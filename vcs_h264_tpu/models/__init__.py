"""Codec orchestration: GOP bitstream pytrees + jitted encode/decode."""

from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo
from vcs_h264_tpu.models.encoder import Encoder
from vcs_h264_tpu.models.decoder import Decoder

__all__ = ["EncodedGOP", "EncodedVideo", "Encoder", "Decoder"]
