"""Rate-distortion regression pins (VERDICT r2 Next #6).

Pins the QF=50 operating points of tools/rd_table.py (both reference videos,
production + 4:2:0 modes) as CI assertions: bytes/frame may only shrink
(entropy-coder improvements pass; size regressions fail) and PSNR may not
drop below the recorded quality. Reference analog: the dct.py QF studies
(`DCTCompression/dct.py:157,188-191`) only ever printed sparsity — no
quality gate existed.

Pinned values measured on CPU, 24 frames (11 for cat_short), round 2
(BASELINE.md R-D table; recomputed here at encode time).
"""

import os

import numpy as np
import pytest

from vcs_h264_tpu.config import CodecConfig

# (video, mode) -> (max bytes/frame, min PSNR dB capped at 99)
# max bytes = round-5 measurement + 5% headroom; min PSNR = round-5 - 0.3 dB.
# Round-5 v11 coder (significance-map coefficients with spatial/temporal/
# cross-channel contexts + (left, up) mode contexts): 11880 / 9114 / 20344
# / 14640 B/frame — -11.1%/-2.8%/-9.5%/-3.2% vs the round-4 v10 points
# (13365 / 9380 / 22479 / 15126) at identical PSNR.
_PINS = {
    ("slow_traffic_small.mp4", "production"): (12480, 34.97),
    ("slow_traffic_small.mp4", "chroma420"): (9570, 34.91),
    ("cat_short.mp4", "production"): (21370, 35.93),
    ("cat_short.mp4", "chroma420"): (15380, 36.60),
}

_VIDEOS = "/root/reference/videos"


def _cfg(mode):
    if mode == "production":
        return CodecConfig.production(quality_factor=50.0, intra_qstep=16)
    return CodecConfig(quant_mode="rounded", chroma_420=True, intra_i=True,
                       intra_qstep=16, quality_factor=50.0)


@pytest.mark.parametrize("video,mode", sorted(_PINS))
def test_rd_operating_point(tmp_path, video, mode):
    path = os.path.join(_VIDEOS, video)
    if not os.path.exists(path):
        pytest.skip(f"{video} unavailable")
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.bitstream import save_vcs
    from vcs_h264_tpu.io.video import VideoReader
    from vcs_h264_tpu.utils.metrics import psnr

    cfg = _cfg(mode)
    mult = cfg.block_size * (2 if cfg.chroma_420 else 1)
    frames = VideoReader(path, block_multiple=mult,
                         max_frames=24).read_all()
    enc = Encoder(cfg, gop_batch=4).encode_frames(frames)
    out = str(tmp_path / "rd.vcs")
    save_vcs(enc, out)
    bpf = os.path.getsize(out) / len(frames)
    dec = Decoder().decode(enc)
    ps = float(np.mean([min(psnr(a, b), 99.0)
                        for a, b in zip(frames, dec)]))
    max_bpf, min_psnr = _PINS[(video, mode)]
    assert bpf <= max_bpf, (bpf, max_bpf)
    assert ps >= min_psnr, (ps, min_psnr)
