"""Host-side encoder orchestration.

The reference `Encoder` (`encoder.py:9-70`) processes one frame per call and
accumulates Python lists. This encoder ingests frames, groups them into GOPs
(dispatch rule `frame_num % gop_len == 0 -> I`, encoder.py:25), batches GOPs,
and runs the jitted device pipeline — one device program per GOP batch
instead of ~10^4 Python-loop iterations per frame.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo
from vcs_h264_tpu.models import pipeline
from vcs_h264_tpu.io.video import group_into_gops


class Encoder:
    def __init__(self, cfg: CodecConfig = CodecConfig(),
                 gop_batch: int = 8):
        self.cfg = cfg
        self.gop_batch = gop_batch

    def encode_frames(self, frames: List[np.ndarray], fps: float = 25.0
                      ) -> EncodedVideo:
        """Encode a list of BGR uint8 frames (all same shape, block-multiple
        dims) into an EncodedVideo."""
        if not frames:
            raise ValueError("no frames to encode")
        h, w, _ = frames[0].shape
        cfg = self.cfg
        gop_len = cfg.gop_len
        grouped = group_into_gops(frames, gop_len)

        # Full-size GOPs run batched; ragged tails run per-GOP (one extra
        # compile per distinct tail size).
        full = [(i, p) for i, p in grouped if p.shape[0] == gop_len - 1]
        tail = [(i, p) for i, p in grouped if p.shape[0] != gop_len - 1]

        encoded: List[EncodedGOP] = []
        enc_batch = pipeline.jit_encode_gop_batch(cfg)
        for start in range(0, len(full), self.gop_batch):
            chunk = full[start:start + self.gop_batch]
            i_b = jnp.asarray(
                np.stack([i for i, _ in chunk]).transpose(0, 3, 1, 2),
                jnp.int32)
            p_b = jnp.asarray(
                np.stack([p for _, p in chunk]).transpose(0, 1, 4, 2, 3),
                jnp.int32)
            out = enc_batch(i_b, p_b)
            for bi in range(len(chunk)):
                encoded.append(EncodedGOP(
                    i_frame=out.i_frame[bi], mv=out.mv[bi],
                    residuals=None if out.residuals is None
                    else out.residuals[bi]))
        enc_one = pipeline.jit_encode_gop(cfg)
        for i_f, p_f in tail:
            i_pl = jnp.asarray(i_f.transpose(2, 0, 1), jnp.int32)
            if p_f.shape[0] == 0:
                encoded.append(EncodedGOP(
                    i_frame=i_pl,
                    mv=jnp.zeros((0, h // cfg.block_size,
                                  w // cfg.block_size, 2), jnp.int32),
                    residuals=None))
            else:
                encoded.append(enc_one(
                    i_pl, jnp.asarray(p_f.transpose(0, 3, 1, 2), jnp.int32)))

        # Re-interleave into stream order (full GOPs were appended first,
        # then tails).
        merged: List[EncodedGOP] = []
        fi = 0
        ti = len(full)
        for _, p in grouped:
            if p.shape[0] == gop_len - 1:
                merged.append(encoded[fi]); fi += 1
            else:
                merged.append(encoded[ti]); ti += 1

        return EncodedVideo(config=cfg, height=h, width=w, fps=fps,
                            num_frames=len(frames), gops=merged)

    def encode_video(self, path: str, max_frames: Optional[int] = None
                     ) -> EncodedVideo:
        from vcs_h264_tpu.io.video import VideoReader
        reader = VideoReader(path, block_multiple=self.cfg.block_size,
                             max_frames=max_frames)
        frames = reader.read_all()
        return self.encode_frames(frames, fps=reader.fps)
