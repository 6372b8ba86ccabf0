"""Host-side decoder orchestration (ref: `decoder.py:11-69`).

Consumes an EncodedVideo artifact (separable from the encoder, unlike the
reference's shared in-memory lists, main.py:48-49) and reconstructs frames on
device, GOP-batched.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo
from vcs_h264_tpu.models import pipeline


class Decoder:
    def __init__(self, gop_batch: int = 8):
        self.gop_batch = gop_batch

    def decode(self, video: EncodedVideo) -> List[np.ndarray]:
        """-> list of BGR uint8 frames, in stream order."""
        import dataclasses
        cfg = video.config
        if cfg.chroma_420:
            return self._decode_420(video)
        dec_batch = pipeline.jit_decode_gop_batch_u8(cfg)
        dec_one = pipeline.jit_decode_gop_u8(cfg)

        def strip(gop: EncodedGOP) -> EncodedGOP:
            # decode_gop_batch never reads the lossy-intra payload (i_frame
            # already holds the reconstruction); uploading it would waste
            # host->device traffic roughly the size of the I-frame per GOP
            if gop.i_qcoef is None:
                return gop
            return dataclasses.replace(gop, i_qcoef=None, i_modes=None,
                                       i_escape=None)

        frames: List[np.ndarray] = []
        # batch together consecutive full GOPs
        buf: List[EncodedGOP] = []

        def flush():
            if not buf:
                return
            import jax
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            out = np.asarray(dec_batch(stacked))         # [B, F, 3, H, W]
            for b in range(out.shape[0]):
                frames.extend(f.transpose(1, 2, 0).astype(np.uint8)
                              for f in out[b])
            buf.clear()

        for gop in video.gops:
            gop = strip(gop)
            if gop.num_coded == cfg.gop_len:
                buf.append(gop)
                if len(buf) >= self.gop_batch:
                    flush()
            else:
                flush()
                if gop.num_p == 0:
                    frames.append(np.asarray(gop.i_frame)
                                  .transpose(1, 2, 0).astype(np.uint8))
                else:
                    out = np.asarray(dec_one(gop))
                    frames.extend(f.transpose(1, 2, 0).astype(np.uint8)
                                  for f in out)
        flush()
        return frames[: video.num_frames]

    def _decode_420(self, video: EncodedVideo) -> List[np.ndarray]:
        import dataclasses
        import jax
        from vcs_h264_tpu.models import pipeline420 as p420
        cfg = video.config
        dec_batch = p420.jit_decode_gop_batch_420_u8(cfg)
        frames: List[np.ndarray] = []
        buf = []

        def strip(gop):
            if gop.iq_y is None:
                return gop
            return dataclasses.replace(gop, iq_y=None, im_y=None, ie_y=None,
                                       iq_c=None, im_c=None, ie_c=None)

        def emit(out):
            for b in range(out.shape[0]):
                frames.extend(f.transpose(1, 2, 0).astype(np.uint8)
                              for f in out[b])

        def flush():
            if not buf:
                return
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            emit(np.asarray(dec_batch(stacked)))
            buf.clear()

        for gop in video.gops:
            gop = strip(gop)
            if gop.num_coded == cfg.gop_len:
                buf.append(gop)
                if len(buf) >= self.gop_batch:
                    flush()
            else:
                flush()
                if gop.num_p == 0:
                    bgr = np.asarray(p420.emit_bgr(
                        jnp.asarray(gop.i_y)[None], jnp.asarray(gop.i_c)[None]))
                    frames.append(bgr[0].transpose(1, 2, 0).astype(np.uint8))
                else:
                    one = jax.tree.map(lambda x: jnp.asarray(x)[None], gop)
                    emit(np.asarray(dec_batch(one)))
        flush()
        return frames[: video.num_frames]

    def decode_to_file(self, video: EncodedVideo, path: str) -> None:
        from vcs_h264_tpu.io.video import VideoWriter
        frames = self.decode(video)
        writer = VideoWriter(path, video.width, video.height, video.fps)
        for f in frames:
            writer.write(f)
        writer.close()
