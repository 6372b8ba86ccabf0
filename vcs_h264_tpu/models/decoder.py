"""Host-side decoder orchestration (ref: `decoder.py:11-69`).

Consumes an EncodedVideo artifact (separable from the encoder, unlike the
reference's shared in-memory lists, main.py:48-49) and reconstructs frames on
device, GOP-batched. `iter_frames` is the streaming core: each GOP batch is
dispatched asynchronously and materialized only when its frames are yielded,
so `decode_to_file` overlaps cv2 encoding of batch k with device decode of
batch k+1 instead of holding the whole video in host memory.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import jax.numpy as jnp

from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo
from vcs_h264_tpu.models import pipeline


class Decoder:
    def __init__(self, gop_batch: int = 8):
        self.gop_batch = gop_batch

    def decode(self, video: EncodedVideo) -> List[np.ndarray]:
        """-> list of BGR uint8 frames, in stream order."""
        return list(self.iter_frames(video))

    def iter_frames(self, video: EncodedVideo) -> Iterator[np.ndarray]:
        """Yield BGR uint8 HxWx3 frames in stream order (streaming)."""
        gen = (self._iter_420(video) if video.config.chroma_420
               else self._iter_fullres(video))
        for n, frame in enumerate(gen):
            if n >= video.num_frames:
                return
            yield frame

    def _iter_fullres(self, video: EncodedVideo) -> Iterator[np.ndarray]:
        import dataclasses
        import jax
        cfg = video.config
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

        buf: List[EncodedGOP] = []

        def flush():
            if not buf:
                return
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            out = np.asarray(dec_batch(stacked))         # [B, F, 3, H, W]
            buf.clear()
            for b in range(out.shape[0]):
                for f in out[b]:
                    yield f.transpose(1, 2, 0).astype(np.uint8)

        for gop in video.gops:
            gop = strip(gop)
            if gop.num_coded == cfg.gop_len:
                buf.append(gop)
                if len(buf) >= self.gop_batch:
                    yield from flush()
            else:
                yield from flush()
                if gop.num_p == 0:
                    yield (np.asarray(gop.i_frame)
                           .transpose(1, 2, 0).astype(np.uint8))
                else:
                    out = np.asarray(dec_one(gop))
                    for f in out:
                        yield f.transpose(1, 2, 0).astype(np.uint8)
        yield from flush()

    def _iter_420(self, video: EncodedVideo) -> Iterator[np.ndarray]:
        import dataclasses
        import jax
        from vcs_h264_tpu.models import pipeline420 as p420
        cfg = video.config
        dec_batch = p420.jit_decode_gop_batch_420_u8(cfg)
        buf = []

        def strip(gop):
            if gop.iq_y is None:
                return gop
            return dataclasses.replace(gop, iq_y=None, im_y=None, ie_y=None,
                                       iq_c=None, im_c=None, ie_c=None)

        def emit(out):
            for b in range(out.shape[0]):
                for f in out[b]:
                    yield f.transpose(1, 2, 0).astype(np.uint8)

        def flush():
            if not buf:
                return
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            out = np.asarray(dec_batch(stacked))
            buf.clear()
            yield from emit(out)

        for gop in video.gops:
            gop = strip(gop)
            if gop.num_coded == cfg.gop_len:
                buf.append(gop)
                if len(buf) >= self.gop_batch:
                    yield from flush()
            else:
                yield from flush()
                if gop.num_p == 0:
                    bgr = np.asarray(p420.emit_bgr(
                        jnp.asarray(gop.i_y)[None], jnp.asarray(gop.i_c)[None]))
                    yield bgr[0].transpose(1, 2, 0).astype(np.uint8)
                else:
                    one = jax.tree.map(lambda x: jnp.asarray(x)[None], gop)
                    yield from emit(np.asarray(dec_batch(one)))
        yield from flush()

    def decode_to_file(self, video: EncodedVideo, path: str) -> None:
        """Stream-decode into a video file: cv2 encoding of each GOP batch
        overlaps the async device decode of the next."""
        from vcs_h264_tpu.io.video import VideoWriter
        writer = VideoWriter(path, video.width, video.height, video.fps)
        try:
            for f in self.iter_frames(video):
                writer.write(f)
        finally:
            writer.close()
