"""4:2:0 codec pipeline: Y + quarter-res chroma through the whole codec.

The reference treats 4:2:0 subsampling as a standalone study
(`ChromaSubsampling/chroma.py`) and never wires it into the video codec —
its encoder carries full-res BGR throughout and converts BGR->YCrCb per
residual (`DCTcompressor.py:55-60`). Here 4:2:0 is a first-class codec mode
(SURVEY.md §7 design principle "color conversion and 4:2:0 happen once at
ingest"): frames are ingested once to planar Y [H, W] + Cr/Cb [H/2, W/2],
motion is searched on luma only, chroma rides the halved luma vectors (the
standard structure), and residuals are DCT/quantized per plane with the
JPEG QY table for luma and QC for chroma (`dct.py:139-166`).

Quantization is the production path (rounded int16, `dct.py:179` semantics);
residuals are signed (no wrap — see pipeline.py's note on why wrap semantics
break under real quantization). The payload per GOP is:

  i_y  [H, W] uint8-valued     i_c [2, H/2, W/2]      (recon when lossy intra)
  mv   [F, nbh, nbw, 2]        luma block grid; chroma uses mv >> 1 on
                               half-size blocks (per-block floor division)
  res_y [F, H, W] int16        quantized luma coefficients
  res_c [F, 2, H/2, W/2] int16 quantized chroma coefficients

vs the full-res mode, the raw sample count drops 2x (3HW -> 1.5HW) before
entropy coding even starts.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.ops import color, motion, subsample
from vcs_h264_tpu.ops.blocks import plane_to_blocks, blocks_to_plane
from vcs_h264_tpu.ops.dct import dct2_blocks, idct2_blocks
from vcs_h264_tpu.ops.quant import quant_tables


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EncodedGOP420:
    """One encoded 4:2:0 GOP (leading batch axis optional on every leaf).

    Lossy-intra payload fields (iq/im/ie, per resolution) are present when
    cfg.intra_qstep > 0; then i_y/i_c hold the lossy reconstruction the
    P-frames were predicted against (same closed-loop contract as
    EncodedGOP.i_qcoef, models/gop.py)."""
    i_y: jax.Array                       # [H, W] int32
    i_c: jax.Array                       # [2, H/2, W/2] int32
    mv: jax.Array                        # [F, nbh, nbw, 2] int32
    res_y: Optional[jax.Array]           # [F, H, W] int16
    res_c: Optional[jax.Array]           # [F, 2, H/2, W/2] int16
    iq_y: Optional[jax.Array] = None     # [1, H, W] int16
    im_y: Optional[jax.Array] = None     # [1, H/4, W/4] int8
    ie_y: Optional[jax.Array] = None     # [1, H/4, W/4] bool
    iq_c: Optional[jax.Array] = None     # [2, H/2, W/2] int16
    im_c: Optional[jax.Array] = None     # [2, H/8, W/8] int8
    ie_c: Optional[jax.Array] = None     # [2, H/8, W/8] bool

    def tree_flatten(self):
        return (self.i_y, self.i_c, self.mv, self.res_y, self.res_c,
                self.iq_y, self.im_y, self.ie_y,
                self.iq_c, self.im_c, self.ie_c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_p(self) -> int:
        return self.mv.shape[0]

    @property
    def num_coded(self) -> int:
        return 1 + self.num_p


def ingest_420(bgr_planes: jnp.ndarray):
    """BGR planar [..., 3, H, W] int -> (y [..., H, W], c [..., 2, H/2, W/2])
    int32, via the cv2-bit-exact fixed-point conversion + the study's
    box-filter decimation (chroma.py:16-21)."""
    ycc = color.bgr_to_ycrcb_planes(bgr_planes.astype(jnp.int32))
    y, cr, cb = subsample.encode_420(ycc)
    return y, jnp.stack([cr, cb], axis=-3)


def emit_bgr(y: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(y [..., H, W], c [..., 2, H/2, W/2]) -> BGR planar [..., 3, H, W]
    int32 via nearest chroma upsampling (chroma.py:31-33)."""
    ycc = subsample.decode_420(y, c[..., 0, :, :], c[..., 1, :, :])
    return color.ycrcb_to_bgr_planes(ycc)


def _code_planes(resid: jnp.ndarray, table: jnp.ndarray, bs: int):
    """Signed residual [..., H, W] -> rounded int16 coefficients."""
    d = dct2_blocks(plane_to_blocks(resid.astype(jnp.float32), bs))
    return blocks_to_plane(jnp.round(d / table)).astype(jnp.int16)


def _decode_planes(coeffs: jnp.ndarray, table: jnp.ndarray, bs: int):
    """int16 coefficients -> signed residual [..., H, W] int32."""
    v = idct2_blocks(plane_to_blocks(coeffs.astype(jnp.float32), bs) * table)
    return jnp.round(blocks_to_plane(v)).astype(jnp.int32)


def _tables(cfg: CodecConfig):
    q = quant_tables(cfg.quality_factor, jnp.float32)    # [3, bs, bs] (Y,C,C)
    return q[0], q[1]


def _chroma_mv(mv: jnp.ndarray) -> jnp.ndarray:
    """Luma MVs -> chroma MVs on half-res planes (floor division; the
    half-size chroma block grid is aligned with the luma grid, so
    |mv//2| <= reach//2 keeps compensation in range)."""
    return jnp.floor_divide(mv, 2)


def _compensate(mv, refs, bs, reach):
    """mv [B, F, nbh, nbw, 2] x refs [B, C, H, W] -> [B, F, C, H, W].

    The TPU Pallas compensation kernel requires block rows divisible by 8
    (mosaic sublane tiling); the half-size chroma blocks (bs//2 = 4) use the
    dynamic-gather path instead — the chroma planes are quarter-area, so the
    gather cost is small next to the luma kernel."""
    backend = "auto" if bs >= 8 else "jnp"
    return motion.motion_compensate_gops(mv, refs, bs=bs, reach=reach,
                                         backend=backend)


def encode_gop_batch_420(i_frames: jnp.ndarray, p_frames: jnp.ndarray,
                         cfg: CodecConfig) -> EncodedGOP420:
    """i_frames BGR planar [B, 3, H, W]; p_frames [B, F, 3, H, W] ->
    EncodedGOP420 batch. H, W must be multiples of 2*block_size."""
    bs = cfg.block_size
    qy, qc = _tables(cfg)
    y_i, c_i = ingest_420(i_frames)                      # [B,H,W], [B,2,h,w]
    y_p, c_p = ingest_420(p_frames)                      # [B,F,H,W], [B,F,2..]

    iq = im = ie = iqc = imc = iec = None
    if cfg.intra_qstep:
        from vcs_h264_tpu.models import intra_codec
        pay_y, rec_y = intra_codec.encode_intra_frames_lossy_batch(
            y_i[:, None], cfg.intra_qstep)
        pay_c, rec_c = intra_codec.encode_intra_frames_lossy_batch(
            c_i, cfg.intra_qstep)
        y_i, c_i = rec_y[:, 0], rec_c
        iq, im, ie = pay_y.qcoef, pay_y.modes, pay_y.escape
        iqc, imc, iec = pay_c.qcoef, pay_c.modes, pay_c.escape

    # luma-only search: the reference's static threshold (motion.py:8) is
    # calibrated for 3-channel SAD; scale it to the single-plane SAD
    mv = motion.motion_search_gops(
        y_p[:, :, None], y_i[:, None], bs=bs, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold // 3)
    res_y = res_c = None
    if cfg.with_residual:
        rec_y = _compensate(mv, y_i[:, None], bs, cfg.search_reach)[:, :, 0]
        rec_c = _compensate(_chroma_mv(mv), c_i, bs // 2,
                            max(1, cfg.search_reach // 2))
        res_y = _code_planes(y_p - rec_y, qy, bs)
        res_c = _code_planes(c_p - rec_c, qc, bs)
    return EncodedGOP420(i_y=y_i, i_c=c_i, mv=mv, res_y=res_y, res_c=res_c,
                         iq_y=iq, im_y=im, ie_y=ie,
                         iq_c=iqc, im_c=imc, ie_c=iec)


def decode_gop_batch_420(gop: EncodedGOP420, cfg: CodecConfig,
                         as_bgr: bool = True):
    """-> BGR frames [B, gop_len, 3, H, W] int32 in display order (or the
    (y, c) plane stacks when as_bgr=False)."""
    bs = cfg.block_size
    qy, qc = _tables(cfg)
    y_i = gop.i_y.astype(jnp.int32)
    c_i = gop.i_c.astype(jnp.int32)
    rec_y = _compensate(gop.mv, y_i[:, None], bs, cfg.search_reach)[:, :, 0]
    rec_c = _compensate(_chroma_mv(gop.mv), c_i, bs // 2,
                        max(1, cfg.search_reach // 2))
    if cfg.with_residual and gop.res_y is not None:
        rec_y = jnp.clip(rec_y + _decode_planes(gop.res_y, qy, bs), 0, 255)
        rec_c = jnp.clip(rec_c + _decode_planes(gop.res_c, qc, bs), 0, 255)
    y = jnp.concatenate([y_i[:, None], rec_y], axis=1)   # [B, 1+F, H, W]
    c = jnp.concatenate([c_i[:, None], rec_c], axis=1)   # [B, 1+F, 2, h, w]
    if not as_bgr:
        return y, c
    return emit_bgr(y, c)


@functools.lru_cache(maxsize=None)
def jit_encode_gop_batch_420(cfg: CodecConfig):
    return jax.jit(functools.partial(encode_gop_batch_420, cfg=cfg))


@functools.lru_cache(maxsize=None)
def jit_decode_gop_batch_420_u8(cfg: CodecConfig):
    def fn(gop):
        return decode_gop_batch_420(gop, cfg).astype(jnp.uint8)
    return jax.jit(fn)


def decode_intra_420(gop: EncodedGOP420, qstep: int) -> EncodedGOP420:
    """Reconstruct i_y/i_c from the lossy-intra payload (bit-exact equal to
    the encoder's recon) — used when loading a serialized stream whose
    I-planes were stored as intra payload only."""
    from vcs_h264_tpu.models import intra_codec
    from vcs_h264_tpu.models.intra_codec import IntraFrameLossy
    y = intra_codec.decode_intra_frame_lossy(
        IntraFrameLossy(jnp.asarray(gop.iq_y), jnp.asarray(gop.im_y),
                        jnp.asarray(gop.ie_y)), qstep)[0]
    c = intra_codec.decode_intra_frame_lossy(
        IntraFrameLossy(jnp.asarray(gop.iq_c), jnp.asarray(gop.im_c),
                        jnp.asarray(gop.ie_c)), qstep)
    return dataclasses.replace(gop, i_y=y, i_c=c)
