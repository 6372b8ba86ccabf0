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
    # B-frame fields (None unless the GOP pattern has B frames); mode is the
    # per-block fwd/bwd/bi decision made on luma SAD
    b_mv: Optional[jax.Array] = None     # [NB, 2, nbh, nbw, 2] int32
    b_mode: Optional[jax.Array] = None   # [NB, nbh, nbw] int8
    bres_y: Optional[jax.Array] = None   # [NB, H, W] int16
    bres_c: Optional[jax.Array] = None   # [NB, 2, H/2, W/2] int16

    def tree_flatten(self):
        return (self.i_y, self.i_c, self.mv, self.res_y, self.res_c,
                self.iq_y, self.im_y, self.ie_y,
                self.iq_c, self.im_c, self.ie_c,
                self.b_mv, self.b_mode, self.bres_y, self.bres_c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_p(self) -> int:
        return self.mv.shape[0]

    @property
    def num_b(self) -> int:
        return 0 if self.b_mv is None else self.b_mv.shape[0]

    @property
    def num_coded(self) -> int:
        return 1 + self.num_p + self.num_b


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


def _use_fused_luma(cfg: CodecConfig, n_p: int) -> bool:
    """Fused Pallas path for the LUMA inter stage (ops/inter_pallas.py,
    c == 1): compensation + DCT + quant in one kernel, bitwise-equal to
    the _code_planes composition. Chroma has its own fused path
    (_use_fused_chroma) since round 5."""
    from vcs_h264_tpu.ops.motion import use_pallas_default
    return (n_p > 0 and cfg.with_residual and cfg.block_size == 8
            and use_pallas_default())


def _use_fused_chroma(cfg: CodecConfig, n_p: int, wc: int) -> bool:
    """Fused Pallas path for the CHROMA inter stage (ops/inter_pallas.py
    _fused_call_c420): the Cr|Cb planes concatenate along W (restoring
    128-lane alignment) and the kernel models the two 4-px MV rows under
    each 8-px transform strip with per-half displacement maps (VERDICT r4
    Next #4). Bitwise-equal to the XLA composition below."""
    from vcs_h264_tpu.ops.motion import use_pallas_default
    return (n_p > 0 and cfg.with_residual and cfg.block_size == 8
            and cfg.search_reach // 2 >= 1 and (2 * wc) % 128 == 0
            and use_pallas_default())


def _fused_code_c(mv, c_ref, c_cur, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import encode_c420_coeffs_fused
    return encode_c420_coeffs_fused(
        _chroma_mv(mv), c_ref, c_cur, cfg.block_size,
        cfg.search_reach // 2, cfg.quality_factor)


def _fused_decode_c(mv, c_ref, res_c, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import decode_c420_frames_fused
    return decode_c420_frames_fused(
        _chroma_mv(mv), c_ref, res_c, cfg.block_size,
        cfg.search_reach // 2, cfg.quality_factor)


def _fused_code_y(mv, y_ref, y_cur, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import encode_p_coeffs_fused
    return encode_p_coeffs_fused(
        mv, y_ref[:, None], y_cur[:, :, None], cfg.block_size,
        cfg.search_reach, cfg.quality_factor)[:, :, 0]


def _fused_decode_y(mv, y_ref, res_y, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import decode_p_frames_fused
    return decode_p_frames_fused(
        mv, y_ref[:, None], res_y[:, :, None], cfg.block_size,
        cfg.search_reach, cfg.quality_factor)[:, :, 0]


def _search(y_cur, y_ref, cfg: CodecConfig):
    """Luma-only search; the reference's static threshold (motion.py:8) is
    calibrated for 3-channel SAD — scale to the single-plane SAD."""
    return motion.motion_search_gops(
        y_cur[:, :, None], y_ref[:, None], bs=cfg.block_size,
        reach=cfg.search_reach, step=cfg.search_step,
        static_threshold=cfg.static_threshold // 3)


def _predict(mv, y_ref, c_ref, cfg: CodecConfig):
    """(luma mv, reference planes) -> (pred_y [B, F, H, W], pred_c)."""
    bs = cfg.block_size
    pred_y = _compensate(mv, y_ref[:, None], bs, cfg.search_reach)[:, :, 0]
    pred_c = _compensate(_chroma_mv(mv), c_ref, bs // 2,
                         max(1, cfg.search_reach // 2))
    return pred_y, pred_c


def encode_gop_batch_420(i_frames: jnp.ndarray, p_frames: jnp.ndarray,
                         cfg: CodecConfig) -> EncodedGOP420:
    """i_frames BGR planar [B, 3, H, W]; p_frames: ALL non-I frames of the
    GOP in display order [B, F, 3, H, W] -> EncodedGOP420 batch. H, W must
    be multiples of 2*block_size. B-bearing patterns predict B frames from
    decoded anchors (closed loop) with a luma-SAD fwd/bwd/bi mode decision;
    chroma rides the halved B vectors."""
    from vcs_h264_tpu.models.pipeline import gop_layout
    bs = cfg.block_size
    qy, qc = _tables(cfg)
    y_i, c_i = ingest_420(i_frames)                      # [B,H,W], [B,2,h,w]
    y_p, c_p = ingest_420(p_frames)                      # [B,F,H,W], [B,F,2..]
    use_b = cfg.has_b and p_frames.shape[1] == cfg.gop_len - 1
    if use_b:
        _, _, prev_slot, next_slot, p_sel, b_sel = gop_layout(cfg.gop_pattern)
        y_b, c_b = y_p[:, np.array(b_sel)], c_p[:, np.array(b_sel)]
        y_p, c_p = y_p[:, np.array(p_sel)], c_p[:, np.array(p_sel)]

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

    mv = _search(y_p, y_i, cfg)
    res_y = res_c = None
    fused_y = _use_fused_luma(cfg, y_p.shape[1])
    fused_c = _use_fused_chroma(cfg, y_p.shape[1], c_p.shape[-1])
    pred_c = None
    if fused_y:
        res_y = _fused_code_y(mv, y_i, y_p, cfg)
        if fused_c:
            res_c = _fused_code_c(mv, c_i, c_p, cfg)
        else:
            pred_c = _compensate(_chroma_mv(mv), c_i, bs // 2,
                                 max(1, cfg.search_reach // 2))
            res_c = _code_planes(c_p - pred_c, qc, bs)
    else:
        pred_y, pred_c = _predict(mv, y_i, c_i, cfg)
        if cfg.with_residual:
            res_y = _code_planes(y_p - pred_y, qy, bs)
            res_c = _code_planes(c_p - pred_c, qc, bs)
    gop = EncodedGOP420(i_y=y_i, i_c=c_i, mv=mv, res_y=res_y, res_c=res_c,
                        iq_y=iq, im_y=im, ie_y=ie,
                        iq_c=iqc, im_c=imc, ie_c=iec)
    if not use_b:
        return gop

    # closed loop: decoded anchors
    if fused_y:
        dec_y = _fused_decode_y(mv, y_i, res_y, cfg)
        if fused_c:
            dec_c = _fused_decode_c(mv, c_i, res_c, cfg)
        else:
            dec_c = jnp.clip(pred_c + _decode_planes(res_c, qc, bs), 0, 255)
    else:
        dec_y, dec_c = pred_y, pred_c
        if cfg.with_residual:
            dec_y = jnp.clip(pred_y + _decode_planes(res_y, qy, bs), 0, 255)
            dec_c = jnp.clip(pred_c + _decode_planes(res_c, qc, bs), 0, 255)
    anch_y = jnp.concatenate([y_i[:, None], dec_y], axis=1)  # [B, NA, H, W]
    anch_c = jnp.concatenate([c_i[:, None], dec_c], axis=1)
    bb, nb = y_b.shape[:2]
    flat = lambda x: x.reshape(bb * nb, *x.shape[2:])
    prev_y = flat(anch_y[:, np.array(prev_slot)])
    next_y = flat(anch_y[:, np.array(next_slot)])
    prev_c = flat(anch_c[:, np.array(prev_slot)])
    next_c = flat(anch_c[:, np.array(next_slot)])
    yb_f, cb_f = flat(y_b), flat(c_b)
    mv_f = _search(yb_f[:, None], prev_y, cfg)[:, 0]     # [B*NB, nbh, nbw, 2]
    mv_b = _search(yb_f[:, None], next_y, cfg)[:, 0]
    pf_y, pf_c = _predict(mv_f[:, None], prev_y, prev_c, cfg)
    pb_y, pb_c = _predict(mv_b[:, None], next_y, next_c, cfg)
    pf_y, pf_c, pb_y, pb_c = pf_y[:, 0], pf_c[:, 0], pb_y[:, 0], pb_c[:, 0]
    # per-block mode decision on luma SAD (first-minimum: fwd, bwd, bi)
    from vcs_h264_tpu.ops.motion import _tile_sums
    bi_y = (pf_y + pb_y + 1) >> 1
    sads = jnp.stack([_tile_sums(jnp.abs(p - yb_f)[:, None], bs)
                      for p in (pf_y, pb_y, bi_y)])      # [3, B*NB, nbh, nbw]
    mode = jnp.argmin(sads, axis=0).astype(jnp.int8)
    mpy = jnp.repeat(jnp.repeat(mode, bs, -2), bs, -1).astype(jnp.int32)
    pred_by = jnp.where(mpy == 0, pf_y, jnp.where(mpy == 1, pb_y, bi_y))
    bs_c = bs // 2
    mpc = jnp.repeat(jnp.repeat(mode, bs_c, -2), bs_c, -1)[:, None]
    mpc = mpc.astype(jnp.int32)
    bi_c = (pf_c + pb_c + 1) >> 1
    pred_bc = jnp.where(mpc == 0, pf_c, jnp.where(mpc == 1, pb_c, bi_c))
    bres_y = bres_c = None
    if cfg.with_residual:
        bres_y = _code_planes(yb_f - pred_by, qy, bs)
        bres_c = _code_planes(cb_f - pred_bc, qc, bs)
    unflat = lambda x: None if x is None else x.reshape(bb, nb, *x.shape[1:])
    b_mv = jnp.stack([mv_f, mv_b], axis=1)               # [B*NB, 2, nbh, nbw, 2]
    return dataclasses.replace(
        gop, b_mv=unflat(b_mv), b_mode=unflat(mode),
        bres_y=unflat(bres_y), bres_c=unflat(bres_c))


def decode_gop_batch_420(gop: EncodedGOP420, cfg: CodecConfig,
                         as_bgr: bool = True):
    """-> BGR frames [B, gop_len, 3, H, W] int32 in display order (or the
    (y, c) plane stacks when as_bgr=False)."""
    bs = cfg.block_size
    qy, qc = _tables(cfg)
    y_i = gop.i_y.astype(jnp.int32)
    c_i = gop.i_c.astype(jnp.int32)
    if (gop.res_y is not None
            and _use_fused_luma(cfg, gop.mv.shape[1])):
        rec_y = _fused_decode_y(gop.mv, y_i, gop.res_y, cfg)
        if _use_fused_chroma(cfg, gop.mv.shape[1], c_i.shape[-1]):
            rec_c = _fused_decode_c(gop.mv, c_i, gop.res_c, cfg)
        else:
            rec_c = _compensate(_chroma_mv(gop.mv), c_i, bs // 2,
                                max(1, cfg.search_reach // 2))
            rec_c = jnp.clip(rec_c + _decode_planes(gop.res_c, qc, bs),
                             0, 255)
    else:
        rec_y, rec_c = _predict(gop.mv, y_i, c_i, cfg)
        if cfg.with_residual and gop.res_y is not None:
            rec_y = jnp.clip(rec_y + _decode_planes(gop.res_y, qy, bs),
                             0, 255)
            rec_c = jnp.clip(rec_c + _decode_planes(gop.res_c, qc, bs),
                             0, 255)
    y = jnp.concatenate([y_i[:, None], rec_y], axis=1)   # [B, 1+NA-1, H, W]
    c = jnp.concatenate([c_i[:, None], rec_c], axis=1)
    if gop.b_mv is not None:
        from vcs_h264_tpu.models.pipeline import gop_layout
        anchor_pos, b_pos, prev_slot, next_slot, _, _ = \
            gop_layout(cfg.gop_pattern)
        bb, nb = gop.b_mv.shape[:2]
        flat = lambda x: x.reshape(bb * nb, *x.shape[2:])
        prev_y, next_y = (flat(y[:, np.array(s)])
                          for s in (prev_slot, next_slot))
        prev_c, next_c = (flat(c[:, np.array(s)])
                          for s in (prev_slot, next_slot))
        bmv = flat(gop.b_mv)
        pf_y, pf_c = _predict(bmv[:, 0][:, None], prev_y, prev_c, cfg)
        pb_y, pb_c = _predict(bmv[:, 1][:, None], next_y, next_c, cfg)
        pf_y, pf_c, pb_y, pb_c = (x[:, 0] for x in (pf_y, pf_c, pb_y, pb_c))
        mode = flat(gop.b_mode)
        mpy = jnp.repeat(jnp.repeat(mode, bs, -2), bs, -1).astype(jnp.int32)
        by = jnp.where(mpy == 0, pf_y,
                       jnp.where(mpy == 1, pb_y, (pf_y + pb_y + 1) >> 1))
        bs_c = bs // 2
        mpc = jnp.repeat(jnp.repeat(mode, bs_c, -2), bs_c, -1)
        mpc = mpc[:, None].astype(jnp.int32)
        bc = jnp.where(mpc == 0, pf_c,
                       jnp.where(mpc == 1, pb_c, (pf_c + pb_c + 1) >> 1))
        if cfg.with_residual and gop.bres_y is not None:
            by = jnp.clip(by + _decode_planes(flat(gop.bres_y), qy, bs),
                          0, 255)
            bc = jnp.clip(bc + _decode_planes(flat(gop.bres_c), qc, bs),
                          0, 255)
        by = by.reshape(bb, nb, *by.shape[1:])
        bc = bc.reshape(bb, nb, *bc.shape[1:])
        yo = jnp.zeros((bb, cfg.gop_len, *y.shape[2:]), jnp.int32)
        co = jnp.zeros((bb, cfg.gop_len, *c.shape[2:]), jnp.int32)
        y = yo.at[:, np.array(anchor_pos)].set(y).at[:, np.array(b_pos)].set(by)
        c = co.at[:, np.array(anchor_pos)].set(c).at[:, np.array(b_pos)].set(bc)
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
