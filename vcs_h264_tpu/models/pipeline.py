"""Jitted GOP encode / decode pipelines.

This replaces the reference's per-frame Python orchestration
(`encoder.py:21-36,49-70`; `decoder.py:23-47,52-69`) with whole-GOP tensor
programs: all P-frames of a GOP are processed as one batch (vmap over the
frame axis), and callers can vmap again over a batch of GOPs — the
data-parallel axis used by `vcs_h264_tpu.parallel`.

Semantics notes (all verified bit-exact against oracles in tests/):
  * residual/add-back use mod-256 wrap, matching uint8 arithmetic
    (motion.py:38-40, decoder.py:57).
  * the DCT residual path in "reference" quant mode reproduces
    `DCTcompressor.compress/decompress` including the BGR->YCrCb roundtrip of
    the *residual image* (DCTcompressor.py:55-60,86-93), unrounded
    quantization (:71) and the truncating `astype(uint8)+128` wrap (:89).
  * "rounded" mode uses round-to-nearest integer coefficients (the
    `dct.py:179` semantics) with round+clip reconstruction — the production
    bitstream path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models.gop import EncodedGOP
from vcs_h264_tpu.ops import color, motion
from vcs_h264_tpu.ops.blocks import plane_to_blocks, blocks_to_plane
from vcs_h264_tpu.ops.dct import dct2_blocks, idct2_blocks
from vcs_h264_tpu.ops.quant import quant_tables


def dct_compress_residual(resid_bgr: jnp.ndarray, cfg: CodecConfig) -> jnp.ndarray:
    """uint8-valued planar BGR residual [..., 3, H, W] -> coefficient planes
    [..., 3, H, W] (ref: DCTcompressor.compress, :49-74)."""
    bs = cfg.block_size
    ycc = color.bgr_to_ycrcb_planes(resid_bgr)               # [..., 3, H, W]
    planes = ycc - 128
    x = plane_to_blocks(planes.astype(jnp.float32), bs)      # [..., 3, nbh, nbw, bs, bs]
    d = dct2_blocks(x)
    q = quant_tables(cfg.quality_factor, jnp.float32)        # [3, bs, bs]
    d = d / q[:, None, None]
    if cfg.quant_mode == "rounded":
        d = jnp.round(d)
    coeffs = blocks_to_plane(d)                              # [..., 3, H, W]
    if cfg.quant_mode == "rounded":
        coeffs = coeffs.astype(jnp.int16)
    return coeffs


def dct_decompress_residual(coeffs: jnp.ndarray, cfg: CodecConfig) -> jnp.ndarray:
    """Coefficient planes [..., 3, H, W] -> uint8-valued planar BGR residual
    [..., 3, H, W] (ref: DCTcompressor.decompress, :76-93)."""
    bs = cfg.block_size
    q = quant_tables(cfg.quality_factor, jnp.float32)
    x = plane_to_blocks(coeffs.astype(jnp.float32), bs)
    v = idct2_blocks(x * q[:, None, None])
    plane = blocks_to_plane(v)                               # [..., 3, H, W] float
    if cfg.quant_mode == "reference":
        # The reference truncates (`astype(np.uint8)`, DCTcompressor.py:89),
        # but its IDCT outputs are always within float noise of exact
        # integers (they came from integer residuals through an unrounded
        # quant roundtrip), so truncation randomly subtracts 1 on ~half the
        # pixels. Rounding recovers the intended integer exactly — strictly
        # more accurate than the reference at every pixel (PARITY.md), and
        # bit-exact on static content where the reference is lossless.
        ycc = ((jnp.round(plane).astype(jnp.int32) & 255) + 128) & 255
    else:
        ycc = jnp.clip(jnp.round(plane) + 128, 0, 255).astype(jnp.int32)
    return color.ycrcb_to_bgr_planes(ycc)


# Production ("rounded") residual path: the reference feeds the mod-256
# *wrapped* residual image through BGR->YCrCb before the DCT
# (DCTcompressor.py:55-60). With its unrounded float quantization that is
# lossless, but with real (rounded) quantization the wrap discontinuities
# (-1 -> 255) explode the high-frequency coefficients and quantization error
# wraps across the whole value range (observed: P-frame PSNR dropping to
# ~19 dB). Production mode therefore codes the *signed* residual through a
# linear (offset-free, clip-free) RCT-style decorrelating transform; the
# wrap semantics remain exclusively a reference-parity feature.

_RCT = (0.299, 0.587, 0.114, 0.713, 0.564, 1.403, 0.714, 0.344, 1.773)


def _signed_bgr_to_ycc(resid: jnp.ndarray) -> jnp.ndarray:
    """Linear BGR->YCrCb on signed planar residuals [..., 3, H, W] float."""
    b = resid[..., 0, :, :]
    g = resid[..., 1, :, :]
    r = resid[..., 2, :, :]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713
    cb = (b - y) * 0.564
    return jnp.stack([y, cr, cb], axis=-3)


def _signed_ycc_to_bgr(ycc: jnp.ndarray) -> jnp.ndarray:
    y = ycc[..., 0, :, :]
    cr = ycc[..., 1, :, :]
    cb = ycc[..., 2, :, :]
    r = y + cr / 0.713
    b = y + cb / 0.564
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([b, g, r], axis=-3)


def dct_compress_residual_signed(resid: jnp.ndarray,
                                 cfg: CodecConfig) -> jnp.ndarray:
    """Signed residual [..., 3, H, W] int32 in [-255, 255] -> int16
    quantized coefficient planes."""
    bs = cfg.block_size
    ycc = _signed_bgr_to_ycc(resid.astype(jnp.float32))
    d = dct2_blocks(plane_to_blocks(ycc, bs))
    q = quant_tables(cfg.quality_factor, jnp.float32)
    coeffs = jnp.round(d / q[:, None, None])
    return blocks_to_plane(coeffs).astype(jnp.int16)


def dct_decompress_residual_signed(coeffs: jnp.ndarray,
                                   cfg: CodecConfig) -> jnp.ndarray:
    """int16 coefficient planes -> signed residual [..., 3, H, W] int32."""
    bs = cfg.block_size
    q = quant_tables(cfg.quality_factor, jnp.float32)
    v = idct2_blocks(plane_to_blocks(coeffs.astype(jnp.float32), bs)
                     * q[:, None, None])
    ycc = blocks_to_plane(v)
    return jnp.round(_signed_ycc_to_bgr(ycc)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# GOP layout (static, derived from the pattern): which display positions are
# anchors (I/P) and which are B, and which anchor each B references.


@functools.lru_cache(maxsize=None)
def gop_layout(gop_pattern):
    """-> (anchor_pos, b_pos, prev_slot, next_slot, p_sel, b_sel) tuples.

    anchor_pos/b_pos: display positions of anchors / B frames.
    prev_slot/next_slot: per B frame, the index into the anchor list (I at
    slot 0, P anchors following) of its forward / backward reference.
    p_sel/b_sel: indices of the P / B frames within the non-I frame array
    (display order positions 1..L-1 minus one)."""
    anchors = tuple(t for t, x in enumerate(gop_pattern) if x != "B")
    b_pos = tuple(t for t, x in enumerate(gop_pattern) if x == "B")
    slot = {t: s for s, t in enumerate(anchors)}
    prev_slot = tuple(slot[max(a for a in anchors if a < t)] for t in b_pos)
    next_slot = tuple(slot[min(a for a in anchors if a > t)] for t in b_pos)
    p_sel = tuple(t - 1 for t in anchors[1:])
    b_sel = tuple(t - 1 for t in b_pos)
    return anchors, b_pos, prev_slot, next_slot, p_sel, b_sel


def _apply_residual(recon: jnp.ndarray, resid, cfg: CodecConfig) -> jnp.ndarray:
    """Decoder-side residual add-back on a predicted frame stack
    (ref: decoder.py:52-60)."""
    if not cfg.with_residual or resid is None:
        return recon
    if cfg.with_dct and cfg.quant_mode == "rounded" and cfg.signed_residual:
        return jnp.clip(recon + dct_decompress_residual_signed(resid, cfg),
                        0, 255)
    if cfg.with_dct:
        resid = dct_decompress_residual(resid, cfg)
    return motion.reconstruct_wrap(recon, resid)


def _encode_residual(cur: jnp.ndarray, recon: jnp.ndarray, cfg: CodecConfig):
    """Encoder-side residual coding of (cur - prediction)."""
    if not cfg.with_residual:
        return None
    if cfg.with_dct and cfg.quant_mode == "rounded" and cfg.signed_residual:
        return dct_compress_residual_signed(cur - recon, cfg)
    resid = motion.residuals_wrap(cur, recon)
    if cfg.with_dct:
        resid = dct_compress_residual(resid, cfg)
    return resid


def _use_fused_inter(cfg: CodecConfig, n_p: int) -> bool:
    """The fused P-frame Pallas path (ops/inter_pallas.py): compensation +
    signed residual + RCT + DCT + quant in one kernel, bitwise-equal to the
    XLA composition below. TPU-only (CPU runs the XLA path); production
    full-res mode only (the wrap-semantics reference path and 4:2:0 have
    their own compositions).

    Determinism contract: because the path is selected by the runtime
    platform, bit-exact closed-loop decode is guaranteed only on the same
    backend class as the encoder (TPU<->TPU or CPU<->CPU). Across backends
    the two compositions can differ by +/-1 at exact round-at-.5 ties in
    the inverse transform (~1e-5 of pixels on real content; see
    tests/test_inter_pallas.py), so a TPU-encoded B-frame stream decoded
    on CPU may drift by 1 LSB at those anchors. The container records
    coefficients, not pixels, so the drift never compounds across GOPs
    (each GOP restarts from its stored I-frame)."""
    from vcs_h264_tpu.ops.motion import use_pallas_default
    return (n_p > 0 and cfg.with_residual and cfg.with_dct
            and cfg.quant_mode == "rounded" and cfg.signed_residual
            and not cfg.chroma_420
            and cfg.block_size == 8 and use_pallas_default())


def _fused_encode(mv, refs, curs, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import encode_p_coeffs_fused
    return encode_p_coeffs_fused(mv, refs, curs, cfg.block_size,
                                 cfg.search_reach, cfg.quality_factor)


def _fused_decode(mv, refs, coeffs, cfg: CodecConfig):
    from vcs_h264_tpu.ops.inter_pallas import decode_p_frames_fused
    return decode_p_frames_fused(mv, refs, coeffs, cfg.block_size,
                                 cfg.search_reach, cfg.quality_factor)


def _search_inputs(cur, ref, cfg: CodecConfig, chan_axis: int):
    """Apply cfg.search_luma_only: SAD over the G channel only (H.264-style
    luma-only motion estimation; encoder-side — MVs drive full-channel
    compensation). The static threshold is 3-channel-SAD-denominated
    (motion.py:8), so it scales by 1/3 with the searched channel count."""
    if not cfg.search_luma_only:
        return cur, ref, cfg.static_threshold
    sl = (slice(None),) * chan_axis + (slice(1, 2),)
    return cur[sl], ref[(slice(None),) * (chan_axis - 1) + (slice(1, 2),)], \
        cfg.static_threshold // 3


def _search_gop(p_frames, i_frame, cfg: CodecConfig):
    p_frames, i_frame, th = _search_inputs(p_frames, i_frame, cfg, 1)
    return motion.motion_search_batch(
        p_frames, i_frame, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=th)


def _search_gops(p_b, i_b, cfg: CodecConfig):
    p_b, i_b, th = _search_inputs(p_b, i_b, cfg, 2)
    return motion.motion_search_gops(
        p_b, i_b, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=th)


def _compensate_gops(mv, refs, cfg: CodecConfig):
    """Batched compensation [B, F, nbh, nbw, 2] x [B, C, H, W] ->
    [B, F, C, H, W] (Pallas kernel on TPU; never under vmap)."""
    return motion.motion_compensate_gops(mv, refs, bs=cfg.block_size,
                                         reach=cfg.search_reach)


def _compensate_frames(mv, refs, cfg: CodecConfig):
    """Per-frame refs: mv [N, nbh, nbw, 2] x refs [N, C, H, W] ->
    [N, C, H, W]."""
    return _compensate_gops(mv[:, None], refs, cfg)[:, 0]


def _b_mode_select(b_frames, pred_f, pred_b, bs):
    """Per-block bidirectional mode decision: 0=fwd, 1=bwd, 2=bi-average
    (H.264-style integer rounding average). First-minimum-wins on ties,
    so cheaper single-reference modes are preferred.

    -> (mode [F, nbh, nbw] int8, prediction [F, C, H, W] int32)."""
    from vcs_h264_tpu.ops.motion import _tile_sums
    pred_bi = (pred_f + pred_b + 1) >> 1
    sads = jnp.stack([_tile_sums(jnp.abs(p - b_frames), bs)
                      for p in (pred_f, pred_b, pred_bi)])   # [3, F, nbh, nbw]
    mode = jnp.argmin(sads, axis=0).astype(jnp.int8)
    mpix = jnp.repeat(jnp.repeat(mode, bs, axis=-2), bs, axis=-1)
    mpix = mpix[:, None].astype(jnp.int32)                   # [F, 1, H, W]
    pred = jnp.where(mpix == 0, pred_f,
                     jnp.where(mpix == 1, pred_b, pred_bi))
    return mode, pred


def _b_predict_batch(anchors, b_mv, b_mode, cfg: CodecConfig):
    """Decoder-side B prediction, GOP-batched: anchors [B, NA, C, H, W],
    b_mv [B, NB, 2, nbh, nbw, 2], b_mode [B, NB, nbh, nbw]
    -> [B*NB, C, H, W] (flattened (gop, b-frame) axis)."""
    _, _, prev_slot, next_slot, _, _ = gop_layout(cfg.gop_pattern)
    bs = cfg.block_size
    bb, nb = b_mv.shape[:2]
    fsh = anchors.shape[2:]
    prev_r = anchors[:, np.array(prev_slot)].reshape(bb * nb, *fsh)
    next_r = anchors[:, np.array(next_slot)].reshape(bb * nb, *fsh)
    mv = b_mv.reshape(bb * nb, *b_mv.shape[2:])
    pred_f = _compensate_frames(mv[:, 0], prev_r, cfg)
    pred_b = _compensate_frames(mv[:, 1], next_r, cfg)
    pred_bi = (pred_f + pred_b + 1) >> 1
    mode = b_mode.reshape(bb * nb, *b_mode.shape[2:])
    mpix = jnp.repeat(jnp.repeat(mode, bs, axis=-2), bs, axis=-1)
    mpix = mpix[:, None].astype(jnp.int32)
    return jnp.where(mpix == 0, pred_f,
                     jnp.where(mpix == 1, pred_b, pred_bi))


def encode_gop(i_frame: jnp.ndarray, p_frames: jnp.ndarray,
               cfg: CodecConfig) -> EncodedGOP:
    """Encode one GOP. i_frame int32 planar [3, H, W]; p_frames: ALL non-I
    frames of the GOP in display order [gop_len-1, 3, H, W].

    Mirrors `Encoder._process_I_frame` (raw reference, encoder.py:41-43) +
    `_process_P_frame` (motion -> compensate -> residual -> DCT,
    encoder.py:49-70); every P references the GOP's I (encoder.py:51).
    B frames (the reference's stub, encoder.py:45-47) are bidirectionally
    predicted from the nearest decoded anchors with a per-block
    fwd/bwd/bi-average mode decision.
    """
    out = encode_gop_batch(i_frame[None], p_frames[None], cfg)
    return jax.tree.map(lambda x: x[0], out)


def decode_gop(gop: EncodedGOP, cfg: CodecConfig) -> jnp.ndarray:
    """Decode one GOP -> int32 planar frames [gop_len, 3, H, W] in display
    order.

    Mirrors `Decoder.reconstruct_video` I-passthrough (decoder.py:35-39) and
    `_reconstruct_P_frame` (decoder.py:62-69); adds B reconstruction."""
    out = decode_gop_batch(jax.tree.map(lambda x: x[None], gop), cfg)
    return out[0]


# Batched-over-GOPs variants: the TPU-efficient entry points. Leading axis is
# the GOP batch (the data-parallel shard axis in parallel/). The motion
# search runs GOP-batched through the pallas grid (never vmapped); the rest
# of the pipeline vmaps normally.
def encode_gop_batch(i_frames, p_frames, cfg: CodecConfig) -> EncodedGOP:
    """i_frames [B, 3, H, W]; p_frames [B, F, 3, H, W]: all non-I frames in
    display order (planar, any int dtype — uint8 uploads minimize
    host->device traffic).

    A B-bearing pattern is only used when the GOP is complete
    (F == gop_len-1); shorter tail GOPs are coded all-P (b fields None)."""
    i_frames = i_frames.astype(jnp.int32)
    p_frames = p_frames.astype(jnp.int32)
    use_b = cfg.has_b and p_frames.shape[1] == cfg.gop_len - 1
    if use_b:
        _, _, _, _, p_sel, b_sel = gop_layout(cfg.gop_pattern)
        p_f = p_frames[:, np.array(p_sel)]
    else:
        p_f = p_frames
    mv = _search_gops(p_f, i_frames, cfg)               # [B, NP, nbh, nbw, 2]
    if not cfg.with_residual and not use_b:
        return EncodedGOP(i_frame=i_frames, mv=mv, residuals=None)

    if _use_fused_inter(cfg, p_f.shape[1]):
        resid = _fused_encode(mv, i_frames, p_f, cfg)
        if not use_b:
            return EncodedGOP(i_frame=i_frames, mv=mv, residuals=resid)
        # closed loop: B frames reference the *decoded* anchors, so encoder
        # and decoder predictions agree even under lossy quantization
        dec_p = _fused_decode(mv, i_frames, resid, cfg)
    else:
        recon = _compensate_gops(mv, i_frames, cfg)     # [B, NP, C, H, W]
        resid = _encode_residual(p_f, recon, cfg)
        if not use_b:
            return EncodedGOP(i_frame=i_frames, mv=mv, residuals=resid)
        dec_p = _apply_residual(recon, resid, cfg)

    b_f = p_frames[:, np.array(b_sel)]                  # [B, NB, C, H, W]
    anchors = jnp.concatenate([i_frames[:, None], dec_p], axis=1)
    bb, nb = b_f.shape[:2]
    _, _, prev_slot, next_slot, _, _ = gop_layout(cfg.gop_pattern)
    prev_r = anchors[:, np.array(prev_slot)].reshape(bb * nb, *b_f.shape[2:])
    next_r = anchors[:, np.array(next_slot)].reshape(bb * nb, *b_f.shape[2:])
    # flatten (gop, b-frame) into the batched-search gop axis (pallas grid)
    bf_flat = b_f.reshape(bb * nb, 1, *b_f.shape[2:])
    mv_f = _search_gops(bf_flat, prev_r, cfg)[:, 0]
    mv_b = _search_gops(bf_flat, next_r, cfg)[:, 0]
    pred_f = _compensate_frames(mv_f, prev_r, cfg)
    pred_b = _compensate_frames(mv_b, next_r, cfg)
    mode, pred = _b_mode_select(b_f.reshape(bb * nb, *b_f.shape[2:]),
                                pred_f, pred_b, cfg.block_size)
    b_resid = _encode_residual(b_f.reshape(bb * nb, *b_f.shape[2:]),
                               pred, cfg)
    unflat = lambda x: None if x is None else x.reshape(bb, nb, *x.shape[1:])
    b_mv = jnp.stack([mv_f, mv_b], axis=1)              # [B*NB, 2, nbh, nbw, 2]
    b_mv = b_mv.reshape(bb, nb, *b_mv.shape[1:])
    return EncodedGOP(i_frame=i_frames, mv=mv, residuals=resid,
                      b_mv=b_mv, b_mode=unflat(mode), b_residuals=unflat(b_resid))


def decode_gop_batch(gop: EncodedGOP, cfg: CodecConfig) -> jnp.ndarray:
    """Decode a batch of GOPs -> [B, gop_len, 3, H, W] int32, display order.

    Fully batched (compensation runs the Pallas kernel once over all GOPs,
    never under vmap).

    Determinism contract (ADVICE r4): decode is bit-exact on the SAME
    backend class as the encode (TPU<->TPU via the fused Pallas composition,
    CPU<->CPU via the XLA composition). Across backend classes the two
    compositions may differ by +-1 at exact round-at-.5 ties in the float
    residual reconstruction (~1e-5 of pixels, tests/test_inter_pallas.py);
    anchors a closed-loop B stream references can therefore drift by the
    same +-1 when encoding on TPU and decoding on CPU."""
    i_frames = gop.i_frame.astype(jnp.int32)            # [B, C, H, W]
    if (gop.residuals is not None
            and _use_fused_inter(cfg, gop.mv.shape[1])):
        out_p = _fused_decode(gop.mv, i_frames, gop.residuals, cfg)
    else:
        recon = _compensate_gops(gop.mv, i_frames, cfg)
        out_p = _apply_residual(recon, gop.residuals, cfg)
    anchors = jnp.concatenate([i_frames[:, None], out_p], axis=1)
    if gop.b_mv is None:
        return anchors
    anchor_pos, b_pos, _, _, _, _ = gop_layout(cfg.gop_pattern)
    bb, nb = gop.b_mv.shape[:2]
    fsh = anchors.shape[2:]
    pred = _b_predict_batch(anchors, gop.b_mv, gop.b_mode, cfg)
    b_res = gop.b_residuals
    if b_res is not None:
        b_res = b_res.reshape(bb * nb, *b_res.shape[2:])
    out_b = _apply_residual(pred, b_res, cfg).reshape(bb, nb, *fsh)
    out = jnp.zeros((bb, cfg.gop_len, *fsh), jnp.int32)
    out = out.at[:, np.array(anchor_pos)].set(anchors)
    return out.at[:, np.array(b_pos)].set(out_b)


@functools.lru_cache(maxsize=None)
def jit_encode_gop(cfg: CodecConfig):
    return jax.jit(functools.partial(encode_gop, cfg=cfg))


@functools.lru_cache(maxsize=None)
def jit_decode_gop(cfg: CodecConfig):
    return jax.jit(functools.partial(decode_gop, cfg=cfg))


@functools.lru_cache(maxsize=None)
def jit_encode_gop_batch(cfg: CodecConfig):
    return jax.jit(functools.partial(encode_gop_batch, cfg=cfg))


@functools.lru_cache(maxsize=None)
def jit_decode_gop_batch(cfg: CodecConfig):
    return jax.jit(functools.partial(decode_gop_batch, cfg=cfg))


@functools.lru_cache(maxsize=None)
def jit_decode_gop_batch_u8(cfg: CodecConfig):
    """Decode + cast to uint8 on device (4x less device->host traffic)."""
    def fn(gop):
        return decode_gop_batch(gop, cfg).astype(jnp.uint8)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def jit_decode_gop_u8(cfg: CodecConfig):
    def fn(gop):
        return decode_gop(gop, cfg).astype(jnp.uint8)
    return jax.jit(fn)
