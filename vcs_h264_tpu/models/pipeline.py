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


def _search_gop(p_frames, i_frame, cfg: CodecConfig):
    return motion.motion_search_batch(
        p_frames, i_frame, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold)


def _search_gops(p_b, i_b, cfg: CodecConfig):
    return motion.motion_search_gops(
        p_b, i_b, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold)


def encode_gop(i_frame: jnp.ndarray, p_frames: jnp.ndarray,
               cfg: CodecConfig) -> EncodedGOP:
    """Encode one GOP. i_frame int32 planar [3, H, W]; p_frames [P, 3, H, W].

    Mirrors `Encoder._process_I_frame` (raw reference, encoder.py:41-43) +
    `_process_P_frame` (motion -> compensate -> residual -> DCT,
    encoder.py:49-70); every P references the GOP's I (encoder.py:51).
    """
    i_frame = i_frame.astype(jnp.int32)
    p_frames = p_frames.astype(jnp.int32)
    mv = _search_gop(p_frames, i_frame, cfg)
    if not cfg.with_residual:
        return EncodedGOP(i_frame=i_frame, mv=mv, residuals=None)
    recon = jax.vmap(lambda m: motion.motion_compensate(
        m, i_frame, cfg.block_size))(mv)
    if cfg.with_dct and cfg.quant_mode == "rounded":
        resid = dct_compress_residual_signed(p_frames - recon, cfg)
    else:
        resid = motion.residuals_wrap(p_frames, recon)
        if cfg.with_dct:
            resid = dct_compress_residual(resid, cfg)
    return EncodedGOP(i_frame=i_frame, mv=mv, residuals=resid)


def decode_gop(gop: EncodedGOP, cfg: CodecConfig) -> jnp.ndarray:
    """Decode one GOP -> int32 planar frames [1 + P, 3, H, W].

    Mirrors `Decoder.reconstruct_video` I-passthrough (decoder.py:35-39) and
    `_reconstruct_P_frame` (decoder.py:62-69)."""
    gop = EncodedGOP(i_frame=gop.i_frame.astype(jnp.int32),
                     mv=gop.mv, residuals=gop.residuals)
    recon = jax.vmap(lambda m: motion.motion_compensate(
        m, gop.i_frame, cfg.block_size))(gop.mv)
    if cfg.with_residual and gop.residuals is not None:
        resid = gop.residuals
        if cfg.with_dct and cfg.quant_mode == "rounded":
            out_p = jnp.clip(
                recon + dct_decompress_residual_signed(resid, cfg), 0, 255)
        else:
            if cfg.with_dct:
                resid = dct_decompress_residual(resid, cfg)
            out_p = motion.reconstruct_wrap(recon, resid)
    else:
        out_p = recon
    return jnp.concatenate([gop.i_frame[None], out_p], axis=0)


# Batched-over-GOPs variants: the TPU-efficient entry points. Leading axis is
# the GOP batch (the data-parallel shard axis in parallel/). The motion
# search runs GOP-batched through the pallas grid (never vmapped); the rest
# of the pipeline vmaps normally.
def encode_gop_batch(i_frames, p_frames, cfg: CodecConfig) -> EncodedGOP:
    """i_frames [B, 3, H, W]; p_frames [B, P, 3, H, W] (planar, any int
    dtype — uint8 uploads minimize host->device traffic)."""
    i_frames = i_frames.astype(jnp.int32)
    p_frames = p_frames.astype(jnp.int32)
    mv = _search_gops(p_frames, i_frames, cfg)          # [B, P, nbh, nbw, 2]
    if not cfg.with_residual:
        return EncodedGOP(i_frame=i_frames, mv=mv, residuals=None)

    def finish(i_frame, p_f, m):
        recon = jax.vmap(lambda mm: motion.motion_compensate(
            mm, i_frame, cfg.block_size))(m)
        if cfg.with_dct and cfg.quant_mode == "rounded":
            return dct_compress_residual_signed(p_f - recon, cfg)
        resid = motion.residuals_wrap(p_f, recon)
        if cfg.with_dct:
            resid = dct_compress_residual(resid, cfg)
        return resid

    resid = jax.vmap(finish)(i_frames, p_frames, mv)
    return EncodedGOP(i_frame=i_frames, mv=mv, residuals=resid)


def decode_gop_batch(gop: EncodedGOP, cfg: CodecConfig) -> jnp.ndarray:
    return jax.vmap(lambda g: decode_gop(g, cfg))(gop)


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
