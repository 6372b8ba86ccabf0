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
