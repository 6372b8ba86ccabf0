"""Intra coding of I-frames (the integration the reference never built).

The reference stores I-frames raw (`encoder.py:41-43`) and its intra study
(`intraframe.py`) is image-only, never wired into the video codec
(SURVEY.md §1 L3). Here the two meet: I-frames are intra-predicted per
channel with the 4x4 mode search and reconstructed losslessly by the
wavefront decoder, so P-frame motion compensation still references the exact
pixels while the stored I-frame payload becomes sparse residuals + 4-bit
modes — entropy-coded, typically 2-3x smaller than raw (see
tests/test_intra_codec.py on real frames).

Prediction runs on the B, G, R planes directly (not YCrCb) so the roundtrip
avoids the color conversion's information loss and stays bit-exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vcs_h264_tpu.ops import intra


class IntraFrame(NamedTuple):
    """Losslessly intra-coded frame: per-channel residual/modes/escape."""
    residual: jax.Array    # int16 [C, H, W]
    modes: jax.Array       # int8  [C, H/4, W/4]
    escape: jax.Array      # bool  [C, H/4, W/4]


@jax.jit
def encode_intra_frame(planes: jnp.ndarray) -> IntraFrame:
    """planes: int32 [C, H, W] (uint8 values), H, W multiples of 4."""
    res, modes, escape = jax.vmap(intra.luma4x4_codec)(planes)
    return IntraFrame(residual=res.astype(jnp.int16),
                      modes=modes.astype(jnp.int8), escape=escape)


@jax.jit
def decode_intra_frame(frame: IntraFrame) -> jnp.ndarray:
    """-> int32 [C, H, W], bit-exact inverse of encode_intra_frame."""
    return intra.intra_decode4x4_batch(
        frame.residual.astype(jnp.int32), frame.modes.astype(jnp.int32),
        frame.escape)


class IntraFrameLossy(NamedTuple):
    """Lossy intra-coded frame: quantized 4x4 core-transform coefficients
    (the reference's commented-out intent, intraframe.py:352-358, realized
    closed-loop — see ops/intra.py)."""
    qcoef: jax.Array       # int16 [C, H, W] (block-layout planes)
    modes: jax.Array       # int8  [C, H/4, W/4]
    escape: jax.Array      # bool  [C, H/4, W/4]


@functools.partial(jax.jit, static_argnames=("qstep",))
def encode_intra_frame_lossy(planes: jnp.ndarray, qstep: int):
    """planes: int32 [C, H, W] -> (IntraFrameLossy, recon int32 [C, H, W]).

    recon is the decoder's exact output (integer closed loop), so callers
    can reference it for subsequent inter prediction without drift."""
    q, modes, escape, recon = intra.intra_encode4x4_lossy_batch(planes, qstep)
    return IntraFrameLossy(qcoef=q.astype(jnp.int16),
                           modes=modes.astype(jnp.int8),
                           escape=escape), recon


@functools.partial(jax.jit, static_argnames=("qstep",))
def encode_intra_frames_lossy_batch(planes: jnp.ndarray, qstep: int):
    """Batched: [B, C, H, W] -> (IntraFrameLossy with leading B, recon).

    The (B, C) axes are flattened into the wavefront core's native plane
    batch — the whole (frames x channels) batch rides ONE scan, every step
    dense over (N, lane) on the VPU (VERDICT r2 Next #1)."""
    b, c = planes.shape[:2]
    q, modes, escape, recon = intra.intra_encode4x4_lossy_batch(
        planes.reshape(b * c, *planes.shape[2:]), qstep)
    unflat = lambda x: x.reshape(b, c, *x.shape[1:])
    return IntraFrameLossy(qcoef=unflat(q.astype(jnp.int16)),
                           modes=unflat(modes.astype(jnp.int8)),
                           escape=unflat(escape)), unflat(recon)


@functools.partial(jax.jit, static_argnames=("qstep",))
def decode_intra_frames_lossy_batch(frame: IntraFrameLossy, qstep: int):
    """Batched: IntraFrameLossy with leading B -> recon [B, C, H, W].

    The (B, C) axes flatten into the wavefront core's plane batch (the
    nested-vmap forms SIGSEGV'd this environment's TPU AOT compile helper
    in round 2; the native batch core replaces vmap entirely)."""
    q = frame.qcoef.astype(jnp.int32)
    b, c = q.shape[:2]
    flat = intra.intra_decode4x4_lossy_batch(
        q.reshape(b * c, *q.shape[2:]),
        frame.modes.astype(jnp.int32).reshape(b * c, *frame.modes.shape[2:]),
        frame.escape.reshape(b * c, *frame.escape.shape[2:]), qstep)
    return flat.reshape(b, c, *flat.shape[1:])


@functools.partial(jax.jit, static_argnames=("qstep",))
def decode_intra_frame_lossy(frame: IntraFrameLossy, qstep: int):
    """-> int32 [C, H, W], bit-exact equal to the encoder's recon."""
    return intra.intra_decode4x4_lossy_batch(
        frame.qcoef.astype(jnp.int32), frame.modes.astype(jnp.int32),
        frame.escape, qstep)
