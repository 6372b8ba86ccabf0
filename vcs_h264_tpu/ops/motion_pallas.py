"""Pallas TPU kernel for the motion-search SAD sweep.

The XLA formulations of the candidate sweep (ops/motion.py) re-read the frame
from HBM for each of the ~121 candidate displacements (~9-30 ms/frame at
640x360). This kernel reads each byte O(1) times:

  grid = (nbh, K)        one program per (block row, row-candidate)
  * the reference row octet for candidate row p = i_min[bi] + step*ki is
    DMA'd directly by the BlockSpec index_map: rows come from one of `bs`
    row-phase copies of the padded reference (phase = (step*ki) % bs, row
    block computed from the scalar-prefetched i_min), so every load is
    tile-aligned and the kernel body does NO dynamic slicing;
  * all F frames that share this reference are processed in one program
    (the GOP's P-frames): the per-candidate work is a [F, C, bs, W] wrap
    difference reduced over channels+rows, written as one aligned [F, W]
    slab per kj;
  * one MXU matmul [K*F, W] @ [W, nbw] finishes the 8-column box sums —
    at HIGHEST precision: the default single-pass bf16 mantissa cannot
    represent row sums (<= 6120), which silently corrupts SADs.

Column clamping (the first ceil(reach/bs) block columns have an absolute
candidate grid) is NOT handled here — `motion_search_batch` stitches those
columns from the exact XLA edge families (ops/motion.py). Row clamping IS
exact (i_min is data). Padded reference values only reach masked candidates.

Bit-exactness vs the scalar reference semantics is asserted in
tests/test_motion_pallas.py (interpret mode on CPU) and on hardware by
tools/check_pallas_tpu.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcs_h264_tpu.ops.motion import MotionSearchPlan


@functools.lru_cache(maxsize=None)
def _sel_np(w: int, bs: int) -> np.ndarray:
    """[W, W/bs] 0/1 block-column summing matrix (MXU operand)."""
    return np.kron(np.eye(w // bs, dtype=np.float32),
                   np.ones((bs, 1), np.float32))


def _sad_kernel(imin_ref, cur_ref, phase_ref, sel_ref, out_ref, acc_ref, *,
                k, step, reach, bs, w, c, f, pad):
    """cur_ref [F, C, bs, W] i32; phase_ref [1, C, bs, Wp] i32 (the
    candidate's ref rows, aligned by the index map); out_ref [1, 1, K*F, nbw]
    i32; acc_ref [K, F, W] f32 scratch."""
    cur = cur_ref[...]
    ref_rows = phase_ref[0]
    for kj in range(k):
        off = pad + step * kj - reach
        seg = jax.lax.slice(ref_rows, (0, 0, off), (c, bs, off + w))
        diff = (seg[None] - cur) & 255               # [F, C, bs, W] wrap
        acc_ref[kj] = diff.sum(axis=(1, 2)).astype(jnp.float32)
    acc = acc_ref[...].reshape(k * f, w)
    out_ref[0, 0] = jax.lax.dot_general(
        acc, sel_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)


def sad_candidates_pallas_batch(curs: jnp.ndarray, ref: jnp.ndarray,
                                plan: MotionSearchPlan) -> jnp.ndarray:
    """All-frame SAD sweep against one shared reference.

    curs: int32 planar [F, C, H, W] (e.g. the GOP's P-frames); ref [C, H, W].
    Returns [F, nbh, nbw, K, K] int32 — rows exact everywhere, columns exact
    for block columns >= n_edge_j."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, nbh, nbw = plan.h, plan.w, plan.nbh, plan.nbw
    f, c = curs.shape[0], curs.shape[1]
    pad = reach + bs

    curs32 = curs.astype(jnp.int32)
    # rows: pad bottom so every phase window exists; cols both sides.
    max_row = (h - bs - reach) + step * (k - 1)
    row_pad = max(0, max_row + bs - h) + 2 * bs
    refp = jnp.pad(ref.astype(jnp.int32), ((0, 0), (0, row_pad), (pad, pad)))
    hrows = ((refp.shape[1] - bs) // bs) * bs
    wp = w + 2 * pad
    # bs row-phase copies: phases[q] = refp rows shifted up by q
    phases = jnp.stack([jax.lax.slice(refp, (0, q, 0), (c, q + hrows, wp))
                        for q in range(bs)])               # [bs, C, Hrows, Wp]

    i_min = jnp.asarray(plan.pos_i[:, 0], jnp.int32)       # [nbh]
    sel = jnp.asarray(_sel_np(w, bs))

    kernel = functools.partial(_sad_kernel, k=k, step=step, reach=reach,
                               bs=bs, w=w, c=c, f=f, pad=pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbh, k),
        in_specs=[
            pl.BlockSpec((f, c, bs, w), lambda bi, ki, im: (0, 0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, bs, wp),
                         lambda bi, ki, im: ((step * ki) % bs, 0,
                                             (im[bi] + step * ki
                                              - (step * ki) % bs) // bs, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, nbw), lambda bi, ki, im: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k * f, nbw),
                               lambda bi, ki, im: (bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, f, w), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbh, k, k * f, nbw), jnp.int32),
    )(i_min, curs32, phases, sel)
    # [nbh, K(ki), K(kj)*F, nbw] -> [F, nbh, nbw, K(ki), K(kj)]
    out = out.reshape(nbh, k, k, f, nbw)
    return out.transpose(3, 0, 4, 1, 2)


def sad_candidates_pallas(cur: jnp.ndarray, ref: jnp.ndarray,
                          plan: MotionSearchPlan) -> jnp.ndarray:
    """Single-frame convenience wrapper: [nbh, nbw, K, K]."""
    return sad_candidates_pallas_batch(cur[None], ref, plan)[0]


def _sad_kernel_gops(imin_ref, cur_ref, phase_ref, sel_ref, out_ref, acc_ref,
                     *, k, step, reach, bs, w, c, f, pad):
    """Multi-GOP variant: same as _sad_kernel, but the leading grid axis
    selects the GOP (its own reference phases + its P-frames)."""
    cur = cur_ref[0]                                 # [F, C, bs, W]
    ref_rows = phase_ref[0, 0]                       # [C, bs, Wp]
    for kj in range(k):
        off = pad + step * kj - reach
        seg = jax.lax.slice(ref_rows, (0, 0, off), (c, bs, off + w))
        diff = (seg[None] - cur) & 255               # [F, C, bs, W] wrap
        acc_ref[kj] = diff.sum(axis=(1, 2)).astype(jnp.float32)
    acc = acc_ref[...].reshape(k * f, w)
    out_ref[0, 0, 0] = jax.lax.dot_general(
        acc, sel_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)


def sad_candidates_pallas_gops(curs: jnp.ndarray, refs: jnp.ndarray,
                               plan: MotionSearchPlan) -> jnp.ndarray:
    """GOP-batched SAD sweep: curs [B, F, C, H, W] vs refs [B, C, H, W]
    -> [B, F, nbh, nbw, K, K] int32. The GOP axis is a grid dimension
    (vmap-free: the dev tunnel's remote compiler stalls on vmapped
    pallas_call programs)."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, nbh, nbw = plan.h, plan.w, plan.nbh, plan.nbw
    b, f, c = curs.shape[0], curs.shape[1], curs.shape[2]
    pad = reach + bs

    curs32 = curs.astype(jnp.int32)
    max_row = (h - bs - reach) + step * (k - 1)
    row_pad = max(0, max_row + bs - h) + 2 * bs
    refp = jnp.pad(refs.astype(jnp.int32),
                   ((0, 0), (0, 0), (0, row_pad), (pad, pad)))
    hrows = ((refp.shape[2] - bs) // bs) * bs
    wp = w + 2 * pad
    phases = jnp.stack([jax.lax.slice(refp, (0, 0, q, 0),
                                      (b, c, q + hrows, wp))
                        for q in range(bs)], axis=1)   # [B, bs, C, Hrows, Wp]

    i_min = jnp.asarray(plan.pos_i[:, 0], jnp.int32)
    sel = jnp.asarray(_sel_np(w, bs))

    kernel = functools.partial(_sad_kernel_gops, k=k, step=step, reach=reach,
                               bs=bs, w=w, c=c, f=f, pad=pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nbh, k),
        in_specs=[
            pl.BlockSpec((1, f, c, bs, w),
                         lambda g, bi, ki, im: (g, 0, 0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, bs, wp),
                         lambda g, bi, ki, im: (g, (step * ki) % bs, 0,
                                                (im[bi] + step * ki
                                                 - (step * ki) % bs) // bs, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, nbw), lambda g, bi, ki, im: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, k * f, nbw),
                               lambda g, bi, ki, im: (g, bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, f, w), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nbh, k, k * f, nbw), jnp.int32),
    )(i_min, curs32, phases, sel)
    # [B, nbh, K(ki), K(kj)*F, nbw] -> [B, F, nbh, nbw, K(ki), K(kj)]
    out = out.reshape(b, nbh, k, k, f, nbw)
    return out.transpose(0, 4, 1, 5, 2, 3)
