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
    (the GOP's P-frames): the per-candidate VPU work is ONE compare per
    byte — the wrap identity (a-b) mod 256 = a - b + 256*[a<b] splits the
    SAD into candidate-independent row sums plus a borrow count (_sad_body);
  * borrow-count bits, candidate ref bytes - 128, and cur bytes - 128
    (all int8-exact) share ONE single-pass INT8 MXU matmul
    [(K*F+K+F)*C*bs, W] @ [W, nbw] (394 TOPS on v5e) producing every
    8-column box sum with exact int32 accumulation (the -128 offsets cancel
    in the SAD assembly); the SAD is assembled from the box sums by cheap
    [*, nbw]-wide row reductions;
  * block rows whose every block passes the saturating static check are
    skipped outright (select_mvs overrides them), with their DMA redirected
    to block 0 so consecutive static rows also skip the fetch.

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

# VMEM is ~16 MiB/core on v5e; the SAD kernel's int8 scratch is
# (K*F + K + F)*C*bs rows of W and grows linearly with the GOP length F.
# Budget it explicitly so a long --gop pattern fails with a clear message
# instead of an opaque Mosaic allocation error (ADVICE r2).
_VMEM_SCRATCH_BUDGET = 8 * 1024 * 1024


def _check_scratch_budget(k: int, f: int, c: int, bs: int, w: int) -> None:
    scratch = (k * f + k + f) * c * bs * w
    if scratch > _VMEM_SCRATCH_BUDGET:
        raise ValueError(
            f"SAD kernel VMEM scratch {scratch / 2**20:.1f} MiB exceeds the "
            f"{_VMEM_SCRATCH_BUDGET / 2**20:.0f} MiB budget (K={k}, F={f}, "
            f"C={c}, bs={bs}, W={w}). Shorten the GOP pattern or split the "
            "P-frame batch into chunks.")


@functools.lru_cache(maxsize=None)
def _sel_np(w: int, bs: int) -> np.ndarray:
    """[W, W/bs] 0/1 block-column summing matrix (MXU operand)."""
    return np.kron(np.eye(w // bs, dtype=np.int8),
                   np.ones((bs, 1), np.int8))


def _sad_body(cur, ref_rows, sel, buf_ref, *, k, step, reach, bs, w, c, f,
              off0):
    """Shared SAD body: cur [F, C, bs, W] i32, ref_rows [C, bs, Wp] i32,
    sel [W, nbw] int8 0/1, buf_ref [(K*F + K + F)*C*bs, W] int8 scratch ->
    [K*F, nbw] i32 SADs.

    Uses the wrap identity (seg - cur) mod 256 = seg - cur + 256*[seg < cur]
    (both operands in [0, 255]): the only per-candidate VPU work is the
    compare. The borrow-count bits, the candidate's ref bytes - 128, and
    the cur bytes - 128 (all int8-exact) share ONE single-pass INT8 MXU
    matmul (394 TOPS on v5e — 2x the bf16 path this replaces) against the
    0/1 block-column matrix with exact int32 accumulation. The -128 offset
    shifts every seg and cur box sum by the same -128*bs per entry, and the
    SAD assembly r_box - c_box subtracts two equally-offset sums, so the
    offsets cancel exactly — no correction term. Only cheap 24-row
    reductions of the [*, nbw] box sums remain on the VPU."""
    rows = c * bs
    n_cmp, n_seg = k * f * rows, k * rows
    for kj in range(k):
        off = off0 + step * kj
        seg = jax.lax.slice(ref_rows, (0, 0, off), (c, bs, off + w))
        cmp = (seg[None] < cur).astype(jnp.int8)             # [F, C, bs, W]
        buf_ref[kj * f * rows:(kj + 1) * f * rows] = cmp.reshape(f * rows, w)
        buf_ref[n_cmp + kj * rows:n_cmp + (kj + 1) * rows] = (
            (seg - 128).astype(jnp.int8).reshape(rows, w))
    buf_ref[n_cmp + n_seg:] = (cur - 128).astype(jnp.int8).reshape(
        f * rows, w)
    box = jax.lax.dot_general(
        buf_ref[...], sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # [n_rows, nbw]
    nbw = box.shape[-1]
    cnt = box[:n_cmp].reshape(k, f, rows, nbw).sum(axis=2)   # [K, F, nbw]
    r_box = box[n_cmp:n_cmp + n_seg].reshape(k, rows, nbw).sum(axis=1)
    c_box = box[n_cmp + n_seg:].reshape(f, rows, nbw).sum(axis=1)
    sad = 256 * cnt + r_box[:, None] - c_box[None]           # [K, F, nbw]
    return sad.reshape(k * f, nbw).astype(jnp.int32)


def _sad_kernel(imin_ref, cur_ref, phase_ref, sel_ref, out_ref, buf_ref, *,
                k, step, reach, bs, w, c, f, pad):
    """cur_ref [F, C, bs, W] i32; phase_ref [1, C, bs, Wp] i32 (the
    candidate's ref rows, aligned by the index map); out_ref [1, 1, K*F, nbw]
    i32; buf_ref [(K*F + K + F)*C*bs, W] int8 scratch."""
    out_ref[0, 0] = _sad_body(cur_ref[...], phase_ref[0], sel_ref[...],
                              buf_ref, k=k, step=step, reach=reach, bs=bs,
                              w=w, c=c, f=f, off0=pad - reach)


def sad_candidates_pallas_batch(curs: jnp.ndarray, ref: jnp.ndarray,
                                plan: MotionSearchPlan) -> jnp.ndarray:
    """All-frame SAD sweep against one shared reference.

    curs: int32 planar [F, C, H, W] (e.g. the GOP's P-frames); ref [C, H, W].
    Returns [F, nbh, nbw, K, K] int32 — rows exact everywhere, columns exact
    for block columns >= n_edge_j."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, nbh, nbw = plan.h, plan.w, plan.nbh, plan.nbw
    f, c = curs.shape[0], curs.shape[1]
    _check_scratch_budget(k, f, c, bs, w)
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
    sel = jnp.asarray(_sel_np(w, bs), jnp.int8)

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
        scratch_shapes=[pltpu.VMEM(((k * f + k + f) * c * bs, w),
                                   jnp.int8)],
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


# ---------------------------------------------------------------------------
# Motion compensation: recon[y, x] = ref[y + dy(block), x + dx(block)].
#
# The XLA formulation (vmap(dynamic_slice) per block, ops/motion.py
# motion_compensate) lowers to a per-block gather — measured ~35 ms for 48
# 640x360 frames, the single most expensive op of the fused pipeline. This
# kernel is branchless instead: per (gop, block-row) program it holds the
# 40-row reference strip rows [ci-reach, ci+reach+bs) in VMEM (5 aligned
# row-octet DMAs), mixes columns with a one-hot [Wp, W] matrix on the MXU
# (bf16 exact: one-hot weights and uint8-range values are both 8-bit
# significands; f32 accumulate), and resolves the per-block row offset with
# a 2*reach+1-way masked select. No gather anywhere.
#
# Validity precondition (guaranteed by the search, see
# motion.motion_compensate_gops): every displacement satisfies |d| <= reach,
# so strip row reach + d + u stays inside [0, bs + 2*reach).


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _comp_kernel(dipix_ref, djpix_ref, *refs_and_out, k_oct, bs, reach, pad,
                 w, c, f):
    """dipix/djpix [1, 1, F, W] i32; k_oct octet refs [1, C, bs, Wpp] i32;
    out [1, F, C, 1, bs, W] i32. `pad` = bs-aligned row/col padding of the
    reference; strip row r holds ref row ci - pad + r."""
    oct_refs = refs_and_out[:k_oct]
    out_ref = refs_and_out[k_oct]
    strip = jnp.concatenate([r[0] for r in oct_refs], axis=1)  # [C, rows, Wpp]
    rows = k_oct * bs
    wpp = strip.shape[-1]
    sb = strip.astype(jnp.bfloat16).reshape(c * rows, wpp)
    xs = jax.lax.broadcasted_iota(jnp.int32, (wpp, w), 0)
    xd = jax.lax.broadcasted_iota(jnp.int32, (wpp, w), 1)
    for fi in range(f):
        dj = djpix_ref[0, 0, fi]                               # [W]
        m = (xs == xd + dj[None, :] + pad).astype(jnp.bfloat16)
        t = jax.lax.dot_general(
            sb, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [C*rows, W]
        t = t.reshape(c, rows, w)
        di = dipix_ref[0, 0, fi][None, None, :]                # [1, 1, W]
        acc = jnp.zeros((c, bs, w), jnp.float32)
        for d in range(-reach, reach + 1):
            seg = jax.lax.slice(t, (0, pad + d, 0),
                                (c, pad + d + bs, w))
            acc = jnp.where(di == d, seg, acc)
        out_ref[0, fi, :, 0] = acc.astype(jnp.int32)


def motion_compensate_pallas_gops(mv: jnp.ndarray, refs: jnp.ndarray,
                                  bs: int, reach: int) -> jnp.ndarray:
    """mv [G, F, nbh, nbw, 2] (dx, dy); refs [G, C, H, W] int32 ->
    recon [G, F, C, H, W] int32. Requires |mv| <= reach componentwise."""
    g, f, nbh, nbw = mv.shape[:4]
    c, h, w = refs.shape[1:]
    pad_top = _round_up(reach, bs)      # strip starts bs-aligned at ci-pad_top
    # octets covering strip rows [0, pad_top + reach + bs)
    k_oct = -(-(pad_top + reach + bs) // bs)
    pad_bot = k_oct * bs - bs - pad_top             # last octet in range
    # columns padded by pad_top on the left so the kernel uses ONE offset for
    # both axes (pad_top == reach whenever reach is a block multiple)
    wpp = _round_up(w + 2 * pad_top, 128)
    refp = jnp.pad(refs.astype(jnp.int32),
                   ((0, 0), (0, 0), (pad_top, pad_bot),
                    (pad_top, wpp - w - pad_top)))

    # per-destination-pixel displacements (block-constant along each bs run),
    # laid out [G, nbh, F, W] so the per-program block is (1, 1, F, W)
    dipix = jnp.repeat(mv[..., 1], bs, axis=-1).astype(jnp.int32)
    djpix = jnp.repeat(mv[..., 0], bs, axis=-1).astype(jnp.int32)
    dipix = dipix.transpose(0, 2, 1, 3)                        # [G,nbh,F,W]
    djpix = djpix.transpose(0, 2, 1, 3)

    kernel = functools.partial(_comp_kernel, k_oct=k_oct, bs=bs, reach=reach,
                               pad=pad_top, w=w, c=c, f=f)
    pix_spec = pl.BlockSpec((1, 1, f, w), lambda gi, bi: (gi, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    oct_specs = [
        pl.BlockSpec((1, c, bs, wpp),
                     functools.partial(lambda gi, bi, q: (gi, 0, bi + q, 0),
                                       q=q),
                     memory_space=pltpu.VMEM)
        for q in range(k_oct)]
    out = pl.pallas_call(
        kernel,
        grid=(g, nbh),
        in_specs=[pix_spec, pix_spec] + oct_specs,
        out_specs=pl.BlockSpec((1, f, c, 1, bs, w),
                               lambda gi, bi: (gi, 0, 0, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, f, c, nbh, bs, w), jnp.int32),
    )(dipix, djpix, *([refp] * k_oct))
    return out.reshape(g, f, c, h, w)


def _sad_kernel_gops(imin_ref, skip_ref, cur_ref, phase_ref, sel_ref,
                     out_ref, buf_ref, *, k, step, reach, bs, w, c, f,
                     pad):
    """Multi-GOP sweep: one program per (gop, block row, row-candidate);
    the leading grid axis selects the GOP (its own reference phases + its
    P-frames).

    skip_ref [B, nbh]: 1 marks a block row whose every block of every frame
    passes the saturating static check — its sweep output is fully
    overridden by select_mvs' static early-out (motion.py:109-116), so the
    MXU/VPU work is skipped entirely (the reference's early-out realized at
    row granularity; VERDICT r2 Next #2 — ~48% of rows on the headline
    content). Skipped rows leave garbage SADs that select_mvs never reads.
    (A finer 128px-column-chunked variant was measured SLOWER despite an
    82% skip rate: the per-chunk box-sum matmul N-dim collapses to 16
    lanes, wasting 7/8 of the MXU — see round-3 notes in BASELINE.md.)"""
    g, bi = pl.program_id(0), pl.program_id(1)

    @pl.when(skip_ref[g, bi] == 0)
    def _():
        out_ref[0, 0, 0] = _sad_body(cur_ref[0], phase_ref[0, 0],
                                     sel_ref[...], buf_ref, k=k, step=step,
                                     reach=reach, bs=bs, w=w, c=c, f=f,
                                     off0=pad - reach)


def sad_candidates_pallas_gops(curs: jnp.ndarray, refs: jnp.ndarray,
                               plan: MotionSearchPlan,
                               row_skip: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """GOP-batched SAD sweep: curs [B, F, C, H, W] vs refs [B, C, H, W]
    -> [B, F, nbh, nbw, K, K] int32. The GOP axis is a grid dimension
    (vmap-free: the dev tunnel's remote compiler stalls on vmapped
    pallas_call programs).

    row_skip [B, nbh] i32 (optional): rows marked 1 skip the sweep; their
    output is garbage that the caller's static early-out overrides (see
    _sad_kernel_gops)."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, nbh, nbw = plan.h, plan.w, plan.nbh, plan.nbw
    b, f, c = curs.shape[0], curs.shape[1], curs.shape[2]
    pad = reach + bs
    _check_scratch_budget(k, f, c, bs, w)
    if row_skip is None:
        row_skip = jnp.zeros((b, nbh), jnp.int32)

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
    sel = jnp.asarray(_sel_np(w, bs), jnp.int8)

    kernel = functools.partial(_sad_kernel_gops, k=k, step=step,
                               reach=reach, bs=bs, w=w, c=c, f=f, pad=pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nbh, k),
        in_specs=[
            # skipped rows redirect their DMA to block 0: consecutive
            # static rows then present the SAME block index and Mosaic
            # elides the refetch, so a skipped program costs neither
            # compute (pl.when) nor bandwidth
            pl.BlockSpec((1, f, c, bs, w),
                         lambda g, bi, ki, im, rs: (
                             g, 0, 0,
                             jnp.where(rs[g, bi] == 1, 0, bi), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, bs, wp),
                         lambda g, bi, ki, im, rs: (
                             g, (step * ki) % bs, 0,
                             jnp.where(rs[g, bi] == 1, 0,
                                       (im[bi] + step * ki
                                        - (step * ki) % bs) // bs), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, nbw), lambda g, bi, ki, im, rs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, k * f, nbw),
                               lambda g, bi, ki, im, rs: (g, bi, ki, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(((k * f + k + f) * c * bs, w),
                                   jnp.int8)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nbh, k, k * f, nbw), jnp.int32),
    )(i_min, row_skip.astype(jnp.int32), curs32, phases, sel)
    out = out.reshape(b, nbh, k, k, f, nbw)
    return out.transpose(0, 4, 1, 5, 2, 3)


# ---------------------------------------------------------------------------
# Motion compensation: recon[y, x] = ref[y + dy(block), x + dx(block)].
#
# The XLA formulation (vmap(dynamic_slice) per block, ops/motion.py
# motion_compensate) lowers to a per-block gather — measured ~35 ms for 48
# 640x360 frames, the single most expensive op of the fused pipeline. This
# kernel is branchless instead: per (gop, block-row) program it holds the
# 40-row reference strip rows [ci-reach, ci+reach+bs) in VMEM (5 aligned
# row-octet DMAs), mixes columns with a one-hot [Wp, W] matrix on the MXU
# (bf16 exact: one-hot weights and uint8-range values are both 8-bit
# significands; f32 accumulate), and resolves the per-block row offset with
# a 2*reach+1-way masked select. No gather anywhere.
#
# Validity precondition (guaranteed by the search, see
# motion.motion_compensate_gops): every displacement satisfies |d| <= reach,
# so strip row reach + d + u stays inside [0, bs + 2*reach).


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _comp_kernel(dipix_ref, djpix_ref, *refs_and_out, k_oct, bs, reach, pad,
                 w, c, f):
    """dipix/djpix [1, 1, F, W] i32; k_oct octet refs [1, C, bs, Wpp] i32;
    out [1, F, C, 1, bs, W] i32. `pad` = bs-aligned row/col padding of the
    reference; strip row r holds ref row ci - pad + r."""
    oct_refs = refs_and_out[:k_oct]
    out_ref = refs_and_out[k_oct]
    strip = jnp.concatenate([r[0] for r in oct_refs], axis=1)  # [C, rows, Wpp]
    rows = k_oct * bs
    wpp = strip.shape[-1]
    sb = strip.astype(jnp.bfloat16).reshape(c * rows, wpp)
    xs = jax.lax.broadcasted_iota(jnp.int32, (wpp, w), 0)
    xd = jax.lax.broadcasted_iota(jnp.int32, (wpp, w), 1)
    for fi in range(f):
        dj = djpix_ref[0, 0, fi]                               # [W]
        m = (xs == xd + dj[None, :] + pad).astype(jnp.bfloat16)
        t = jax.lax.dot_general(
            sb, m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [C*rows, W]
        t = t.reshape(c, rows, w)
        di = dipix_ref[0, 0, fi][None, None, :]                # [1, 1, W]
        acc = jnp.zeros((c, bs, w), jnp.float32)
        for d in range(-reach, reach + 1):
            seg = jax.lax.slice(t, (0, pad + d, 0),
                                (c, pad + d + bs, w))
            acc = jnp.where(di == d, seg, acc)
        out_ref[0, fi, :, 0] = acc.astype(jnp.int32)


def motion_compensate_pallas_gops(mv: jnp.ndarray, refs: jnp.ndarray,
                                  bs: int, reach: int) -> jnp.ndarray:
    """mv [G, F, nbh, nbw, 2] (dx, dy); refs [G, C, H, W] int32 ->
    recon [G, F, C, H, W] int32. Requires |mv| <= reach componentwise."""
    g, f, nbh, nbw = mv.shape[:4]
    c, h, w = refs.shape[1:]
    pad_top = _round_up(reach, bs)      # strip starts bs-aligned at ci-pad_top
    # octets covering strip rows [0, pad_top + reach + bs)
    k_oct = -(-(pad_top + reach + bs) // bs)
    pad_bot = k_oct * bs - bs - pad_top             # last octet in range
    # columns padded by pad_top on the left so the kernel uses ONE offset for
    # both axes (pad_top == reach whenever reach is a block multiple)
    wpp = _round_up(w + 2 * pad_top, 128)
    refp = jnp.pad(refs.astype(jnp.int32),
                   ((0, 0), (0, 0), (pad_top, pad_bot),
                    (pad_top, wpp - w - pad_top)))

    # per-destination-pixel displacements (block-constant along each bs run),
    # laid out [G, nbh, F, W] so the per-program block is (1, 1, F, W)
    dipix = jnp.repeat(mv[..., 1], bs, axis=-1).astype(jnp.int32)
    djpix = jnp.repeat(mv[..., 0], bs, axis=-1).astype(jnp.int32)
    dipix = dipix.transpose(0, 2, 1, 3)                        # [G,nbh,F,W]
    djpix = djpix.transpose(0, 2, 1, 3)

    kernel = functools.partial(_comp_kernel, k_oct=k_oct, bs=bs, reach=reach,
                               pad=pad_top, w=w, c=c, f=f)
    pix_spec = pl.BlockSpec((1, 1, f, w), lambda gi, bi: (gi, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    oct_specs = [
        pl.BlockSpec((1, c, bs, wpp),
                     functools.partial(lambda gi, bi, q: (gi, 0, bi + q, 0),
                                       q=q),
                     memory_space=pltpu.VMEM)
        for q in range(k_oct)]
    out = pl.pallas_call(
        kernel,
        grid=(g, nbh),
        in_specs=[pix_spec, pix_spec] + oct_specs,
        out_specs=pl.BlockSpec((1, f, c, 1, bs, w),
                               lambda gi, bi: (gi, 0, 0, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, f, c, nbh, bs, w), jnp.int32),
    )(dipix, djpix, *([refp] * k_oct))
    return out.reshape(g, f, c, h, w)
