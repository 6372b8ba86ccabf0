"""Pallas TPU kernels for the motion-search SAD sweep + compensation.

The XLA formulations of the candidate sweep (ops/motion.py) re-read the frame
from HBM for each of the ~121 candidate displacements (~9-30 ms/frame at
640x360). This kernel reads each byte O(1) times:

  grid = (B, nbh)        one program per (gop, block row)
  * every operand is INT8, pre-recentered by -128 at the XLA level: the
    compare that drives the wrap identity is order-preserved by the shift,
    the -128 offsets cancel between the r_box and c_box terms of the SAD
    assembly, and int8 quarters the DMA volume, the VMEM footprint and the
    per-element VPU cost vs the previous int32 datapath;
  * the reference row octets for all K row-candidates are DMA'd directly by
    K BlockSpec index maps (rows come from one of `bs` row-phase copies of
    the padded reference, phase = (step*ki) % bs, row block computed from
    the scalar-prefetched i_min), so every load is tile-aligned, the kernel
    body does NO dynamic slicing, and all K fetches overlap the program;
  * all F frames that share this reference are processed in one program
    (the GOP's P-frames): the per-candidate VPU work is ONE int8 compare per
    byte — the wrap identity (a-b) mod 256 = a - b + 256*[a<b] splits the
    SAD into candidate-independent row sums plus a borrow count;
  * borrow-count bits and candidate ref bytes (recentered int8) share ONE
    single-pass INT8 MXU matmul per row-candidate [(K+1)*F*C*bs, W] @
    [W, nbw] (394 TOPS on v5e) producing every 8-column box sum with exact
    int32 accumulation; the candidate-independent cur box sums come from
    one small matmul per program; the SAD is assembled from the box sums
    by cheap [*, nbw]-wide row reductions over a double-buffered operand
    scratch (the next candidate's fills overlap this one's matmul);
  * block rows whose every block passes the saturating static check are
    skipped outright (select_mvs overrides them), with their DMAs redirected
    to block 0 so consecutive static rows also skip the fetches.

Column clamping (the first ceil(reach/bs) block columns have an absolute
candidate grid) is NOT handled here — `motion_search_batch` stitches those
columns from the exact XLA edge families (ops/motion.py). Row clamping IS
exact (i_min is data). Padded reference values (-128, the recentering of the
previous revision's zero padding) only reach masked candidates.

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
    scratch = 2 * (k * f + k) * c * bs * w
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


def _sad_kernel_gops(imin_ref, skip_ref, cur_ref, *refs, k, step, reach, bs,
                     w, c, f, pad, nbuf):
    """One program per (gop, block row), all K row-candidates inside.

    cur_ref [1, 1, F*C*bs, W] int8 (recentered); refs = K phase refs
    [1, 1, 1, C*bs, Wp] int8 (the candidate row octets, aligned by the index
    maps), then sel [W, nbw] int8, out [1, 1, K, K*F, nbw] i32, and the
    [nbuf, (K*F + K)*C*bs, W] int8 matmul-operand scratch (nbuf = 2 when W
    is lane-aligned, else a single flat buffer).

    skip_ref [B, nbh]: 1 marks a block row whose every block of every frame
    passes the saturating static check — its sweep output is fully
    overridden by select_mvs' static early-out (motion.py:109-116), so the
    MXU/VPU work is skipped entirely (the reference's early-out realized at
    row granularity; VERDICT r2 Next #2). Skipped rows leave garbage SADs
    that select_mvs never reads. (A finer 128px-column-chunked variant was
    measured SLOWER despite an 82% skip rate: the per-chunk box-sum matmul
    N-dim collapses to 16 lanes, wasting 7/8 of the MXU — round-3 notes in
    BASELINE.md.)"""
    phase_refs = refs[:k]
    sel_ref, out_ref, buf_ref = refs[k], refs[k + 1], refs[k + 2]
    g, bi = pl.program_id(0), pl.program_id(1)
    rows = c * bs
    n_cmp, n_seg = k * f * rows, k * rows
    off0 = pad - reach

    @pl.when(skip_ref[g, bi] == 0)
    def _():
        cur = cur_ref[0, 0]                          # [F*C*bs, W] int8
        # the cur box sums are candidate-independent: ONE small matmul per
        # program instead of riding every per-candidate matmul
        c_box = jax.lax.dot_general(
            cur, sel_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        nbw = c_box.shape[-1]
        c_box = c_box.reshape(f, rows, nbw).sum(axis=1)      # [F, nbw]
        # the VPU has no packed int8 compare (Mosaic: "Target does not
        # support this comparison" on vector<8x128x4xi8>), so widen each
        # operand ONCE — curb per program, ref rows per row-candidate —
        # while the matmul operand stays int8
        curb = cur.reshape(f, rows, w).astype(jnp.int32)
        for ki in range(k):
            ref_rows = phase_refs[ki][0, 0, 0]       # [C*bs, Wp] int8
            ref32 = ref_rows.astype(jnp.int32)
            # double-buffered operand scratch: the ki+1 fills (VPU) overlap
            # the ki box-sum matmul (MXU) instead of serializing on one
            # buffer's write-after-read hazard. Mosaic rejects memref slices
            # whose minor dim is not lane-aligned, so sub-128-wide frames
            # (tests) fall back to a single flat buffer (nbuf == 1).
            buf = buf_ref.at[ki % nbuf] if nbuf > 1 else buf_ref
            for kj in range(k):
                off = off0 + step * kj
                seg = jax.lax.slice(ref_rows, (0, off), (rows, off + w))
                seg32 = jax.lax.slice(ref32, (0, off), (rows, off + w))
                cmp = (seg32[None] < curb).astype(jnp.int8)  # [F, rows, W]
                buf[kj * f * rows:(kj + 1) * f * rows] = (
                    cmp.reshape(f * rows, w))
                buf[n_cmp + kj * rows:n_cmp + (kj + 1) * rows] = seg
            box = jax.lax.dot_general(
                buf[...], sel_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # [n_rows, nbw]
            cnt = box[:n_cmp].reshape(k, f, rows, nbw).sum(axis=2)
            r_box = box[n_cmp:n_cmp + n_seg].reshape(k, rows, nbw).sum(axis=1)
            sad = 256 * cnt + r_box[:, None] - c_box[None]   # [K, F, nbw]
            out_ref[0, 0, ki] = sad.reshape(k * f, nbw).astype(jnp.int32)


def sad_candidates_pallas_gops(curs: jnp.ndarray, refs: jnp.ndarray,
                               plan: MotionSearchPlan,
                               row_skip: jnp.ndarray | None = None,
                               layout: str = "std") -> jnp.ndarray:
    """GOP-batched SAD sweep: curs [B, F, C, H, W] vs refs [B, C, H, W]
    -> [B, F, nbh, nbw, K, K] int32 — rows exact everywhere, columns exact
    for block columns >= n_edge_j. The GOP axis is a grid dimension
    (vmap-free: the dev tunnel's remote compiler stalls on vmapped
    pallas_call programs).

    row_skip [B, nbh] i32 (optional): rows marked 1 skip the sweep; their
    output is garbage that the caller's static early-out overrides (see
    _sad_kernel_gops).

    layout="kernel" returns the kernel-native [B, nbh, K(ki), K(kj), F,
    nbw] without the [B, F, nbh, nbw, K, K] transpose — the candidate axes
    land on sublanes and nbw stays on lanes, which is what the packed
    key-min selection wants (the std-layout transpose materializes the
    full candidate tensor twice and puts K*K on the minor axes)."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, nbh, nbw = plan.h, plan.w, plan.nbh, plan.nbw
    b, f, c = curs.shape[0], curs.shape[1], curs.shape[2]
    pad = reach + bs
    _check_scratch_budget(k, f, c, bs, w)
    if row_skip is None:
        row_skip = jnp.zeros((b, nbh), jnp.int32)

    # int8 recentered operands, laid out so every BlockSpec's last two dims
    # equal the array's (Mosaic's int8 (32, 128) tile constraint is waived
    # when block == array on the trailing dims).
    curs8 = (curs - 128).astype(jnp.int8)
    curs8 = curs8.reshape(b, f, c, nbh, bs, w).transpose(
        0, 3, 1, 2, 4, 5).reshape(b, nbh, f * c * bs, w)

    max_row = (h - bs - reach) + step * (k - 1)
    row_pad = max(0, max_row + bs - h) + 2 * bs
    refp = jnp.pad((refs - 128).astype(jnp.int8),
                   ((0, 0), (0, 0), (0, row_pad), (pad, pad)),
                   constant_values=np.int8(-128))
    hrows = ((refp.shape[2] - bs) // bs) * bs
    nr = hrows // bs
    wp = w + 2 * pad
    # bs row-phase copies: phases[:, q] = refp rows shifted up by q, grouped
    # into bs-row octets on the sublane axis: [B, bs, nr, C*bs, Wp]
    phases = jnp.stack([
        jax.lax.slice(refp, (0, 0, q, 0), (b, c, q + hrows, wp))
        .reshape(b, c, nr, bs, wp).transpose(0, 2, 1, 3, 4)
        .reshape(b, nr, c * bs, wp)
        for q in range(bs)], axis=1)

    i_min = jnp.asarray(plan.pos_i[:, 0], jnp.int32)
    sel = jnp.asarray(_sel_np(w, bs), jnp.int8)

    nbuf = 2 if w % 128 == 0 else 1
    kernel = functools.partial(_sad_kernel_gops, k=k, step=step,
                               reach=reach, bs=bs, w=w, c=c, f=f, pad=pad,
                               nbuf=nbuf)

    def phase_spec(ki):
        # skipped rows redirect their DMAs to block 0: consecutive static
        # rows then present the SAME block indices and Mosaic elides the
        # refetches, so a skipped program costs neither compute (pl.when)
        # nor bandwidth
        def imap(g, bi, im, rs, _ki=ki):
            blk = (im[bi] + step * _ki - (step * _ki) % bs) // bs
            return (g, (step * _ki) % bs,
                    jnp.where(rs[g, bi] == 1, 0, blk), 0, 0)
        return pl.BlockSpec((1, 1, 1, c * bs, wp), imap,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nbh),
        in_specs=[
            pl.BlockSpec((1, 1, f * c * bs, w),
                         lambda g, bi, im, rs: (
                             g, jnp.where(rs[g, bi] == 1, 0, bi), 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [phase_spec(ki) for ki in range(k)] + [
            pl.BlockSpec((w, nbw), lambda g, bi, im, rs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, k * f, nbw),
                               lambda g, bi, im, rs: (g, bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(
            (nbuf, (k * f + k) * c * bs, w) if nbuf > 1
            else ((k * f + k) * c * bs, w), jnp.int8)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nbh, k, k * f, nbw), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(i_min, row_skip.astype(jnp.int32), curs8,
      *([phases] * k), sel)
    out = out.reshape(b, nbh, k, k, f, nbw)
    if layout == "kernel":
        return out
    return out.transpose(0, 4, 1, 5, 2, 3)


def sad_candidates_pallas_batch(curs: jnp.ndarray, ref: jnp.ndarray,
                                plan: MotionSearchPlan) -> jnp.ndarray:
    """All-frame SAD sweep against one shared reference: curs [F, C, H, W]
    vs ref [C, H, W] -> [F, nbh, nbw, K, K] int32."""
    return sad_candidates_pallas_gops(curs[None], ref[None], plan)[0]


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


def _comp_kernel(dipix_ref, djpix_ref, dmat_ref, *refs_and_out, k_oct, bs,
                 reach, pad, w, c, f):
    """dipix/djpix [1, 1, F, W] i32; dmat [Wpp, W] i32 difference matrix
    s - x (one compare instead of two iotas + a full-panel add per frame);
    k_oct octet refs [1, C, bs, Wpp] i32; out [1, F, C, 1, bs, W] i32.
    `pad` = bs-aligned row/col padding of the reference; strip row r holds
    ref row ci - pad + r."""
    oct_refs = refs_and_out[:k_oct]
    out_ref = refs_and_out[k_oct]
    strip = jnp.concatenate([r[0] for r in oct_refs], axis=1)  # [C, rows, Wpp]
    rows = k_oct * bs
    wpp = strip.shape[-1]
    sb = strip.astype(jnp.bfloat16).reshape(c * rows, wpp)
    for fi in range(f):
        dj = djpix_ref[0, 0, fi]                               # [W]
        m = (dmat_ref[...] == dj[None, :] + pad).astype(jnp.bfloat16)
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
    dmat = jnp.asarray(
        np.arange(wpp, dtype=np.int32)[:, None]
        - np.arange(w, dtype=np.int32)[None, :])
    oct_specs = [
        pl.BlockSpec((1, c, bs, wpp),
                     functools.partial(lambda gi, bi, q: (gi, 0, bi + q, 0),
                                       q=q),
                     memory_space=pltpu.VMEM)
        for q in range(k_oct)]
    out = pl.pallas_call(
        kernel,
        grid=(g, nbh),
        in_specs=[pix_spec, pix_spec,
                  pl.BlockSpec((wpp, w), lambda gi, bi: (0, 0),
                               memory_space=pltpu.VMEM)] + oct_specs,
        out_specs=pl.BlockSpec((1, f, c, 1, bs, w),
                               lambda gi, bi: (gi, 0, 0, bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, f, c, nbh, bs, w), jnp.int32),
    )(dipix, djpix, dmat, *([refp] * k_oct))
    return out.reshape(g, f, c, h, w)
