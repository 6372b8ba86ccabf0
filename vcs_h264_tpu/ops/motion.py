"""Block motion estimation / compensation, TPU-vectorized, reference-exact.

The reference (`InterframeCompression/motion.py`) does a per-block Python loop:
for each block, a saturating-SAD static check against the co-located reference
block (threshold 2000, `motion.py:109-116`), else a coarse full search on a
step-3 grid inside a +/-16 px window clamped to the frame (`motion.py:118-146`),
minimizing the *wrapping* uint8 SAD `sum(|ref_block - block|)` with
first-minimum-wins tie-breaking (`motion.py:149-152`) and a `[0, 0]` fallback
coordinate when no candidate is valid (`motion.py:102,122`).

This module reproduces those semantics bit-exactly as batched tensor ops with
no data-dependent gathers in the search. Key observation: the candidate
position is

    p(b, k) = max(c_b - reach, 0) + step * k,      k = 0..K-1

so for blocks at least `reach` from the top/left edge the candidate grid is a
*uniform displacement* of the block coordinate: the SAD of one displacement
over all blocks is a shifted whole-frame absolute difference followed by an
8x8 box reduction — pure VPU work that XLA fuses. Blocks in the first
ceil(reach/bs) block rows/cols have an *absolute* grid (p = step*k), uniform
across those strips, handled by three small edge families whose patch indices
are host-side constants. Candidate validity (`i+bs >= i_max`, motion.py:136)
depends only on block coordinates and is a precomputed constant mask.

Selection = first-occurrence argmin over [sentinel] + masked candidates, which
reproduces the reference's strict-< update and its 9999999999 initial best
(`motion.py:122`).

Layout: frames are **planar** [C, H, W] — W is the minor (lane) dimension.
Interleaved [H, W, 3] would put the size-3 channel axis on TPU lanes and
waste 125/128 of every vector register and HBM tile; planar keeps every
shifted-difference pass dense (SURVEY.md §7 design principles).

All public entry points are jit-compiled (geometry args are static).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# Value for the virtual "initial best" candidate at coordinate (0, 0)
# (ref: motion.py:102,122). Real SADs (<= 3*255*bs^2) always beat it; masked
# candidates never do.
_INIT_SENTINEL = np.int32(1 << 30)
_MASKED = np.int32((1 << 30) + 1)


class MotionSearchPlan(NamedTuple):
    """Static (host-precomputed) search geometry for a given frame shape."""
    bs: int
    reach: int
    step: int
    n_edge_i: int        # block rows whose window clamps at 0
    n_edge_j: int
    k: int               # candidates per axis
    nbh: int
    nbw: int
    h: int
    w: int
    # [nbh, K] / [nbw, K] candidate validity (p + bs < i_max)
    valid_i: np.ndarray
    valid_j: np.ndarray
    # [nbh, K] / [nbw, K] absolute candidate positions p = i_min + step*k
    pos_i: np.ndarray
    pos_j: np.ndarray


@functools.lru_cache(maxsize=None)
def make_plan(h: int, w: int, bs: int, reach: int, step: int) -> MotionSearchPlan:
    if h % bs or w % bs:
        raise ValueError(f"frame {h}x{w} must be a multiple of block {bs}")
    nbh, nbw = h // bs, w // bs
    k = -(-2 * reach // step)          # ceil(2*reach / step)
    n_edge = -(-reach // bs)           # ceil(reach / bs)

    def axis_plan(nb, extent):
        c = np.arange(nb) * bs
        lo = np.maximum(c - reach, 0)
        hi = np.minimum(c + reach, extent)
        pos = lo[:, None] + step * np.arange(k)[None, :]
        valid = pos + bs < hi[:, None]          # ref skip: i+bs >= i_max
        return pos.astype(np.int32), valid

    pos_i, valid_i = axis_plan(nbh, h)
    pos_j, valid_j = axis_plan(nbw, w)
    return MotionSearchPlan(bs, reach, step, min(n_edge, nbh), min(n_edge, nbw),
                            k, nbh, nbw, h, w, valid_i, valid_j, pos_i, pos_j)


def _tile_sums(diff: jnp.ndarray, bs: int) -> jnp.ndarray:
    """[..., C, R, W] -> per-(bs x bs)-tile sums [..., R//bs, W//bs] int32."""
    *lead, c, r, w = diff.shape
    x = diff.reshape(*lead, c, r // bs, bs, w // bs, bs)
    return x.sum(axis=(-5, -3, -1), dtype=jnp.int32)


def _wrap_abs_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """uint8-wrapping |a - b|: np.abs on uint8 is the identity, so the
    reference SAD term is simply (a - b) mod 256 (motion.py:146)."""
    return (a - b) & 255


def _family_abs_cols(cur, refp, plan):
    """Absolute-column candidates for the left edge strips:
    [nbh, ne_j, K(ki), K(kj)] (rows relative; valid meaning rows >= ne_i)."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, ne_j = plan.h, plan.w, plan.n_edge_j
    c = cur.shape[0]
    pad = reach + bs
    cj_pos = np.minimum(plan.pos_j[:ne_j], w - bs)
    hp = refp.shape[1]
    # The (ne_j, K) candidate columns are host-side constants, stacked side
    # by side along the LANE axis: every op below runs on ne_j*K*bs lanes
    # instead of bs (= 8) — the earlier per-strip layout wasted 15/16 of
    # every vector register and this family cost ~14 ms/32f at 720p
    # (round 5). Box sums ride the MXU per strip.
    L = ne_j * k * bs
    col_abs = jnp.concatenate([
        jax.lax.slice(refp, (0, 0, pad + int(cj_pos[e, ki])),
                      (c, hp, pad + int(cj_pos[e, ki]) + bs))
        for e in range(ne_j) for ki in range(k)], axis=-1)  # [C, Hp, L]
    cur_cols = jnp.concatenate(
        [jax.lax.slice(cur, (0, 0, e * bs), (c, h, (e + 1) * bs))
         for e in range(ne_j) for _ in range(k)], axis=-1)  # [C, H, L]
    sel = jnp.asarray(_boxsum_np(L, bs), jnp.bfloat16)      # [L, ne_j*K]
    rel_abs = []
    for ki in range(k):
        di = step * ki - reach
        sl = jax.lax.slice(col_abs, (0, pad + di, 0),
                           (c, pad + di + h, L))
        d = _wrap_abs_diff(sl, cur_cols).astype(jnp.bfloat16)
        box = jnp.einsum("chl,lm->chm", d, sel,
                         preferred_element_type=jnp.float32)
        box = box.reshape(c, h // bs, bs, ne_j * k).sum(
            axis=(0, 2), dtype=jnp.float32)                 # [nbh, ne_j*K]
        rel_abs.append(box.astype(jnp.int32))
    s = jnp.stack(rel_abs, axis=1)                 # [nbh, K(ki), ne_j, K(kj)]
    return s.reshape(plan.nbh, k, ne_j, k).transpose(0, 2, 1, 3)


def _family_corner(cur, ref, plan):
    """Absolute row+column candidates for the top-left corner blocks:
    [ne_i, ne_j, K, K] via one constant-index gather."""
    bs, k = plan.bs, plan.k
    h, w = plan.h, plan.w
    ne_i, ne_j = plan.n_edge_i, plan.n_edge_j
    c = cur.shape[0]
    if not (ne_i and ne_j):
        return jnp.zeros((ne_i, ne_j, k, k), jnp.int32)
    ri = np.minimum(plan.pos_i[:ne_i], h - bs)     # [ne_i, K]
    cjp = np.minimum(plan.pos_j[:ne_j], w - bs)    # [ne_j, K]
    # two-stage static slicing instead of a [C, ne_i, ne_j, K, K, bs, bs]
    # gather (round 5): ne_i*K row strips, then ne_j*K column slices of the
    # stacked strips — 2*ne*K slice ops total, all host-constant indices
    rowstrips = jnp.stack([
        jax.lax.slice(ref, (0, int(ri[ei, ki]), 0),
                      (c, int(ri[ei, ki]) + bs, w))
        for ei in range(ne_i) for ki in range(k)])  # [ne_i*K, C, bs, W]
    colcuts = jnp.stack([
        jax.lax.slice(rowstrips, (0, 0, 0, int(cjp[ej, kj])),
                      (ne_i * k, c, bs, int(cjp[ej, kj]) + bs))
        for ej in range(ne_j) for kj in range(k)])  # [ne_j*K, ne_i*K, C, bs, bs]
    patches = colcuts.reshape(ne_j, k, ne_i, k, c, bs, bs).transpose(
        4, 2, 0, 3, 1, 5, 6)
    # [C, ne_i, ne_j, K, K, bs, bs]
    cur_c = cur[:, : ne_i * bs, : ne_j * bs].reshape(
        c, ne_i, bs, ne_j, bs).transpose(0, 1, 3, 2, 4)
    return _wrap_abs_diff(patches, cur_c[:, :, :, None, None]).sum(
        axis=(0, -2, -1), dtype=jnp.int32)         # [ne_i, ne_j, K, K]


def sad_left_edge(cur: jnp.ndarray, ref: jnp.ndarray,
                  plan: MotionSearchPlan) -> jnp.ndarray:
    """SADs for the absolute-grid left-edge block columns only:
    [nbh, ne_j, K, K] (used to stitch around the Pallas kernel)."""
    bs = plan.bs
    pad = plan.reach + bs
    ne_i = plan.n_edge_i
    refp = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)))
    s_abs_j = _family_abs_cols(cur, refp, plan)
    s_corner = _family_corner(cur, ref, plan)
    return jnp.concatenate([s_corner, s_abs_j[ne_i:]], axis=0)


def sad_candidates(cur: jnp.ndarray, ref: jnp.ndarray,
                   plan: MotionSearchPlan) -> jnp.ndarray:
    """Exact SAD of every (block, candidate): [nbh, nbw, K, K] int32.

    `cur`, `ref`: int32 planar [C, H, W] with uint8-range values.
    """
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w = plan.h, plan.w
    ne_i, ne_j = plan.n_edge_i, plan.n_edge_j
    nbh, nbw = plan.nbh, plan.nbw
    c = cur.shape[0]

    # Pad H/W so every shifted slice is in-bounds; padded values only reach
    # masked candidates.
    pad = reach + bs
    refp = jnp.pad(ref, ((0, 0), (pad, pad), (pad, pad)))
    wp = w + 2 * pad

    # ---- row-shifted stacks -------------------------------------------------
    # relative rows: [K, C, H, Wp], entry ki = ref shifted by di = step*ki-reach
    row_rel = jnp.stack([
        jax.lax.slice(refp, (0, pad + step * ki - reach, 0),
                      (c, pad + step * ki - reach + h, wp))
        for ki in range(k)])
    # absolute rows (top strips): [ne_i, K, C, bs, Wp] via constant gather
    if ne_i:
        ri = np.minimum(plan.pos_i[:ne_i], h - bs)      # clamp invalid, masked
        row_idx = pad + ri[:, :, None] + np.arange(bs)[None, None, :]
        row_abs = refp[:, jnp.asarray(row_idx)]         # [C, ne_i, K, bs, Wp]
        row_abs = row_abs.transpose(1, 2, 0, 3, 4)      # [ne_i, K, C, bs, Wp]
        cur_top = cur[:, : ne_i * bs].reshape(c, ne_i, bs, w)
        cur_top = cur_top.transpose(1, 0, 2, 3)         # [ne_i, C, bs, W]

    # ---- loop over column candidates ---------------------------------------
    rel_rel = []     # per kj: [K, nbh, nbw]
    abs_rel = []     # per kj: [ne_i, K, nbw]
    for kj in range(k):
        dj = step * kj - reach
        shifted = jax.lax.slice(row_rel, (0, 0, 0, pad + dj),
                                (k, c, h, pad + dj + w))
        rel_rel.append(_tile_sums(_wrap_abs_diff(shifted, cur[None]), bs))
        if ne_i:
            s = jax.lax.slice(row_abs, (0, 0, 0, 0, pad + dj),
                              (ne_i, k, c, bs, pad + dj + w))
            d = _wrap_abs_diff(s, cur_top[:, None])     # [ne_i, K, C, bs, W]
            abs_rel.append(_tile_sums(d, bs)[..., 0, :])
    s_rel = jnp.stack(rel_rel, axis=1).transpose(2, 3, 0, 1)   # [nbh,nbw,K,K]
    if ne_i:
        s_abs_i = jnp.stack(abs_rel, axis=2)                   # [ne_i,K,K,nbw]
        s_abs_i = s_abs_i.transpose(0, 3, 1, 2)                # [ne_i,nbw,K,K]

    # ---- absolute columns + corner families --------------------------------
    s_abs_j = _family_abs_cols(cur, refp, plan) if ne_j else None
    s_corner = _family_corner(cur, ref, plan)

    # ---- stitch families by block position ---------------------------------
    #   [ corner  | abs-rows ]      rows < ne_i
    #   [ abs-cols| relative ]      rows >= ne_i
    top = (jnp.concatenate([s_corner, s_abs_i[:, ne_j:]], axis=1)
           if ne_j else s_abs_i) if ne_i else None
    bottom = (jnp.concatenate([s_abs_j[ne_i:], s_rel[ne_i:, ne_j:]], axis=1)
              if ne_j else s_rel[ne_i:])
    return jnp.concatenate([top, bottom], axis=0) if ne_i else bottom


@functools.lru_cache(maxsize=None)
def _boxsum_np(n: int, bs: int) -> np.ndarray:
    """[n, n/bs] 0/1 block-column summing matrix (MXU operand)."""
    return np.kron(np.eye(n // bs, dtype=np.float32),
                   np.ones((bs, 1), np.float32))


def static_sad(cur: jnp.ndarray, ref: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Saturating co-located SAD (ref: motion.py:109-111 uses cv2.subtract,
    which clamps at 0): [nbh, nbw] int32. Planar [C, H, W] inputs.

    Box sums ride the MXU: the lane (W) axis contracts against a 0/1
    summing matrix in bf16 (saturating diffs <= 255 are exact; f32
    accumulation of 8 of them is exact), the sublane (H) axis by a
    grouped reshape-sum. The previous _tile_sums formulation lowered to
    lane-strided reductions that cost ~25 ms/32f at 720p — vs ~2 ms for
    this form (round-5 measurement)."""
    w = cur.shape[-1]
    diff = jnp.maximum(ref - cur, 0).astype(jnp.bfloat16)
    sw = jnp.asarray(_boxsum_np(w, bs), jnp.bfloat16)
    s1 = jnp.einsum("...chw,wn->...chn", diff, sw,
                    preferred_element_type=jnp.float32)      # [..., C, H, nbw]
    *lead, c, h, nbw = s1.shape
    s2 = s1.reshape(*lead, c, h // bs, bs, nbw).sum(
        axis=(-4, -2), dtype=jnp.float32)                    # [..., nbh, nbw]
    return s2.astype(jnp.int32)


def select_mvs(sad: jnp.ndarray, cur: jnp.ndarray, ref: jnp.ndarray,
               plan: MotionSearchPlan, static_threshold: int) -> jnp.ndarray:
    """Candidate SADs [nbh, nbw, K, K] -> motion vectors [nbh, nbw, 2].

    Reproduces the reference's selection: validity masking, sentinel initial
    best at (0,0) (motion.py:102,122), first-minimum-wins (strict <), and the
    saturating static-block early out (motion.py:109-116)."""
    bs = plan.bs
    k = plan.k
    valid = (jnp.asarray(plan.valid_i)[:, None, :, None]
             & jnp.asarray(plan.valid_j)[None, :, None, :])

    # Packed key-minimum: key = (sad << sh) | (flat candidate index + 1).
    # A plain min-reduction then carries both the winning SAD and its FIRST
    # index (ties pick the smaller index = the reference's strict-< update
    # order) — ~5x cheaper than the materialized [.., K*K+1] argmin this
    # replaced (round 5). The virtual initial best (motion.py:102,122) is
    # the `sent` key: any valid candidate beats it, masked candidates
    # (sent | idx > it) never do. Garbage SADs from skip-overridden rows
    # may overflow the shift; those lanes are fully overwritten by the
    # static early-out in _mvs_from_best.
    sh, sent = _key_packing(plan, cur.shape[0])
    idx = jnp.arange(1, k * k + 1, dtype=jnp.int32).reshape(k, k)
    key = jnp.where(valid, (sad << sh) + idx, sent + ((1 << sh) - 1))
    best = jnp.min(key, axis=(-2, -1))
    return _mvs_from_best(best, cur, ref, plan, static_threshold, sh, sent)


def _key_packing(plan: MotionSearchPlan, c: int):
    """(shift, sentinel) for the packed key-minimum selection."""
    k, bs = plan.k, plan.bs
    sh = (k * k + 1).bit_length()
    sad_max = c * 255 * bs * bs
    assert (sad_max + 1) << sh < 2**31, "key packing overflow"
    return sh, jnp.int32((sad_max + 1) << sh)


def _mvs_from_best(best: jnp.ndarray, cur: jnp.ndarray, ref: jnp.ndarray,
                   plan: MotionSearchPlan, static_threshold: int,
                   sh: int, sent) -> jnp.ndarray:
    """Packed best keys [nbh, nbw] -> motion vectors [nbh, nbw, 2], with
    the (0, 0) no-hit fallback and the saturating static early-out."""
    bs, k, nbh, nbw = plan.bs, plan.k, plan.nbh, plan.nbw
    best = jnp.minimum(best, sent)
    hit = best < sent
    flat_idx = (best & ((1 << sh) - 1)) - 1
    ki = flat_idx // k
    kj = flat_idx % k

    pos_i = jnp.asarray(plan.pos_i)                             # [nbh, K]
    pos_j = jnp.asarray(plan.pos_j)                             # [nbw, K]
    bi = jnp.arange(nbh)[:, None]
    bj = jnp.arange(nbw)[None, :]
    pi = jnp.where(hit, pos_i[bi, ki], 0)
    pj = jnp.where(hit, pos_j[bj, kj], 0)

    stat = static_sad(cur, ref, bs) <= static_threshold
    ci = bi * bs
    cj = bj * bs
    pi = jnp.where(stat, ci, pi)
    pj = jnp.where(stat, cj, pj)

    return jnp.stack([pj - cj, pi - ci], axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bs", "reach", "step",
                                             "static_threshold"))
def motion_search(cur: jnp.ndarray, ref: jnp.ndarray, *, bs: int = 8,
                  reach: int = 16, step: int = 3,
                  static_threshold: int = 2000) -> jnp.ndarray:
    """Reference-exact motion vectors [nbh, nbw, 2] int32 as (dx, dy).

    `cur`, `ref`: int32 (uint8-valued) planar [C, H, W].
    """
    _, h, w = cur.shape
    plan = make_plan(h, w, bs, reach, step)
    sad = sad_candidates(cur, ref, plan)                        # [nbh,nbw,K,K]
    return select_mvs(sad, cur, ref, plan, static_threshold)


def use_pallas_default() -> bool:
    """Pallas kernel on TPU; XLA families elsewhere (CPU tests)."""
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("bs", "reach", "step",
                                             "static_threshold", "backend"))
def motion_search_batch(curs: jnp.ndarray, ref: jnp.ndarray, *, bs: int = 8,
                        reach: int = 16, step: int = 3,
                        static_threshold: int = 2000,
                        backend: str = "auto") -> jnp.ndarray:
    """Motion vectors for F frames sharing one reference (the GOP shape,
    encoder.py:51): curs [F, C, H, W], ref [C, H, W] -> [F, nbh, nbw, 2].

    backend: "pallas" | "xla" | "auto" (pallas on TPU)."""
    return motion_search_gops(curs[None], ref[None], bs=bs, reach=reach,
                              step=step, static_threshold=static_threshold,
                              backend=backend)[0]


@functools.partial(jax.jit, static_argnames=("bs", "reach", "step",
                                             "static_threshold", "backend"))
def motion_search_gops(curs: jnp.ndarray, refs: jnp.ndarray, *, bs: int = 8,
                       reach: int = 16, step: int = 3,
                       static_threshold: int = 2000,
                       backend: str = "auto") -> jnp.ndarray:
    """GOP-batched search: curs [B, F, C, H, W] vs refs [B, C, H, W]
    -> [B, F, nbh, nbw, 2].

    The pallas path puts the GOP axis in the kernel grid rather than vmapping
    the kernel (vmapped pallas_call programs stall this dev environment's
    remote pipeline, and a grid axis is cheaper anyway)."""
    b, f, _, h, w = curs.shape
    plan = make_plan(h, w, bs, reach, step)
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and use_pallas_default()))
    if use_pallas:
        from vcs_h264_tpu.ops.motion_pallas import sad_candidates_pallas_gops
        # Row-granular static early-out (the reference's per-block early-out,
        # motion.py:109-116, realized at the kernel's work granularity): a
        # block row whose every block of every frame passes the saturating
        # static check has its whole sweep output overridden by select_mvs,
        # so the kernel skips the row's MXU/VPU work entirely. On static
        # content this is most of the search (VERDICT r2 Weak #2).
        stat = jax.vmap(jax.vmap(static_sad, in_axes=(0, None, None)),
                        in_axes=(0, 0, None))(curs, refs, bs)  # [B,F,nbh,nbw]
        row_skip = jnp.all(stat <= static_threshold,
                           axis=(1, 3)).astype(jnp.int32)      # [B, nbh]
        # Packed key-min DIRECTLY in the kernel layout [B, nbh, ki, kj, F,
        # nbw]: the candidate axes reduce on sublanes while nbw stays on
        # lanes, and the [B, F, nbh, nbw, K, K] transpose (2x the full
        # candidate tensor through HBM, K*K on the minor axes) disappears
        # — the std-layout select cost ~13 ms/32f at 720p (round 5).
        k = plan.k
        sad_k = sad_candidates_pallas_gops(curs, refs, plan, row_skip,
                                           layout="kernel")
        sh, sent = _key_packing(plan, curs.shape[2])
        vi = jnp.asarray(plan.valid_i)                         # [nbh, K]
        vj = jnp.asarray(plan.valid_j)                         # [nbw, K]
        valid_k = (vi[None, :, :, None, None, None]
                   & vj.T[None, None, None, :, None, :])
        idx = (jnp.arange(k, dtype=jnp.int32)[:, None] * k
               + jnp.arange(k, dtype=jnp.int32)[None, :] + 1)
        key = jnp.where(valid_k,
                        (sad_k << sh) + idx[None, :, :, None, None][:, None],
                        sent + ((1 << sh) - 1))
        best = jnp.min(key, axis=(2, 3))                       # [B,nbh,F,nbw]
        best = best.transpose(0, 2, 1, 3)                      # [B,F,nbh,nbw]
        # left-edge block columns come from the exact XLA families (their
        # own key-min in the small [.., ne_j, K, K] layout)
        ne_j = plan.n_edge_j
        if ne_j:
            left = jax.vmap(jax.vmap(sad_left_edge, in_axes=(0, None, None)),
                            in_axes=(0, 0, None))(curs, refs, plan)
            lvalid = vi[:, None, :, None] & vj[None, :ne_j, None, :]
            lkey = jnp.where(lvalid, (left << sh) + idx, sent + ((1 << sh) - 1))
            lbest = jnp.min(lkey, axis=(-2, -1))               # [B,F,nbh,ne_j]
            best = jnp.concatenate([lbest, best[..., ne_j:]], axis=-1)
        tail = lambda b_, cc, rr: _mvs_from_best(
            b_, cc, rr, plan, static_threshold, sh, sent)
        return jax.vmap(jax.vmap(tail, in_axes=(0, 0, None)))(best, curs, refs)
    sad = jax.vmap(jax.vmap(sad_candidates, in_axes=(0, None, None)),
                   in_axes=(0, 0, None))(curs, refs, plan)
    select = lambda s, cc, rr: select_mvs(s, cc, rr, plan, static_threshold)
    return jax.vmap(jax.vmap(select, in_axes=(0, 0, None)))(sad, curs, refs)


@functools.partial(jax.jit, static_argnames=("bs",))
def motion_compensate(mv: jnp.ndarray, ref: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Rebuild a frame purely from motion vectors + reference
    (ref: motion.py:42-69). `mv` [nbh, nbw, 2] (dx, dy); `ref` [C, H, W]."""
    c, h, w = ref.shape
    nbh, nbw = h // bs, w // bs
    ci = jnp.arange(nbh)[:, None] * bs + mv[..., 1]
    cj = jnp.arange(nbw)[None, :] * bs + mv[..., 0]

    def grab(i0, j0):
        return jax.lax.dynamic_slice(ref, (0, i0, j0), (c, bs, bs))

    blocks = jax.vmap(jax.vmap(grab))(ci, cj)          # [nbh, nbw, C, bs, bs]
    return blocks.transpose(2, 0, 3, 1, 4).reshape(c, h, w)


@functools.partial(jax.jit, static_argnames=("bs", "reach", "backend"))
def motion_compensate_gops(mv: jnp.ndarray, refs: jnp.ndarray, *, bs: int,
                           reach: int, backend: str = "auto") -> jnp.ndarray:
    """Batched motion compensation: mv [G, F, nbh, nbw, 2] against shared
    per-GOP refs [G, C, H, W] -> [G, F, C, H, W] int32.

    On TPU this runs the branchless Pallas kernel (strip-resident column
    one-hot MXU mix + row select) instead of the per-block gather. The kernel
    requires |displacement| <= reach on both axes, which `select_mvs` output
    always satisfies: a chosen candidate position lies in the clamped window
    [max(c-reach, 0), min(c+reach, extent)); the static override is d = 0;
    and the (0, 0)-fallback (motion.py:102,122) can only fire when every
    candidate is invalid, which requires c <= reach on that axis (for
    c > reach the in-window candidate at p = c always satisfies p + bs < hi),
    so its displacement -c is also within reach."""
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and use_pallas_default()))
    if use_pallas:
        from vcs_h264_tpu.ops.motion_pallas import (
            motion_compensate_pallas_gops)
        return motion_compensate_pallas_gops(mv, refs.astype(jnp.int32),
                                             bs, reach)
    comp = lambda m, r: motion_compensate(m, r, bs)
    return jax.vmap(jax.vmap(comp, in_axes=(0, None)))(
        mv, refs.astype(jnp.int32))


def residuals_wrap(cur: jnp.ndarray, recon: jnp.ndarray) -> jnp.ndarray:
    """uint8-wrapping residual (ref: motion.py:38-40 on uint8 arrays)."""
    return (cur - recon) & 255


def reconstruct_wrap(recon: jnp.ndarray, res: jnp.ndarray) -> jnp.ndarray:
    """uint8-wrapping add-back (ref: decoder.py:57-60)."""
    return (recon + res) & 255


def num_static_blocks(mv: jnp.ndarray) -> jnp.ndarray:
    """Count of zero motion vectors (the reference's printed statistic,
    motion.py:67-68)."""
    return jnp.sum(jnp.all(mv == 0, axis=-1))
