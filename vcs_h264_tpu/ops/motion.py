"""Block motion estimation / compensation, TPU-vectorized, reference-exact.

The reference (`InterframeCompression/motion.py`) does a per-block Python loop:
for each block, a saturating-SAD static check against the co-located reference
block (threshold 2000, `motion.py:109-116`), else a coarse full search on a
step-3 grid inside a +/-16 px window clamped to the frame (`motion.py:118-146`),
minimizing the *wrapping* uint8 SAD `sum(|ref_block - block|)` with
first-minimum-wins tie-breaking (`motion.py:149-152`) and a `[0, 0]` fallback
coordinate when no candidate is valid (`motion.py:102,122`).

This module reproduces those semantics bit-exactly but as batched tensor ops
with **zero gathers** in the search. Key observation: the candidate position is

    p(b, k) = max(c_b - reach, 0) + step * k,      k = 0..K-1

so for blocks at least `reach` away from the top/left edge the candidate grid
is a *uniform displacement* of the block coordinate, and the SAD for one
displacement over all blocks is a shifted whole-frame absolute difference
followed by an 8x8 box reduction — pure VPU work that XLA fuses. Blocks in the
first ceil(reach/bs) block rows/cols have an *absolute* candidate grid
(p = step*k) which is uniform across those blocks, giving three more small
"edge strip" families. Candidate validity (`i+bs >= i_max` skip, motion.py:136)
depends only on the block coordinate, so it is a host-precomputed constant
mask.

Selection = first-occurrence argmin over [sentinel] + masked candidates, which
reproduces the reference's strict-< update and its 9999999999 initial best
(`motion.py:122`).
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
    n_edge: int          # block rows/cols whose window clamps at 0
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
    return MotionSearchPlan(bs, reach, step, n_edge, k, nbh, nbw, h, w,
                            valid_i, valid_j, pos_i, pos_j)


def _block_sums(diff: jnp.ndarray, bs: int) -> jnp.ndarray:
    """[R, W, C] wrap-diff -> per-(bs x bs)-block SAD [R//bs, W//bs] int32."""
    r, w, c = diff.shape
    x = diff.reshape(r // bs, bs, w // bs, bs, c)
    return x.sum(axis=(1, 3, 4), dtype=jnp.int32)


def _wrap_abs_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """uint8-wrapping |a - b|: np.abs on uint8 is the identity, so the
    reference SAD term is simply (a - b) mod 256 (motion.py:146)."""
    return (a - b) & 255


def sad_candidates(cur: jnp.ndarray, ref: jnp.ndarray,
                   plan: MotionSearchPlan) -> jnp.ndarray:
    """Exact SAD of every (block, candidate): [nbh, nbw, K, K] int32.

    `cur`, `ref`: int32 [H, W, C] with uint8-range values.
    """
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    h, w, ne = plan.h, plan.w, plan.n_edge
    nbh, nbw = plan.nbh, plan.nbw

    # Pad so relative-displacement slices are always in-bounds. Values in the
    # pad are never selected (masked candidates).
    pad = reach + bs
    refp = jnp.pad(ref, ((pad, pad), (pad, pad), (0, 0)))

    # ---- family 1: relative/relative (valid meaning for bi,bj >= n_edge) ----
    rel = []
    for ki in range(k):
        di = step * ki - reach
        for kj in range(k):
            dj = step * kj - reach
            shifted = jax.lax.slice(
                refp, (pad + di, pad + dj, 0), (pad + di + h, pad + dj + w, 3))
            rel.append(_block_sums(_wrap_abs_diff(shifted, cur), bs))
    s_rel = jnp.stack(rel).reshape(k, k, nbh, nbw).transpose(2, 3, 0, 1)

    ne_i = min(ne, nbh)
    ne_j = min(ne, nbw)

    # ---- family 2: absolute rows (top edge strips), relative cols ----------
    abs_rows = []
    for bi in range(ne_i):
        per_bi = []
        cur_rows = jax.lax.slice(cur, (bi * bs, 0, 0), (bi * bs + bs, w, 3))
        for ki in range(k):
            pi = int(plan.pos_i[bi, ki])
            pi_c = min(pi, h - bs)          # masked when invalid; keep in-bounds
            ref_rows = jax.lax.slice(refp, (pad + pi_c, 0, 0),
                                     (pad + pi_c + bs, 2 * pad + w, 3))
            for kj in range(k):
                dj = step * kj - reach
                shifted = jax.lax.slice(ref_rows, (0, pad + dj, 0),
                                        (bs, pad + dj + w, 3))
                per_bi.append(_block_sums(_wrap_abs_diff(shifted, cur_rows), bs))
        abs_rows.append(jnp.stack(per_bi).reshape(k, k, 1, nbw).transpose(2, 3, 0, 1))
    s_abs_i = (jnp.concatenate(abs_rows, axis=0) if abs_rows
               else jnp.zeros((0, nbw, k, k), jnp.int32))

    # ---- family 3: relative rows, absolute cols (left edge strips) ---------
    abs_cols = []
    for bj in range(ne_j):
        per_bj = []
        cur_cols = jax.lax.slice(cur, (0, bj * bs, 0), (h, bj * bs + bs, 3))
        for kj in range(k):
            pj = int(plan.pos_j[bj, kj])
            pj_c = min(pj, w - bs)
            ref_cols = jax.lax.slice(refp, (0, pad + pj_c, 0),
                                     (2 * pad + h, pad + pj_c + bs, 3))
            for ki in range(k):
                di = step * ki - reach
                shifted = jax.lax.slice(ref_cols, (pad + di, 0, 0),
                                        (pad + di + h, bs, 3))
                per_bj.append(_block_sums(_wrap_abs_diff(shifted, cur_cols), bs))
        # stacked as [kj, ki] -> transpose to [ki, kj]
        s = jnp.stack(per_bj).reshape(k, k, nbh, 1).transpose(2, 3, 1, 0)
        abs_cols.append(s)
    s_abs_j = (jnp.concatenate(abs_cols, axis=1) if abs_cols
               else jnp.zeros((nbh, 0, k, k), jnp.int32))

    # ---- family 4: absolute/absolute (top-left corner blocks) --------------
    if ne_i and ne_j:
        corner = []
        for bi in range(ne_i):
            for bj in range(ne_j):
                blk = jax.lax.slice(cur, (bi * bs, bj * bs, 0),
                                    (bi * bs + bs, bj * bs + bs, 3))
                per = []
                for ki in range(k):
                    pi = min(int(plan.pos_i[bi, ki]), h - bs)
                    for kj in range(k):
                        pj = min(int(plan.pos_j[bj, kj]), w - bs)
                        rb = jax.lax.slice(ref, (pi, pj, 0),
                                           (pi + bs, pj + bs, 3))
                        per.append(_wrap_abs_diff(rb, blk)
                                   .sum(dtype=jnp.int32))
                corner.append(jnp.stack(per).reshape(k, k))
        s_corner = jnp.stack(corner).reshape(ne_i, ne_j, k, k)
    else:
        s_corner = jnp.zeros((ne_i, ne_j, k, k), jnp.int32)

    # ---- stitch families by block position ---------------------------------
    #   [ corner  | abs-rows ]      rows < ne_i
    #   [ abs-cols| relative ]      rows >= ne_i
    top = (jnp.concatenate([s_corner, s_abs_i[:, ne_j:]], axis=1)
           if ne_j else s_abs_i)                       # [ne_i, nbw, K, K]
    bottom = (jnp.concatenate([s_abs_j[ne_i:], s_rel[ne_i:, ne_j:]], axis=1)
              if ne_j else s_rel[ne_i:])               # [nbh-ne_i, nbw, K, K]
    return jnp.concatenate([top, bottom], axis=0) if ne_i else bottom


def static_sad(cur: jnp.ndarray, ref: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Saturating co-located SAD (ref: motion.py:109-111 uses cv2.subtract,
    which clamps at 0): [nbh, nbw] int32."""
    diff = jnp.maximum(ref - cur, 0)
    return _block_sums(diff, bs)


def motion_search(cur: jnp.ndarray, ref: jnp.ndarray, *, bs: int = 8,
                  reach: int = 16, step: int = 3,
                  static_threshold: int = 2000) -> jnp.ndarray:
    """Reference-exact motion vectors [nbh, nbw, 2] int32 as (dx, dy).

    `cur`, `ref`: int32 (uint8-valued) [H, W, 3].
    """
    h, w, _ = cur.shape
    plan = make_plan(h, w, bs, reach, step)
    nbh, nbw, k = plan.nbh, plan.nbw, plan.k

    sad = sad_candidates(cur, ref, plan)                        # [nbh,nbw,K,K]
    valid = (jnp.asarray(plan.valid_i)[:, None, :, None]
             & jnp.asarray(plan.valid_j)[None, :, None, :])
    masked = jnp.where(valid, sad, _MASKED)

    # Prepend the sentinel "initial best" (coordinate (0,0), motion.py:102).
    flat = masked.reshape(nbh, nbw, k * k)
    with_init = jnp.concatenate(
        [jnp.full((nbh, nbw, 1), _INIT_SENTINEL, jnp.int32), flat], axis=-1)
    best = jnp.argmin(with_init, axis=-1)                       # first-wins
    hit = best > 0
    ki = (best - 1) // k
    kj = (best - 1) % k

    pos_i = jnp.asarray(plan.pos_i)                             # [nbh, K]
    pos_j = jnp.asarray(plan.pos_j)                             # [nbw, K]
    bi = jnp.arange(nbh)[:, None]
    bj = jnp.arange(nbw)[None, :]
    pi = jnp.where(hit, pos_i[bi, ki], 0)
    pj = jnp.where(hit, pos_j[bj, kj], 0)

    # Static-block early out (ref: motion.py:109-116).
    stat = static_sad(cur, ref, bs) <= static_threshold
    ci = bi * bs
    cj = bj * bs
    pi = jnp.where(stat, ci, pi)
    pj = jnp.where(stat, cj, pj)

    return jnp.stack([pj - cj, pi - ci], axis=-1).astype(jnp.int32)


def motion_compensate(mv: jnp.ndarray, ref: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Rebuild a frame purely from motion vectors + reference
    (ref: motion.py:42-69). `mv` [nbh, nbw, 2] (dx, dy); `ref` [H, W, C]."""
    h, w, c = ref.shape
    nbh, nbw = h // bs, w // bs
    ci = jnp.arange(nbh)[:, None] * bs + mv[..., 1]
    cj = jnp.arange(nbw)[None, :] * bs + mv[..., 0]

    def grab(i0, j0):
        return jax.lax.dynamic_slice(ref, (i0, j0, 0), (bs, bs, c))

    blocks = jax.vmap(jax.vmap(grab))(ci, cj)          # [nbh, nbw, bs, bs, C]
    return blocks.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


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
