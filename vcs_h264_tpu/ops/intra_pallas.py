"""Pallas TPU kernels for the wavefront intra scans — MXU formulation.

The XLA lax.scan formulation (ops/intra.py) pays a fixed per-diagonal
overhead that dominates at large frames (~264 us/diagonal at 720p); a first
Pallas port that transcribed the same elementwise predictor formulas was no
faster (~95 us/diagonal at 360p) because the body issues ~1500 tiny VPU ops
per step — issue-bound, not compute-bound. This version collapses the body
onto the MXU:

  * every H.264 4x4 predictor value is a sum of at most three per-term
    floor-divided neighbor values (e.g. `u[0]//4 + u[1]//2 + u[2]//4`,
    intramodes.py) — so all 9 modes x 16 positions are ONE matmul
    S [144, 41] @ features [41, B] where the features are the 13 neighbor
    pixels (u0-3, l0-3, ul, ur0-3), their >>1 and >>2 (values are
    non-negative, so shifts ARE the reference's floor divisions), and the
    two wrap-corrected `3*x//4` terms. 0/1 matrix entries and values <= 765
    make the f32 MXU product exact. The DC mode (mod-256 wrap + //8) is
    computed on the VPU and overlaid on its 16 rows.
  * the 4x4 integer core transform is linear: vec(Cf X Cf^T) =
    kron(Cf, Cf) @ vec(X) — a [16, 16] f32 matmul, exact (|entries| <= 4,
    intermediate sums < 2^24); same for the inverse with kron(2Ci, 2Ci).
  * grid = (T,): one sequential step per anti-diagonal, slim carry (bottom
    row / right column / corners of the last three diagonals) in VMEM
    scratch, per-step inputs/outputs streamed by BlockSpec index maps.
  * layout: all per-step tensors are [rows, B] with B = N*L (plane batch x
    wavefront lanes) fused into the minor axis — every op is lane-dense.

Semantics are bit-identical to ops/intra.py's scan (same integer formulas,
128 fills, ur fallback, strict-< first-min mode selection, escape rule);
asserted in tests/test_intra_pallas.py (interpret mode) and on hardware by
tools/check_pallas_tpu.py.

Reference parity lineage: the predictors realize
`IntraframeCompression/intramodes.py`; the closed-loop 4x4 integer core
transform realizes the commented-out intent of `intraframe.py:14-22,352-358`
(SURVEY.md C9/C10).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcs_h264_tpu.ops.intra import _CF4, _CI4X2, _G4X400, _iround_div

# feature indices: 13 neighbors raw, then >>1, then >>2, then the two
# wrap-corrected 3*x//4 terms
_NB = 13                               # u0-3, l0-3, ul, ur0-3
_U0, _L0, _UL, _UR0 = 0, 4, 8, 9
_NFEAT = 3 * _NB + 2
_W3UR3, _W3L3 = 3 * _NB, 3 * _NB + 1
_NMODE, _NPOS = 9, 16
_DC_MODE = 2


def _raw(i):
    return i


def _half(i):
    return _NB + i


def _quar(i):
    return 2 * _NB + i


@functools.lru_cache(maxsize=None)
def _selection_matrix() -> np.ndarray:
    """[9*16, 41] 0/1 matrix: row (mode*16 + r*4 + c) sums the features of
    that predictor position. DC rows are zero (overlaid in-kernel)."""
    s = np.zeros((_NMODE * _NPOS, _NFEAT), np.float32)

    def put(mode, grid):
        for r in range(4):
            for c in range(4):
                for f in grid[r][c]:
                    s[mode * 16 + r * 4 + c, f] += 1.0

    u = [_U0 + i for i in range(4)]
    l = [_L0 + i for i in range(4)]
    ul = _UL
    ur = [_UR0 + i for i in range(4)]

    # mode 0 vertical / mode 1 horizontal (intramodes.py:7,13)
    put(0, [[[_raw(u[c])] for c in range(4)] for _ in range(4)])
    put(1, [[[_raw(l[r])] for _ in range(4)] for r in range(4)])
    # mode 2 dc: overlaid in-kernel (wrap + //8 is not per-term linear)

    # mode 3 downleft (intramodes.py:25): e = u0-3, ur0-3
    e = u + ur
    t = [[_quar(e[s_]), _half(e[s_ + 1]), _quar(e[s_ + 2])] for s_ in range(6)]
    t.append([_quar(e[6]), _W3UR3])
    put(3, [[t[r + c] for c in range(4)] for r in range(4)])

    # mode 4 downright (intramodes.py:45)
    d = {
        3: [_quar(u[1]), _half(u[2]), _quar(u[3])],
        2: [_quar(u[0]), _half(u[1]), _quar(u[2])],
        1: [_quar(ul), _half(u[0]), _quar(u[1])],
        0: [_quar(ul), _half(u[0]), _quar(l[0])],
        -1: [_quar(u[0]), _half(l[0]), _quar(l[1])],
        -2: [_quar(l[0]), _half(l[1]), _quar(l[2])],
        -3: [_quar(l[1]), _half(l[2]), _quar(l[3])],
    }
    put(4, [[d[c - r] for c in range(4)] for r in range(4)])

    # mode 5 verticalright (intramodes.py:65)
    a = [[_half(ul), _half(u[0])], [_half(u[0]), _half(u[1])],
         [_half(u[1]), _half(u[2])], [_half(u[2]), _half(u[3])]]
    b = [[_quar(u[0]), _half(ul), _quar(l[0])],
         [_quar(ul), _half(u[0]), _quar(u[1])],
         [_quar(u[0]), _half(u[1]), _quar(u[2])],
         [_quar(u[1]), _half(u[2]), _quar(u[3])]]
    c0 = [_quar(ul), _half(l[0]), _quar(l[1])]
    d0 = [_quar(l[0]), _half(l[1]), _quar(l[2])]
    put(5, [a, b, [c0, a[0], a[1], a[2]], [d0, b[0], b[1], b[2]]])

    # mode 6 horizontaldown (intramodes.py:85)
    a = [[_half(ul), _half(l[0])],
         [_quar(u[0]), _half(ul), _quar(l[0])],
         [_quar(ul), _half(u[0]), _quar(u[1])],
         [_quar(u[0]), _half(u[1]), _quar(u[2])]]
    b0 = [_half(l[0]), _half(l[1])]
    b1 = [_quar(ul), _half(l[1]), _quar(l[2])]
    c0_ = [_half(l[1]), _half(l[2])]
    c1 = [_quar(l[0]), _half(l[1]), _quar(l[2])]
    d0_ = [_half(l[2]), _half(l[3])]
    d1 = [_quar(l[1]), _half(l[2]), _quar(l[3])]
    put(6, [a, [b0, b1, a[0], a[1]], [c0_, c1, b0, b1],
            [d0_, d1, c0_, c1]])

    # mode 7 verticalleft (intramodes.py:105)
    a = [[_half(u[0]), _half(u[1])], [_half(u[1]), _half(u[2])],
         [_half(u[2]), _half(u[3])], [_half(u[3]), _half(ur[0])],
         [_half(ur[0]), _half(ur[1])]]
    b = [[_quar(u[0]), _half(u[1]), _quar(u[2])],
         [_quar(u[1]), _half(u[2]), _quar(u[3])],
         [_quar(u[2]), _half(u[3]), _quar(ur[0])],
         [_quar(u[3]), _half(ur[0]), _quar(ur[1])],
         [_quar(ur[0]), _half(ur[1]), _quar(ur[2])]]
    put(7, [a[:4], b[:4], a[1:5], b[1:5]])

    # mode 8 horizontalup (intramodes.py:125)
    a0 = [_half(l[0]), _half(l[1])]
    a1 = [_quar(l[0]), _half(l[1]), _quar(l[2])]
    a2 = [_half(l[1]), _half(l[2])]
    a3 = [_quar(l[1]), _half(l[2]), _quar(l[3])]
    b2 = [_half(l[2]), _half(l[3])]
    b3 = [_quar(l[2]), _W3L3]
    cc = [_raw(l[3])]
    put(8, [[a0, a1, a2, a3], [a2, a3, b2, b3],
            [b2, b3, cc, cc], [cc, cc, cc, cc]])
    return s


@functools.lru_cache(maxsize=None)
def _kron_mats():
    """(kron(Cf, Cf) [16,16] f32, kron(2Ci, 2Ci) [16,16] f32, gk [16,1] i32:
    flattened 400*G norm table)."""
    cf = np.asarray(_CF4, np.float32)
    ci2 = np.asarray(_CI4X2, np.float32)
    gk = np.asarray(_G4X400, np.int32).reshape(16, 1)
    return np.kron(cf, cf), np.kron(ci2, ci2), gk


@functools.lru_cache(maxsize=None)
def _carry_select() -> np.ndarray:
    """[9, 16] 0/1 matrix extracting a block's carry pixels from its
    vec-position layout: rows 0-3 = bottom row (p = 12..15), rows 4-7 =
    right column (p = 3, 7, 11, 15), row 8 = bottom-right corner (p = 15).
    A tiny matmul yields all of them in CANONICAL vector layout — sublane
    slices like block16[12:16] carry offset layouts that Mosaic cannot
    concatenate (lane-shift) or keep in registers across sub-steps."""
    e = np.zeros((9, 16), np.float32)
    for i, p_ in enumerate([12, 13, 14, 15]):
        e[i, p_] = 1.0
    for i, p_ in enumerate([3, 7, 11, 15]):
        e[4 + i, p_] = 1.0
    e[8, 15] = 1.0
    return e


def _shift_m1(x):
    """result[i] = x[i - 1], zero shifted in. In the skewed layout every
    lane IS its block row bi, so an up-ish neighbor always sits one lane
    lower — a CONSTANT shift. A shifted read crosses a plane-batch boundary
    of the fused (N, bi) axis only at bi == 0, where the availability mask
    is False, so the leaked value is never observed."""
    z = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([z, x[..., :-1]], axis=-1)


def _neighbors(carry, masks8):
    """u/l [4,B], ul [1,B], ur [4,B] with the reference 128 fills + ur
    fallback. masks [4, B] i32. Skewed-layout neighbor lanes: u -> diag t-2
    lane bi-1, l -> diag t-1 lane bi, ul -> diag t-3 lane bi-1, ur -> diag
    t-1 lane bi-1 (all fixed shifts). carry = (row1, col1, row2, cor1,
    cor2, cor3): bottom row + right column of t-1, bottom row of t-2, and
    the PIPELINED corners of t-1/t-2/t-3 — corners ride their own [1, B]
    stages so no sub-step ever slices a register value (slices carry offset
    layouts Mosaic cannot shift or concatenate)."""
    row1, col1, row2, _, _, cor3 = carry
    masks = masks8.astype(jnp.int32)   # int8 stream; no packed int8 compare
    fill = jnp.int32(128)
    m_u, m_l = masks[0:1] != 0, masks[1:2] != 0           # [1, B]
    m_ul, m_ur = masks[2:3] != 0, masks[3:4] != 0
    u_raw = _shift_m1(row2)                               # [4, B]
    u = jnp.where(m_u, u_raw, fill)
    l = jnp.where(m_l, col1, fill)
    ul = jnp.where(m_ul, _shift_m1(cor3), fill)           # [1, B]
    ur_fb = jnp.where(m_u, u_raw[3:4], fill)              # [1, B]
    ur = jnp.where(m_ur, _shift_m1(row1), ur_fb)
    return u, l, ul, ur, m_u, m_l, m_ur


def _features_and_dc(u, l, ul, ur, m_u, m_l, m_ur):
    """-> (features [41, B] f32, dc [1, B] i32)."""
    nb = jnp.concatenate([u, l, ul, ur], axis=0)          # [13, B]
    w3u = 3 * ur[3:4]
    w3u = jnp.where(m_ur, w3u & 255, w3u) >> 2
    w3l = 3 * l[3:4]
    w3l = jnp.where(m_l, w3l & 255, w3l) >> 2
    feats = jnp.concatenate([nb, nb >> 1, nb >> 2, w3u, w3l], axis=0)
    s = u + l
    s = jnp.where(m_u & m_l, s & 255, s)
    dc = jnp.sum(s, axis=0, keepdims=True) >> 3           # [1, B]
    return feats.astype(jnp.float32), dc


def _all_preds(feats, dc, s_ref):
    """-> preds [144, B] f32 (exact integers <= 765): 9 modes x 16
    positions (DC rows overlaid). Staying in f32 through the SAD avoids two
    full-panel dtype converts per diagonal — every value and every 16-term
    SAD below is an exact f32 integer (< 2^24)."""
    p = jax.lax.dot_general(
        s_ref[...], feats, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    lo, hi = _DC_MODE * _NPOS, (_DC_MODE + 1) * _NPOS
    return jnp.where((rows >= lo) & (rows < hi),
                     dc.astype(jnp.float32), p)


def _core_fwd_quant(x16, kf_ref, gk_ref, qstep):
    """vec residual [16, B] f32 (exact ints) -> quantized coefficients
    [16, B] i32."""
    coef = jax.lax.dot_general(
        kf_ref[...], x16,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return _iround_div(coef * gk_ref[...], 400 * qstep)


def _core_dequant_inv(q16, ki_ref, qstep):
    """quantized coefficients [16, B] i32 -> reconstructed residual i32."""
    r = jax.lax.dot_general(
        ki_ref[...], (q16 * jnp.int32(qstep)).astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return _iround_div(r, 4)


def _carry_rows(block16, e_ref):
    """(bottom row [4,B], right column [4,B], corner [1,B]) of a diagonal's
    blocks in vec-position layout (p = r*4 + c), extracted by three tiny
    0/1 matmuls so the results have canonical layouts (see _carry_select)
    and can ride registers across sub-steps."""
    blk = block16.astype(jnp.float32)

    def sel(rows):
        return jax.lax.dot_general(
            rows, blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    e = e_ref[...]
    return sel(e[0:4]), sel(e[4:8]), sel(e[8:9])


def _init_carry(t, refs, B):
    @pl.when(t == 0)
    def _():
        z = jnp.zeros((4, B), jnp.int32)
        z1 = jnp.zeros((1, B), jnp.int32)
        for r, zz in zip(refs, (z, z, z, z1, z1, z1)):
            r[...] = zz


# Each grid step processes _KDIAG consecutive anti-diagonals: the carry
# rides registers across the unrolled sub-steps and is stored to scratch
# once per grid step, cutting the per-diagonal fixed cost (grid/DMA/
# semaphore overhead) ~_KDIAG-fold. Padded tail sub-steps (t >= T) see
# all-False masks and their outputs land in padded rows dropped on unpad.
_KDIAG = 4


def _enc_substep(oblk, carry, masks, s_ref, kf_ref, ki_ref, gk_ref, e_ref,
                 qstep, B):
    u, l, ul, ur, m_u, m_l, m_ur = _neighbors(carry, masks)
    feats, dc = _features_and_dc(u, l, ul, ur, m_u, m_l, m_ur)
    preds = _all_preds(feats, dc, s_ref)                  # [144, B] f32
    # oblk arrives as recentered int8 (the [T',16,B] streams dominated the
    # stage cost as int32: the XLA-side skew transform alone was 7.4 ms vs
    # the kernel's 6.8 at 720p/24 planes — int8/int16 boundary dtypes
    # quarter that traffic); +128 restores the exact pixel values
    oblk_f = oblk.astype(jnp.float32) + 128.0

    # strict-< first-min search over the 9 per-mode SADs (intraframe.py:
    # 79-144): start from the 16*255 sentinel; earlier modes win ties.
    # Packed-key formulation (the unrolled 9-step compare loop added ~36
    # serially-dependent VPU ops to the wavefront's critical path): key =
    # SAD*16 + mode + 1 is an exact f32 integer (< 2^17), its minimum picks
    # the smallest SAD with the LOWEST mode on ties — exactly the strict-<
    # first-min rule — and a key above the packed sentinel 4080*16 means no
    # mode beat the initial best (the escape).
    p9 = preds.reshape(_NMODE, _NPOS, B)
    d9 = jnp.sum(jnp.abs(p9 - oblk_f[None]), axis=1)      # [9, B] f32
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (_NMODE, B), 0).astype(
        jnp.float32)                       # (Mosaic has no float iota)
    kmin = jnp.min(d9 * 16.0 + m_iota + 1.0, axis=0,
                   keepdims=True)                         # [1, B]
    esc = kmin > float(16 * 255 * 16)
    mode = jnp.where(esc, 0, (kmin.astype(jnp.int32) & 15) - 1)
    sel = ((mode == jax.lax.broadcasted_iota(jnp.int32, (_NMODE, B), 0))
           & ~esc).astype(jnp.float32)                    # [9, B]
    pred16 = jnp.sum(p9 * sel[:, None], axis=0)           # [16, B] f32 exact

    q = _core_fwd_quant(oblk_f - pred16, kf_ref, gk_ref, qstep)
    rec = jnp.clip(pred16.astype(jnp.int32)
                   + _core_dequant_inv(q, ki_ref, qstep), 0, 255)
    bottom, right, corner = _carry_rows(rec, e_ref)
    new_carry = (bottom, right, carry[0], corner, carry[3], carry[4])
    return (q, mode, esc, rec), new_carry


def _enc_kernel(orig_ref, mask_ref, s_ref, kf_ref, ki_ref, gk_ref, e_ref,
                q_ref, mode_ref, esc_ref, rec_ref, *scratch, qstep, B):
    t0 = pl.program_id(0)
    _init_carry(t0, scratch, B)
    # the carry rides REGISTERS across the k sub-steps (all entries have
    # canonical layouts thanks to the _carry_select matmuls and the
    # pipelined corners); scratch is only read once per grid step and
    # written once at the end
    carry = tuple(r[...] for r in scratch)
    for j in range(_KDIAG):
        (q, mode, esc, rec), carry = _enc_substep(
            orig_ref[0, j], carry, mask_ref[0, j],
            s_ref, kf_ref, ki_ref, gk_ref, e_ref, qstep, B)
        q_ref[0, j] = q.astype(jnp.int16)
        rec_ref[0, j] = (rec - 128).astype(jnp.int8)
        mode_ref[0, j] = mode
        esc_ref[0, j] = esc.astype(jnp.int32)
    for r, v in zip(scratch, carry):
        r[...] = v


def _dec_substep(res, mode, live, carry, masks, s_ref, ki_ref, e_ref,
                 qstep, clip, B):
    res = res.astype(jnp.int32)          # int16 stream (see _enc_substep)
    if qstep:
        res = _core_dequant_inv(res, ki_ref, qstep)
    u, l, ul, ur, m_u, m_l, m_ur = _neighbors(carry, masks)
    feats, dc = _features_and_dc(u, l, ul, ur, m_u, m_l, m_ur)
    preds = _all_preds(feats, dc, s_ref)                  # [144, B] f32
    sel = ((mode == jax.lax.broadcasted_iota(jnp.int32, (_NMODE, B), 0))
           & live).astype(jnp.float32)
    pred16 = jnp.sum(preds.reshape(_NMODE, _NPOS, B) * sel[:, None],
                     axis=0).astype(jnp.int32)
    block = pred16 + res
    if clip:
        block = jnp.clip(block, 0, 255)
    bottom, right, corner = _carry_rows(block, e_ref)
    return block, (bottom, right, carry[0], corner, carry[3], carry[4])


def _dec_kernel(res_ref, mask_ref, mode_in, esc_in, s_ref, ki_ref, e_ref,
                out_ref, *scratch, qstep, clip, B):
    """qstep > 0: res_ref holds quantized coefficients (dequantized here);
    qstep == 0: res_ref holds exact residuals (lossless path). Clipped
    output rides an int8 stream (recentered; the unskew relayout is the
    stage's real cost, see _enc_substep)."""
    t0 = pl.program_id(0)
    _init_carry(t0, scratch, B)
    carry = tuple(r[...] for r in scratch)
    for j in range(_KDIAG):
        block, carry = _dec_substep(
            res_ref[0, j], mode_in[0, j], esc_in[0, j] == 0, carry,
            mask_ref[0, j], s_ref, ki_ref, e_ref, qstep, clip, B)
        out_ref[0, j] = (block - 128).astype(jnp.int8) if clip else block
    for r, v in zip(scratch, carry):
        r[...] = v


# Mosaic stack-allocates the kernel body's intermediates at peak liveness;
# the default 16 MiB scoped-VMEM budget is too small for the production
# batch (the [144, B] predictor panel plus the feature/diff temporaries).
# v5e has 128 MiB of physical VMEM — raise the scoped limit.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _skew_masks(nbh: int, nbw: int, n: int) -> jnp.ndarray:
    """[T', 4, N*nbh] int8 availability masks in the skewed layout: lane i
    of diagonal t holds block (i, t - 2i); a_u/a_l/a_ul/a_ur follow the
    positional rules of ops/intra.py _avail_masks. Padded diagonals
    (t >= T) are all-False so tail sub-steps are inert."""
    T = 2 * (nbh - 1) + nbw
    Tp = _pad_T(T)
    t = np.arange(Tp)[:, None]
    i = np.arange(nbh)[None, :]
    j = t - 2 * i
    valid = (j >= 0) & (j < nbw) & (t < T)
    a_u = valid & (i >= 1)
    a_l = valid & (j >= 1)
    a_ul = a_u & (j >= 1)
    a_ur = a_u & (j < nbw - 1)
    m = np.stack([a_u, a_l, a_ul, a_ur], axis=1).astype(np.int8)
    m = np.broadcast_to(m[:, :, None, :], (Tp, 4, n, nbh))
    return jnp.asarray(m.reshape(Tp, 4, n * nbh))


def _pad_T(T: int) -> int:
    return -(-T // _KDIAG) * _KDIAG


def _skew(planes: jnp.ndarray):
    """[N, H, W] -> skewed lane stream [T', 16, N*nbh].

    The wavefront key is 2*bi + bj, so padding each block row bi by 2*bi
    columns turns diagonal t into a plain COLUMN — a pure pad + reshape
    (flat index i*(T+2) + c reinterpreted with row length T), no gather:
    Z[i, 2i + j] = X[i, j]. (The XLA gather formulation of this reordering
    cost ~54 ms per 24-plane 720p batch — 5x the kernel itself.)"""
    n, h, w = planes.shape
    nbh, nbw = h // 4, w // 4
    T = 2 * (nbh - 1) + nbw
    Tp = _pad_T(T)
    x = planes.reshape(n, nbh, 4, nbw, 4).transpose(2, 4, 0, 1, 3)
    x = x.reshape(16, n, nbh, nbw)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T + 2 - nbw)))
    # reinterpret each (p, n) group's [nbh, T+2] rows with row length T:
    # Z[i, 2i + j] = X[i, j] (the per-group slice keeps group starts aligned)
    x = x.reshape(16, n, nbh * (T + 2))[..., : nbh * T]
    x = x.reshape(16, n, nbh, T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Tp - T)))
    return x.transpose(3, 0, 1, 2).reshape(Tp, 16, n * nbh)


def _unskew(lanes: jnp.ndarray, n: int, h: int, w: int):
    """[T', 16, N*nbh] -> [N, H, W] (inverse of _skew; drops pad lanes)."""
    nbh, nbw = h // 4, w // 4
    T = 2 * (nbh - 1) + nbw
    x = lanes[:T].transpose(1, 2, 0).reshape(16, n, nbh * T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * nbh)))
    x = x.reshape(16, n, nbh, T + 2)[..., :nbw]
    x = x.reshape(4, 4, n, nbh, nbw).transpose(2, 3, 0, 4, 1)
    return x.reshape(n, h, w)


def _skew_scalar(v: jnp.ndarray, nbh: int, nbw: int):
    """[N, nbh, nbw] -> [T', 1, N*nbh]."""
    n = v.shape[0]
    T = 2 * (nbh - 1) + nbw
    Tp = _pad_T(T)
    x = jnp.pad(v, ((0, 0), (0, 0), (0, T + 2 - nbw)))
    x = x.reshape(n, nbh * (T + 2))[..., : nbh * T].reshape(n, nbh, T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T)))
    return x.transpose(2, 0, 1).reshape(Tp, 1, n * nbh)


def _unskew_scalar(lanes: jnp.ndarray, n: int, nbh: int, nbw: int):
    """[T', 1, N*nbh] -> [N, nbh, nbw]."""
    T = 2 * (nbh - 1) + nbw
    x = lanes[:T].reshape(T, n, nbh).transpose(1, 2, 0).reshape(n, nbh * T)
    x = jnp.pad(x, ((0, 0), (0, 2 * nbh)))
    return x.reshape(n, nbh, T + 2)[..., :nbw]


def _specs(B):
    k = _KDIAG
    blk = pl.BlockSpec((1, k, 16, B), lambda t: (t, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((1, k, 4, B), lambda t: (t, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    sca = pl.BlockSpec((1, k, 1, B), lambda t: (t, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),
                                       memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((4, B), jnp.int32)] * 3 + \
              [pltpu.VMEM((1, B), jnp.int32)] * 3
    return blk, msk, sca, const, scratch


def _consts():
    s_np = _selection_matrix()
    kf_np, ki_np, gk_np = _kron_mats()
    return (jnp.asarray(s_np), jnp.asarray(kf_np), jnp.asarray(ki_np),
            jnp.asarray(gk_np), jnp.asarray(_carry_select()))


def encode_lossy_planes(planes: jnp.ndarray, qstep: int,
                        interpret: bool = False):
    """planes [N, H, W] i32 -> (qcoef [N,H,W] block-layout planes i32,
    modes [N,nbh,nbw] i32, escape [N,nbh,nbw] bool, recon [N,H,W] i32).
    Bit-identical to the lax.scan in intra_encode4x4_lossy_batch."""
    n, h, w = planes.shape
    nbh, nbw = h // 4, w // 4
    B = n * nbh
    k = _KDIAG
    masks = _skew_masks(nbh, nbw, n)
    Tp = masks.shape[0]
    s_m, kf, ki, gk, e_m = _consts()
    blk, msk, sca, const, scratch = _specs(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(Tp // k,),
        in_specs=[blk, msk, const((_NMODE * _NPOS, _NFEAT)),
                  const((16, 16)), const((16, 16)), const((16, 1)),
                  const((9, 16))],
        out_specs=[blk, sca, sca, blk],
        scratch_shapes=scratch)
    orig_p = _skew((planes - 128).astype(jnp.int8)).reshape(
        Tp // k, k, 16, B)
    q_l, mode_l, esc_l, rec_l = pl.pallas_call(
        functools.partial(_enc_kernel, qstep=qstep, B=B),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Tp // k, k, 16, B), jnp.int16),
                   jax.ShapeDtypeStruct((Tp // k, k, 1, B), jnp.int32),
                   jax.ShapeDtypeStruct((Tp // k, k, 1, B), jnp.int32),
                   jax.ShapeDtypeStruct((Tp // k, k, 16, B), jnp.int8)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(orig_p, masks.reshape(Tp // k, k, 4, B), s_m, kf, ki, gk, e_m)
    unv = lambda x: _unskew(x.reshape(Tp, 16, B), n, h, w)
    uns = lambda x: _unskew_scalar(x.reshape(Tp, 1, B), n, nbh, nbw)
    return (unv(q_l).astype(jnp.int32), uns(mode_l), uns(esc_l) != 0,
            unv(rec_l).astype(jnp.int32) + 128)


def decode_planes(res_planes: jnp.ndarray, modes: jnp.ndarray,
                  escape: jnp.ndarray, qstep: int, clip: bool,
                  interpret: bool = False):
    """res_planes [N, H, W] i32 (block-layout quantized coefficients when
    qstep > 0, exact residuals when qstep == 0), modes/escape [N, nbh, nbw]
    -> reconstructed planes [N, H, W] i32. Bit-identical to
    _wavefront_reconstruct_batch."""
    n, h, w = res_planes.shape
    nbh, nbw = h // 4, w // 4
    B = n * nbh
    k = _KDIAG
    masks = _skew_masks(nbh, nbw, n)
    Tp = masks.shape[0]
    s_m, _, ki, _, e_m = _consts()
    blk, msk, sca, const, scratch = _specs(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(Tp // k,),
        in_specs=[blk, msk, sca, sca, const((_NMODE * _NPOS, _NFEAT)),
                  const((16, 16)), const((9, 16))],
        out_specs=blk,
        scratch_shapes=scratch)
    out = pl.pallas_call(
        functools.partial(_dec_kernel, qstep=qstep, clip=clip, B=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp // k, k, 16, B),
                                       jnp.int8 if clip else jnp.int32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(_skew(res_planes).reshape(Tp // k, k, 16, B),
      masks.reshape(Tp // k, k, 4, B),
      _skew_scalar(modes.astype(jnp.int32), nbh, nbw).reshape(
          Tp // k, k, 1, B),
      _skew_scalar(escape.astype(jnp.int32), nbh, nbw).reshape(
          Tp // k, k, 1, B), s_m, ki, e_m)
    dec = _unskew(out.reshape(Tp, 16, B), n, h, w)
    return dec.astype(jnp.int32) + 128 if clip else dec
