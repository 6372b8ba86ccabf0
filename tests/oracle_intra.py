"""Scalar NumPy oracle for the intra mode search (reference semantics).

Follows the reference's data flow (uint8 plane slices, float 128 fills, float
prediction buffers) so numpy's own dtype rules reproduce the wrap behaviors
documented in SURVEY.md §7 — 3*x overflow in uint8 for the downleft /
horizontal-up edge taps, u+l wrap in dc4x4 — without emulating them by hand.

The chroma oracle fixes the reference's `Cbres` typo (intraframe.py:266): the
Cb "up" neighbor reads the Cb plane, matching vcs_h264_tpu.ops.intra.
"""

import numpy as np


def _vert(u, n):
    p = np.zeros((n, n))
    p[:] = u
    return p


def _horiz(l, n):
    p = np.zeros((n, n))
    p[:] = np.asarray(l).reshape(n, 1)
    return p


def _dc4(u, l):
    return np.ones((4, 4)) * (np.sum(u + l) // 8)


def _dc_big(u, l, n):
    return np.ones((n, n)) * ((np.sum(u) + np.sum(l)) // (2 * n))


def _downleft(u, ur):
    p = np.zeros((4, 4))
    t = [u[0] // 4 + u[1] // 2 + u[2] // 4,
         u[1] // 4 + u[2] // 2 + u[3] // 4,
         u[2] // 4 + u[3] // 2 + ur[0] // 4,
         u[3] // 4 + ur[0] // 2 + ur[1] // 4,
         ur[0] // 4 + ur[1] // 2 + ur[2] // 4,
         ur[1] // 4 + ur[2] // 2 + ur[3] // 4,
         ur[2] // 4 + 3 * ur[3] // 4]
    for r in range(4):
        for c in range(4):
            p[r, c] = t[r + c]
    return p


def _downright(ul, u, l):
    p = np.zeros((4, 4))
    d = {3: u[1] // 4 + u[2] // 2 + u[3] // 4,
         2: u[0] // 4 + u[1] // 2 + u[2] // 4,
         1: ul // 4 + u[0] // 2 + u[1] // 4,
         0: ul // 4 + u[0] // 2 + l[0] // 4,
         -1: u[0] // 4 + l[0] // 2 + l[1] // 4,
         -2: l[0] // 4 + l[1] // 2 + l[2] // 4,
         -3: l[1] // 4 + l[2] // 2 + l[3] // 4}
    for r in range(4):
        for c in range(4):
            p[r, c] = d[c - r]
    return p


def _vertright(ul, u, l):
    a = [ul // 2 + u[0] // 2, u[0] // 2 + u[1] // 2,
         u[1] // 2 + u[2] // 2, u[2] // 2 + u[3] // 2]
    b = [u[0] // 4 + ul // 2 + l[0] // 4, ul // 4 + u[0] // 2 + u[1] // 4,
         u[0] // 4 + u[1] // 2 + u[2] // 4, u[1] // 4 + u[2] // 2 + u[3] // 4]
    c0 = ul // 4 + l[0] // 2 + l[1] // 4
    d0 = l[0] // 4 + l[1] // 2 + l[2] // 4
    return np.array([a, b, [c0, a[0], a[1], a[2]], [d0, b[0], b[1], b[2]]],
                    dtype=np.float64)


def _horizdown(ul, u, l):
    a = [ul // 2 + l[0] // 2, u[0] // 4 + ul // 2 + l[0] // 4,
         ul // 4 + u[0] // 2 + u[1] // 4, u[0] // 4 + u[1] // 2 + u[2] // 4]
    b = [l[0] // 2 + l[1] // 2, ul // 4 + l[1] // 2 + l[2] // 4]
    c = [l[1] // 2 + l[2] // 2, l[0] // 4 + l[1] // 2 + l[2] // 4]
    d = [l[2] // 2 + l[3] // 2, l[1] // 4 + l[2] // 2 + l[3] // 4]
    return np.array([a, [b[0], b[1], a[0], a[1]],
                     [c[0], c[1], b[0], b[1]],
                     [d[0], d[1], c[0], c[1]]], dtype=np.float64)


def _vertleft(u, ur):
    a = [u[0] // 2 + u[1] // 2, u[1] // 2 + u[2] // 2,
         u[2] // 2 + u[3] // 2, u[3] // 2 + ur[0] // 2,
         ur[0] // 2 + ur[1] // 2]
    b = [u[0] // 4 + u[1] // 2 + u[2] // 4, u[1] // 4 + u[2] // 2 + u[3] // 4,
         u[2] // 4 + u[3] // 2 + ur[0] // 4, u[3] // 4 + ur[0] // 2 + ur[1] // 4,
         ur[0] // 4 + ur[1] // 2 + ur[2] // 4]
    return np.array([a[:4], b[:4], a[1:5], b[1:5]], dtype=np.float64)


def _horizup(l):
    a = [l[0] // 2 + l[1] // 2, l[0] // 4 + l[1] // 2 + l[2] // 4,
         l[1] // 2 + l[2] // 2, l[1] // 4 + l[2] // 2 + l[3] // 4]
    b2 = l[2] // 2 + l[3] // 2
    b3 = l[2] // 4 + 3 * l[3] // 4
    c = l[3]
    return np.array([a, [a[2], a[3], b2, b3], [b2, b3, c, c],
                     [c, c, c, c]], dtype=np.float64)


def _neigh4(Y, i, j, nbw):
    """Reference neighbor extraction (intraframe.py:36-77)."""
    iM, jM = i // 4, j // 4
    s = [False] * 4  # ul, u, ur, l
    if iM == 0 and jM == 0:
        pass
    elif iM == 0:
        s[3] = True
    elif jM == 0:
        s[1] = True
        s[2] = True
    elif jM + 1 == nbw:
        s[0] = s[1] = s[3] = True
    else:
        s = [True] * 4
    ul = Y[i - 1, j - 1] if s[0] else 128
    u = Y[i - 1, j:j + 4] if s[1] else np.ones(4) * 128
    if s[2]:
        ur = Y[i - 1, j + 4:j + 8]
    elif s[1]:
        ur = np.ones(4) * Y[i - 1, j + 3]
    else:
        ur = np.ones(4) * 128
    l = Y[i:i + 4, j - 1] if s[3] else np.ones(4) * 128
    return ul, u, ur, l


def oracle_luma4x4(Y):
    Y = np.asarray(Y, dtype=np.uint8)
    h, w = Y.shape
    res = np.zeros((h, w))
    pred = np.zeros((h, w))
    modes = np.zeros((h // 4, w // 4), np.int32)
    for i in range(0, h, 4):
        for j in range(0, w, 4):
            ul, u, ur, l = _neigh4(Y, i, j, w // 4)
            cands = [_vert(u, 4), _horiz(l, 4), _dc4(u, l),
                     _downleft(u, ur), _downright(ul, u, l),
                     _vertright(ul, u, l), _horizdown(ul, u, l),
                     _vertleft(u, ur), _horizup(l)]
            block = Y[i:i + 4, j:j + 4]
            best, bestm, bestp = 16 * 255, 0, np.zeros((4, 4))
            for m, p in enumerate(cands):
                d = np.sum(np.abs(p - block))
                if d < best:
                    best, bestm, bestp = d, m, p
            res[i:i + 4, j:j + 4] = block - bestp
            pred[i:i + 4, j:j + 4] = bestp
            modes[i // 4, j // 4] = bestm
    return res, pred, modes


def _neigh_vhdc(plane, i, j, n):
    iM, jM = i // n, j // n
    u_ok = iM > 0
    l_ok = jM > 0
    u = plane[i - 1, j:j + n] if u_ok else np.ones(n) * 128
    l = plane[i:i + n, j - 1] if l_ok else np.ones(n) * 128
    return u, l


def oracle_luma16x16(Y):
    Y = np.asarray(Y, dtype=np.uint8)
    h, w = Y.shape
    res = np.zeros((h, w))
    pred = np.zeros((h, w))
    modes = np.zeros((h // 16, w // 16), np.int32)
    for i in range(0, h, 16):
        for j in range(0, w, 16):
            u, l = _neigh_vhdc(Y, i, j, 16)
            cands = [_vert(u, 16), _horiz(l, 16), _dc_big(u, l, 16)]
            block = Y[i:i + 16, j:j + 16]
            best, bestm, bestp = 16 * 16 * 255, 0, np.zeros((16, 16))
            for m, p in enumerate(cands):
                d = np.sum(np.abs(p - block))
                if d < best:
                    best, bestm, bestp = d, m, p
            res[i:i + 16, j:j + 16] = block - bestp
            pred[i:i + 16, j:j + 16] = bestp
            modes[i // 16, j // 16] = bestm
    return res, pred, modes


def oracle_chroma8x8(Cr, Cb):
    Cr = np.asarray(Cr, np.uint8)
    Cb = np.asarray(Cb, np.uint8)
    h, w = Cr.shape
    out = [np.zeros((h, w)) for _ in range(4)]   # crres, crpred, cbres, cbpred
    modes = np.zeros((h // 8, w // 8), np.int32)
    for i in range(0, h, 8):
        for j in range(0, w, 8):
            ur_, lr_ = _neigh_vhdc(Cr, i, j, 8)
            ub_, lb_ = _neigh_vhdc(Cb, i, j, 8)
            cands_r = [_vert(ur_, 8), _horiz(lr_, 8), _dc_big(ur_, lr_, 8)]
            cands_b = [_vert(ub_, 8), _horiz(lb_, 8), _dc_big(ub_, lb_, 8)]
            br = Cr[i:i + 8, j:j + 8]
            bb = Cb[i:i + 8, j:j + 8]
            best, bestm = 2 * 8 * 8 * 255, 0
            bpr = bpb = np.zeros((8, 8))
            for m in range(3):
                d = (np.sum(np.abs(cands_r[m] - br))
                     + np.sum(np.abs(cands_b[m] - bb)))
                if d < best:
                    best, bestm, bpr, bpb = d, m, cands_r[m], cands_b[m]
            out[0][i:i + 8, j:j + 8] = br - bpr
            out[1][i:i + 8, j:j + 8] = bpr
            out[2][i:i + 8, j:j + 8] = bb - bpb
            out[3][i:i + 8, j:j + 8] = bpb
            modes[i // 8, j // 8] = bestm
    return (*out, modes)
