"""NumPy oracles reproducing the reference's observable semantics.

These are independent reimplementations of the behaviors documented in
SURVEY.md §2/§3 (written from the behavioral spec, not copied code): uint8
wrap-around SAD, saturating static check, clamped step-grid search with
first-minimum tie-breaking, float64 DCT with unrounded quantization, and
truncating uint8 casts. They exist so every vectorized TPU op can be pinned
against the exact per-block scalar semantics.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Motion (spec: InterframeCompression/motion.py)

SIMILARITY_THRESHOLD = 2000


def oracle_find_match(ref, block, cj, ci, bs, reach, step):
    """Scalar search for one block; returns best (j, i) coordinate."""
    h, w = ref.shape[:2]
    colocated = ref[ci:ci + bs, cj:cj + bs]
    # saturating subtract, as cv2.subtract does on uint8
    sat = np.sum(np.maximum(colocated.astype(np.int32) - block.astype(np.int32), 0))
    if sat <= SIMILARITY_THRESHOLD:
        return cj, ci
    best_val = 9999999999
    best = (0, 0)
    i_lo, i_hi = max(ci - reach, 0), min(ci + reach, h)
    j_lo, j_hi = max(cj - reach, 0), min(cj + reach, w)
    for i in range(i_lo, i_hi, step):
        if i + bs >= i_hi:
            continue
        for j in range(j_lo, j_hi, step):
            if j + bs >= j_hi:
                continue
            cand = ref[i:i + bs, j:j + bs]
            # uint8 wrapping difference; abs of uint8 is identity
            val = int(np.sum((cand.astype(np.int64) - block.astype(np.int64)) % 256))
            if val < best_val:
                best_val = val
                best = (j, i)
    return best


def oracle_motion_search(cur, ref, bs=8, reach=16, step=3):
    """Full-frame motion vectors [(dx, dy)] grid [nbh, nbw, 2]."""
    h, w = cur.shape[:2]
    nbh, nbw = h // bs, w // bs
    mv = np.zeros((nbh, nbw, 2), np.int32)
    for bi in range(nbh):
        for bj in range(nbw):
            ci, cj = bi * bs, bj * bs
            block = cur[ci:ci + bs, cj:cj + bs]
            j, i = oracle_find_match(ref, block, cj, ci, bs, reach, step)
            mv[bi, bj] = (j - cj, i - ci)
    return mv


def oracle_motion_compensate(mv, ref, bs):
    h, w = ref.shape[:2]
    out = np.zeros_like(ref)
    for bi in range(h // bs):
        for bj in range(w // bs):
            i0 = bi * bs + mv[bi, bj, 1]
            j0 = bj * bs + mv[bi, bj, 0]
            out[bi * bs:bi * bs + bs, bj * bs:bj * bs + bs] = \
                ref[i0:i0 + bs, j0:j0 + bs]
    return out


# ---------------------------------------------------------------------------
# Transform / quantization (spec: DCTcompressor.py, dct.py)

def oracle_dct_matrix(n):
    m = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i == 0:
                m[i, j] = 1 / math.sqrt(n)
            else:
                m[i, j] = math.sqrt(2 / n) * math.cos((2 * j + 1) * i * math.pi / (2 * n))
    return m


def oracle_dct2(block):
    d = oracle_dct_matrix(block.shape[0])
    return d @ block @ d.T


def oracle_idct2(block):
    d = oracle_dct_matrix(block.shape[0])
    return d.T @ block @ d


def oracle_quant_tables(qf):
    qy = np.array([
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 48, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99]], np.float64)
    qc = np.array([
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99]], np.float64)
    scale = 50 / qf if qf < 50 else (100 - qf) / 50
    clip = lambda q: np.clip(np.round(q * scale), 1, 255)
    return clip(qy), clip(qc)


def oracle_compress_plane(plane_i16, q, bs, rounded):
    """One channel: blockwise dct then /q (unrounded = DCTcompressor.py:71;
    rounded = dct.py:179)."""
    h, w = plane_i16.shape
    out = np.zeros((h, w))
    for i in range(0, h, bs):
        for j in range(0, w, bs):
            d = oracle_dct2(plane_i16[i:i + bs, j:j + bs].astype(np.float64))
            d = d / q
            if rounded:
                d = np.round(d)
            out[i:i + bs, j:j + bs] = d
    return out


def oracle_decompress_plane(coef, q, bs):
    """One channel: blockwise *q then idct, truncating uint8 cast, +128
    (DCTcompressor.py:82-89)."""
    h, w = coef.shape
    out = np.zeros((h, w), np.uint8)
    for i in range(0, h, bs):
        for j in range(0, w, bs):
            d = oracle_idct2(coef[i:i + bs, j:j + bs] * q)
            out[i:i + bs, j:j + bs] = d.astype(np.uint8)  # trunc-mod-256
    return out + np.uint8(128)


def oracle_dct_compress(residual_bgr_u8, qf, bs):
    """Full reference DCT path on a residual frame: cv2 color split, -128,
    per-channel compress (DCTcompressor.py:49-74)."""
    import cv2
    ycc = cv2.cvtColor(residual_bgr_u8, cv2.COLOR_BGR2YCR_CB)
    qy, qc = oracle_quant_tables(qf)
    qs = [qy, qc, qc]
    planes = [ycc[..., c].astype(np.int16) - 128 for c in range(3)]
    return [oracle_compress_plane(p, q, bs, rounded=False)
            for p, q in zip(planes, qs)]


def oracle_dct_decompress(coefs, qf, bs):
    import cv2
    qy, qc = oracle_quant_tables(qf)
    qs = [qy, qc, qc]
    planes = [oracle_decompress_plane(c, q, bs) for c, q in zip(coefs, qs)]
    ycc = np.dstack(planes)
    return cv2.cvtColor(ycc, cv2.COLOR_YCR_CB2BGR).astype(np.uint8)


# ---------------------------------------------------------------------------
# End-to-end codec (spec: encoder.py / decoder.py / main.py)

def oracle_encode_decode(frames, gop_len=4, bs=8, with_dct=True, qf=50.0,
                         reach=16, step=3):
    """Encode + decode the frame list; returns reconstructed uint8 frames."""
    refs = {}
    out = []
    for n, frame in enumerate(frames):
        if n % gop_len == 0:
            refs[n // gop_len] = frame
            out.append(frame.copy())
            continue
        ref = refs[n // gop_len]
        mv = oracle_motion_search(frame, ref, bs, reach, step)
        recon = oracle_motion_compensate(mv, ref, bs)
        resid = frame - recon                      # uint8 wrap
        if with_dct:
            coefs = oracle_dct_compress(resid, qf, bs)
            resid = oracle_dct_decompress(coefs, qf, bs)
        out.append(recon + resid)                  # uint8 wrap
    return out
