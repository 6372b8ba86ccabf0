"""Quantization tables, quality scaling, zigzag scan.

Tables are the JPEG-standard luma/chroma matrices used by the reference
(`InterframeCompression/DCTcompressor.py:11-27`, `DCTCompression/dct.py:141-157`)
with the same quality-factor scaling (`DCTcompressor.py:30-38`):

    scale = 50/QF            (1 < QF < 50)
    scale = (100-QF)/50      (50 <= QF < 100)
    Q     = clip(round(Qbase * scale), 1, 255)

Two quantization modes exist because the reference itself disagrees with its
own study code:
  * "reference": `np.true_divide(d, Q)` with NO rounding
    (`DCTcompressor.py:71`) — float coefficients, lossless given exact
    dequantization. Used for bit-parity.
  * "rounded": `np.round(np.divide(d, Q))` (`dct.py:179`) — integer
    coefficients, the real codec path.

The zigzag scan (absent in the reference; named in the north star) orders
coefficients by diagonal for run-length coding in the bitstream layer.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# JPEG standard base tables (ref: DCTcompressor.py:11-27).
QY_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 48, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

QC_BASE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def qf_scale(qf: float) -> float:
    """Quality-factor -> table scale (ref: DCTcompressor.py:30-35)."""
    if not (1 <= qf <= 99):
        raise ValueError("quality factor must be in [1, 99]")
    if qf < 50:
        return 50.0 / qf
    return (100.0 - qf) / 50.0


@functools.lru_cache(maxsize=None)
def quant_tables_np(qf: float):
    """(QY, QC) scaled tables as float64, clipped to [1, 255]."""
    s = qf_scale(qf)
    qy = np.clip(np.round(QY_BASE * s), 1, 255)
    qc = np.clip(np.round(QC_BASE * s), 1, 255)
    return qy, qc


def quant_tables(qf: float, dtype=jnp.float32):
    """Stacked [3, 8, 8] table for (Y, Cr, Cb) channel order, on device."""
    qy, qc = quant_tables_np(qf)
    return jnp.asarray(np.stack([qy, qc, qc]), dtype=dtype)


def quantize(coeffs: jnp.ndarray, q: jnp.ndarray, rounded: bool) -> jnp.ndarray:
    """coeffs/q, optionally round-to-nearest (np.round = half-to-even).

    `coeffs` [..., bs, bs] float; `q` broadcastable table.
    """
    d = coeffs / q
    if rounded:
        # np.round is banker's rounding; jnp.round matches.
        d = jnp.round(d)
    return d


def dequantize(coeffs: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return coeffs * q


# ---------------------------------------------------------------------------
# Zigzag scan


@functools.lru_cache(maxsize=None)
def zigzag_order_np(n: int) -> np.ndarray:
    """Flat indices of an n x n block in zigzag (diagonal) scan order."""
    idx = []
    for s in range(2 * n - 1):
        diag = [(i, s - i) for i in range(max(0, s - n + 1), min(n, s + 1))]
        if s % 2 == 0:
            diag = diag[::-1]   # even diagonals run bottom-left -> top-right
        idx.extend(i * n + j for i, j in diag)
    return np.array(idx, dtype=np.int32)


def zigzag(blocks: jnp.ndarray) -> jnp.ndarray:
    """[..., n, n] -> [..., n*n] in zigzag order."""
    n = blocks.shape[-1]
    order = jnp.asarray(zigzag_order_np(n))
    flat = blocks.reshape(*blocks.shape[:-2], n * n)
    return flat[..., order]


def unzigzag(scans: jnp.ndarray) -> jnp.ndarray:
    """[..., n*n] zigzag -> [..., n, n]."""
    nn = scans.shape[-1]
    n = int(round(nn ** 0.5))
    order = zigzag_order_np(n)
    inv = np.empty_like(order)
    inv[order] = np.arange(nn, dtype=np.int32)
    flat = scans[..., jnp.asarray(inv)]
    return flat.reshape(*scans.shape[:-1], n, n)
