"""Quality metrics + structured per-frame logging.

The reference has no quality metric at all (BASELINE.md: "no PSNR code
exists"); its only statistics are sparsity printouts (`dct.py:188-191`,
`intraframe.py:360-365`) and static-block counts (`motion.py:67-68`). The
north star's acceptance metric is PSNR, so PSNR/SSIM live here, plus the
bits-proxy (nonzero coefficient count) and JSONL metrics logging
(SURVEY.md §5 observability plan).
"""

from __future__ import annotations

import json
import time
from typing import IO

import numpy as np
import jax.numpy as jnp


def psnr(a, b, max_val: float = 255.0) -> float:
    """Peak signal-to-noise ratio between two uint8-valued arrays."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))


def psnr_jnp(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0):
    """Device-side PSNR (for jitted metric fusion)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    mse = jnp.mean((af - bf) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-10))


def ssim(a, b, max_val: float = 255.0, win: int = 8) -> float:
    """Mean local SSIM over sliding uniform windows (win x win, per
    channel), the standard structural similarity formulation with a uniform
    filter in place of the 11x11 Gaussian. Inputs are HxW or HxWxC
    uint8-valued arrays."""
    from scipy.ndimage import uniform_filter
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.ndim == 3:                    # per-channel mean
        return float(np.mean([ssim(a[..., c], b[..., c], max_val, win)
                              for c in range(a.shape[-1])]))
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = uniform_filter(a, win)
    mu_b = uniform_filter(b, win)
    va = uniform_filter(a * a, win) - mu_a * mu_a
    vb = uniform_filter(b * b, win) - mu_b * mu_b
    cov = uniform_filter(a * b, win) - mu_a * mu_b
    s = (((2 * mu_a * mu_b + c1) * (2 * cov + c2))
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    # crop the filter's edge-padded border
    m = win // 2
    return float(s[m:-m or None, m:-m or None].mean())


def sparsity(x) -> float:
    """1 - nonzeros/size (the reference's compression statistic,
    dct.py:188-191)."""
    x = np.asarray(x)
    return float(1.0 - np.count_nonzero(x) / x.size)


class MetricsLogger:
    """Append-only JSONL metrics sink."""

    def __init__(self, path_or_file):
        if hasattr(path_or_file, "write"):
            self._fh: IO = path_or_file
            self._owns = False
        else:
            self._fh = open(path_or_file, "a")
            self._owns = True

    def log(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event}
        rec.update(fields)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._owns:
            self._fh.close()
