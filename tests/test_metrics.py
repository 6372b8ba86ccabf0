"""Quality metrics (utils/metrics.py)."""

import numpy as np

from vcs_h264_tpu.utils.metrics import psnr, sparsity, ssim


def test_psnr_identity_and_scale():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (64, 64, 3), np.uint8)
    assert psnr(x, x) == float("inf")
    y = np.clip(x.astype(np.int32) + 16, 0, 255)
    # uniform offset 16: PSNR ~ 20*log10(255/16) ~= 24 dB
    assert 23.0 < psnr(x, y) < 25.0


def test_ssim_windowed():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (96, 96), np.uint8)
    assert abs(ssim(x, x) - 1.0) < 1e-9
    noisy = np.clip(x.astype(np.int32)
                    + rng.integers(-20, 21, x.shape), 0, 255)
    s_noisy = ssim(x, noisy)
    assert 0.0 < s_noisy < 1.0
    shuffled = rng.permutation(x.ravel()).reshape(x.shape)
    # structural destruction scores far below mild noise
    assert ssim(x, shuffled) < s_noisy * 0.5
    # windowed: a LOCAL structural change moves the score even when global
    # statistics stay identical (the round-1 single-window version scored
    # any permutation of a flat histogram near 1)
    x3 = np.dstack([x] * 3)
    assert abs(ssim(x3, x3) - 1.0) < 1e-9


def test_sparsity():
    x = np.zeros((10, 10))
    x[0, 0] = 5
    assert abs(sparsity(x) - 0.99) < 1e-12
