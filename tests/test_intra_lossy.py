"""Lossy closed-loop intra codec (the reference's commented-out 4x4 integer
DCT of intra residuals, `intraframe.py:14-22,352-358`, realized properly).

Checks: exact transform algebra, bit-exact encode/decode closed loop,
quality monotone in qstep, and rate (nonzero coefficients) decreasing in
qstep on a real image.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vcs_h264_tpu.ops import intra
from vcs_h264_tpu.models.intra_codec import (encode_intra_frame_lossy,
                                             decode_intra_frame_lossy)

CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
              dtype=np.float64)
CI = np.array([[1, 1, 1, .5], [1, .5, -1, -1], [1, -.5, -1, 1],
               [1, -1, 1, -.5]], dtype=np.float64)


def test_core4_fwd_matches_reference_matrices(rng):
    """core4_fwd is exactly the reference's DCTTransform sandwich
    (intraframe.py:352-358 commented loop body)."""
    x = rng.integers(-255, 256, (7, 4, 4)).astype(np.int32)
    got = np.asarray(intra.core4_fwd(jnp.asarray(x)))
    want = np.einsum("ij,bjk,lk->bil", CF, x.astype(np.float64), CF)
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_core4_inverse_algebra(rng):
    """Ci ((Cf X Cfᵀ) ⊙ G) Ciᵀ == X exactly, G = ggᵀ, g=(1/4,1/5,1/4,1/5)."""
    g = np.array([.25, .2, .25, .2])
    x = rng.integers(-255, 256, (4, 4)).astype(np.float64)
    r = CI @ ((CF @ x @ CF.T) * np.outer(g, g)) @ CI.T
    np.testing.assert_allclose(r, x, atol=1e-9)


@pytest.mark.parametrize("qstep", [1, 4, 16])
def test_quant_roundtrip_error_bound(rng, qstep):
    """Pixel-domain error of quant→dequant-inverse is bounded by the
    transform gain: |X̂ - X| <= ~6*qstep (empirically ~3.5*qstep + 2)."""
    x = jnp.asarray(rng.integers(-255, 256, (64, 4, 4)).astype(np.int32))
    q = intra.core4_quant(intra.core4_fwd(x), qstep)
    back = np.asarray(intra.core4_dequant_inv(q, qstep))
    assert np.max(np.abs(back - np.asarray(x))) <= 2 + 4 * qstep


@pytest.mark.parametrize("qstep", [1, 8])
def test_closed_loop_bit_exact(rng, qstep):
    """decode(encode(y)) equals the encoder's own recon bit-for-bit — the
    property that lets inter frames reference lossy-coded I frames."""
    y = jnp.asarray(rng.integers(0, 256, (32, 40)).astype(np.int32))
    qpl, modes, escape, recon = intra.intra_encode4x4_lossy(y, qstep)
    dec = intra.intra_decode4x4_lossy(qpl, modes, escape, qstep)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(recon))


def test_quality_monotone_and_near_lossless(rng):
    base = rng.integers(0, 200, (48, 48)).astype(np.float32)
    # smooth-ish content so prediction has something to work with
    k = np.ones((5, 5)) / 25.0
    y = np.zeros_like(base)
    for i in range(48):
        for j in range(48):
            y[i, j] = base[max(0, i - 2):i + 3, max(0, j - 2):j + 3].mean()
    y = jnp.asarray(y.astype(np.int32))

    def psnr_at(qstep):
        qpl, modes, esc, recon = intra.intra_encode4x4_lossy(y, qstep)
        err = np.asarray(recon) - np.asarray(y)
        mse = np.mean(err.astype(np.float64) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    p1, p4, p16 = psnr_at(1), psnr_at(4), psnr_at(16)
    assert p1 >= 45.0, p1
    assert p1 >= p4 >= p16, (p1, p4, p16)


def test_frame_level_roundtrip_and_rate(rng):
    """Channel-vmapped frame codec: decode == recon, and nonzero
    coefficients (the rate proxy) shrink as qstep grows."""
    import cv2
    img = cv2.imread("/root/reference/images/happy-corgi.jpg")
    if img is None:
        img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    img = img[:128, :160]
    planes = jnp.asarray(img.transpose(2, 0, 1).astype(np.int32))
    nnz = {}
    for qstep in (1, 8):
        enc, recon = encode_intra_frame_lossy(planes, qstep)
        dec = decode_intra_frame_lossy(enc, qstep)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(recon))
        nnz[qstep] = int(np.count_nonzero(np.asarray(enc.qcoef)))
    assert nnz[8] < nnz[1]
