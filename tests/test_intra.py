"""Vectorized intra mode search vs the scalar reference-semantics oracle.

(The oracle's predictor functions are themselves validated bit-exact against
the reference's intramodes.py — see tests/oracle_intra.py docstring.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from vcs_h264_tpu.ops import intra
from oracle_intra import oracle_luma4x4, oracle_luma16x16, oracle_chroma8x8


def _plane(rng, h, w):
    base = rng.integers(0, 256, (h, w), dtype=np.uint8)
    # add smooth regions so non-DC modes actually win sometimes
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = ((yy * 2 + xx * 5) % 256).astype(np.uint8)
    mix = np.where((xx // 16) % 2 == 0, base, smooth)
    return mix.astype(np.uint8)


@pytest.mark.parametrize("h,w", [(32, 32), (48, 64)])
def test_luma4x4_exact(rng, h, w):
    y = _plane(rng, h, w)
    want_res, want_pred, want_modes = oracle_luma4x4(y)
    res, pred, modes = (np.asarray(x) for x in
                        intra.luma4x4(jnp.asarray(y, jnp.int32)))
    np.testing.assert_array_equal(modes, want_modes)
    np.testing.assert_array_equal(pred, want_pred)
    np.testing.assert_array_equal(res, want_res)


def test_luma4x4_smooth_gradient(rng):
    yy, xx = np.mgrid[0:32, 0:32]
    y = ((yy * 3 + xx) % 256).astype(np.uint8)
    want_res, want_pred, want_modes = oracle_luma4x4(y)
    res, pred, modes = (np.asarray(x) for x in
                        intra.luma4x4(jnp.asarray(y, jnp.int32)))
    np.testing.assert_array_equal(modes, want_modes)
    np.testing.assert_array_equal(res, want_res)


def test_luma4x4_extreme_values(rng):
    """Saturated values exercise the 3*x uint8 wrap taps."""
    y = rng.choice(np.array([0, 1, 127, 128, 254, 255], np.uint8),
                   size=(32, 32)).astype(np.uint8)
    want_res, want_pred, want_modes = oracle_luma4x4(y)
    res, pred, modes = (np.asarray(x) for x in
                        intra.luma4x4(jnp.asarray(y, jnp.int32)))
    np.testing.assert_array_equal(modes, want_modes)
    np.testing.assert_array_equal(res, want_res)


def test_luma4x4_real_image():
    import cv2
    img = cv2.imread("/root/reference/images/happy-corgi.jpg")
    if img is None:
        pytest.skip("image unavailable")
    y = cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB)[..., 0][:64, :96]
    want_res, want_pred, want_modes = oracle_luma4x4(y)
    res, pred, modes = (np.asarray(x) for x in
                        intra.luma4x4(jnp.asarray(y, jnp.int32)))
    np.testing.assert_array_equal(modes, want_modes)
    np.testing.assert_array_equal(res, want_res)


def test_luma16x16_exact(rng):
    y = _plane(rng, 64, 80)
    want_res, want_pred, want_modes = oracle_luma16x16(y)
    res, pred, modes = (np.asarray(x) for x in
                        intra.luma16x16(jnp.asarray(y, jnp.int32)))
    np.testing.assert_array_equal(modes, want_modes)
    np.testing.assert_array_equal(res, want_res)
    np.testing.assert_array_equal(pred, want_pred)


def test_chroma8x8_exact(rng):
    cr = _plane(rng, 32, 48)
    cb = _plane(rng, 32, 48)
    want = oracle_chroma8x8(cr, cb)
    got = [np.asarray(x) for x in
           intra.chroma8x8(jnp.asarray(cr, jnp.int32),
                           jnp.asarray(cb, jnp.int32))]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_intra_residual_lossless(rng):
    """pred + residual reconstructs the source exactly (the property the
    reference's plots rely on)."""
    y = _plane(rng, 32, 32)
    res, pred, _ = intra.luma4x4(jnp.asarray(y, jnp.int32))
    np.testing.assert_array_equal(np.asarray(res + pred), y)


def test_intra_wavefront_decode_lossless(rng):
    """decode(residual, modes) == source, using only decoder-visible data."""
    y = _plane(rng, 32, 48)
    res, modes, escape = intra.luma4x4_codec(jnp.asarray(y, jnp.int32))
    recon = np.asarray(intra.intra_decode4x4(res, modes, escape))
    np.testing.assert_array_equal(recon, y)


def test_intra_wavefront_decode_real_image():
    import cv2
    img = cv2.imread("/root/reference/images/happy-corgi.jpg")
    if img is None:
        pytest.skip("image unavailable")
    y = cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB)[..., 0][:96, :128]
    res, modes, escape = intra.luma4x4_codec(jnp.asarray(y, jnp.int32))
    recon = np.asarray(intra.intra_decode4x4(res, modes, escape))
    np.testing.assert_array_equal(recon, y)


def test_luma4x4_codec_consistent_with_study(rng):
    """codec variant's residual/modes match the parity-mode function."""
    y = _plane(rng, 32, 32)
    res1, _, modes1 = intra.luma4x4(jnp.asarray(y, jnp.int32))
    res2, modes2, escape = intra.luma4x4_codec(jnp.asarray(y, jnp.int32))
    np.testing.assert_array_equal(np.asarray(res1), np.asarray(res2))
    np.testing.assert_array_equal(np.asarray(modes1), np.asarray(modes2))
    assert not np.asarray(escape).any()     # natural images never escape
