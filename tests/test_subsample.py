"""4:2:0 subsampling vs cv2 / the chroma study's scalar semantics."""

import cv2
import numpy as np
import jax.numpy as jnp

from vcs_h264_tpu.ops import subsample


def test_box_filter_matches_cv2(rng):
    for shape in [(16, 16), (9, 13), (33, 64)]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        want = cv2.boxFilter(x, ddepth=-1, ksize=(2, 2))
        got = np.asarray(subsample.box_filter_2x2(
            jnp.asarray(x, jnp.int32))).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def test_subsample_matches_reference_flow(rng):
    x = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    want = cv2.boxFilter(x, ddepth=-1, ksize=(2, 2))[::2, ::2]
    got = np.asarray(subsample.subsample_420(jnp.asarray(x, jnp.int32)))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_upsample_nearest():
    x = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    up = np.asarray(subsample.upsample_nearest(x))
    np.testing.assert_array_equal(
        up, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])


def _oracle_chroma_study(img):
    """Scalar reimplementation of chroma.py:9-40."""
    ycc = cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB)
    cr = cv2.boxFilter(ycc[:, :, 1], ddepth=-1, ksize=(2, 2))[::2, ::2]
    cb = cv2.boxFilter(ycc[:, :, 2], ddepth=-1, ksize=(2, 2))[::2, ::2]
    rows, cols = img.shape[:2]
    out = np.zeros_like(img)
    for i in range(rows):
        for j in range(cols):
            y = ycc[i, j, 0]
            crv = cr[i // 2, j // 2]
            cbv = cb[i // 2, j // 2]
            r = y + 1.4022 * (crv - 128.0)
            g = y - 0.34414 * (cbv - 128.0) - 0.71414 * (crv - 128.0)
            b = y + 1.772 * (cbv - 128.0)
            out[i, j] = [max(0, min(255, b)), max(0, min(255, g)),
                         max(0, min(255, r))]
    return out


def test_chroma_roundtrip_matches_study(rng):
    img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    want = _oracle_chroma_study(img)
    planes = jnp.asarray(img.transpose(2, 0, 1), jnp.int32)
    got = np.asarray(subsample.chroma_420_roundtrip(planes))
    got_hwc = got.transpose(1, 2, 0).astype(np.uint8)
    np.testing.assert_array_equal(got_hwc, want)


def test_encode_decode_420_shapes(rng):
    ycc = jnp.asarray(rng.integers(0, 256, (3, 24, 32)), jnp.int32)
    y, cr, cb = subsample.encode_420(ycc)
    assert y.shape == (24, 32) and cr.shape == (12, 16) and cb.shape == (12, 16)
    back = subsample.decode_420(y, cr, cb)
    assert back.shape == (3, 24, 32)
    np.testing.assert_array_equal(np.asarray(back[0]), np.asarray(y))
