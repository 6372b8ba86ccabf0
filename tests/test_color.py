"""Color conversion must be bit-exact with OpenCV's uint8 path."""

import cv2
import numpy as np

from vcs_h264_tpu.ops import color


def test_bgr_to_ycrcb_matches_cv2(rng):
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    ours = np.asarray(color.bgr_to_ycrcb(img)).astype(np.uint8)
    theirs = cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB)
    np.testing.assert_array_equal(ours, theirs)


def test_ycrcb_to_bgr_matches_cv2(rng):
    img = rng.integers(0, 256, (41, 29, 3), dtype=np.uint8)
    ours = np.asarray(color.ycrcb_to_bgr(img)).astype(np.uint8)
    theirs = cv2.cvtColor(img, cv2.COLOR_YCR_CB2BGR)
    np.testing.assert_array_equal(ours, theirs)


def test_roundtrip_extremes():
    # all 256 gray levels plus saturated corners
    v = np.arange(256, dtype=np.uint8)
    img = np.stack([v, v[::-1], np.roll(v, 64)], axis=-1).reshape(16, 16, 3)
    ours = np.asarray(color.bgr_to_ycrcb(img)).astype(np.uint8)
    np.testing.assert_array_equal(ours, cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB))
    back = np.asarray(color.ycrcb_to_bgr(ours)).astype(np.uint8)
    np.testing.assert_array_equal(back, cv2.cvtColor(ours, cv2.COLOR_YCR_CB2BGR))


def test_batched_shapes(rng):
    imgs = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(color.bgr_to_ycrcb(imgs))
    for i in range(4):
        np.testing.assert_array_equal(
            out[i].astype(np.uint8), cv2.cvtColor(imgs[i], cv2.COLOR_BGR2YCR_CB))


def test_chroma_study_float_constants():
    # spec: ChromaSubsampling/chroma.py:33-40
    y = np.array([[100.0]]); cr = np.array([[200.0]]); cb = np.array([[50.0]])
    r, g, b = color.ycrcb_to_rgb_float(y, cr, cb)
    assert np.isclose(float(r[0, 0]), min(255, 100 + 1.4022 * 72), atol=1e-3)
    assert np.isclose(float(g[0, 0]), 100 - 0.34414 * -78 - 0.71414 * 72, atol=1e-3)
    assert np.isclose(float(b[0, 0]), max(0, 100 + 1.772 * -78), atol=1e-3)
