"""Pallas wavefront kernels == the lax.scan wavefront (interpret mode).

Hardware bit-exactness of the compiled Mosaic kernels is asserted by
tools/check_pallas_tpu.py (the CPU suite runs interpret mode, like
tests/test_motion_pallas.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vcs_h264_tpu.ops import intra, intra_pallas


def _planes(rng, n, h, w):
    return jnp.asarray(rng.integers(0, 256, (n, h, w)), jnp.int32)


@pytest.mark.parametrize("n,h,w", [(1, 16, 16), (2, 24, 40), (3, 20, 64)])
def test_encode_lossy_pallas_matches_scan(rng, n, h, w):
    planes = _planes(rng, n, h, w)
    qstep = 16
    want = intra.intra_encode4x4_lossy_batch(planes, qstep, backend="xla")
    got = intra_pallas.encode_lossy_planes(planes, qstep, interpret=True)
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


@pytest.mark.parametrize("qstep,clip", [(16, True), (0, False)])
def test_decode_pallas_matches_scan(rng, qstep, clip):
    n, h, w = 2, 24, 40
    planes = _planes(rng, n, h, w)
    if qstep:
        q, modes, esc, want = intra.intra_encode4x4_lossy_batch(
            planes, qstep, backend="xla")
        res = q
    else:
        # lossless intra: residual from the codec-facing search
        import jax
        res, modes, esc = jax.vmap(intra.luma4x4_codec)(planes)
        want = planes
    got = intra_pallas.decode_planes(
        res.astype(jnp.int32), modes.astype(jnp.int32), esc, qstep, clip,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_skew_roundtrip(rng):
    """The pad+reshape skew (diagonal t -> column t) inverts exactly."""
    n, h, w = 3, 28, 44
    planes = _planes(rng, n, h, w)
    lanes = intra_pallas._skew(planes)
    back = intra_pallas._unskew(lanes, n, h, w)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))
    nbh, nbw = h // 4, w // 4
    v = jnp.asarray(rng.integers(0, 9, (n, nbh, nbw)), jnp.int32)
    sl = intra_pallas._skew_scalar(v, nbh, nbw)
    np.testing.assert_array_equal(
        np.asarray(intra_pallas._unskew_scalar(sl, n, nbh, nbw)),
        np.asarray(v))
