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

    nbh, nbw = h // 4, w // 4
    plan = intra._wavefront_plan(nbh, nbw)
    orig_l = intra._pm_lanes_of_blocks(
        intra._pm_blocks_of_planes(planes), plan)
    q_l, mode_l, esc_l, rec_l = intra_pallas.encode_lossy_lanes(
        orig_l, plan, qstep, interpret=True)
    got = (intra._pm_planes_of_blocks(
               intra._pm_blocks_of_lanes(q_l, plan), h, w),
           intra._pm_scalars_of_lanes(mode_l, plan).reshape(n, nbh, nbw),
           intra._pm_scalars_of_lanes(esc_l, plan).reshape(n, nbh, nbw),
           intra._pm_planes_of_blocks(
               intra._pm_blocks_of_lanes(rec_l, plan), h, w))
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


@pytest.mark.parametrize("qstep,clip", [(16, True), (0, False)])
def test_decode_pallas_matches_scan(rng, qstep, clip):
    n, h, w = 2, 24, 40
    planes = _planes(rng, n, h, w)
    nbh, nbw = h // 4, w // 4
    plan = intra._wavefront_plan(nbh, nbw)
    if qstep:
        q, modes, esc, want = intra.intra_encode4x4_lossy_batch(
            planes, qstep, backend="xla")
        res_blocks = intra._pm_blocks_of_planes(q)
    else:
        # lossless intra: residual from the codec-facing search
        import jax
        res, modes, esc = jax.vmap(intra.luma4x4_codec)(planes)
        want = planes
        res_blocks = intra._pm_blocks_of_planes(res)
    out_l = intra_pallas.decode_lanes(
        intra._pm_lanes_of_blocks(res_blocks, plan),
        intra._pm_lanes_of_scalars(
            modes.reshape(n, -1).astype(jnp.int32), plan),
        intra._pm_lanes_of_scalars(esc.reshape(n, -1), plan),
        plan, qstep, clip, interpret=True)
    got = intra._pm_planes_of_blocks(
        intra._pm_blocks_of_lanes(out_l, plan), h, w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
