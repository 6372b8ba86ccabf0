"""Pallas SAD kernel vs the XLA families (interpret mode on CPU).

Hardware-mode exactness is checked by tools/check_pallas_tpu.py (the suite
runs on CPU, where the kernel runs interpreted)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

from vcs_h264_tpu.ops import motion as M


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    import vcs_h264_tpu.ops.motion_pallas as MP
    monkeypatch.setattr(MP.pl, "pallas_call", patched)
    return MP


@pytest.mark.parametrize("h,w", [(64, 64), (48, 80)])
def test_sad_kernel_matches_xla(rng, interpret_pallas, h, w):
    MP = interpret_pallas
    plan = M.make_plan(h, w, 8, 16, 3)
    cur = jnp.asarray(rng.integers(0, 256, (3, h, w)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (3, h, w)), jnp.int32)
    got = np.asarray(MP.sad_candidates_pallas(cur, ref, plan))
    want = np.asarray(M.sad_candidates(cur, ref, plan))
    valid = (plan.valid_i[:, None, :, None] & plan.valid_j[None, :, None, :])
    valid = valid.copy()
    valid[:, :plan.n_edge_j] = False       # left edge stitched by callers
    np.testing.assert_array_equal(got[valid], want[valid])


def test_sad_kernel_batch_matches_xla(rng, interpret_pallas):
    MP = interpret_pallas
    h, w, f = 64, 64, 3
    plan = M.make_plan(h, w, 8, 16, 3)
    curs = jnp.asarray(rng.integers(0, 256, (f, 3, h, w)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (3, h, w)), jnp.int32)
    got = np.asarray(MP.sad_candidates_pallas_batch(curs, ref, plan))
    valid = (plan.valid_i[:, None, :, None] & plan.valid_j[None, :, None, :])
    valid = valid.copy()
    valid[:, :plan.n_edge_j] = False
    for i in range(f):
        want = np.asarray(M.sad_candidates(curs[i], ref, plan))
        np.testing.assert_array_equal(got[i][valid], want[valid])


def test_motion_search_batch_pallas_backend(rng, interpret_pallas):
    """Full stitched search through the pallas path == reference oracle."""
    import sys
    sys.path.insert(0, "tests")
    from oracles import oracle_motion_search
    h, w = 64, 64
    ref_hwc = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    cur_hwc = np.roll(ref_hwc, (5, -7), axis=(0, 1))
    ref = jnp.asarray(np.moveaxis(ref_hwc, -1, 0), jnp.int32)
    curs = jnp.asarray(np.moveaxis(cur_hwc, -1, 0), jnp.int32)[None]
    got = np.asarray(M.motion_search_batch(curs, ref, backend="pallas"))[0]
    want = oracle_motion_search(cur_hwc, ref_hwc)
    np.testing.assert_array_equal(got, want)
