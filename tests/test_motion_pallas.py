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


@pytest.mark.parametrize("h,w,reach", [(64, 64, 16), (48, 80, 16),
                                       (64, 128, 8)])
def test_compensate_kernel_matches_gather(rng, interpret_pallas, h, w, reach):
    """Pallas compensation == per-block dynamic_slice gather for arbitrary
    in-window displacements."""
    MP = interpret_pallas
    bs, g, f = 8, 2, 3
    nbh, nbw = h // bs, w // bs
    refs = jnp.asarray(rng.integers(0, 256, (g, 3, h, w)), jnp.int32)
    # displacements anywhere in [-reach, reach], clamped to stay in frame
    mv = rng.integers(-reach, reach + 1, (g, f, nbh, nbw, 2))
    ci = np.arange(nbh)[:, None] * bs
    cj = np.arange(nbw)[None, :] * bs
    mv[..., 1] = np.clip(mv[..., 1], -ci, h - bs - ci)
    mv[..., 0] = np.clip(mv[..., 0], -cj, w - bs - cj)
    mv = jnp.asarray(mv, jnp.int32)
    got = np.asarray(MP.motion_compensate_pallas_gops(mv, refs, bs, reach))
    want = np.asarray(M.motion_compensate_gops(mv, refs, bs=bs, reach=reach,
                                               backend="xla"))
    np.testing.assert_array_equal(got, want)


def test_compensate_kernel_on_search_output(rng, interpret_pallas):
    """Kernel fed by real search output (exercises static/fallback MVs)."""
    MP = interpret_pallas
    h, w, bs = 64, 64, 8
    ref_hwc = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    cur_hwc = np.roll(ref_hwc, (5, -7), axis=(0, 1))
    refs = jnp.asarray(np.moveaxis(ref_hwc, -1, 0), jnp.int32)[None]
    curs = jnp.asarray(np.moveaxis(cur_hwc, -1, 0), jnp.int32)[None, None]
    mv = M.motion_search_gops(curs, refs, backend="xla")    # [1,1,nbh,nbw,2]
    got = np.asarray(MP.motion_compensate_pallas_gops(mv, refs, bs, 16))
    want = np.asarray(M.motion_compensate_gops(mv, refs, bs=bs, reach=16,
                                               backend="xla"))
    np.testing.assert_array_equal(got, want)


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
