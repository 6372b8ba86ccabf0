"""Motion search / compensation vs the scalar reference-semantics oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from vcs_h264_tpu.ops import motion
from oracles import (oracle_motion_search, oracle_motion_compensate)


def _pl(x):
    """HWC host frame -> planar CHW device layout."""
    return jnp.asarray(np.moveaxis(x, -1, 0), jnp.int32)


def _random_pair(rng, h, w, shift=(3, -5), noise=30):
    """A ref frame and a shifted+noised current frame."""
    ref = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    cur = np.roll(ref, shift, axis=(0, 1))
    idx = rng.integers(0, h * w, size=noise)
    cur = cur.copy()
    cur.reshape(-1, 3)[idx] = rng.integers(0, 256, (noise, 3))
    return cur, ref


@pytest.mark.parametrize("h,w", [(64, 64), (48, 80), (40, 48)])
def test_motion_search_exact_vs_oracle(rng, h, w):
    cur, ref = _random_pair(rng, h, w)
    want = oracle_motion_search(cur, ref)
    got = np.asarray(motion.motion_search(_pl(cur), _pl(ref)))
    np.testing.assert_array_equal(got, want)


def test_motion_search_smooth_frames(rng):
    """Smooth gradients exercise the static-block early-out heavily."""
    yy, xx = np.mgrid[0:64, 0:64]
    base = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    ref = np.stack([base, base // 2, 255 - base], axis=-1)
    cur = np.roll(ref, (6, 0), axis=(0, 1))
    want = oracle_motion_search(cur, ref)
    got = np.asarray(motion.motion_search(_pl(cur), _pl(ref)))
    np.testing.assert_array_equal(got, want)


def test_motion_search_identical_frames(rng):
    ref = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    got = np.asarray(motion.motion_search(_pl(ref), _pl(ref)))
    np.testing.assert_array_equal(got, 0)       # all static


def test_motion_search_on_real_frames():
    from conftest import load_test_frames
    frames = load_test_frames("/root/reference/videos/traffic_cut.mp4", 2)
    if len(frames) < 2:
        pytest.skip("test video unavailable")
    # downscale center crop to keep the scalar oracle fast
    cur = frames[1][100:180, 200:320]
    ref = frames[0][100:180, 200:320]
    want = oracle_motion_search(cur, ref)
    got = np.asarray(motion.motion_search(_pl(cur), _pl(ref)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bs", [4, 16])
def test_motion_search_block_size_sweep(rng, bs):
    """The reference's block-size sweep (Videos/MotionPrediction(NoRes)/
    output-traffic(4x4|8x8|16x16).mp4, Prototypes/match-block.py:40-43):
    bs != 8 with the reference's derived window (reach = 2*bs,
    motion.py:18) and step (round(bs/3), motion.py:132)."""
    reach, step = 2 * bs, max(1, round(bs / 3))
    cur, ref = _random_pair(rng, 4 * bs + bs, 6 * bs)
    want = oracle_motion_search(cur, ref, bs=bs, reach=reach, step=step)
    got = np.asarray(motion.motion_search(_pl(cur), _pl(ref), bs=bs,
                                          reach=reach, step=step))
    np.testing.assert_array_equal(got, want)
    # compensation at the swept block size
    from oracles import oracle_motion_compensate
    want_c = oracle_motion_compensate(want, ref, bs)
    got_c = np.moveaxis(np.asarray(motion.motion_compensate(
        jnp.asarray(want), _pl(ref), bs)), 0, -1).astype(np.uint8)
    np.testing.assert_array_equal(got_c, want_c)


def test_motion_compensate_vs_oracle(rng):
    cur, ref = _random_pair(rng, 48, 64)
    mv = oracle_motion_search(cur, ref)
    want = oracle_motion_compensate(mv, ref, 8)
    got = np.moveaxis(np.asarray(motion.motion_compensate(
        jnp.asarray(mv), _pl(ref), 8)), 0, -1).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_residual_wrap_roundtrip(rng):
    cur = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    recon = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    res = np.asarray(motion.residuals_wrap(
        jnp.asarray(cur, jnp.int32), jnp.asarray(recon, jnp.int32)))
    back = np.asarray(motion.reconstruct_wrap(
        jnp.asarray(recon, jnp.int32), jnp.asarray(res)))
    np.testing.assert_array_equal(back.astype(np.uint8), cur)
    # and the residual itself matches numpy uint8 wrap
    np.testing.assert_array_equal(res.astype(np.uint8), cur - recon)


def test_num_static_blocks():
    mv = np.zeros((4, 4, 2), np.int32)
    mv[0, 0] = (1, 0)
    assert int(motion.num_static_blocks(jnp.asarray(mv))) == 15
