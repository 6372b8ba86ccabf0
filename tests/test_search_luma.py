"""cfg.search_luma_only: H.264-style luma-only motion estimation.

The flag is an encoder-side choice (stored MVs drive full-channel
compensation), so the contract to pin is (a) the searched inputs really are
the G channel with the 1/3-scaled static threshold, (b) the closed-loop
roundtrip still decodes, at quality on par with the 3-channel search, and
(c) sharded == unsharded under the flag (the tile search mirrors the
pipeline's input slicing). Reference lineage: the 3-channel SAD semantics
being relaxed are `InterframeCompression/motion.py:100-154`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import pipeline
from vcs_h264_tpu.ops import motion
from vcs_h264_tpu.utils.metrics import psnr


def _frames(rng, b=2, p=3, h=64, w=128):
    i_frames = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    p_frames = np.stack([
        np.stack([np.roll(i_frames[g], (t + 1, -2 * t), axis=(0, 1))
                  for t in range(p)])
        for g in range(b)])
    noise = rng.integers(0, 256, p_frames.shape, dtype=np.uint8)
    mask = rng.random(p_frames.shape[:-1])[..., None] < 0.02
    p_frames = np.where(mask, noise, p_frames)
    return (jnp.asarray(i_frames.transpose(0, 3, 1, 2), jnp.int32),
            jnp.asarray(p_frames.transpose(0, 1, 4, 2, 3), jnp.int32))


def test_luma_only_mvs_are_g_channel_search(rng):
    i_b, p_b = _frames(rng)
    cfg = CodecConfig.production(search_luma_only=True)
    got = pipeline.encode_gop_batch(i_b, p_b, cfg).mv
    want = motion.motion_search_gops(
        p_b[:, :, 1:2], i_b[:, 1:2], bs=cfg.block_size,
        reach=cfg.search_reach, step=cfg.search_step,
        static_threshold=cfg.static_threshold // 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_luma_only_roundtrip_quality(rng):
    i_b, p_b = _frames(rng)
    psnrs = {}
    for flag in (False, True):
        cfg = CodecConfig.production(intra_qstep=24, search_luma_only=flag)
        enc = pipeline.encode_gop_batch(i_b, p_b, cfg)
        dec = pipeline.decode_gop_batch(enc, cfg)
        psnrs[flag] = np.mean([
            psnr(np.asarray(dec[:, 1 + t]), np.asarray(p_b[:, t]))
            for t in range(p_b.shape[1])])
    # same lossy quant on either MV field: quality must stay on par
    assert psnrs[True] >= psnrs[False] - 0.2, psnrs


def test_luma_only_sharded_matches_unsharded(rng):
    import jax
    from vcs_h264_tpu.parallel import mesh as pmesh
    from vcs_h264_tpu.parallel import spatial
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = pmesh.make_mesh(gop=2, tile=4)
    i_b, p_b = _frames(rng, h=128, w=64)
    cfg = CodecConfig.production(search_luma_only=True)
    want = pipeline.encode_gop_batch(i_b, p_b, cfg)
    got = spatial.sharded_encode_gop_batch(i_b, p_b, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(got.mv), np.asarray(want.mv))
