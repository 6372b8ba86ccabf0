"""Golden-frame tests on the reference's controlled fixtures (SURVEY.md §4
item 3) and a transfer-guard race check (§5 race-detection plan).

The reference ships hand-made 2-frame synthetic motion sequences
(`images/sequences/{minor-jump,big-jump}/{0,1}.png`, authored in Illustrator —
its only controlled fixtures) plus the `images/oscar-cat/` burst used by the
prototype harnesses (`Prototypes/match-block.py:25-32`). These pin the full
encode/decode path on exactly the media the reference was developed against.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import Encoder, Decoder
from oracles import (oracle_encode_decode, oracle_motion_search,
                     oracle_motion_compensate)

SEQ = "/root/reference/images/sequences"
OSCAR = "/root/reference/images/oscar-cat"


def _load_pair(d, names):
    import cv2
    frames = [cv2.imread(os.path.join(d, n)) for n in names]
    if any(f is None for f in frames):
        pytest.skip(f"fixture missing under {d}")
    return frames


@pytest.mark.parametrize("seq", ["minor-jump", "big-jump"])
def test_synthetic_jump_bit_exact(seq):
    """I+P encode/decode on the synthetic jump pairs is bit-exact vs the
    reference-semantics oracle (no-DCT path is fully integer)."""
    frames = _load_pair(os.path.join(SEQ, seq), ["0.png", "1.png"])
    # big-jump is 161x161; ingest crops to the block multiple like the
    # framework does (io/video.py), and the oracle sees the same crop.
    h, w = (s - s % 8 for s in frames[0].shape[:2])
    frames = [f[:h, :w] for f in frames]
    got, _ = _roundtrip(frames, CodecConfig(with_dct=False))
    want = oracle_encode_decode(frames, with_dct=False)
    for g, ww in zip(got, want):
        np.testing.assert_array_equal(g, ww)


@pytest.mark.parametrize("seq", ["minor-jump", "big-jump"])
def test_synthetic_jump_motion_vectors_match(seq):
    """Motion search on the jump fixtures returns the oracle's MVs
    bit-for-bit (window clamp, step grid, static rule, tie-breaks)."""
    from vcs_h264_tpu.ops import motion
    frames = _load_pair(os.path.join(SEQ, seq), ["0.png", "1.png"])
    h, w = (s - s % 8 for s in frames[0].shape[:2])
    ref, cur = (f[:h, :w] for f in frames)
    want = oracle_motion_search(cur, ref)
    cfg = CodecConfig()
    cur_p = jnp.asarray(cur.transpose(2, 0, 1).astype(np.int32))
    ref_p = jnp.asarray(ref.transpose(2, 0, 1).astype(np.int32))
    got = motion.motion_search_batch(
        cur_p[None], ref_p, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold)[0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_oscar_cat_burst_parity():
    """Multi-frame GOP on the oscar-cat burst (the prototypes' TEST_IMG
    media): bit-exact decode in wrap mode, and compensation-only decode
    matches oracle compensation."""
    frames = _load_pair(OSCAR, [f"{i}.jpg" for i in range(5)])
    frames = [f[:200, :240] for f in frames]   # keep the oracle tractable
    got, _ = _roundtrip(frames, CodecConfig(with_dct=False))
    want = oracle_encode_decode(frames, with_dct=False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    got_nr, _ = _roundtrip(frames, CodecConfig(with_residual=False,
                                               with_dct=False))
    for n, frame in enumerate(frames):
        if n % 4 == 0:
            np.testing.assert_array_equal(got_nr[n], frame)
        else:
            ref = frames[(n // 4) * 4]
            mv = oracle_motion_search(frame, ref)
            np.testing.assert_array_equal(
                got_nr[n], oracle_motion_compensate(mv, ref, 8))


def _roundtrip(frames, cfg):
    enc = Encoder(cfg, gop_batch=2)
    video = enc.encode_frames(frames)
    return Decoder(gop_batch=2).decode(video), video


def test_hot_path_no_implicit_transfers(rng):
    """Race/transfer hygiene: the jitted GOP encode+decode touches no host
    memory once inputs are device-resident. `transfer_guard("disallow")`
    turns any implicit host<->device copy (a sync hazard and the closest
    TPU analog of a data race) into an error."""
    from vcs_h264_tpu.models import pipeline
    cfg = CodecConfig.production()
    frames = rng.integers(0, 256, (8, 3, 48, 64), dtype=np.uint8)
    i_b = jax.device_put(jnp.asarray(frames[::4][:2]))
    p_b = jax.device_put(jnp.asarray(
        np.stack([frames[1:4], frames[5:8]])))
    enc = pipeline.jit_encode_gop_batch(cfg)
    dec = pipeline.jit_decode_gop_batch(cfg)
    # warm up (compile) outside the guard
    out = jax.block_until_ready(dec(enc(i_b, p_b)))
    with jax.transfer_guard("disallow"):
        out2 = jax.block_until_ready(dec(enc(i_b, p_b)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
