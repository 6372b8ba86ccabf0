"""B-frame (bidirectional prediction) tests.

The reference only stubbed B frames (`InterframeCompression/encoder.py:45-47`;
intended display order I,B,P,B,P,B,P in `Prototypes/main-motion.py:137-140`).
This framework implements them fully: per-block forward / backward /
bi-average mode decision against the nearest decoded anchors (closed loop).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import pipeline
from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo


def _gop_frames(rng, cfg, h=64, w=96):
    i = rng.integers(0, 256, (3, h, w)).astype(np.int32)
    rest = np.stack([np.roll(i, (t + 1, -t), axis=(1, 2))
                     for t in range(cfg.gop_len - 1)])
    return i, rest


def test_config_validation():
    CodecConfig.bframes()                      # IBPBPBP, valid
    CodecConfig(gop_pattern=("I", "B", "P"))   # minimal valid
    with pytest.raises(ValueError):
        CodecConfig(gop_pattern=("I", "P", "B"))   # B without next anchor
    with pytest.raises(ValueError):
        CodecConfig(gop_pattern=("B", "P", "P"))   # must start with I
    assert CodecConfig.bframes().num_b == 3
    assert CodecConfig.bframes().has_b
    assert not CodecConfig().has_b


def test_gop_layout():
    a, b, prev_s, next_s, p_sel, b_sel = pipeline.gop_layout(
        ("I", "B", "P", "B", "P", "B", "P"))
    assert a == (0, 2, 4, 6) and b == (1, 3, 5)
    assert prev_s == (0, 1, 2) and next_s == (1, 2, 3)
    assert p_sel == (1, 3, 5) and b_sel == (0, 2, 4)


def test_wrap_roundtrip_lossless(rng):
    """with_dct=False wrap residuals: decode must be bit-exact, including all
    B frames (mod-256 symmetry, as for P in the reference, decoder.py:57)."""
    cfg = CodecConfig.bframes(with_dct=False)
    i, rest = _gop_frames(rng, cfg)
    gop = pipeline.jit_encode_gop(cfg)(jnp.asarray(i), jnp.asarray(rest))
    assert gop.b_mv.shape == (3, 2, 8, 12, 2)
    assert gop.b_mode.shape == (3, 8, 12)
    dec = np.asarray(pipeline.jit_decode_gop(cfg)(gop))
    np.testing.assert_array_equal(dec, np.concatenate([i[None], rest]))


def test_backward_prediction_used(rng):
    """A B frame identical to its NEXT anchor must pick the backward mode on
    every block (wrap mode: the decoded P anchor is bit-exact, so the
    backward SAD is exactly zero while the forward anchor is unrelated)."""
    cfg = CodecConfig(gop_pattern=("I", "B", "P"), with_dct=False)
    h, w = 64, 96
    i = rng.integers(0, 256, (3, h, w)).astype(np.int32)
    p = rng.integers(0, 256, (3, h, w)).astype(np.int32)   # unrelated anchor
    rest = np.stack([p, p])                                  # B == next anchor
    gop = pipeline.jit_encode_gop(cfg)(jnp.asarray(i), jnp.asarray(rest))
    assert np.all(np.asarray(gop.b_mode)[0] == 1)            # all backward
    assert np.all(np.asarray(gop.b_mv)[0, 1] == 0)           # zero (static)
    dec = np.asarray(pipeline.jit_decode_gop(cfg)(gop))
    np.testing.assert_array_equal(dec[1], p)


def test_bi_average_mode(rng):
    """A B frame that is the integer average of both anchors should pick the
    bi mode on (nearly) every block."""
    cfg = CodecConfig(gop_pattern=("I", "B", "P"), with_dct=False)
    h, w = 64, 96
    i = rng.integers(0, 256, (3, h, w)).astype(np.int32)
    p = rng.integers(0, 256, (3, h, w)).astype(np.int32)
    b = (i + p + 1) >> 1
    gop = pipeline.jit_encode_gop(cfg)(
        jnp.asarray(i), jnp.asarray(np.stack([b, p])))
    modes = np.asarray(gop.b_mode)[0]
    assert (modes == 2).mean() > 0.9
    dec = np.asarray(pipeline.jit_decode_gop(cfg)(gop))
    np.testing.assert_array_equal(dec[1], b)                 # wrap lossless


def test_batch_matches_single(rng):
    cfg = CodecConfig.bframes(with_dct=False)
    i0, r0 = _gop_frames(rng, cfg)
    i1, r1 = _gop_frames(rng, cfg)
    batch = pipeline.jit_encode_gop_batch(cfg)(
        jnp.asarray(np.stack([i0, i1])), jnp.asarray(np.stack([r0, r1])))
    single = pipeline.jit_encode_gop(cfg)(jnp.asarray(i1), jnp.asarray(r1))
    np.testing.assert_array_equal(np.asarray(batch.b_mv[1]),
                                  np.asarray(single.b_mv))
    np.testing.assert_array_equal(np.asarray(batch.b_mode[1]),
                                  np.asarray(single.b_mode))
    dec = np.asarray(pipeline.jit_decode_gop_batch(cfg)(batch))
    np.testing.assert_array_equal(dec[0], np.concatenate([i0[None], r0]))


def test_host_encoder_decoder_with_tail(rng):
    """Host path: 2 full IBPBPBP GOPs + a 3-frame tail (coded all-P),
    bit-exact in wrap mode."""
    from vcs_h264_tpu.models import Encoder, Decoder
    cfg = CodecConfig.bframes(with_dct=False)
    n = 2 * cfg.gop_len + 3
    h, w = 64, 96
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    frames = [np.roll(base, (t, -t), axis=(0, 1)) for t in range(n)]
    video = Encoder(cfg, gop_batch=2).encode_frames(frames)
    assert video.gops[0].num_b == 3 and video.gops[0].num_p == 3
    assert video.gops[-1].num_b == 0 and video.gops[-1].num_p == 2
    rec = Decoder(gop_batch=2).decode(video)
    assert len(rec) == n
    for f, r in zip(frames, rec):
        np.testing.assert_array_equal(f, r)


def test_npz_and_vcs_roundtrip(rng, tmp_path):
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.bitstream import save_vcs, load_vcs
    cfg = CodecConfig.production(gop_pattern=("I", "B", "P", "B", "P"))
    h, w = 64, 96
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    frames = [np.roll(base, (2 * t, -t), axis=(0, 1))
              for t in range(cfg.gop_len)]
    video = Encoder(cfg).encode_frames(frames)
    rec0 = Decoder().decode(video)

    npz = str(tmp_path / "b.npz")
    video.save_npz(npz)
    v1 = EncodedVideo.load_npz(npz)
    assert v1.gops[0].b_mv.shape == video.gops[0].b_mv.shape
    rec1 = Decoder().decode(v1)

    vcs = str(tmp_path / "b.vcs")
    save_vcs(video, vcs)
    v2 = load_vcs(vcs)
    assert v2.config.gop_pattern == cfg.gop_pattern
    rec2 = Decoder().decode(v2)

    for a, b, c in zip(rec0, rec1, rec2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


def test_production_quality(rng):
    """Rounded-quant B coding keeps PSNR high on translating content."""
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.utils.metrics import psnr
    cfg = CodecConfig.production(gop_pattern=("I", "B", "P", "B", "P"))
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([128 + 100 * np.sin(2 * np.pi * (yy / 40 + xx / 55 + ph))
                     for ph in (0.0, 0.3, 0.6)], axis=-1)
    base = np.clip(np.round(base), 0, 255).astype(np.uint8)
    frames = [np.roll(base, (2 * t, -t), axis=(0, 1))
              for t in range(cfg.gop_len)]
    video = Encoder(cfg).encode_frames(frames)
    rec = Decoder().decode(video)
    # the reference-parity step-3 search grid does not always hit the exact
    # displacement, so the residual carries real energy through QF=50 quant
    for f, r in zip(frames, rec):
        assert psnr(f, r) > 30.0
