"""End-to-end encode/decode parity with the reference pipeline.

Bit-exactness targets (SURVEY.md §7 hard parts):
  * with_dct=False path: fully integer -> bit-exact vs the scalar oracle.
  * with_dct=True "reference" mode: float32 on device vs the oracle's
    float64 — identical except where truncation boundaries flip; asserted as
    near-exact (max |diff| <= 1 on < 0.5% of pixels) + PSNR parity.
  * our own encode->decode determinism and npz persistence roundtrip.
"""

import numpy as np
import pytest

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import Encoder, Decoder
from vcs_h264_tpu.utils.metrics import psnr
from oracles import oracle_encode_decode
from conftest import load_test_frames


def _small_frames(rng, n=8, h=48, w=64):
    """Synthetic video: moving rectangle over textured background."""
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    frames = []
    for t in range(n):
        f = np.roll(base, (t, 2 * t), axis=(0, 1)).copy()
        f[10 + t:20 + t, 15 + 2 * t:30 + 2 * t] = (255, 0, 0)
        frames.append(f)
    return frames


def _roundtrip(frames, cfg):
    enc = Encoder(cfg, gop_batch=2)
    video = enc.encode_frames(frames)
    return Decoder(gop_batch=2).decode(video), video


def test_no_dct_bit_exact(rng):
    frames = _small_frames(rng)
    cfg = CodecConfig(with_dct=False)
    got, _ = _roundtrip(frames, cfg)
    want = oracle_encode_decode(frames, with_dct=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("bs", [4, 16])
def test_no_dct_block_size_sweep_bit_exact(rng, bs):
    """e2e at the reference's swept block sizes (no-DCT configs only —
    the reference's sweep videos were motion-only; see
    CodecConfig.__post_init__)."""
    frames = _small_frames(rng, h=6 * bs, w=8 * bs)
    reach, step = 2 * bs, max(1, round(bs / 3))
    cfg = CodecConfig(block_size=bs, with_dct=False, search_reach=reach,
                      search_step=step)
    got, _ = _roundtrip(frames, cfg)
    want = oracle_encode_decode(frames, bs=bs, with_dct=False, reach=reach,
                                step=step)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_with_dct_rejects_nonstandard_block_size():
    """with_dct + bs != 8 must fail loudly (the 8x8 JPEG tables don't
    generalize), not shape-crash inside quant_tables."""
    with pytest.raises(ValueError, match="block_size=8"):
        CodecConfig(block_size=16)
    with pytest.raises(ValueError, match="block_size=8"):
        CodecConfig(block_size=4, with_residual=True)
    # no-DCT configs at swept sizes are accepted
    CodecConfig(block_size=4, with_dct=False)
    CodecConfig(block_size=16, with_dct=False, with_residual=False)


def test_no_residual_bit_exact(rng):
    frames = _small_frames(rng, n=5)
    cfg = CodecConfig(with_residual=False, with_dct=False)
    got, _ = _roundtrip(frames, cfg)
    # oracle with no residual: recon = motion compensation only
    from oracles import oracle_motion_search, oracle_motion_compensate
    for n, frame in enumerate(frames):
        if n % 4 == 0:
            np.testing.assert_array_equal(got[n], frame)
        else:
            ref = frames[(n // 4) * 4]
            mv = oracle_motion_search(frame, ref)
            np.testing.assert_array_equal(
                got[n], oracle_motion_compensate(mv, ref, 8))


def test_dct_reference_mode_near_exact(rng):
    """The reference's decode truncates IDCT outputs that sit within float
    noise of exact integers (`astype(np.uint8)` on ~integer + 1e-13), so its
    own output is FP-noise-determined: any implementation not doing
    bit-identical float64 ops flips ~half those truncations by 1. Assert the
    divergence is exactly that shape: tiny, symmetric, PSNR-neutral."""
    frames = _small_frames(rng)
    cfg = CodecConfig(with_dct=True, quant_mode="reference")
    got, _ = _roundtrip(frames, cfg)
    want = oracle_encode_decode(frames, with_dct=True)
    for g, w in zip(got, want):
        diff = np.abs(g.astype(np.int32) - w.astype(np.int32))
        # wrap makes 0 <-> 255 adjacent
        diff = np.minimum(diff, 256 - diff)
        assert diff.max() <= 4, diff.max()
        # wrap-aware PSNR (0 and 255 are adjacent mod 256; a truncation flip
        # across the wrap is still a 1-level flip)
        mse = np.mean(diff.astype(np.float64) ** 2)
        assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) >= 40.0, mse


def test_dct_reference_mode_psnr_parity(rng):
    frames = _small_frames(rng, n=8)
    cfg = CodecConfig(with_dct=True, quant_mode="reference")
    got, _ = _roundtrip(frames, cfg)
    want = oracle_encode_decode(frames, with_dct=True)
    p_ours = np.mean([psnr(g, f) for g, f in zip(got, frames)])
    p_ref = np.mean([psnr(w, f) for w, f in zip(want, frames)])
    assert p_ours >= p_ref - 0.05, (p_ours, p_ref)


def test_rounded_mode_deterministic(rng):
    frames = _small_frames(rng)
    cfg = CodecConfig.production()
    got1, video = _roundtrip(frames, cfg)
    got2, _ = _roundtrip(frames, cfg)
    for a, b in zip(got1, got2):
        np.testing.assert_array_equal(a, b)
    # coefficients are integers (int16) — the real bitstream payload
    assert video.gops[0].residuals.dtype == np.int16


def test_npz_roundtrip(tmp_path, rng):
    frames = _small_frames(rng, n=6)
    cfg = CodecConfig(with_dct=False)
    enc = Encoder(cfg, gop_batch=2)
    video = enc.encode_frames(frames)
    path = str(tmp_path / "stream.npz")
    video.save_npz(path)
    from vcs_h264_tpu.models.gop import EncodedVideo
    loaded = EncodedVideo.load_npz(path)
    got = Decoder().decode(loaded)
    want = Decoder().decode(video)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_npz_preserves_production_config(tmp_path, rng):
    """save_npz/load_npz must round-trip the full config (search_reach,
    intra_i, intra_qstep) and the lossy-intra payload — round 1 silently
    decayed production streams to raw-I on an npz roundtrip."""
    frames = _small_frames(rng, n=8)
    cfg = CodecConfig.production(intra_qstep=24)
    video = Encoder(cfg, gop_batch=2).encode_frames(frames)
    path = str(tmp_path / "stream.npz")
    video.save_npz(path)
    from vcs_h264_tpu.models.gop import EncodedVideo
    loaded = EncodedVideo.load_npz(path)
    assert loaded.config == cfg
    for g, l in zip(video.gops, loaded.gops):
        assert l.i_qcoef is not None
        np.testing.assert_array_equal(np.asarray(g.i_qcoef),
                                      np.asarray(l.i_qcoef))
        np.testing.assert_array_equal(np.asarray(g.i_modes),
                                      np.asarray(l.i_modes))
        np.testing.assert_array_equal(np.asarray(g.i_escape),
                                      np.asarray(l.i_escape))
    got = Decoder().decode(loaded)
    want = Decoder().decode(video)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_stale_config_reencoded(tmp_path, rng):
    """A checkpoint written under a different config (e.g. changed
    intra_qstep) must be re-encoded, not reused — reusing it serializes a
    stream whose header qstep mismatches the stored payload and decodes
    corrupted (ADVICE.md round 1, medium)."""
    frames = _small_frames(rng, n=8)
    ck = str(tmp_path / "ck")
    cfg_a = CodecConfig.production(intra_qstep=20)
    Encoder(cfg_a, gop_batch=2).encode_frames(frames, checkpoint_dir=ck)
    cfg_b = CodecConfig.production(intra_qstep=36)
    v_resumed = Encoder(cfg_b, gop_batch=2).encode_frames(
        frames, checkpoint_dir=ck)
    v_fresh = Encoder(cfg_b, gop_batch=2).encode_frames(frames)
    got = Decoder().decode(v_resumed)
    want = Decoder().decode(v_fresh)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_real_video_reference_parity():
    frames = load_test_frames("/root/reference/videos/cat_short.mp4", 6)
    if len(frames) < 6:
        pytest.skip("video unavailable")
    frames = [f[:96, :112] for f in frames]     # crop: keep oracle tractable
    cfg = CodecConfig(with_dct=False)
    got, _ = _roundtrip(frames, cfg)
    want = oracle_encode_decode(frames, with_dct=False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_checkpoint_resume(tmp_path, rng):
    """Per-GOP checkpointing: a second run reuses persisted GOPs and decodes
    identically (SURVEY.md §5 failure-recovery plan)."""
    frames = _small_frames(rng, n=8)
    cfg = CodecConfig(with_dct=False)
    ck = str(tmp_path / "ck")
    enc = Encoder(cfg, gop_batch=2)
    v1 = enc.encode_frames(frames, checkpoint_dir=ck)
    import os
    files = sorted(os.listdir(ck))
    assert len(files) == 2
    # poison the in-memory path: re-encode with checkpoints present must load
    v2 = Encoder(cfg, gop_batch=2).encode_frames(frames, checkpoint_dir=ck)
    d1 = Decoder().decode(v1)
    d2 = Decoder().decode(v2)
    for a, b in zip(d1, d2):
        np.testing.assert_array_equal(a, b)


def test_encoder_metrics_logging(tmp_path, rng):
    import json
    from vcs_h264_tpu.utils.metrics import MetricsLogger
    frames = _small_frames(rng, n=8)
    path = tmp_path / "m.jsonl"
    logger = MetricsLogger(str(path))
    Encoder(CodecConfig(), metrics=logger).encode_frames(frames)
    logger.close()
    recs = [json.loads(line) for line in open(path)]
    events = {r["event"] for r in recs}
    assert "gop" in events and "encode_summary" in events
    gop_recs = [r for r in recs if r["event"] == "gop"]
    assert all("static_block_ratio" in r for r in gop_recs)
    assert all("nonzero_coeff_ratio" in r for r in gop_recs)


def test_encoder_profile_stage_timings(tmp_path, rng):
    """profile=True routes per-stage wall clock (utils/profiling.StageTimer)
    into the JSONL metrics stream."""
    import json
    from vcs_h264_tpu.utils.metrics import MetricsLogger
    frames = _small_frames(rng, n=8)
    path = tmp_path / "m.jsonl"
    logger = MetricsLogger(str(path))
    enc = Encoder(CodecConfig.production(intra_qstep=16), metrics=logger,
                  profile=True)
    enc.encode_frames(frames)
    logger.close()
    recs = [json.loads(line) for line in open(path)]
    stage = [r for r in recs if r["event"] == "stage_timings"]
    assert len(stage) == 1
    assert "encode_gop_batch" in stage[0]
    assert "intra_i_encode" in stage[0]
    assert stage[0]["encode_gop_batch"] > 0
    # the timer itself accumulated matching call counts
    assert enc.stage_timer.summary()["encode_gop_batch"]["calls"] >= 1
