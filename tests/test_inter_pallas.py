"""Fused inter kernels (ops/inter_pallas.py) vs the XLA production
composition (interpret mode on CPU; hardware via tools/check_pallas_tpu.py).

The fused path must be bitwise the models/pipeline.py composition:
compensate -> signed residual -> RCT -> DCT -> round(/Q) -> int16, and the
inverse. The kron-matmul DCT contracts over zero-padded blocks, which is
FP-exact, so equality is asserted exactly, not approximately.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import pipeline
from vcs_h264_tpu.ops import motion as M


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    import vcs_h264_tpu.ops.inter_pallas as IP
    monkeypatch.setattr(IP.pl, "pallas_call", patched)
    return IP


def _mk(rng, g, f, h, w, reach):
    bs = 8
    nbh, nbw = h // bs, w // bs
    refs = jnp.asarray(rng.integers(0, 256, (g, 3, h, w)), jnp.int32)
    curs = jnp.asarray(rng.integers(0, 256, (g, f, 3, h, w)), jnp.int32)
    mv = rng.integers(-reach, reach + 1, (g, f, nbh, nbw, 2))
    ci = np.arange(nbh)[:, None] * bs
    cj = np.arange(nbw)[None, :] * bs
    mv[..., 1] = np.clip(mv[..., 1], -ci, h - bs - ci)
    mv[..., 0] = np.clip(mv[..., 0], -cj, w - bs - cj)
    return jnp.asarray(mv, jnp.int32), refs, curs


def _xla_encode(mv, refs, curs, cfg):
    recon = M.motion_compensate_gops(mv, refs, bs=cfg.block_size,
                                     reach=cfg.search_reach, backend="xla")
    return pipeline.dct_compress_residual_signed(curs - recon, cfg)


def _xla_decode(mv, refs, coeffs, cfg):
    recon = M.motion_compensate_gops(mv, refs, bs=cfg.block_size,
                                     reach=cfg.search_reach, backend="xla")
    return jnp.clip(
        recon + pipeline.dct_decompress_residual_signed(coeffs, cfg), 0, 255)


@pytest.mark.parametrize("h,w,qf", [(64, 128, 50.0), (48, 64, 90.0)])
def test_fused_encode_matches_xla(rng, interpret_pallas, h, w, qf):
    IP = interpret_pallas
    cfg = CodecConfig.production(quality_factor=qf)
    mv, refs, curs = _mk(rng, 2, 3, h, w, cfg.search_reach)
    got = np.asarray(IP.encode_p_coeffs_fused(
        mv, refs, curs, cfg.block_size, cfg.search_reach, qf))
    want = np.asarray(_xla_encode(mv, refs, curs, cfg))
    assert got.dtype == want.dtype == np.int16
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,qf", [(64, 128, 50.0)])
def test_fused_decode_matches_xla(rng, interpret_pallas, h, w, qf):
    """Near-exact on CPU: the decode-side inverse RCT rounds IDCT outputs,
    and XLA-CPU's SIMD dot accumulates the kron contraction's nonzero terms
    in a tree order (one per SIMD accumulator) while the blockwise dot sums
    them sequentially — a last-ulp difference that flips round() at exact
    .5 ties on ~1e-5 of pixels. On the MXU both contractions accumulate
    sequentially along K, so hardware equality is exact and asserted by
    tools/check_pallas_tpu.py."""
    IP = interpret_pallas
    cfg = CodecConfig.production(quality_factor=qf)
    mv, refs, curs = _mk(rng, 2, 3, h, w, cfg.search_reach)
    coeffs = _xla_encode(mv, refs, curs, cfg)
    got = np.asarray(IP.decode_p_frames_fused(
        mv, refs, coeffs, cfg.block_size, cfg.search_reach, qf))
    want = np.asarray(_xla_decode(mv, refs, coeffs, cfg))
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-4


def test_fused_static_row_fast_path(rng, interpret_pallas):
    """Rows whose every MV is (0,0) take the strip-slice fast path; mixed
    static/moving rows must still match the XLA composition exactly."""
    IP = interpret_pallas
    cfg = CodecConfig.production()
    h, w = 64, 128
    mv, refs, curs = _mk(rng, 2, 3, h, w, cfg.search_reach)
    mv = np.asarray(mv).copy()
    mv[:, :, ::2] = 0                       # every other block row static
    mv = jnp.asarray(mv)
    got = np.asarray(IP.encode_p_coeffs_fused(
        mv, refs, curs, cfg.block_size, cfg.search_reach, 50.0))
    want = np.asarray(_xla_encode(mv, refs, curs, cfg))
    np.testing.assert_array_equal(got, want)
    got_d = np.asarray(IP.decode_p_frames_fused(
        mv, refs, want, cfg.block_size, cfg.search_reach, 50.0))
    want_d = np.asarray(_xla_decode(mv, refs, want, cfg))
    diff = np.abs(got_d.astype(np.int64) - want_d.astype(np.int64))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-4


def test_fused_roundtrip_on_real_motion(rng, interpret_pallas):
    """Search output -> fused encode -> fused decode reconstructs close to
    the input (sanity: quantization-only loss at QF 50)."""
    IP = interpret_pallas
    cfg = CodecConfig.production()
    h, w = 64, 64
    # smooth content shifted by a displacement the reference's step-3
    # candidate grid can represent exactly (-16 + 3k: dy=-4, dx=5), so
    # interior residuals are pure quantization noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((np.sin(yy / 9.0) + np.cos(xx / 7.0)) * 60 + 128).astype(np.uint8)
    ref_hwc = np.stack([base, base // 2 + 64, 255 - base], axis=-1)
    cur_hwc = np.roll(ref_hwc, (4, -5), axis=(0, 1))
    refs = jnp.asarray(np.moveaxis(ref_hwc, -1, 0), jnp.int32)[None]
    curs = jnp.asarray(np.moveaxis(cur_hwc, -1, 0), jnp.int32)[None, None]
    mv = M.motion_search_gops(curs, refs, backend="xla")
    coeffs = IP.encode_p_coeffs_fused(mv, refs, curs, 8, 16, 50.0)
    dec = np.asarray(IP.decode_p_frames_fused(mv, refs, coeffs, 8, 16, 50.0))
    err = np.abs(dec[0, 0].astype(np.int64)
                 - np.asarray(curs[0, 0]).astype(np.int64))
    # rounded QF-50 quantization: reconstruction within a tight error band
    assert np.mean(err) < 3.0 and np.percentile(err, 99) <= 25


def test_fused_luma_plane_matches_xla_420(rng, interpret_pallas):
    """c == 1 (the 4:2:0 luma path): no RCT, QY table — the pipeline420
    _code_planes / _decode_planes composition. Near-exact on CPU interpret
    (integer-valued plane residuals hit round-at-.5 ties more often than
    the RCT'd full-res path, and the CPU SIMD kron-contraction ulp flips
    those — same mechanism as test_fused_decode_matches_xla); exact on
    hardware (tools/check_pallas_tpu.py)."""
    IP = interpret_pallas
    from vcs_h264_tpu.models import pipeline420 as p420
    from vcs_h264_tpu.config import CodecConfig as CC
    cfg = CC(quant_mode="rounded", chroma_420=True, intra_i=True)
    bs, reach = cfg.block_size, cfg.search_reach
    h, w = 64, 128
    mv, refs3, curs3 = _mk(rng, 2, 3, h, w, reach)
    y_ref = refs3[:, :1]                              # [G, 1, H, W]
    y_cur = curs3[:, :, :1]                           # [G, F, 1, H, W]
    qy, _ = p420._tables(cfg)
    pred = M.motion_compensate_gops(mv, y_ref, bs=bs, reach=reach,
                                    backend="xla")[:, :, 0]
    want = np.asarray(p420._code_planes(y_cur[:, :, 0] - pred, qy, bs))
    got = np.asarray(IP.encode_p_coeffs_fused(
        mv, y_ref, y_cur, bs, reach, cfg.quality_factor)[:, :, 0])
    dq = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert dq.max() <= 1 and (dq != 0).mean() < 1e-3
    want_d = np.asarray(jnp.clip(
        pred + p420._decode_planes(jnp.asarray(want), qy, bs), 0, 255))
    got_d = np.asarray(IP.decode_p_frames_fused(
        mv, y_ref, jnp.asarray(want)[:, :, None], bs, reach,
        cfg.quality_factor)[:, :, 0])
    diff = np.abs(got_d.astype(np.int64) - want_d.astype(np.int64))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-4


@pytest.mark.parametrize("h,w,qf", [(32, 128, 50.0), (48, 64, 75.0)])
def test_fused_c420_matches_xla(rng, interpret_pallas, h, w, qf):
    """Two-MV-rows-per-strip chroma kernel (ops/inter_pallas.py
    _fused_call_c420) vs pipeline420's XLA composition (halved-grid
    compensation + _code_planes/_decode_planes with the C table).
    h, w here are the CHROMA plane dims; the MV grid is bs/2 = 4 px."""
    IP = interpret_pallas
    from vcs_h264_tpu.ops import motion
    from vcs_h264_tpu.models.pipeline420 import _code_planes, _decode_planes
    from vcs_h264_tpu.ops.quant import quant_tables

    bs, reach_c = 8, 8
    g, f = 2, 3
    nbh_mv, nbw_mv = h // 4, w // 4
    c_refs = jnp.asarray(rng.integers(0, 256, (g, 2, h, w)), jnp.int32)
    c_curs = jnp.asarray(rng.integers(0, 256, (g, f, 2, h, w)), jnp.int32)
    mv_c = rng.integers(-reach_c, reach_c + 1,
                        (g, f, nbh_mv, nbw_mv, 2)).astype(np.int32)
    # the search guarantees every source window stays inside the frame
    # (clamped candidate grids); mirror that, else the XLA path's gather
    # clamp and the kernel's padding diverge on out-of-frame sources
    bi = np.arange(nbh_mv) * 4
    bj = np.arange(nbw_mv) * 4
    mv_c[..., 0] = np.clip(mv_c[..., 0], -bj[None, None, None, :],
                           (w - 4) - bj[None, None, None, :])
    mv_c[..., 1] = np.clip(mv_c[..., 1], -bi[None, None, :, None],
                           (h - 4) - bi[None, None, :, None])
    mv_c = jnp.asarray(mv_c)
    # some all-static rows to exercise the fast path
    mv_c = mv_c.at[:, :, :2].set(0)

    qc = quant_tables(qf, jnp.float32)[1]
    pred = motion.motion_compensate_gops(mv_c, c_refs, bs=4, reach=reach_c,
                                         backend="jnp")
    want_co = np.asarray(_code_planes(c_curs - pred, qc, bs))
    got_co = np.asarray(IP.encode_c420_coeffs_fused(
        mv_c, c_refs, c_curs, bs, reach_c, qf))
    np.testing.assert_allclose(got_co, want_co, atol=1)
    frac = np.mean(got_co != want_co)
    assert frac < 1e-3, frac                 # off-TPU round-at-.5 ties only

    co = jnp.asarray(want_co, jnp.int16)
    want_fr = np.asarray(jnp.clip(
        pred + _decode_planes(co, qc, bs), 0, 255))
    got_fr = np.asarray(IP.decode_c420_frames_fused(
        mv_c, c_refs, co, bs, reach_c, qf))
    np.testing.assert_allclose(got_fr, want_fr, atol=1)
    assert np.mean(got_fr != want_fr) < 1e-3
