"""Hardware check: Pallas SAD kernel vs XLA families on the real TPU.

The CPU test suite runs the kernel in interpret mode; this script asserts
bit-exactness of the compiled Mosaic kernel on device (it once differed: the
MXU's default bf16 single-pass matmul silently corrupted integer SADs, see
ops/motion_pallas.py).

Run: python tools/check_pallas_tpu.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcs_h264_tpu.ops import motion as M


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    for (b, f, h, w) in [(1, 1, 64, 64), (2, 3, 360, 640)]:
        curs = jnp.asarray(rng.integers(0, 256, (b, f, 3, h, w)), jnp.int32)
        refs = jnp.asarray(rng.integers(0, 256, (b, 3, h, w)), jnp.int32)
        mv_p = np.asarray(M.motion_search_gops(curs, refs, backend="pallas"))
        mv_x = np.asarray(M.motion_search_gops(curs, refs, backend="xla"))
        assert np.array_equal(mv_p, mv_x), f"search mismatch {b}x{f}x{h}x{w}"
        rec_p = np.asarray(M.motion_compensate_gops(
            jnp.asarray(mv_p), refs, bs=8, reach=16, backend="pallas"))
        rec_x = np.asarray(M.motion_compensate_gops(
            jnp.asarray(mv_p), refs, bs=8, reach=16, backend="xla"))
        assert np.array_equal(rec_p, rec_x), f"comp mismatch {b}x{f}x{h}x{w}"
        print(f"ok {b}x{f} {h}x{w}")
    print("pallas kernels (search + compensate) bit-exact on TPU")

    # fused inter kernels (ops/inter_pallas.py): on the MXU the kron-matmul
    # DCT accumulates nonzero terms in the same sequential K-order as the
    # blockwise einsum, so equality is exact on hardware (the CPU interpret
    # test tolerates the SIMD tree-order ulp; tests/test_inter_pallas.py)
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import pipeline
    from vcs_h264_tpu.ops import inter_pallas as IP
    cfg = CodecConfig.production()
    for (b, f, h, w) in [(2, 3, 360, 640)]:
        bs, reach = cfg.block_size, cfg.search_reach
        nbh, nbw = h // bs, w // bs
        refs = jnp.asarray(rng.integers(0, 256, (b, 3, h, w)), jnp.int32)
        curs = jnp.asarray(rng.integers(0, 256, (b, f, 3, h, w)), jnp.int32)
        mv = rng.integers(-reach, reach + 1, (b, f, nbh, nbw, 2))
        ci = np.arange(nbh)[:, None] * bs
        cj = np.arange(nbw)[None, :] * bs
        mv[..., 1] = np.clip(mv[..., 1], -ci, h - bs - ci)
        mv[..., 0] = np.clip(mv[..., 0], -cj, w - bs - cj)
        mv = jnp.asarray(mv, jnp.int32)
        recon = M.motion_compensate_gops(mv, refs, bs=bs, reach=reach,
                                         backend="xla")
        want_co = pipeline.dct_compress_residual_signed(curs - recon, cfg)
        got_co = IP.encode_p_coeffs_fused(mv, refs, curs, bs, reach,
                                          cfg.quality_factor)
        assert np.array_equal(np.asarray(got_co), np.asarray(want_co)), \
            f"fused encode mismatch {b}x{f}x{h}x{w}"
        want_dec = jnp.clip(
            recon + pipeline.dct_decompress_residual_signed(want_co, cfg),
            0, 255)
        got_dec = IP.decode_p_frames_fused(mv, refs, want_co, bs, reach,
                                           cfg.quality_factor)
        assert np.array_equal(np.asarray(got_dec), np.asarray(want_dec)), \
            f"fused decode mismatch {b}x{f}x{h}x{w}"
        print(f"ok fused inter {b}x{f} {h}x{w}")
    # c == 1 (the 4:2:0 luma path: no RCT, QY table, pipeline420 semantics)
    from vcs_h264_tpu.models import pipeline420 as p420
    cfg420 = CodecConfig(quant_mode="rounded", chroma_420=True, intra_i=True)
    for (b, f, h, w) in [(2, 3, 352, 640)]:
        bs, reach = cfg420.block_size, cfg420.search_reach
        nbh, nbw = h // bs, w // bs
        y_ref = jnp.asarray(rng.integers(0, 256, (b, 1, h, w)), jnp.int32)
        y_cur = jnp.asarray(rng.integers(0, 256, (b, f, 1, h, w)), jnp.int32)
        mv = rng.integers(-reach, reach + 1, (b, f, nbh, nbw, 2))
        ci = np.arange(nbh)[:, None] * bs
        cj = np.arange(nbw)[None, :] * bs
        mv[..., 1] = np.clip(mv[..., 1], -ci, h - bs - ci)
        mv[..., 0] = np.clip(mv[..., 0], -cj, w - bs - cj)
        mv = jnp.asarray(mv, jnp.int32)
        qy, _ = p420._tables(cfg420)
        pred = M.motion_compensate_gops(mv, y_ref, bs=bs, reach=reach,
                                        backend="xla")[:, :, 0]
        want = np.asarray(p420._code_planes(y_cur[:, :, 0] - pred, qy, bs))
        got = np.asarray(IP.encode_p_coeffs_fused(
            mv, y_ref, y_cur, bs, reach, cfg420.quality_factor)[:, :, 0])
        assert np.array_equal(got, want.astype(np.int16)), \
            f"fused luma encode mismatch {b}x{f}x{h}x{w}"
        want_d = np.asarray(jnp.clip(
            pred + p420._decode_planes(jnp.asarray(want), qy, bs), 0, 255))
        got_d = np.asarray(IP.decode_p_frames_fused(
            mv, y_ref, jnp.asarray(want)[:, :, None], bs, reach,
            cfg420.quality_factor)[:, :, 0])
        assert np.array_equal(got_d, want_d), \
            f"fused luma decode mismatch {b}x{f}x{h}x{w}"
        print(f"ok fused luma {b}x{f} {h}x{w}")
    # 4:2:0 chroma kernel: two MV rows per transform strip, Cr|Cb concat
    for (b, f, hc, wc) in [(2, 3, 176, 320)]:
        bs = cfg420.block_size
        reach_c = cfg420.search_reach // 2
        nbh_mv, nbw_mv = hc // 4, wc // 4
        c_ref = jnp.asarray(rng.integers(0, 256, (b, 2, hc, wc)), jnp.int32)
        c_cur = jnp.asarray(rng.integers(0, 256, (b, f, 2, hc, wc)),
                            jnp.int32)
        mvc = rng.integers(-reach_c, reach_c + 1, (b, f, nbh_mv, nbw_mv, 2))
        ci = np.arange(nbh_mv)[:, None] * 4
        cj = np.arange(nbw_mv)[None, :] * 4
        mvc[..., 1] = np.clip(mvc[..., 1], -ci, hc - 4 - ci)
        mvc[..., 0] = np.clip(mvc[..., 0], -cj, wc - 4 - cj)
        mvc = jnp.asarray(mvc, jnp.int32)
        _, qc = p420._tables(cfg420)
        pred = M.motion_compensate_gops(mvc, c_ref, bs=4, reach=reach_c,
                                        backend="jnp")
        want = np.asarray(p420._code_planes(c_cur - pred, qc, bs))
        got = np.asarray(IP.encode_c420_coeffs_fused(
            mvc, c_ref, c_cur, bs, reach_c, cfg420.quality_factor))
        assert np.array_equal(got, want.astype(np.int16)), \
            f"fused chroma encode mismatch {b}x{f} {hc}x{wc}"
        want_d = np.asarray(jnp.clip(
            pred + p420._decode_planes(jnp.asarray(want), qc, bs), 0, 255))
        got_d = np.asarray(IP.decode_c420_frames_fused(
            mvc, c_ref, jnp.asarray(want, jnp.int16), bs, reach_c,
            cfg420.quality_factor))
        assert np.array_equal(got_d, want_d), \
            f"fused chroma decode mismatch {b}x{f} {hc}x{wc}"
        print(f"ok fused chroma {b}x{f} {hc}x{wc}")
    print("fused inter kernels (enc + dec, c=3/c=1/chroma420) bit-exact "
          "on TPU")

    # wavefront intra kernels (MXU formulation, ops/intra_pallas.py)
    from vcs_h264_tpu.ops import intra as I
    for (n, h, w) in [(3, 64, 96), (6, 360, 640)]:
        planes = jnp.asarray(rng.integers(0, 256, (n, h, w)), jnp.int32)
        got = [np.asarray(x) for x in
               I.intra_encode4x4_lossy_batch(planes, 24, backend="pallas")]
        want = [np.asarray(x) for x in
                I.intra_encode4x4_lossy_batch(planes, 24, backend="xla")]
        for g, w_ in zip(got, want):
            assert np.array_equal(g, w_), f"intra enc mismatch {n}x{h}x{w}"
        q, m, e, _ = want
        dp = np.asarray(I.intra_decode4x4_lossy_batch(
            jnp.asarray(q), jnp.asarray(m), jnp.asarray(e), 24,
            backend="pallas"))
        dx = np.asarray(I.intra_decode4x4_lossy_batch(
            jnp.asarray(q), jnp.asarray(m), jnp.asarray(e), 24,
            backend="xla"))
        assert np.array_equal(dp, dx), f"intra dec mismatch {n}x{h}x{w}"
        print(f"ok intra {n}x{h}x{w}")
    print("pallas wavefront intra kernels bit-exact on TPU")


if __name__ == "__main__":
    main()
