"""Production stage split at tiled resolutions: intra enc/dec, inter enc+dec.

Times the three programs of bench.py's prod_bench separately to direct
optimization (VERDICT r2 Next #1; generalized to 1080p for r4 Next #6).
The 640x360 source frames are tiled --tile x --tile:
  --tile 2 -> 1280x720 (the north-star point), --tile 3 -> 1920x1080.

Run: python tools/exp_720_stages.py [--frames 32] [--iters 4] [--tile 2]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tile", type=int, default=2,
                    help="spatial tiling of the 640x360 source (2=720p, 3=1080p)")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax
    import cv2
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import pipeline, intra_codec

    cap = cv2.VideoCapture("/root/reference/videos/slow_traffic_small.mp4")
    frames = []
    while len(frames) < args.frames:
        ok, f = cap.read()
        frames.append(f)
    cap.release()
    arr = np.tile(np.stack(frames).transpose(0, 3, 1, 2),
                  (1, 1, args.tile, args.tile))
    cfg = CodecConfig.production(intra_qstep=24)
    g = cfg.gop_len
    b = len(frames) // g
    i_b = jnp.asarray(arr[::g][:b]).astype(jnp.int32)
    p_b = jnp.asarray(np.stack(
        [arr[k * g + 1:k * g + g] for k in range(b)])).astype(jnp.int32)
    QSTEP = 24
    print(f"frames={len(frames)} gops={b} i_b={i_b.shape} "
          f"res={arr.shape[-1]}x{arr.shape[-2]}")

    def fused(step):
        @jax.jit
        def run(*xs):
            def body(it, acc):
                return acc + step(it, *xs)
            return lax.fori_loop(0, args.iters, body, jnp.int32(0))
        return run

    def timed(name, fn, *a):
        _ = int(fn(*a))
        t0 = time.perf_counter()
        _ = int(fn(*a))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:22s} {ms:8.2f} ms / {len(frames)} frames", flush=True)
        return ms

    def intra_enc(it, i_f):
        pay, rec = intra_codec.encode_intra_frames_lossy_batch(
            jnp.roll(i_f, it & 7, axis=-1), QSTEP)
        return jnp.sum(rec) + jnp.sum(pay.qcoef.astype(jnp.int32))

    timed("intra_enc", fused(intra_enc), i_b)

    pay0, _ = intra_codec.encode_intra_frames_lossy_batch(i_b, QSTEP)
    pay0 = jax.block_until_ready(pay0)

    def intra_dec(it, pay_q, pay_m, pay_e):
        p2 = intra_codec.IntraFrameLossy(
            jnp.roll(pay_q, it & 7, axis=-1), pay_m, pay_e)
        return jnp.sum(intra_codec.decode_intra_frames_lossy_batch(p2, QSTEP))

    timed("intra_dec", fused(intra_dec), pay0.qcoef, pay0.modes, pay0.escape)

    def inter(it, i_f, p_f):
        p = jnp.roll(p_f, it & 7, axis=-1)
        enc = pipeline.encode_gop_batch(i_f, p, cfg)
        dec = pipeline.decode_gop_batch(enc, cfg)
        return jnp.sum(enc.mv) + jnp.sum(dec)

    timed("inter_encdec", fused(inter), i_b, p_b)

    from vcs_h264_tpu.ops import motion
    def search_only(it, i_f, p_f):
        return jnp.sum(motion.motion_search_gops(
            jnp.roll(p_f, it & 7, axis=-1), i_f, bs=cfg.block_size,
            reach=cfg.search_reach, step=cfg.search_step,
            static_threshold=cfg.static_threshold))

    timed("search", fused(search_only), i_b, p_b)

    # fused inter kernels (ops/inter_pallas.py) vs the XLA composition
    mv0 = jax.block_until_ready(motion.motion_search_gops(
        p_b, i_b, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold))
    from vcs_h264_tpu.ops import inter_pallas as IP

    def fused_enc(it, m, i_f, p_f):
        return jnp.sum(IP.encode_p_coeffs_fused(
            m, i_f, jnp.roll(p_f, it & 7, axis=-1), cfg.block_size,
            cfg.search_reach, cfg.quality_factor).astype(jnp.int32))

    timed("fused_enc", fused(fused_enc), mv0, i_b, p_b)

    co0 = jax.block_until_ready(IP.encode_p_coeffs_fused(
        mv0, i_b, p_b, cfg.block_size, cfg.search_reach,
        cfg.quality_factor))

    def fused_dec(it, m, i_f, co):
        return jnp.sum(IP.decode_p_frames_fused(
            m, i_f, jnp.roll(co, it & 7, axis=-1), cfg.block_size,
            cfg.search_reach, cfg.quality_factor))

    timed("fused_dec", fused(fused_dec), mv0, i_b, co0)

    def xla_enc(it, m, i_f, p_f):
        recon = motion.motion_compensate_gops(
            m, i_f, bs=cfg.block_size, reach=cfg.search_reach)
        return jnp.sum(pipeline.dct_compress_residual_signed(
            jnp.roll(p_f, it & 7, axis=-1) - recon, cfg).astype(jnp.int32))

    timed("xla_enc(comp+dctq)", fused(xla_enc), mv0, i_b, p_b)


if __name__ == "__main__":
    main()
