"""Same-run A/B of the fused inter kernels: per-frame vs wide formulation.

Tunnel run-to-run noise is +-10%, so cross-run comparisons are meaningless
for kernels in the 20 ms range — this times both variants interleaved in
ONE process (round-5 memory note).

Run: python tools/exp_fused_ab.py [--frames 32] [--iters 4] [--res 720]
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
    ap.add_argument("--res", type=int, default=720, choices=(360, 720, 1080))
    ap.add_argument("--reps", type=int, default=3)
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
    from vcs_h264_tpu.ops import motion
    from vcs_h264_tpu.ops import inter_pallas as IP

    cap = cv2.VideoCapture("/root/reference/videos/slow_traffic_small.mp4")
    frames = []
    while len(frames) < args.frames:
        ok, f = cap.read()
        frames.append(f)
    cap.release()
    reps = {360: (1, 1), 720: (2, 2), 1080: (3, 3)}[args.res]
    arr = np.tile(np.stack(frames).transpose(0, 3, 1, 2),
                  (1, 1, *reps))
    if args.res == 1080:
        arr = arr[:, :, :1080, :1920]
    cfg = CodecConfig.production(intra_qstep=24)
    g = cfg.gop_len
    b = len(frames) // g
    i_b = jnp.asarray(arr[::g][:b]).astype(jnp.int32)
    p_b = jnp.asarray(np.stack(
        [arr[k * g + 1:k * g + g] for k in range(b)])).astype(jnp.int32)
    print(f"res={args.res} gops={b} i_b={i_b.shape}")

    mv0 = jax.block_until_ready(motion.motion_search_gops(
        p_b, i_b, bs=cfg.block_size, reach=cfg.search_reach,
        step=cfg.search_step, static_threshold=cfg.static_threshold))
    co0 = jax.block_until_ready(IP.encode_p_coeffs_fused(
        mv0, i_b, p_b, cfg.block_size, cfg.search_reach, cfg.quality_factor))

    def fused(step):
        @jax.jit
        def run(*xs):
            def body(it, acc):
                return acc + step(it, *xs)
            return lax.fori_loop(0, args.iters, body, jnp.int32(0))
        return run

    def make(wide, decode):
        if decode:
            def step(it, m, i_f, co):
                return jnp.sum(IP._fused_call(
                    m, i_f, jnp.roll(co, it & 7, axis=-1), cfg.block_size,
                    cfg.search_reach, cfg.quality_factor, decode=True,
                    wide=wide))
            return fused(step), (mv0, i_b, co0)
        def step(it, m, i_f, p_f):
            return jnp.sum(IP._fused_call(
                m, i_f, jnp.roll(p_f, it & 7, axis=-1), cfg.block_size,
                cfg.search_reach, cfg.quality_factor,
                decode=False, wide=wide).astype(jnp.int32))
        return fused(step), (mv0, i_b, p_b)

    jobs = {}
    for name, wide, dec in (("enc_frame", False, False),
                            ("enc_wide", True, False),
                            ("dec_frame", False, True),
                            ("dec_wide", True, True)):
        fn, a = make(wide, dec)
        _ = int(fn(*a))                       # compile + warm
        jobs[name] = (fn, a)

    res = {k: [] for k in jobs}
    for _ in range(args.reps):
        for name, (fn, a) in jobs.items():    # interleave A/B per rep
            t0 = time.perf_counter()
            _ = int(fn(*a))
            res[name].append((time.perf_counter() - t0) / args.iters * 1e3)
    for name, ts in res.items():
        print(f"{name:10s} min {min(ts):7.2f}  med {sorted(ts)[len(ts)//2]:7.2f} ms")


if __name__ == "__main__":
    main()
