"""Isolate the wavefront cost: Pallas kernel alone vs gathers+kernel.

Times (a) the raw encode kernel on pre-gathered lane inputs, (b) the full
intra_encode4x4_lossy_batch (lane gather + kernel + scatter), (c) the same
for decode. Run: python tools/exp_intra_kernel_only.py [--res 360]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=360)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax
    import cv2
    from vcs_h264_tpu.ops import intra, intra_pallas

    cap = cv2.VideoCapture("/root/reference/videos/slow_traffic_small.mp4")
    frames = []
    while len(frames) < args.frames:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    arr = np.stack(frames).transpose(0, 3, 1, 2)
    if args.res == 720:
        arr = np.tile(arr, (1, 1, 2, 2))
    planes = jnp.asarray(arr.reshape(-1, *arr.shape[2:])).astype(jnp.int32)
    n, h, w = planes.shape
    nbh, nbw = h // 4, w // 4
    plan = intra._wavefront_plan(nbh, nbw)
    QSTEP = 24

    orig_l = jax.jit(lambda p: intra._pm_lanes_of_blocks(
        intra._pm_blocks_of_planes(p), plan))(planes)
    orig_l = jax.block_until_ready(orig_l)
    print(f"lanes shape {orig_l.shape}  T={plan['T']} L={plan['L']} N={n}")

    def timed(fn, *a):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        return (time.perf_counter() - t0) * 1e3, out

    @jax.jit
    def kernel_only(ol):
        def body(it, acc):
            q, m, e, r = intra_pallas.encode_lossy_lanes(
                jnp.roll(ol, it & 7, axis=-1), plan, QSTEP)
            return acc + jnp.sum(r) + jnp.sum(q)
        return lax.fori_loop(0, args.iters, body, jnp.int32(0))

    ms, _ = timed(kernel_only, orig_l)
    print(f"kernel-only enc: {ms / args.iters:8.2f} ms / {n // 3} frames")

    @jax.jit
    def full(p):
        def body(it, acc):
            q, m, e, r = intra.intra_encode4x4_lossy_batch(
                jnp.roll(p, it & 7, axis=-1), QSTEP)
            return acc + jnp.sum(r) + jnp.sum(q)
        return lax.fori_loop(0, args.iters, body, jnp.int32(0))

    ms, _ = timed(full, planes)
    print(f"full enc:        {ms / args.iters:8.2f} ms / {n // 3} frames")


if __name__ == "__main__":
    main()
