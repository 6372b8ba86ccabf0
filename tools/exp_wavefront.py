"""Wavefront intra kernel sweep: _KDIAG (sub-steps per grid step) at the
720p production batch (8 I-frames x 3 channels -> 24 planes, B = 4320).

Times encode_lossy_planes / decode_planes per variant to direct the
latency-floor attack (VERDICT r3 Next #3).

Run: python tools/exp_wavefront.py [--kdiags 4,8,16] [--iters 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kdiags", default="4,8,16")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--planes", type=int, default=24)
    ap.add_argument("--hw", default="720x1280")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax
    from vcs_h264_tpu.ops import intra_pallas as IPL

    h, w = (int(x) for x in args.hw.split("x"))
    rng = np.random.default_rng(7)
    planes = jnp.asarray(rng.integers(0, 256, (args.planes, h, w)), jnp.int32)
    qstep = 24
    print(f"planes={args.planes} {h}x{w} iters={args.iters}")

    def timed(name, fn, *a):
        out = fn(*a)
        _ = int(jax.tree.leaves(out)[0].sum())
        t0 = time.perf_counter()
        out = fn(*a)
        _ = int(jax.tree.leaves(out)[0].sum())
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    ref_q = ref_m = ref_e = None
    for kd in (int(x) for x in args.kdiags.split(",")):
        IPL._KDIAG = kd

        @jax.jit
        def enc_loop(p, _kd=kd):
            def body(it, acc):
                q, m, e, r = IPL.encode_lossy_planes(
                    jnp.roll(p, it & 3, axis=-1), qstep)
                return acc + jnp.sum(q) + jnp.sum(r)
            return lax.fori_loop(0, args.iters, body, jnp.int32(0))

        timed(f"enc kdiag={kd}", enc_loop, planes)

        q, m, e, r = jax.block_until_ready(
            jax.jit(lambda p: IPL.encode_lossy_planes(p, qstep))(planes))
        if ref_q is None:
            ref_q, ref_m, ref_e = np.asarray(q), np.asarray(m), np.asarray(e)
        else:
            assert np.array_equal(np.asarray(q), ref_q), f"kdiag={kd} q"
            assert np.array_equal(np.asarray(m), ref_m), f"kdiag={kd} m"

        @jax.jit
        def dec_loop(qq, mm, ee, _kd=kd):
            def body(it, acc):
                out = IPL.decode_planes(jnp.roll(qq, it & 3, axis=-1),
                                        mm, ee, qstep, True)
                return acc + jnp.sum(out)
            return lax.fori_loop(0, args.iters, body, jnp.int32(0))

        timed(f"dec kdiag={kd}", dec_loop, q, m, e)


if __name__ == "__main__":
    main()
