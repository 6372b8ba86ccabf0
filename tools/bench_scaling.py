"""Scaling-efficiency harness for the sharded pipeline.

On a pod this measures real ICI scaling (run under jax.distributed); in this
1-chip dev environment it runs on the virtual CPU mesh, which validates the
sharding program and communication structure but NOT silicon speedups (all
virtual devices share host cores — treat the numbers as structural, the
methodology transfers unchanged to real slices).

Run:  JAX_PLATFORMS=cpu python tools/bench_scaling.py
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.parallel.mesh import make_mesh
    from vcs_h264_tpu.parallel.spatial import (make_sharded_encoder,
                                               make_sharded_decoder)

    cfg = CodecConfig(with_dct=True)
    rng = np.random.default_rng(0)
    B, P, H, W = 8, 3, 384, 640
    i_b = jnp.asarray(rng.integers(0, 256, (B, 3, H, W)), jnp.int32)
    p_b = jnp.asarray(rng.integers(0, 256, (B, P, 3, H, W)), jnp.int32)

    results = {}
    for gop, tile in [(1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (1, 4),
                      (2, 4), (4, 2)]:
        n_dev = gop * tile
        if n_dev > len(jax.devices()):
            continue
        mesh = make_mesh(gop=gop, tile=tile)
        enc = make_sharded_encoder(mesh, cfg, H, W)
        out = enc(i_b, p_b)
        jax.block_until_ready(out.mv)
        t0 = time.perf_counter()
        for _ in range(3):
            out = enc(i_b, p_b)
            jax.block_until_ready((out.mv, out.residuals))
        dt = (time.perf_counter() - t0) / 3
        fps = B * (P + 1) / dt
        results[f"gop{gop}x tile{tile}"] = {
            "devices": n_dev, "ms": round(dt * 1e3, 1),
            "fps": round(fps, 1)}

    base = results.get("gop1x tile1", {}).get("fps")
    for k, v in results.items():
        if base:
            v["speedup"] = round(v["fps"] / base, 2)
            v["efficiency"] = round(v["fps"] / base / v["devices"], 2)
    print(json.dumps({"note": "virtual CPU mesh — structural validation; "
                              "run on a pod slice for silicon numbers",
                      "shape": f"{B} GOPs x {P + 1} frames {W}x{H}",
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()
