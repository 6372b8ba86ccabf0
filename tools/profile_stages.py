"""Per-stage device-time profile of the codec pipeline on real video.

Each stage is timed as ONE jitted dispatch running N iterations in a
lax.fori_loop (same technique as bench.py), so the dev tunnel's ~25 ms
synchronous per-RPC floor does not pollute the numbers. Prints ms per
64-frame iteration for: motion search, motion compensation, residual
DCT encode, residual DCT encode+decode, full encode, full encode+decode,
the wavefront intra stages, and the production/420 end-to-end loops.

Run: python tools/profile_stages.py [--res 720]  (default 360;
720 tiles the frames 2x2 to the north-star 1280x720 operating point,
VERDICT r2 Next #1.)
"""

import argparse

import sys
import time

import numpy as np

sys.path.insert(0, ".")

VIDEO = "/root/reference/videos/slow_traffic_small.mp4"
N_FRAMES = 64
N_ITERS = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, choices=[360, 720], default=360)
    args = ap.parse_args()
    import os
    import cv2
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import pipeline
    from vcs_h264_tpu.ops import motion

    global N_FRAMES, N_ITERS
    cap = cv2.VideoCapture(VIDEO)
    frames = []
    while len(frames) < N_FRAMES:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    cfg = CodecConfig()
    arr = np.stack(frames).transpose(0, 3, 1, 2).astype(np.int32)
    if args.res == 720:
        # north-star operating point: 2x2-tiled 1280x720 frames; fewer
        # frames + iterations to bound device time
        N_FRAMES, N_ITERS = 32, 4
        arr = np.tile(arr[:N_FRAMES], (1, 1, 2, 2))
    g = cfg.gop_len
    b = len(frames) // g
    i_b = jnp.asarray(arr[::g][:b])
    p_b = jnp.asarray(np.stack([arr[k * g + 1:k * g + g] for k in range(b)]))

    mv0 = jax.jit(lambda i, p: motion.motion_search_gops(
        p, i, bs=cfg.block_size, reach=cfg.search_reach, step=cfg.search_step,
        static_threshold=cfg.static_threshold))(i_b, p_b)
    mv0 = jax.block_until_ready(mv0)
    recon0 = jax.block_until_ready(
        jax.jit(lambda m, i: motion.motion_compensate_gops(
            m, i, bs=cfg.block_size, reach=cfg.search_reach))(mv0, i_b))

    def loop(body):
        @jax.jit
        def run():
            return lax.fori_loop(0, N_ITERS, body, jnp.int32(0))
        return run

    stages = {
        "search": loop(lambda it, acc: acc + jnp.sum(
            motion.motion_search_gops(
                jnp.roll(p_b, it & 7, axis=-1), i_b, bs=cfg.block_size,
                reach=cfg.search_reach, step=cfg.search_step,
                static_threshold=cfg.static_threshold))),
        "compensate": loop(lambda it, acc: acc + jnp.sum(
            motion.motion_compensate_gops(
                jnp.roll(mv0, it & 1, axis=2), i_b, bs=cfg.block_size,
                reach=cfg.search_reach))),
        "resid_dct_enc": loop(lambda it, acc: acc + jnp.sum(
            pipeline.dct_compress_residual(
                motion.residuals_wrap(jnp.roll(p_b, it & 7, axis=-1), recon0),
                cfg)).astype(jnp.int32)),
        "resid_dct_encdec": loop(lambda it, acc: acc + jnp.sum(
            pipeline.dct_decompress_residual(
                pipeline.dct_compress_residual(
                    motion.residuals_wrap(jnp.roll(p_b, it & 7, axis=-1),
                                          recon0), cfg), cfg))),
        "encode": loop(lambda it, acc: acc + jnp.sum(
            pipeline.encode_gop_batch(
                i_b, jnp.roll(p_b, it & 7, axis=-1), cfg).mv)),
        "encode+decode": loop(lambda it, acc: acc + jnp.sum(
            pipeline.decode_gop_batch(pipeline.encode_gop_batch(
                i_b, jnp.roll(p_b, it & 7, axis=-1), cfg), cfg))),
    }

    # ---- production / 420 stages ------------------------------------------
    from vcs_h264_tpu.models import intra_codec, pipeline420
    h420 = (arr.shape[-2] // 16) * 16          # 2*bs multiple for 4:2:0
    QSTEP = 24
    pcfg = CodecConfig.production(intra_qstep=QSTEP)
    ccfg = CodecConfig(quant_mode="rounded", chroma_420=True,
                       intra_i=True, intra_qstep=QSTEP)
    pay0, rec0 = intra_codec.encode_intra_frames_lossy_batch(i_b, QSTEP)
    pay0 = jax.block_until_ready(pay0)

    def prod_step(it, acc):
        # NOTE: no intra DECODE here — the intra encode scan and decode scan
        # in one XLA module SIGSEGV this environment's AOT compile helper
        # (see bench.py); the decode is charged by its own stage below
        p = jnp.roll(p_b, it & 7, axis=-1)
        i = jnp.roll(i_b, it & 7, axis=-1)
        pay, i_rec = intra_codec.encode_intra_frames_lossy_batch(i, QSTEP)
        enc = pipeline.encode_gop_batch(i_rec, p, pcfg)
        dec = pipeline.decode_gop_batch(enc, pcfg)
        return (acc + jnp.sum(enc.mv) + jnp.sum(dec)
                + jnp.sum(pay.qcoef.astype(jnp.int32)))

    stages.update({
        "intra_lossy_enc": loop(lambda it, acc: acc + jnp.sum(
            intra_codec.encode_intra_frames_lossy_batch(
                jnp.roll(i_b, it & 7, axis=-1), QSTEP)[1])),
        "intra_lossy_dec": loop(lambda it, acc: acc + jnp.sum(
            intra_codec.decode_intra_frames_lossy_batch(
                intra_codec.IntraFrameLossy(
                    jnp.roll(pay0.qcoef, it & 7, axis=-1),
                    pay0.modes, pay0.escape), QSTEP))),
        "production_e2e": loop(prod_step),
        "chroma420_e2e": loop(lambda it, acc: acc + jnp.sum(
            pipeline420.decode_gop_batch_420(
                pipeline420.encode_gop_batch_420(
                    i_b[..., :h420, :], jnp.roll(p_b, it & 7, axis=-1)
                    [..., :h420, :], ccfg), ccfg))),
    })
    for name, fn in stages.items():
        _ = int(fn())      # compile + warm
        t0 = time.perf_counter()
        _ = int(fn())
        dt = (time.perf_counter() - t0) / N_ITERS * 1e3
        print(f"{name:18s} {dt:7.2f} ms / {N_FRAMES} frames")


if __name__ == "__main__":
    main()
