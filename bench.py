"""Benchmark: end-to-end encode+decode throughput on real video frames.

Prints JSON lines of the form
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...extras}
progressively refined — a provisional line lands as soon as a first real
measurement exists (so a driver timeout still captures a parsed number), and
the final line carries the headline fused-loop measurement plus the
production-mode and 720p extras. The LAST printed line is the most complete.

Headline method: frames of the reference's headline video
(slow_traffic_small.mp4, 640x360) are uploaded to the device once; the timed
region is ONE jitted call that runs N_ITERS full encode -> decode iterations
in a lax.fori_loop, each on a spatially rolled copy of the P-frames (the
data-dependent roll defeats loop-invariant hoisting; the roll is <= 7 px so
the motion search operates in its normal regime). A scalar reduction of every
iteration's outputs is loop-carried and fetched at the end, so the region is
a single dispatch: this measures sustained device throughput — the production
configuration — rather than the dev tunnel's ~25 ms synchronous per-dispatch
RPC floor (an artifact of this environment; host DMA overlaps compute in
production). The provisional number is the same program measured as one
synchronous dispatch (includes that RPC floor — strictly conservative).

Extras (each its own fused loop, run while the time budget allows):
  * production_fps_640x360 — CodecConfig.production(intra_qstep=24): rounded
    int16 quant, lossy wavefront-intra-coded I-frames, full decode incl.
    the intra wavefront reconstruction.
  * encode_decode_fps_1280x720 — the north-star operating point
    (BASELINE.json: frames/s per chip at 720p, intra+inter), production
    config on 2x2-tiled 720p frames.
  * chroma420_fps_640x352 / production_fps_1920x1080 — the 4:2:0 codec
    mode and the 3x3-tiled 1080p point.
  * *_lumasearch — the same programs with cfg.search_luma_only (H.264-
    style G-channel motion estimation, quality-neutral: BASELINE.md
    round-5 notes); the plain keys keep the 3-channel-SAD definition.

The persistent XLA compilation cache (.jax_cache/) makes warm runs skip the
multi-minute remote compiles; cold runs degrade to provisional numbers.

Baseline denominator: the measured Python reference (tools/
measure_reference_baseline.py -> BASELINE_MEASURED.json), end-to-end
encode+decode fps on one CPU core of this machine.
"""

import json
import os
import time

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
VIDEO = "/root/reference/videos/slow_traffic_small.mp4"
BASE = os.path.join(_DIR, "BASELINE_MEASURED.json")
N_FRAMES = 64          # frames resident on device (16 GOPs)
N_ITERS = 32           # fused-loop iterations (headline; >= 2 s window)
N_REPEAT = 3           # repeated timed runs; report the median
# Extras are attempted as long as budget remains; the external timeout is the
# real bound (lines print progressively, so a kill mid-extra still leaves the
# last complete line for the driver). The known 5-10 min pre-device tunnel
# stall must not self-censor the extras — hence the generous default.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
QSTEP = 24             # production lossy-intra step


def load_frames(path, n):
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    while len(frames) < n:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def main():
    t_start = time.monotonic()

    def left():
        return BUDGET_S - (time.monotonic() - t_start)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_DIR, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax import lax
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import pipeline, intra_codec

    cfg = CodecConfig()          # reference operating point: bs=8 IPPP QF=50
    frames = load_frames(VIDEO, N_FRAMES)
    if not frames:
        print(json.dumps({"metric": "encode_decode_fps", "value": 0,
                          "unit": "fps", "vs_baseline": 0,
                          "error": "video unavailable"}), flush=True)
        return

    base_fps = base_psnr = None
    if os.path.exists(BASE):
        base = json.load(open(BASE))
        base_fps = base.get("end_to_end_fps")
        base_psnr = base.get("mean_psnr_capped99_db")

    # pre-device artifact: if the TPU tunnel wedges before first contact
    # (observed), the driver still parses a line instead of recording null
    print(json.dumps({"metric": "encode_decode_fps_640x360", "value": 0,
                      "unit": "fps", "vs_baseline": 0, "provisional": True,
                      "note": "pre-device placeholder; later lines override"}),
          flush=True)

    arr = np.stack(frames).transpose(0, 3, 1, 2)                   # [N,3,H,W] u8
    g = cfg.gop_len
    b = len(frames) // g
    # upload uint8 (4x less tunnel traffic than int32 — the link can degrade
    # to sub-MB/s for minutes); the device casts on first use
    i_b = jnp.asarray(arr[::g][:b]).astype(jnp.int32)              # [B,3,H,W]
    p_b = jnp.asarray(
        np.stack([arr[k * g + 1:k * g + g]
                  for k in range(b)])).astype(jnp.int32)           # [B,P,3,H,W]

    def enc_dec(i_frames, p_frames):
        enc = pipeline.encode_gop_batch(i_frames, p_frames, cfg)
        dec = pipeline.decode_gop_batch(enc, cfg)
        return enc, dec

    @jax.jit
    def psnr_step(i_frames, p_frames):
        enc, dec = enc_dec(i_frames, p_frames)
        err = (dec[:, 1:] - p_frames).astype(jnp.float32)
        mse = jnp.mean(err * err, axis=(2, 3, 4))      # [B, P] per frame
        sink = jnp.sum(enc.mv) + jnp.sum(dec)
        return mse, sink

    # ---- provisional: one synchronous dispatch (includes the tunnel's RPC
    # floor — strictly conservative vs the fused-loop number) ---------------
    mse, _ = psnr_step(i_b, p_b)
    mse = np.asarray(mse)                               # sync + PSNR data
    t0 = time.perf_counter()
    _, sink = psnr_step(i_b, p_b)
    int(sink)
    dt1 = time.perf_counter() - t0

    mse_r = mse.ravel()
    p_psnr = np.where(mse_r > 0,
                      10 * np.log10(255.0 ** 2 / np.maximum(mse_r, 1e-12)),
                      np.inf)
    per_frame = np.concatenate([np.full(b, np.inf), p_psnr])   # + I frames
    psnr_capped = float(np.mean(np.minimum(per_frame, 99.0)))

    result = {
        "metric": "encode_decode_fps_640x360",
        "value": round(b * g / dt1, 1),
        "unit": "fps",
        "vs_baseline": round(b * g / dt1 / base_fps, 1) if base_fps else None,
        "psnr_capped99_db": round(psnr_capped, 2),
        "provisional": True,
        "device": str(jax.devices()[0]),
        "baseline_fps": base_fps,
        "baseline_psnr_capped99_db": base_psnr,
    }
    print(json.dumps(result), flush=True)
    result.pop("provisional")

    # ---- headline: fused N_ITERS-iteration loop, one dispatch -------------
    def fused_loop(step_fn, n_iters):
        def body(it, acc):
            return acc + step_fn(it)
        return lax.fori_loop(0, n_iters, body, jnp.int32(0))

    @jax.jit
    def bench_loop(i_frames, p_frames):
        def step(it):
            p = jnp.roll(p_frames, it & 7, axis=-1)
            enc, dec = enc_dec(i_frames, p)
            return jnp.sum(enc.mv) + jnp.sum(dec)
        return fused_loop(step, N_ITERS)

    _ = int(bench_loop(i_b, p_b))                       # compile + warmup
    runs = []
    for _rep in range(N_REPEAT):
        t0 = time.perf_counter()
        _ = int(bench_loop(i_b, p_b))
        runs.append(time.perf_counter() - t0)
        if left() < 120:
            break
    dt = sorted(runs)[len(runs) // 2]                   # median
    fps = N_ITERS * b * g / dt
    result.update(value=round(fps, 1),
                  vs_baseline=round(fps / base_fps, 1) if base_fps else None,
                  frames=N_ITERS * b * g, seconds=round(dt, 3),
                  runs_s=[round(r, 3) for r in runs])
    print(json.dumps(result), flush=True)

    # ---- extras: production mode + 720p, while the budget allows ----------
    # NOTE: the intra encode scan and intra decode scan must live in
    # SEPARATE programs — compiling both wavefront lax.scans into one XLA
    # module reliably SIGSEGVs this environment's AOT compile helper
    # (isolated empirically; either scan alone, or one scan + the full inter
    # pipeline, compiles fine). Production fps is therefore measured as two
    # fused loops — (intra-encode + inter encode + inter decode) and
    # (intra-decode) — and combined by total wall time, which still charges
    # every production stage.
    def _timed(loop_fn, *args):
        for attempt in range(3):        # tunnel compile is also flaky
            try:
                _ = int(loop_fn(*args))                 # compile + warmup
                break
            except Exception:
                if attempt == 2 or left() < 40:
                    raise
        t0 = time.perf_counter()
        _ = int(loop_fn(*args))
        return time.perf_counter() - t0

    def prod_bench(i_frames, p_frames, n_iters, label, luma_search=False):
        # luma_search=True measures the H.264-style G-channel motion search
        # (cfg.search_luma_only) under its own *_lumasearch key — the plain
        # keys keep the 3-channel-SAD definition for round-over-round
        # comparability.
        pcfg = CodecConfig.production(intra_qstep=QSTEP,
                                      search_luma_only=luma_search)

        @jax.jit
        def loop_enc(i_f, p_f):
            def step(it):
                # roll I and P by the same it-dependent amount: nothing is
                # loop-invariant (hoistable) and the motion search still
                # operates in its normal regime
                p = jnp.roll(p_f, it & 7, axis=-1)
                i = jnp.roll(i_f, it & 7, axis=-1)
                payload, i_rec = intra_codec.encode_intra_frames_lossy_batch(
                    i, QSTEP)
                enc = pipeline.encode_gop_batch(i_rec, p, pcfg)
                dec = pipeline.decode_gop_batch(enc, pcfg)
                return (jnp.sum(enc.mv) + jnp.sum(dec)
                        + jnp.sum(payload.qcoef.astype(jnp.int32)))
            return fused_loop(step, n_iters)

        payload, _ = intra_codec.encode_intra_frames_lossy_batch(
            i_frames, QSTEP)

        @jax.jit
        def loop_dec(pay):
            def step(it):
                # roll the coefficients so the decode is not loop-invariant
                # (XLA would hoist an invariant body out of the fori_loop)
                p2 = intra_codec.IntraFrameLossy(
                    jnp.roll(pay.qcoef, it & 7, axis=-1),
                    pay.modes, pay.escape)
                i_dec = intra_codec.decode_intra_frames_lossy_batch(
                    p2, QSTEP)
                return jnp.sum(i_dec)
            return fused_loop(step, n_iters)

        dt = _timed(loop_enc, i_frames, p_frames) + _timed(loop_dec, payload)
        nb, npf = p_frames.shape[:2]
        return round(n_iters * nb * (npf + 1) / dt, 1)

    try:
        if left() > 45:
            result["production_fps_640x360"] = prod_bench(
                i_b, p_b, 8, "production 640x360")
            print(json.dumps(result), flush=True)
        if left() > 45:
            # 720p operating point: 2x2-tile the 640x360 frames (north-star
            # metric is fps per chip at 1280x720, intra+inter); 32-frame
            # window so the wavefront intra batch (8 I-planes x 3 channels)
            # keeps the kernel's (batch, lane) axis dense
            arr720 = np.tile(arr[:32], (1, 1, 2, 2))    # [32,3,720,1280] u8
            b7 = 32 // g
            i7 = jnp.asarray(arr720[::g][:b7]).astype(jnp.int32)
            p7 = jnp.asarray(np.stack(
                [arr720[k * g + 1:k * g + g]
                 for k in range(b7)])).astype(jnp.int32)
            result["encode_decode_fps_1280x720"] = prod_bench(
                i7, p7, 4, "production 720p")
            print(json.dumps(result), flush=True)
            if left() > 45:
                result["encode_decode_fps_1280x720_lumasearch"] = prod_bench(
                    i7, p7, 4, "production 720p luma-search",
                    luma_search=True)
                print(json.dumps(result), flush=True)
        if left() > 45:
            # the 4:2:0 codec mode (lossy intra + luma search + chroma on
            # halved vectors), 640x352 (2*bs multiple)
            from vcs_h264_tpu.models import pipeline420
            ccfg = CodecConfig(quant_mode="rounded", chroma_420=True,
                               intra_i=True, intra_qstep=QSTEP)
            i_c = i_b[..., :352, :]
            p_c = p_b[..., :352, :]

            @jax.jit
            def loop_420(i_f, p_f):
                def step(it):
                    enc = pipeline420.encode_gop_batch_420(
                        jnp.roll(i_f, it & 7, axis=-1),
                        jnp.roll(p_f, it & 7, axis=-1), ccfg)
                    dec = pipeline420.decode_gop_batch_420(enc, ccfg)
                    return jnp.sum(dec) + jnp.sum(enc.mv)
                return fused_loop(step, 8)

            dt420 = _timed(loop_420, i_c, p_c)
            result["chroma420_fps_640x352"] = round(8 * b * g / dt420, 1)
            print(json.dumps(result), flush=True)
        if left() > 120:
            # beyond the north star: 1080p production (3x3-tiled, cropped
            # to 1920x1080 — a block multiple), 16-frame window
            arr1080 = np.tile(arr[:16], (1, 3, 3))[:, :, :1080, :1920]
            b9 = 16 // g
            i9 = jnp.asarray(arr1080[::g][:b9]).astype(jnp.int32)
            p9 = jnp.asarray(np.stack(
                [arr1080[k * g + 1:k * g + g]
                 for k in range(b9)])).astype(jnp.int32)
            result["production_fps_1920x1080"] = prod_bench(
                i9, p9, 4, "production 1080p")
            print(json.dumps(result), flush=True)
            if left() > 45:
                result["production_fps_1920x1080_lumasearch"] = prod_bench(
                    i9, p9, 4, "production 1080p luma-search",
                    luma_search=True)
                print(json.dumps(result), flush=True)
    except Exception as e:                              # extras must never
        result["extras_error"] = repr(e)                # kill the headline
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
