"""Benchmark: end-to-end encode+decode throughput on real video frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...extras}

Method: frames of the reference's headline video (slow_traffic_small.mp4,
640x360) are uploaded to the device once; the timed region is ONE jitted
call that runs N_ITERS full encode -> decode iterations in a lax.fori_loop,
each on a spatially rolled copy of the P-frames (the data-dependent roll
defeats loop-invariant hoisting, and the roll is <= 7 px so the motion
search still operates in its normal regime). A scalar reduction of every
iteration's outputs is loop-carried and fetched at the end, so the region
is a single dispatch: this measures sustained device throughput — the
production configuration — rather than the dev tunnel's ~25 ms synchronous
per-dispatch RPC floor (which at 64-frame batches would dominate and is an
artifact of this environment, not the codec; host DMA overlaps compute in
production).

PSNR is reported from one untimed iteration on the unrolled frames (so it is
comparable with the reference baseline measurement).

Baseline denominator: the measured Python reference (tools/
measure_reference_baseline.py -> BASELINE_MEASURED.json), end-to-end
encode+decode fps on one CPU core of this machine.
"""

import json
import os
import time

import numpy as np

VIDEO = "/root/reference/videos/slow_traffic_small.mp4"
BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "BASELINE_MEASURED.json")
N_FRAMES = 64          # frames resident on device (16 GOPs)
N_ITERS = 24
WARMUP = 2


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
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import pipeline

    cfg = CodecConfig()          # reference operating point: bs=8 IPPP QF=50
    frames = load_frames(VIDEO, N_FRAMES)
    if not frames:
        raise SystemExit(json.dumps({"metric": "encode_decode_fps",
                                     "value": 0, "unit": "fps",
                                     "vs_baseline": 0,
                                     "error": "video unavailable"}))
    arr = np.stack(frames).transpose(0, 3, 1, 2).astype(np.int32)  # [N,3,H,W]
    g = cfg.gop_len
    b = len(frames) // g
    i_b = jnp.asarray(arr[::g][:b])                                # [B,3,H,W]
    p_b = jnp.asarray(
        np.stack([arr[k * g + 1:k * g + g] for k in range(b)]))    # [B,P,3,H,W]

    def enc_dec(i_frames, p_frames):
        enc = pipeline.encode_gop_batch(i_frames, p_frames, cfg)
        dec = pipeline.decode_gop_batch(enc, cfg)
        return enc, dec

    @jax.jit
    def psnr_step(i_frames, p_frames):
        _, dec = enc_dec(i_frames, p_frames)
        err = (dec[:, 1:] - p_frames).astype(jnp.float32)
        return jnp.mean(err * err, axis=(2, 3, 4))     # [B, P] per frame

    @jax.jit
    def bench_loop(i_frames, p_frames):
        def body(it, acc):
            p = jnp.roll(p_frames, it & 7, axis=-1)
            enc, dec = enc_dec(i_frames, p)
            return acc + jnp.sum(enc.mv) + jnp.sum(dec)
        return lax.fori_loop(0, N_ITERS, body, jnp.int32(0))

    # untimed PSNR iteration + compile warmup of the timed loop
    mse = np.asarray(psnr_step(i_b, p_b))
    for _ in range(WARMUP):
        _ = int(bench_loop(i_b, p_b))

    # Timed region: ONE dispatch running N_ITERS iterations on device; the
    # scalar fetch is the sync point.
    t0 = time.perf_counter()
    sink = int(bench_loop(i_b, p_b))
    dt = time.perf_counter() - t0

    frames_done = N_ITERS * b * g
    fps = frames_done / dt
    # per-frame PSNR, capped at 99 dB (lossless frames), I-frames lossless
    mse = mse.ravel()
    p_psnr = np.where(mse > 0,
                      10 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12)),
                      np.inf)
    per_frame = np.concatenate([np.full(b, np.inf), p_psnr])   # + I frames
    psnr_capped = float(np.mean(np.minimum(per_frame, 99.0)))
    psnr_db = float(np.mean(np.minimum(p_psnr, 99.0)))

    vs = None
    extras = {}
    if os.path.exists(BASE):
        base = json.load(open(BASE))
        ref_fps = base.get("end_to_end_fps")
        if ref_fps:
            vs = fps / ref_fps
        extras["baseline_fps"] = ref_fps
        extras["baseline_psnr_capped99_db"] = base.get("mean_psnr_capped99_db")

    result = {
        "metric": "encode_decode_fps_640x360",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(vs, 1) if vs else None,
        "psnr_capped99_db": round(psnr_capped, 2),
        "p_frame_psnr_capped_db": round(psnr_db, 2),
        "frames": frames_done,
        "seconds": round(dt, 3),
        "device": str(jax.devices()[0]),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
