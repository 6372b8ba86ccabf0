"""Measure the Python reference implementation's encode+decode throughput.

The reference publishes no numbers (BASELINE.md), so the baseline denominator
is measured by importing the reference modules from /root/reference (read-only)
and timing Encoder.encode_frame + Decoder frame reconstruction on pre-loaded
frames of the target video. Writes BASELINE_MEASURED.json at the repo root.

Run:  python tools/measure_reference_baseline.py [n_frames]
"""

import json
import os
import sys
import time

import numpy as np
import cv2

REF = "/root/reference/InterframeCompression"
sys.path.insert(0, REF)

VIDEO = "/root/reference/videos/slow_traffic_small.mp4"
OUT = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")


def load_frames(path, n):
    cap = cv2.VideoCapture(path)
    frames = []
    while len(frames) < n:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse else float("inf")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    frames = load_frames(VIDEO, n)
    h, w, _ = frames[0].shape
    print(f"{len(frames)} frames {w}x{h}")

    # silence the reference's prints + tqdm
    import contextlib, io

    from encoder import Encoder            # noqa: E402 (reference module)
    from decoder import Decoder            # noqa: E402

    enc = Encoder(pattern=["I", "P", "P", "P"], shape=[h, w],
                  block_size=8, with_DCT=True)
    sink = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(sink), contextlib.redirect_stderr(sink):
        for i, f in enumerate(frames):
            enc.encode_frame(f, i)
    t_enc = time.perf_counter() - t0

    dec = Decoder(encoded_frames=enc.encoded_frames, fps=25.0, shape=[h, w],
                  ref_frames=enc.ref_frames, block_size=8, with_DCT=True)
    # reconstruct frames without the video-writer (time pure decode math)
    t0 = time.perf_counter()
    recon = []
    with contextlib.redirect_stdout(sink), contextlib.redirect_stderr(sink):
        num_ref = 0
        for fr in enc.encoded_frames:
            if fr.t == "I":
                recon.append(enc.ref_frames[num_ref]); num_ref += 1
            else:
                recon.append(dec._reconstruct_P_frame(fr, True))
    t_dec = time.perf_counter() - t0

    psnrs = [psnr(r, f) for r, f in zip(recon, frames)]
    capped = [min(p_, 99.0) for p_ in psnrs]     # cap lossless frames
    result = {
        "video": VIDEO,
        "width": w, "height": h, "n_frames": len(frames),
        "encode_s": t_enc, "decode_s": t_dec,
        "encode_fps": len(frames) / t_enc,
        "decode_fps": len(frames) / t_dec,
        "end_to_end_fps": len(frames) / (t_enc + t_dec),
        "mean_psnr_db": float(np.mean(psnrs)),
        "mean_psnr_capped99_db": float(np.mean(capped)),
        "per_frame_psnr_db": [round(float(p_), 4) if np.isfinite(p_)
                              else None for p_ in psnrs],
        "hardware": "1 CPU core (python reference)",
    }
    print(json.dumps(result, indent=2))
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
