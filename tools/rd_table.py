"""Rate-distortion table: QF sweep x videos x codec modes.

Reports actual .vcs container bytes/frame + PSNR (the compression-side
evidence for BASELINE.md; reference analog: the dct.py QF studies,
`DCTCompression/dct.py:157,188-191` — which only ever printed sparsity).

    python tools/rd_table.py [--platform cpu] [--frames 24]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEOS = ["/root/reference/videos/slow_traffic_small.mp4",
          "/root/reference/videos/cat_short.mp4"]
QFS = [10.0, 50.0, 90.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["default", "cpu"], default="cpu")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--json", default=None, help="also write rows as JSON")
    ap.add_argument("--qfs", default=None,
                    help="comma-separated QF list (default 10,50,90)")
    args = ap.parse_args()
    if args.qfs:
        global QFS
        QFS = [float(q) for q in args.qfs.split(",")]
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.bitstream import save_vcs
    from vcs_h264_tpu.io.video import VideoReader
    from vcs_h264_tpu.utils.metrics import psnr

    import tempfile
    rows = []
    modes = [
        ("production", lambda qf: CodecConfig.production(quality_factor=qf,
                                                         intra_qstep=16)),
        ("chroma420", lambda qf: CodecConfig(
            quant_mode="rounded", chroma_420=True, intra_i=True,
            intra_qstep=16, quality_factor=qf)),
    ]
    for video_path in VIDEOS:
        if not os.path.exists(video_path):
            continue
        name = os.path.basename(video_path)
        for mode_name, mk in modes:
            for qf in QFS:
                cfg = mk(qf)
                mult = cfg.block_size * (2 if cfg.chroma_420 else 1)
                frames = VideoReader(video_path, block_multiple=mult,
                                     max_frames=args.frames).read_all()
                video = Encoder(cfg, gop_batch=4).encode_frames(frames)
                with tempfile.NamedTemporaryFile(suffix=".vcs") as f:
                    save_vcs(video, f.name)
                    size = os.path.getsize(f.name)
                dec = Decoder().decode(video)
                ps = float(np.mean([min(psnr(a, b), 99.0)
                                    for a, b in zip(frames, dec)]))
                raw = len(frames) * video.height * video.width * 3
                rows.append(dict(video=name, mode=mode_name, qf=qf,
                                 frames=len(frames),
                                 bytes_per_frame=size // len(frames),
                                 compression_x=round(raw / size, 2),
                                 psnr_capped99_db=round(ps, 2)))
                r = rows[-1]
                print(f"{name:28s} {mode_name:10s} QF={qf:4.0f}  "
                      f"{r['bytes_per_frame']:8d} B/frame  "
                      f"{r['compression_x']:7.2f}x  {r['psnr_capped99_db']:6.2f} dB",
                      flush=True)
    print("\n| video | mode | QF | B/frame | vs raw | PSNR (dB, cap 99) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['video']} | {r['mode']} | {r['qf']:.0f} | "
              f"{r['bytes_per_frame']} | {r['compression_x']}x | "
              f"{r['psnr_capped99_db']} |")
    if args.json:
        json.dump(rows, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
