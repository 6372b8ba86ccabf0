"""Command-line driver (replaces the reference's edit-the-constants script,
`InterframeCompression/main.py:13-16,27-28`).

    python -m vcs_h264_tpu.cli encode IN.mp4 -o OUT.npz [--qf 50 ...]
    python -m vcs_h264_tpu.cli decode IN.npz -o OUT.mp4
    python -m vcs_h264_tpu.cli roundtrip IN.mp4 -o OUT.mp4 [--metrics m.jsonl]
    python -m vcs_h264_tpu.cli intra IN.png  (the intra study, intraframe.py)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _add_codec_args(p: argparse.ArgumentParser):
    p.add_argument("--block-size", type=int, default=8)
    p.add_argument("--gop", type=str, default="IPPP",
                   help="GOP pattern, e.g. IPPP")
    p.add_argument("--qf", type=float, default=50.0, help="quality factor")
    p.add_argument("--no-dct", action="store_true")
    p.add_argument("--no-residual", action="store_true")
    p.add_argument("--quant-mode", choices=["reference", "rounded"],
                   default="reference")
    p.add_argument("--production", action="store_true",
                   help="rounded quant + intra-coded I-frames (the real "
                        "bitstream path; shorthand for CodecConfig."
                        "production())")
    p.add_argument("--intra-i", action="store_true",
                   help="intra-code I-frames (lossless) in the container")
    p.add_argument("--intra-qstep", type=int, default=0,
                   help="lossy intra quant step for I-frames (0 = lossless; "
                        "implies --intra-i)")
    p.add_argument("--chroma-420", action="store_true",
                   help="4:2:0 codec mode: Y + quarter-res chroma through "
                        "the whole pipeline (implies the production quant "
                        "path)")
    p.add_argument("--search-luma-only", action="store_true",
                   help="motion-search SAD on the G channel only "
                        "(H.264-style luma-only estimation; ~1.9x faster "
                        "search, stored MVs still drive full-channel "
                        "compensation)")
    p.add_argument("--gop-batch", type=int, default=8)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--profile", action="store_true",
                   help="per-stage wall-clock timing (blocks on device "
                        "results at stage exits; prints a summary and, with "
                        "--metrics, logs a stage_timings record)")
    p.add_argument("--trace-dir", default=None,
                   help="capture a TensorBoard-viewable device trace of the "
                        "encode into this directory (jax.profiler)")


def _cfg(args):
    from vcs_h264_tpu.config import CodecConfig
    kw = dict(
        block_size=args.block_size,
        gop_pattern=tuple(args.gop),
        quality_factor=args.qf,
        with_dct=not args.no_dct and not args.no_residual,
        with_residual=not args.no_residual,
        quant_mode=args.quant_mode,
        intra_i=args.intra_i or args.intra_qstep > 0,
        intra_qstep=args.intra_qstep,
        chroma_420=args.chroma_420,
        search_luma_only=getattr(args, "search_luma_only", False))
    if args.production:
        kw["quant_mode"] = "rounded"
        kw["intra_i"] = True
    if args.chroma_420:
        kw["quant_mode"] = "rounded"
    return CodecConfig(**kw)


def _save_stream(video, path: str) -> str:
    """Write the stream; returns the path actually written (np.savez appends
    '.npz' when the name has no extension, so the input path may not exist)."""
    if path.endswith(".vcs"):
        from vcs_h264_tpu.io.bitstream import save_vcs
        save_vcs(video, path)
        return path
    video.save_npz(path)
    return path if path.endswith(".npz") else path + ".npz"


def _load_stream(path: str):
    if path.endswith(".vcs"):
        from vcs_h264_tpu.io.bitstream import load_vcs
        return load_vcs(path)
    from vcs_h264_tpu.models.gop import EncodedVideo
    return EncodedVideo.load_npz(path)


def _apply_platform(args):
    """--platform cpu forces the CPU backend (must run before any backend
    init; the axon sitecustomize force-registers the TPU tunnel, so an env
    var alone does not suffice)."""
    if getattr(args, "platform", None) == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def _encode_distributed(args, cfg):
    """Multi-process encode: each process initializes jax.distributed,
    encodes its contiguous assign_gops span into the shared checkpoint dir,
    barriers, and process 0 assembles the container from the checkpoints
    (SURVEY.md §2.3 'GOP independence across the video' — the DCN axis)."""
    import cv2
    from vcs_h264_tpu.models import Encoder
    from vcs_h264_tpu.io.video import VideoReader
    from vcs_h264_tpu.parallel.distributed import (assign_gops,
                                                   frame_range_for_gops,
                                                   init_distributed,
                                                   process_barrier)
    import os
    if not args.coordinator and not os.environ.get("VCS_COORDINATOR"):
        sys.exit("--procs > 1 requires --coordinator host:port")
    pid, n = init_distributed(args.coordinator, args.procs, args.proc_id)
    cap = cv2.VideoCapture(args.input)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    if args.max_frames:
        total = min(total, args.max_frames)
    gop_len = cfg.gop_len
    n_gops = (total + gop_len - 1) // gop_len
    idxs = assign_gops(n_gops, n, pid)
    lo, hi = frame_range_for_gops(idxs, gop_len, total)
    mult = cfg.block_size * (2 if cfg.chroma_420 else 1)
    reader = VideoReader(args.input, block_multiple=mult, max_frames=total)
    all_frames = reader.read_all()
    ck = args.checkpoint_dir or args.output + ".ckpt"
    enc = Encoder(cfg, gop_batch=args.gop_batch)
    if lo < hi:
        enc.encode_frames(all_frames[lo:hi], fps=reader.fps,
                          checkpoint_dir=ck, gop_index_offset=idxs[0])
        print(f"[proc {pid}/{n}] encoded GOPs {idxs[0]}..{idxs[-1]} -> {ck}")
    process_barrier("vcs_encode_done")
    if pid == 0:
        # every GOP is checkpointed now; this pass only loads + assembles
        video = enc.encode_frames(all_frames, fps=reader.fps,
                                  checkpoint_dir=ck)
        written = _save_stream(video, args.output)
        print(f"[proc 0/{n}] wrote {written} ({n_gops} GOPs, {n} procs)")


def _maybe_trace(trace_dir):
    """Device trace scope (utils/profiling.py) or a no-op."""
    import contextlib
    if not trace_dir:
        return contextlib.nullcontext()
    from vcs_h264_tpu.utils.profiling import device_trace
    print(f"capturing device trace -> {trace_dir}")
    return device_trace(trace_dir)


def _print_stage_summary(enc):
    if enc.stage_timer is None or not enc.stage_timer.totals:
        return
    print("stage timings (wall-clock, device-synced at stage exits):")
    for name, s in enc.stage_timer.summary().items():
        print(f"  {name:24s} {s['mean_ms']:9.2f} ms/call "
              f"x{s['calls']} = {s['total_s']:.3f} s")


def cmd_encode(args):
    from vcs_h264_tpu.models import Encoder
    cfg = _cfg(args)
    if args.procs > 1:
        _encode_distributed(args, cfg)
        return
    enc = Encoder(cfg, gop_batch=args.gop_batch, profile=args.profile)
    t0 = time.perf_counter()
    with _maybe_trace(args.trace_dir):
        video = enc.encode_video(args.input, max_frames=args.max_frames,
                                 checkpoint_dir=args.checkpoint_dir)
    dt = time.perf_counter() - t0
    _print_stage_summary(enc)
    written = _save_stream(video, args.output)
    import os
    size = os.path.getsize(written)
    raw = video.num_frames * video.height * video.width * 3
    print(f"encoded {video.num_frames} frames in {dt:.2f}s "
          f"({video.num_frames / dt:.1f} fps) -> {written} "
          f"({size} bytes, {raw / max(size, 1):.2f}x vs raw)")


def cmd_decode(args):
    from vcs_h264_tpu.models import Decoder
    video = _load_stream(args.input)
    t0 = time.perf_counter()
    Decoder(gop_batch=args.gop_batch).decode_to_file(video, args.output)
    dt = time.perf_counter() - t0
    print(f"decoded {video.num_frames} frames in {dt:.2f}s -> {args.output}")


def cmd_roundtrip(args):
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.video import VideoReader, VideoWriter
    from vcs_h264_tpu.utils.metrics import psnr, MetricsLogger

    cfg = _cfg(args)
    mult = cfg.block_size * (2 if cfg.chroma_420 else 1)
    reader = VideoReader(args.input, block_multiple=mult,
                         max_frames=args.max_frames)
    frames = reader.read_all()
    logger = MetricsLogger(args.metrics) if args.metrics else None
    enc = Encoder(cfg, gop_batch=args.gop_batch, profile=args.profile,
                  metrics=logger)
    t0 = time.perf_counter()
    with _maybe_trace(args.trace_dir):
        video = enc.encode_frames(frames, fps=reader.fps)
        recon = Decoder(gop_batch=args.gop_batch).decode(video)
    dt = time.perf_counter() - t0
    _print_stage_summary(enc)
    psnrs = []
    for i, (f, r) in enumerate(zip(frames, recon)):
        p = psnr(f, r)
        psnrs.append(p)
        if logger:
            logger.log("frame", index=i, psnr_db=p)
    mean_psnr = float(np.mean([p for p in psnrs if np.isfinite(p)] or [np.inf]))
    print(f"{len(frames)} frames in {dt:.2f}s ({len(frames)/dt:.1f} fps), "
          f"mean PSNR {mean_psnr:.2f} dB")
    if args.output:
        writer = VideoWriter(args.output, video.width, video.height, video.fps)
        for r in recon:
            writer.write(r)
        writer.close()
        print(f"wrote {args.output}")
    if logger:
        logger.log("summary", frames=len(frames), seconds=dt,
                   fps=len(frames) / dt, mean_psnr_db=mean_psnr)
        logger.close()


def _save_side_by_side(path: str, panels, titles):
    """The reference studies' side-by-side matplotlib comparison
    (chroma.py:43-54, dct.py:206-214, intraframe.py:366-389), saved to a
    file instead of shown interactively. Panels are BGR or grayscale."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, len(panels), figsize=(6 * len(panels), 5))
    if len(panels) == 1:
        axes = [axes]
    for ax, img, title in zip(axes, panels, titles):
        if img.ndim == 3:
            ax.imshow(img[..., ::-1])          # BGR -> RGB
        else:
            ax.imshow(img, cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    print(f"wrote comparison plot -> {path}")


def cmd_intra(args):
    """The intra study (ref: intraframe.py:319-391): mode search + sparsity."""
    import cv2
    import jax.numpy as jnp
    from vcs_h264_tpu.ops import intra
    from vcs_h264_tpu.utils.metrics import sparsity

    img = cv2.imread(args.input)
    if img is None:
        sys.exit(f"cannot read {args.input}")
    h, w = img.shape[:2]
    img = cv2.resize(img, (16 * (w // 16), 16 * (h // 16)))
    ycc = cv2.cvtColor(img, cv2.COLOR_BGR2YCR_CB)
    y, cr, cb = (jnp.asarray(ycc[..., i], jnp.int32) for i in range(3))
    if args.mode == "4x4":
        yres, ypred, modes = intra.luma4x4(y)
    else:
        yres, ypred, modes = intra.luma16x16(y)
    crres, crpred, cbres, cbpred, cmodes = intra.chroma8x8(cr, cb)
    # the reference's printed statistics (intraframe.py:360-365)
    for name, r in [("Y", yres), ("Cb", cbres), ("Cr", crres)]:
        print(f"sparsity ({name}): {sparsity(np.asarray(r)):.6f}")
    pred = np.dstack([np.asarray(ypred), np.asarray(crpred),
                      np.asarray(cbpred)]).astype(np.uint8)
    pred_bgr = cv2.cvtColor(pred, cv2.COLOR_YCR_CB2BGR)
    if args.output:
        cv2.imwrite(args.output, pred_bgr)
        print(f"wrote prediction image -> {args.output}")
    if args.plot:
        # the reference's 2x2 figure (intraframe.py:366-389): original,
        # prediction, residual, mode map — flattened to one row
        _save_side_by_side(
            args.plot,
            [img, pred_bgr, np.abs(np.asarray(yres)).astype(np.uint8),
             np.asarray(modes).astype(np.uint8)],
            ["original", "intra prediction", "|Y residual|", "Y mode map"])


def cmd_dct_study(args):
    """The DCT study (ref: DCTCompression/dct.py completeDCT): blockwise
    DCT + rounded quantization of an image, sparsity + PSNR report."""
    import cv2
    import jax.numpy as jnp
    from vcs_h264_tpu.ops import dct as dct_ops
    from vcs_h264_tpu.ops import quant as quant_ops
    from vcs_h264_tpu.ops import blocks as blk
    from vcs_h264_tpu.ops import color
    from vcs_h264_tpu.utils.metrics import sparsity, psnr

    img = cv2.imread(args.input)
    if img is None:
        sys.exit(f"cannot read {args.input}")
    bs = args.block_size
    h, w = img.shape[:2]
    img = cv2.resize(img, (bs * (w // bs), bs * (h // bs)))
    planes = jnp.asarray(img.transpose(2, 0, 1), jnp.int32)
    ycc = color.bgr_to_ycrcb_planes(planes).astype(jnp.float32) - 128
    q = quant_ops.quant_tables(args.qf, jnp.float32)
    coeffs = quant_ops.quantize(
        dct_ops.dct2_blocks(blk.plane_to_blocks(ycc, bs)),
        q[:, None, None], rounded=True)
    # the reference's printed statistic (dct.py:188-191)
    print(f"sparsity: {sparsity(np.asarray(coeffs)):.6f}")
    back = dct_ops.idct2_blocks(quant_ops.dequantize(coeffs, q[:, None, None]))
    rec = jnp.clip(jnp.round(blk.blocks_to_plane(back)) + 128, 0, 255)
    bgr = np.asarray(color.ycrcb_to_bgr_planes(rec.astype(jnp.int32)))
    bgr_hwc = bgr.transpose(1, 2, 0).astype(np.uint8)
    print(f"roundtrip PSNR at QF={args.qf}: {psnr(bgr_hwc, img):.2f} dB")
    if args.output:
        cv2.imwrite(args.output, bgr_hwc)
        print(f"wrote {args.output}")
    if args.plot:
        _save_side_by_side(args.plot, [img, bgr_hwc],
                           ["original", f"DCT roundtrip QF={args.qf:.0f}"])


def cmd_chroma_study(args):
    """The 4:2:0 chroma study (ref: ChromaSubsampling/chroma.py)."""
    import cv2
    import jax.numpy as jnp
    from vcs_h264_tpu.ops import subsample
    from vcs_h264_tpu.utils.metrics import psnr

    img = cv2.imread(args.input)
    if img is None:
        sys.exit(f"cannot read {args.input}")
    planes = jnp.asarray(img.transpose(2, 0, 1), jnp.int32)
    out = np.asarray(subsample.chroma_420_roundtrip(planes))
    out_hwc = out.transpose(1, 2, 0).astype(np.uint8)
    print(f"4:2:0 roundtrip PSNR: {psnr(out_hwc, img):.2f} dB")
    if args.output:
        cv2.imwrite(args.output, out_hwc)
        print(f"wrote {args.output}")
    if args.plot:
        _save_side_by_side(args.plot, [img, out_hwc],
                           ["original", "4:2:0 roundtrip"])


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vcs_h264_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode", help="encode video -> .npz/.vcs bitstream")
    p.add_argument("input"); p.add_argument("-o", "--output", required=True)
    p.add_argument("--procs", type=int, default=1,
                   help="total processes for multi-host encode "
                        "(jax.distributed; GOP spans assigned per process)")
    p.add_argument("--proc-id", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="host:port of the jax.distributed coordinator")
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-GOP checkpoint/resume dir (shared across "
                        "processes in distributed mode)")
    _add_codec_args(p); p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("decode", help="decode .npz bitstream -> video")
    p.add_argument("input"); p.add_argument("-o", "--output", required=True)
    p.add_argument("--gop-batch", type=int, default=8)
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("roundtrip", help="encode+decode, report PSNR")
    p.add_argument("input"); p.add_argument("-o", "--output", default=None)
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    _add_codec_args(p); p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser("intra", help="intra-frame study on an image")
    p.add_argument("input"); p.add_argument("-o", "--output", default=None)
    p.add_argument("--mode", choices=["4x4", "16x16"], default="4x4")
    p.add_argument("--plot", default=None, help="side-by-side comparison PNG")
    p.set_defaults(fn=cmd_intra)

    p = sub.add_parser("dct", help="DCT+quant study on an image")
    p.add_argument("input"); p.add_argument("-o", "--output", default=None)
    p.add_argument("--qf", type=float, default=99.0)
    p.add_argument("--plot", default=None, help="side-by-side comparison PNG")
    p.add_argument("--block-size", type=int, default=8)
    p.set_defaults(fn=cmd_dct_study)

    p = sub.add_parser("chroma", help="4:2:0 subsampling study on an image")
    p.add_argument("input"); p.add_argument("-o", "--output", default=None)
    p.add_argument("--plot", default=None, help="side-by-side comparison PNG")
    p.set_defaults(fn=cmd_chroma_study)

    for sp in sub.choices.values():
        sp.add_argument("--platform", choices=["default", "cpu"],
                        default="default",
                        help="cpu forces the CPU backend (no TPU contact)")

    args = ap.parse_args(argv)
    _apply_platform(args)
    args.fn(args)


if __name__ == "__main__":
    main()
