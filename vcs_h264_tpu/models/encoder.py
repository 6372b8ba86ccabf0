"""Host-side encoder orchestration.

The reference `Encoder` (`encoder.py:9-70`) processes one frame per call and
accumulates Python lists. This encoder ingests frames, groups them into GOPs
(dispatch rule `frame_num % gop_len == 0 -> I`, encoder.py:25), batches GOPs,
and runs the jitted device pipeline — one device program per GOP batch
instead of ~10^4 Python-loop iterations per frame.

Adds the subsystems the reference lacks (SURVEY.md §5):
  * per-GOP checkpointing: with `checkpoint_dir`, every encoded GOP is
    persisted immediately and already-persisted GOPs are skipped on re-run,
    so a failed job re-encodes only its missing GOPs;
  * structured metrics: frames/s, static-block ratio and the
    nonzero-coefficient bits proxy per GOP, logged as JSONL.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models.gop import EncodedGOP, EncodedVideo
from vcs_h264_tpu.models import pipeline
from vcs_h264_tpu.io.video import group_into_gops
from vcs_h264_tpu.utils.profiling import StageTimer, trace_annotation


def _cfg_fingerprint(cfg: CodecConfig) -> str:
    """Stable string of every knob that changes what a checkpointed GOP
    contains. A checkpoint written under a different fingerprint must be
    re-encoded, not reused: e.g. the lossy-intra payload is qstep-dependent,
    so resuming with a changed intra_qstep would serialize a stream whose
    header qstep mismatches the stored coefficients and decode corrupted."""
    import json
    return json.dumps(dict(
        block_size=cfg.block_size, gop_pattern=",".join(cfg.gop_pattern),
        search_reach=cfg.search_reach, search_step=cfg.search_step,
        static_threshold=cfg.static_threshold,
        quality_factor=cfg.quality_factor, with_dct=cfg.with_dct,
        with_residual=cfg.with_residual, quant_mode=cfg.quant_mode,
        intra_i=cfg.intra_i, intra_qstep=cfg.intra_qstep,
        chroma_420=cfg.chroma_420), sort_keys=True)


def _save_gop_npz(path: str, gop: EncodedGOP, with_dct: bool,
                  fingerprint: str = "") -> None:
    def as_res(res):
        if res is None:
            return None
        res = np.asarray(res)
        return res.astype(np.uint8) if not with_dct else res

    # int16 MVs: int8 would silently wrap configs with search_reach > 127
    arrays = dict(i=np.asarray(gop.i_frame, np.uint8),
                  mv=np.asarray(gop.mv, np.int16),
                  cfg=np.array([fingerprint]))
    res = as_res(gop.residuals)
    if res is not None:
        arrays["res"] = res
    if gop.b_mv is not None:
        arrays["bmv"] = np.asarray(gop.b_mv, np.int16)
        arrays["bmode"] = np.asarray(gop.b_mode, np.int8)
        bres = as_res(gop.b_residuals)
        if bres is not None:
            arrays["bres"] = bres
    if gop.i_qcoef is not None:
        # the intra payload must survive resume: re-encoding the recon is
        # not bit-stable, the original encoding is (models/gop.py docstring)
        arrays["iq"] = np.asarray(gop.i_qcoef, np.int16)
        arrays["imodes"] = np.asarray(gop.i_modes, np.int8)
        arrays["iesc"] = np.asarray(gop.i_escape, bool)
    np.savez_compressed(path, **arrays)


def _save_gop_npz_420(path: str, gop, fingerprint: str = "") -> None:
    arrays = dict(y=np.asarray(gop.i_y, np.uint8),
                  c=np.asarray(gop.i_c, np.uint8),
                  mv=np.asarray(gop.mv, np.int16),
                  cfg=np.array([fingerprint]))
    if gop.res_y is not None:
        arrays["resy"] = np.asarray(gop.res_y, np.int16)
        arrays["resc"] = np.asarray(gop.res_c, np.int16)
    if gop.b_mv is not None:
        arrays["bmv"] = np.asarray(gop.b_mv, np.int16)
        arrays["bmode"] = np.asarray(gop.b_mode, np.int8)
        if gop.bres_y is not None:
            arrays["bresy"] = np.asarray(gop.bres_y, np.int16)
            arrays["bresc"] = np.asarray(gop.bres_c, np.int16)
    if gop.iq_y is not None:
        arrays.update(iqy=np.asarray(gop.iq_y, np.int16),
                      imy=np.asarray(gop.im_y, np.int8),
                      iey=np.asarray(gop.ie_y, bool),
                      iqc=np.asarray(gop.iq_c, np.int16),
                      imc=np.asarray(gop.im_c, np.int8),
                      iec=np.asarray(gop.ie_c, bool))
    np.savez_compressed(path, **arrays)


def _load_gop_npz_420(path: str, fingerprint: str = ""):
    from vcs_h264_tpu.models.pipeline420 import EncodedGOP420
    data = np.load(path)
    stored = str(data["cfg"][0]) if "cfg" in data else None
    if fingerprint and stored != fingerprint:
        return None
    iqy = data["iqy"] if "iqy" in data else None
    bmv = data["bmv"] if "bmv" in data else None
    return EncodedGOP420(
        i_y=data["y"].astype(np.int32), i_c=data["c"].astype(np.int32),
        mv=data["mv"].astype(np.int32),
        res_y=data["resy"] if "resy" in data else None,
        res_c=data["resc"] if "resc" in data else None,
        iq_y=iqy,
        im_y=data["imy"] if iqy is not None else None,
        ie_y=data["iey"] if iqy is not None else None,
        iq_c=data["iqc"] if iqy is not None else None,
        im_c=data["imc"] if iqy is not None else None,
        ie_c=data["iec"] if iqy is not None else None,
        b_mv=None if bmv is None else bmv.astype(np.int32),
        b_mode=data["bmode"].astype(np.int8) if bmv is not None else None,
        bres_y=data["bresy"] if "bresy" in data else None,
        bres_c=data["bresc"] if "bresc" in data else None)


def _load_gop_npz(path: str, fingerprint: str = "") -> Optional[EncodedGOP]:
    """Load a checkpointed GOP, or None when it was written under a different
    config fingerprint (stale checkpoints are re-encoded, never reused)."""
    data = np.load(path)
    stored = str(data["cfg"][0]) if "cfg" in data else None
    if fingerprint and stored != fingerprint:
        return None
    bmv = data["bmv"] if "bmv" in data else None
    return EncodedGOP(i_frame=data["i"].astype(np.int32),
                      mv=data["mv"].astype(np.int32),
                      residuals=data["res"] if "res" in data else None,
                      b_mv=None if bmv is None else bmv.astype(np.int32),
                      b_mode=(data["bmode"].astype(np.int8)
                              if bmv is not None else None),
                      b_residuals=data["bres"] if "bres" in data else None,
                      i_qcoef=data["iq"] if "iq" in data else None,
                      i_modes=data["imodes"] if "iq" in data else None,
                      i_escape=data["iesc"] if "iq" in data else None)


class Encoder:
    def __init__(self, cfg: CodecConfig = CodecConfig(),
                 gop_batch: int = 8, metrics=None, profile: bool = False):
        self.cfg = cfg
        self.gop_batch = gop_batch
        self.metrics = metrics          # utils.metrics.MetricsLogger or None
        # Opt-in per-stage wall-clock timing (utils/profiling.py). Blocking:
        # each stage waits on its device results, which defeats the async
        # dispatch overlap of encode_stream — keep off for throughput runs.
        self.stage_timer = StageTimer() if profile else None

    def _stage(self, name: str):
        """Profiler-annotated (and, with profile=True, timed) stage scope."""
        if self.stage_timer is not None:
            return self.stage_timer.stage(name)
        return trace_annotation(name)

    def encode_frames(self, frames: List[np.ndarray], fps: float = 25.0,
                      checkpoint_dir: Optional[str] = None,
                      gop_index_offset: int = 0) -> EncodedVideo:
        """Encode BGR uint8 frames (same shape, block-multiple dims).

        gop_index_offset: global index of the first GOP in `frames` — used
        for checkpoint naming when hosts encode disjoint GOP spans of one
        video into a shared checkpoint dir (parallel/distributed.py)."""
        if not frames:
            raise ValueError("no frames to encode")
        import time
        t_start = time.perf_counter()
        h, w, _ = frames[0].shape
        cfg = self.cfg
        gop_len = cfg.gop_len
        grouped = group_into_gops(frames, gop_len)
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

        def ckpt_path(idx: int) -> Optional[str]:
            return (os.path.join(
                checkpoint_dir, f"gop_{idx + gop_index_offset:06d}.npz")
                if checkpoint_dir else None)

        fingerprint = _cfg_fingerprint(cfg)
        load_ckpt = _load_gop_npz_420 if cfg.chroma_420 else _load_gop_npz
        encoded: List[Optional[EncodedGOP]] = [None] * len(grouped)
        pending = []
        for idx, (i_f, p_f) in enumerate(grouped):
            path = ckpt_path(idx)
            gop = (load_ckpt(path, fingerprint)
                   if path and os.path.exists(path) else None)
            if gop is not None:
                encoded[idx] = gop
            else:
                pending.append(idx)

        full = [i for i in pending if grouped[i][1].shape[0] == gop_len - 1]
        tail = [i for i in pending if grouped[i][1].shape[0] != gop_len - 1]

        if cfg.chroma_420:
            self._encode_pending_420(grouped, full, tail, encoded,
                                     ckpt_path, fingerprint)
            video = EncodedVideo(config=cfg, height=h, width=w, fps=fps,
                                 num_frames=len(frames), gops=encoded)
            self._log_summary(len(frames), len(encoded),
                              time.perf_counter() - t_start)
            return video

        def lossy_i(i_b):
            """GOP-level closed loop (cfg.intra_qstep): lossy-code the
            I-frames once; P/B frames reference the reconstruction, and the
            payload rides along for bit-stable serialization."""
            from vcs_h264_tpu.models import intra_codec
            payload, recon = intra_codec.encode_intra_frames_lossy_batch(
                i_b.astype(jnp.int32), cfg.intra_qstep)
            return payload, recon

        def attach(gop, payload, bi):
            import dataclasses
            return dataclasses.replace(
                gop, i_qcoef=payload.qcoef[bi], i_modes=payload.modes[bi],
                i_escape=payload.escape[bi])

        enc_batch = pipeline.jit_encode_gop_batch(cfg)
        for start in range(0, len(full), self.gop_batch):
            idxs = full[start:start + self.gop_batch]
            # uint8 uploads: device casts to int32 (4x less host link traffic)
            i_b = jnp.asarray(
                np.stack([grouped[i][0] for i in idxs]).transpose(0, 3, 1, 2))
            p_b = jnp.asarray(
                np.stack([grouped[i][1] for i in idxs])
                .transpose(0, 1, 4, 2, 3))
            payload = None
            if cfg.intra_qstep:
                with self._stage("intra_i_encode") as box:
                    payload, i_b = lossy_i(i_b)
                    if box is not None:
                        box["result"] = payload
            with self._stage("encode_gop_batch") as box:
                out = enc_batch(i_b, p_b)
                if box is not None:
                    box["result"] = out
            for bi, idx in enumerate(idxs):
                gop = jax.tree.map(lambda x, _bi=bi: x[_bi], out)
                if payload is not None:
                    gop = attach(gop, payload, bi)
                encoded[idx] = gop
                self._log_gop(idx, gop)
                if checkpoint_dir:
                    with self._stage("checkpoint_write"):
                        _save_gop_npz(ckpt_path(idx), gop, cfg.with_dct,
                                      fingerprint)

        enc_one = pipeline.jit_encode_gop(cfg)
        for idx in tail:
            i_f, p_f = grouped[idx]
            i_pl = jnp.asarray(i_f.transpose(2, 0, 1))
            payload = None
            if cfg.intra_qstep:
                payload, i_b1 = lossy_i(i_pl[None])
                i_pl = i_b1[0]
            if p_f.shape[0] == 0:
                gop = EncodedGOP(
                    i_frame=i_pl,
                    mv=jnp.zeros((0, h // cfg.block_size,
                                  w // cfg.block_size, 2), jnp.int32),
                    residuals=None)
            else:
                gop = enc_one(i_pl, jnp.asarray(p_f.transpose(0, 3, 1, 2)))
            if payload is not None:
                gop = attach(gop, payload, 0)
            encoded[idx] = gop
            self._log_gop(idx, gop)
            if checkpoint_dir:
                _save_gop_npz(ckpt_path(idx), gop, cfg.with_dct, fingerprint)

        video = EncodedVideo(config=cfg, height=h, width=w, fps=fps,
                             num_frames=len(frames), gops=encoded)
        self._log_summary(len(frames), len(encoded),
                          time.perf_counter() - t_start)
        return video

    def _log_summary(self, n_frames: int, n_gops: int, dt: float) -> None:
        """Emit the encode summary — and, when profiling, per-stage wall
        clock — into the JSONL metrics stream."""
        if not self.metrics:
            return
        self.metrics.log("encode_summary", frames=n_frames, seconds=dt,
                         fps=n_frames / dt, gops=n_gops)
        if self.stage_timer is not None and self.stage_timer.totals:
            self.metrics.log("stage_timings", **{
                k: round(v["mean_ms"], 3)
                for k, v in self.stage_timer.summary().items()})

    def _encode_pending_420(self, grouped, full, tail, encoded,
                            ckpt_path, fingerprint) -> None:
        """4:2:0 mode: the whole GOP batch (ingest, luma search, chroma on
        halved vectors, per-plane DCT/quant, optional lossy intra) is one
        jitted program (models/pipeline420.py)."""
        from vcs_h264_tpu.models import pipeline420 as p420
        cfg = self.cfg
        enc_batch = p420.jit_encode_gop_batch_420(cfg)

        def finish(idx, gop):
            encoded[idx] = gop
            self._log_gop(idx, gop)
            if ckpt_path(idx):
                _save_gop_npz_420(ckpt_path(idx), gop, fingerprint)

        for start in range(0, len(full), self.gop_batch):
            idxs = full[start:start + self.gop_batch]
            i_b = jnp.asarray(np.stack([grouped[i][0] for i in idxs])
                              .transpose(0, 3, 1, 2))
            p_b = jnp.asarray(np.stack([grouped[i][1] for i in idxs])
                              .transpose(0, 1, 4, 2, 3))
            with self._stage("encode_gop_batch_420") as box:
                out = enc_batch(i_b, p_b)
                if box is not None:
                    box["result"] = out
            for bi, idx in enumerate(idxs):
                finish(idx, jax.tree.map(lambda x, _bi=bi: x[_bi], out))

        for idx in tail:
            i_f, p_f = grouped[idx]
            i_pl = jnp.asarray(i_f.transpose(2, 0, 1))[None]
            if p_f.shape[0] == 0:
                h, w = i_f.shape[:2]
                nbh, nbw = h // cfg.block_size, w // cfg.block_size
                mv0 = jnp.zeros((0, nbh, nbw, 2), jnp.int32)
                if cfg.intra_qstep:
                    from vcs_h264_tpu.models import intra_codec
                    y, c = p420.ingest_420(i_pl.astype(jnp.int32))
                    pay_y, rec_y = intra_codec.encode_intra_frames_lossy_batch(
                        y[:, None], cfg.intra_qstep)
                    pay_c, rec_c = intra_codec.encode_intra_frames_lossy_batch(
                        c, cfg.intra_qstep)
                    gop = p420.EncodedGOP420(
                        i_y=rec_y[0, 0], i_c=rec_c[0], mv=mv0,
                        res_y=None, res_c=None,
                        iq_y=pay_y.qcoef[0], im_y=pay_y.modes[0],
                        ie_y=pay_y.escape[0], iq_c=pay_c.qcoef[0],
                        im_c=pay_c.modes[0], ie_c=pay_c.escape[0])
                else:
                    y, c = p420.ingest_420(i_pl.astype(jnp.int32))
                    gop = p420.EncodedGOP420(i_y=y[0], i_c=c[0], mv=mv0,
                                             res_y=None, res_c=None)
            else:
                out = enc_batch(
                    i_pl, jnp.asarray(p_f.transpose(0, 3, 1, 2))[None])
                gop = jax.tree.map(lambda x: x[0], out)
            finish(idx, gop)

    def _log_gop(self, idx: int, gop) -> None:
        if not self.metrics:
            return
        mv = np.asarray(gop.mv)
        n_blocks = max(1, mv.shape[0] * mv.shape[1] * mv.shape[2]) \
            if mv.ndim >= 3 else 1
        static = int(np.sum(np.all(mv == 0, axis=-1))) if mv.size else 0
        rec = {"gop": idx, "static_block_ratio": static / n_blocks}
        res = getattr(gop, "residuals", None)
        if res is None:
            res = getattr(gop, "res_y", None)
        if res is not None:
            res = np.asarray(res)
            if self.cfg.with_dct:
                nz = int(np.count_nonzero(np.round(res)))
                rec["nonzero_coeff_ratio"] = nz / res.size   # bits proxy
        self.metrics.log("gop", **rec)

    def encode_video(self, path: str, max_frames: Optional[int] = None,
                     checkpoint_dir: Optional[str] = None) -> EncodedVideo:
        from vcs_h264_tpu.io.video import VideoReader
        # 4:2:0 needs dims divisible by 2*bs (half-res chroma DCT blocks)
        mult = self.cfg.block_size * (2 if self.cfg.chroma_420 else 1)
        reader = VideoReader(path, block_multiple=mult,
                             max_frames=max_frames)
        if checkpoint_dir:
            # resume semantics want the full frame list up front
            frames = reader.read_all()
            return self.encode_frames(frames, fps=reader.fps,
                                      checkpoint_dir=checkpoint_dir)
        return self.encode_stream(reader)

    def encode_stream(self, reader) -> EncodedVideo:
        """Streaming encode: consume the reader in GOP-batch chunks so cv2
        decode (the reader's prefetch thread), host->device upload, and
        device compute of consecutive batches overlap — JAX dispatch is
        async and encoded GOPs stay device-resident until serialization, so
        each encode_frames call returns without waiting for the device
        (sustained file->file throughput, VERDICT r2 Next #4)."""
        cfg = self.cfg
        chunk = self.gop_batch * cfg.gop_len
        gops: List = []
        total = 0
        height = width = None
        buf: List[np.ndarray] = []

        def flush():
            nonlocal total, height, width
            if not buf:
                return
            v = self.encode_frames(buf, fps=reader.fps,
                                   gop_index_offset=len(gops))
            gops.extend(v.gops)
            total += len(buf)
            height, width = v.height, v.width
            buf.clear()

        for frame in reader:
            buf.append(frame)
            if len(buf) == chunk:
                flush()
        flush()
        if total == 0:
            raise ValueError("no frames to encode")
        return EncodedVideo(config=cfg, height=height, width=width,
                            fps=reader.fps, num_frames=total, gops=gops)
