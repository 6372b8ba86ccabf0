"""Bitstream data model.

The reference's "bitstream" is a Python list of `Frame(t, mv, r, c, i, ref_i)`
objects held in encoder memory (`InterframeCompression/frame.py:1-8`,
`encoder.py:33`). Here the unit is the GOP — one I-frame plus its P-frames —
stored as a JAX pytree so it can be produced by a jitted pipeline, sharded
across devices, and serialized to a real artifact (SURVEY.md §5
checkpoint/resume plan). Block coordinates are implicit in the dense MV grid
(the reference's `block_coords` list is reconstructible from indices).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional

import numpy as np
import jax

from vcs_h264_tpu.config import CodecConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EncodedGOP:
    """One encoded GOP.

    i_frame:   int32/uint8 [H, W, 3]    raw reference frame (ref stores
               I-frames raw, encoder.py:41-43)
    mv:        int32 [P, nbh, nbw, 2]   (dx, dy) per block per P-frame
    residuals: with_dct=False: int32/uint8 [P, H, W, 3] wrap residuals
               with_dct=True:  float32 [P, 3, H, W] coefficient planes
               ("reference" quant mode) or int16 ("rounded" mode)

    B-frame fields (None unless the GOP pattern has B frames — the
    reference's stub, encoder.py:45-47):
    b_mv:        int32 [NB, 2, nbh, nbw, 2]  forward + backward vectors
    b_mode:      int8  [NB, nbh, nbw]        0=fwd, 1=bwd, 2=bi-average
    b_residuals: same formats as `residuals`, [NB, ...]

    Lossy-intra payload (None unless cfg.intra_qstep > 0). When present,
    `i_frame` holds the lossy RECONSTRUCTION — the exact plane the P/B
    frames were predicted against (GOP-level closed loop) — and the payload
    below is its compressed form, reproducing it bit-exactly on decode:
    i_qcoef:  int16 [C, H, W]        quantized 4x4 core-transform coeffs
    i_modes:  int8  [C, H/4, W/4]
    i_escape: bool  [C, H/4, W/4]
    """
    i_frame: jax.Array
    mv: jax.Array
    residuals: Optional[jax.Array]
    b_mv: Optional[jax.Array] = None
    b_mode: Optional[jax.Array] = None
    b_residuals: Optional[jax.Array] = None
    i_qcoef: Optional[jax.Array] = None
    i_modes: Optional[jax.Array] = None
    i_escape: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.i_frame, self.mv, self.residuals,
                self.b_mv, self.b_mode, self.b_residuals,
                self.i_qcoef, self.i_modes, self.i_escape), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_p(self) -> int:
        return self.mv.shape[0]

    @property
    def num_b(self) -> int:
        return 0 if self.b_mv is None else self.b_mv.shape[0]

    @property
    def num_coded(self) -> int:
        """Total frames this GOP codes (I + P + B)."""
        return 1 + self.num_p + self.num_b


@dataclasses.dataclass
class EncodedVideo:
    """A sequence of encoded GOPs + stream metadata. The separable artifact
    the reference lacks (its encode/decode share in-memory lists,
    main.py:48-49)."""
    config: CodecConfig
    height: int
    width: int
    fps: float
    num_frames: int
    gops: List[EncodedGOP]

    # ---- persistence (npz container; native entropy-coded container lives
    # in io/bitstream.py) ----------------------------------------------------

    def save_npz(self, path: str) -> None:
        arrays = {}

        def put_res(key, res):
            if res is None:
                return
            res = np.asarray(res)
            if not self.config.with_dct:
                res = res.astype(np.uint8)          # wrap residuals are bytes
            arrays[key] = res

        if self.config.chroma_420:
            self._save_npz_420(path, arrays)
            return
        # MVs are int16: values are bounded by search_reach, and int8 would
        # silently wrap any config with search_reach > 127.
        for g, gop in enumerate(self.gops):
            arrays[f"gop{g}_i"] = np.asarray(gop.i_frame, dtype=np.uint8)
            arrays[f"gop{g}_mv"] = np.asarray(gop.mv, dtype=np.int16)
            put_res(f"gop{g}_res", gop.residuals)
            if gop.b_mv is not None:
                arrays[f"gop{g}_bmv"] = np.asarray(gop.b_mv, dtype=np.int16)
                arrays[f"gop{g}_bmode"] = np.asarray(gop.b_mode, dtype=np.int8)
                put_res(f"gop{g}_bres", gop.b_residuals)
            if gop.i_qcoef is not None:
                # the lossy-intra payload must survive the roundtrip:
                # re-encoding the stored recon is not bit-stable, the
                # original encode-time payload is (EncodedGOP docstring)
                arrays[f"gop{g}_iq"] = np.asarray(gop.i_qcoef, np.int16)
                arrays[f"gop{g}_imodes"] = np.asarray(gop.i_modes, np.int8)
                arrays[f"gop{g}_iesc"] = np.asarray(gop.i_escape, bool)
        np.savez_compressed(path, _meta=np.array([json.dumps(
            self._meta_dict())]), **arrays)

    def _meta_dict(self) -> dict:
        return dict(height=self.height, width=self.width, fps=self.fps,
                    num_frames=self.num_frames, num_gops=len(self.gops),
                    block_size=self.config.block_size,
                    gop_pattern=",".join(self.config.gop_pattern),
                    quality_factor=self.config.quality_factor,
                    with_dct=int(self.config.with_dct),
                    with_residual=int(self.config.with_residual),
                    quant_mode=self.config.quant_mode,
                    search_reach=self.config.search_reach,
                    intra_i=int(self.config.intra_i),
                    intra_qstep=self.config.intra_qstep,
                    chroma_420=int(self.config.chroma_420))

    def _save_npz_420(self, path: str, arrays: dict) -> None:
        """4:2:0 stream: Y + quarter-res chroma planes per GOP
        (models/pipeline420.py)."""
        for g, gop in enumerate(self.gops):
            arrays[f"gop{g}_y"] = np.asarray(gop.i_y, np.uint8)
            arrays[f"gop{g}_c"] = np.asarray(gop.i_c, np.uint8)
            arrays[f"gop{g}_mv"] = np.asarray(gop.mv, np.int16)
            if gop.res_y is not None:
                arrays[f"gop{g}_resy"] = np.asarray(gop.res_y, np.int16)
                arrays[f"gop{g}_resc"] = np.asarray(gop.res_c, np.int16)
            if gop.b_mv is not None:
                arrays[f"gop{g}_bmv"] = np.asarray(gop.b_mv, np.int16)
                arrays[f"gop{g}_bmode"] = np.asarray(gop.b_mode, np.int8)
                if gop.bres_y is not None:
                    arrays[f"gop{g}_bresy"] = np.asarray(gop.bres_y, np.int16)
                    arrays[f"gop{g}_bresc"] = np.asarray(gop.bres_c, np.int16)
            if gop.iq_y is not None:
                for k, v, dt in (("iqy", gop.iq_y, np.int16),
                                 ("imy", gop.im_y, np.int8),
                                 ("iey", gop.ie_y, bool),
                                 ("iqc", gop.iq_c, np.int16),
                                 ("imc", gop.im_c, np.int8),
                                 ("iec", gop.ie_c, bool)):
                    arrays[f"gop{g}_{k}"] = np.asarray(v, dt)
        np.savez_compressed(path, _meta=np.array([json.dumps(
            self._meta_dict())]), **arrays)

    @classmethod
    def _load_npz_420(cls, data, meta, cfg: "CodecConfig") -> "EncodedVideo":
        from vcs_h264_tpu.models.pipeline420 import EncodedGOP420
        gops = []
        for g in range(int(meta["num_gops"])):
            resy = data.get(f"gop{g}_resy")
            iqy = data.get(f"gop{g}_iqy")
            bmv = data.get(f"gop{g}_bmv")
            gops.append(EncodedGOP420(
                i_y=data[f"gop{g}_y"].astype(np.int32),
                i_c=data[f"gop{g}_c"].astype(np.int32),
                mv=data[f"gop{g}_mv"].astype(np.int32),
                res_y=resy,
                res_c=data.get(f"gop{g}_resc"),
                iq_y=iqy,
                im_y=data.get(f"gop{g}_imy") if iqy is not None else None,
                ie_y=data.get(f"gop{g}_iey") if iqy is not None else None,
                iq_c=data.get(f"gop{g}_iqc") if iqy is not None else None,
                im_c=data.get(f"gop{g}_imc") if iqy is not None else None,
                ie_c=data.get(f"gop{g}_iec") if iqy is not None else None,
                b_mv=None if bmv is None else bmv.astype(np.int32),
                b_mode=(data[f"gop{g}_bmode"].astype(np.int8)
                        if bmv is not None else None),
                bres_y=data.get(f"gop{g}_bresy"),
                bres_c=data.get(f"gop{g}_bresc")))
        return cls(cfg, int(meta["height"]), int(meta["width"]),
                   float(meta["fps"]), int(meta["num_frames"]), gops)

    @classmethod
    def load_npz(cls, path: str) -> "EncodedVideo":
        data = np.load(path, allow_pickle=False)
        raw_meta = str(data["_meta"][0])
        try:
            meta = json.loads(raw_meta)
        except json.JSONDecodeError:
            # round-1 artifacts stored a Python repr dict; parse it safely
            import ast
            meta = ast.literal_eval(raw_meta)
        cfg = CodecConfig(
            block_size=int(meta["block_size"]),
            gop_pattern=tuple(meta["gop_pattern"].split(",")),
            quality_factor=float(meta["quality_factor"]),
            with_dct=bool(meta["with_dct"]),
            with_residual=bool(meta["with_residual"]),
            quant_mode=meta["quant_mode"],
            search_reach=int(meta.get("search_reach", 16)),
            intra_i=bool(meta.get("intra_i", 0)),
            intra_qstep=int(meta.get("intra_qstep", 0)),
            chroma_420=bool(meta.get("chroma_420", 0)))
        if cfg.chroma_420:
            return cls._load_npz_420(data, meta, cfg)
        gops = []
        for g in range(int(meta["num_gops"])):
            res = data.get(f"gop{g}_res")
            bmv = data.get(f"gop{g}_bmv")
            bres = data.get(f"gop{g}_bres")
            iq = data.get(f"gop{g}_iq")
            gops.append(EncodedGOP(
                i_frame=data[f"gop{g}_i"].astype(np.int32),
                mv=data[f"gop{g}_mv"].astype(np.int32),
                residuals=None if res is None else res,
                b_mv=None if bmv is None else bmv.astype(np.int32),
                b_mode=(None if bmv is None
                        else data[f"gop{g}_bmode"].astype(np.int8)),
                b_residuals=None if bres is None else bres,
                i_qcoef=iq,
                i_modes=data.get(f"gop{g}_imodes") if iq is not None else None,
                i_escape=data.get(f"gop{g}_iesc") if iq is not None else None))
        return cls(cfg, int(meta["height"]), int(meta["width"]),
                   float(meta["fps"]), int(meta["num_frames"]), gops)
