"""Codec configuration.

The reference scatters its knobs across module constants
(`InterframeCompression/main.py:13-16,27-28`, `motion.py:8-11`,
`DCTcompressor.py:29`, `DCTCompression/dct.py:157`). Here they are a single
frozen dataclass whose defaults mirror the reference's operating point
(BASELINE.md "Reference operating points").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """All codec knobs. Defaults = the reference's operating point."""

    # --- block / GOP structure ----------------------------------------------
    block_size: int = 8              # ref: main.py:15
    # Frame types in display order. "B" frames are bidirectionally predicted
    # from the nearest anchor (I/P) on each side — the reference only stubbed
    # these (`encoder.py:45-47`; prototype display order I,B,P,B,P,B,P at
    # `Prototypes/main-motion.py:137-140`). A pattern containing B must end
    # with an anchor so every B has both references inside its own GOP
    # (keeps GOPs independent — the data-parallel axis).
    gop_pattern: Tuple[str, ...] = ("I", "P", "P", "P")   # ref: main.py:16

    # --- motion search -------------------------------------------------------
    # search window reach, in pixels, each direction (ref: motion.py:18
    # `search_window_size = block_size * 2`)
    search_reach: int = 16
    # SAD threshold under which a block is declared static (ref: motion.py:8)
    static_threshold: int = 2000
    # coarse search grid step (ref: motion.py:132 `round(block_size/3)`)
    search_step: int = 3

    # Search SAD on the G channel only instead of all three BGR planes —
    # what every production H.264 encoder does (motion estimation on luma).
    # Encoder-side choice only: the stored MVs drive full-channel
    # compensation, so decoders are unaffected and containers are unchanged.
    # The static threshold (defined on 3-channel SAD, motion.py:8) is scaled
    # by 1/3 so the static early-out keeps its intended sensitivity.
    # Measured at 720p/1080p: search stage ~1.9x faster, e2e PSNR within
    # 0.05 dB (BASELINE.md round-5 notes). Default False = the reference's
    # 3-channel semantics (parity mode). No-op in chroma_420 mode, which
    # already searches luma by construction.
    search_luma_only: bool = False

    # --- transform / quantization -------------------------------------------
    quality_factor: float = 50.0      # ref: DCTcompressor.py:29 (dct.py:157 uses 99)
    with_residual: bool = True        # ref: main.py:27
    with_dct: bool = True             # ref: main.py:28
    # "reference": un-rounded float coefficient planes, residuals passed
    #   through a BGR->YCrCb roundtrip, truncating uint8 casts — reproduces
    #   the reference pipeline (DCTcompressor.py:71,89) for parity tests.
    # "rounded": round-to-nearest int16 coefficients (dct.py:179 semantics) —
    #   the production bitstream path (actually compressible).
    quant_mode: str = "reference"
    # Intra-code I-frames (lossless 4x4 mode prediction + wavefront decode)
    # in the serialized bitstream instead of storing them raw. The reference
    # never wired its intra study into the codec (SURVEY.md §1 L3).
    intra_i: bool = False
    # Lossy intra quantization step for I-frames (0 = lossless). When > 0,
    # I-frames are coded with the H.264 4x4 integer core transform the
    # reference declared but never used (intraframe.py:14-22,352-358) in a
    # closed loop: P/B frames reference the lossy reconstruction, so
    # encode/decode stay bit-consistent. Requires intra_i.
    intra_qstep: int = 0

    # Production residual transform: True codes the SIGNED residual through
    # the linear RCT decorrelation (models/pipeline.py, the only sane choice
    # under real quantization); False is the legacy container-v3 semantics
    # (mod-256 wrap residual + uint8 BGR->YCrCb roundtrip, as the v3-era
    # writer produced). Decode-only compatibility knob: load_vcs sets it for
    # v3 streams; save_vcs refuses to write it.
    signed_residual: bool = True

    # 4:2:0 codec mode: frames carried as Y + quarter-res Cr/Cb through the
    # whole codec (motion on luma, chroma rides halved vectors); the
    # reference only studied subsampling standalone (ChromaSubsampling/
    # chroma.py) and never wired it in. Requires the production quant path
    # (rounded, signed residuals) — wrap semantics are a full-res
    # reference-parity feature.
    chroma_420: bool = False

    # --- compute -------------------------------------------------------------
    dtype: str = "float32"            # transform math dtype on device

    def __post_init__(self):
        if self.block_size < 2:
            raise ValueError(f"block_size must be >= 2, got {self.block_size}")
        if self.with_dct and self.block_size != 8:
            # The JPEG quantization tables are 8x8 only (ops/quant.py
            # QY_BASE/QC_BASE = DCTcompressor.py:11-27); the reference's own
            # block-size sweep (Videos/MotionPrediction(NoRes)/
            # output-traffic(4x4|8x8|16x16).mp4, Prototypes/match-block.py:
            # 40-43) was motion-only. Reject loudly instead of shape-crashing
            # inside quant_tables.
            raise ValueError(
                f"with_dct requires block_size=8 (8x8 JPEG quantization "
                f"tables), got {self.block_size}. Use with_dct=False for "
                f"the block-size sweep; the reference's sweep used "
                f"search_reach=2*block_size and search_step=round("
                f"block_size/3) (motion.py:18,132).")
        if not self.gop_pattern or self.gop_pattern[0] != "I":
            raise ValueError("gop_pattern must start with 'I'")
        if any(t not in ("I", "P", "B") for t in self.gop_pattern):
            raise ValueError(f"unknown frame types in {self.gop_pattern}")
        if "I" in self.gop_pattern[1:]:
            raise ValueError("only the first frame of a GOP may be I")
        if "B" in self.gop_pattern and self.gop_pattern[-1] == "B":
            raise ValueError(
                "a GOP pattern with B frames must end with an anchor (P) so "
                "every B has a backward reference inside its own GOP")
        if not (1 <= self.quality_factor <= 99):
            raise ValueError("quality_factor must be in [1, 99]")
        if self.quant_mode not in ("reference", "rounded"):
            raise ValueError(f"unknown quant_mode {self.quant_mode!r}")
        if not (0 <= self.intra_qstep <= 255):
            raise ValueError("intra_qstep must be in [0, 255]")
        if self.intra_qstep and not self.intra_i:
            raise ValueError("intra_qstep > 0 requires intra_i=True")
        if self.chroma_420:
            if self.quant_mode != "rounded" or not self.with_dct \
                    or not self.with_residual:
                raise ValueError(
                    "chroma_420 requires the production path (quant_mode="
                    "'rounded', with_dct, with_residual): wrap-residual "
                    "semantics are a full-res reference-parity feature")

    @property
    def gop_len(self) -> int:
        return len(self.gop_pattern)

    @property
    def frames_per_gop_p(self) -> int:
        return self.gop_len - 1

    @property
    def has_b(self) -> bool:
        return "B" in self.gop_pattern

    @property
    def num_b(self) -> int:
        return sum(1 for t in self.gop_pattern if t == "B")

    @classmethod
    def reference(cls, **overrides) -> "CodecConfig":
        """The exact reference operating point (bit-parity mode)."""
        return cls(**overrides)

    @classmethod
    def bframes(cls, **overrides) -> "CodecConfig":
        """The prototype's 7-frame display order I,B,P,B,P,B,P
        (Prototypes/main-motion.py:137-140) with real bidirectional
        prediction."""
        kw = dict(gop_pattern=("I", "B", "P", "B", "P", "B", "P"))
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def production(cls, **overrides) -> "CodecConfig":
        """Rounded-quant bitstream mode (real compression), intra-coded
        I-frames."""
        kw = dict(quant_mode="rounded", intra_i=True)
        kw.update(overrides)
        return cls(**kw)
