"""vcs_h264_tpu — a TPU-native H.264-style video encode/decode engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
implementation (miatang13/VCS-h264): 4:2:0 chroma subsampling, 8x8 block DCT +
quantization, intra-frame prediction mode search, and block-based motion
estimation + residual coding for inter frames — built TPU-first:

  * frames live as batched planes in HBM; per-block Python loops in the
    reference become batched einsums / fused XLA ops / Pallas kernels;
  * GOPs are the data-parallel axis over a `jax.sharding.Mesh`; spatial tiles
    with halo exchange cover the motion-search window across shard edges;
  * integer semantics (mod-256 wrap, saturating SAD) are explicit so the
    encode->decode roundtrip is exact by construction.

Layering (mirrors reference layers documented in SURVEY.md §1):
  io/        host-side media I/O (cv2), bitstream serialization  [L0]
  ops/       color, subsample, DCT/quant, intra, motion           [L1-L3]
  models/    encoder/decoder GOP pipeline                         [L4]
  parallel/  mesh + sharded pipeline (halo exchange)              [new]
  utils/     metrics (PSNR/SSIM), profiling, logging              [new]
  cli        argparse driver                                      [L5]
"""

__version__ = "0.1.0"

from vcs_h264_tpu.config import CodecConfig

__all__ = ["CodecConfig", "__version__"]
