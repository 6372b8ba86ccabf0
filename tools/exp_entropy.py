"""Entropy-model shootout on REAL quantized-coefficient streams.

Encodes 24 frames (production QF50) on CPU, extracts the per-GOP zigzag
coefficient streams exactly as the .vcs writer codes them, and estimates the
compressed size of candidate context models using the same 12-bit / >>5
adaptation rule as the range coder (cost = -log2(p), no renormalization —
within ~0.1% of the real coder). Directs the v9+ design.

Models:
  v8      one context set for the whole stream (runs cross blocks)
  v9      zigzag-band-conditioned contexts (shipping v9)
  cbf     per-block coded-block-flag (ctx: prev CBF) + in-block runs/levels
          with band contexts; trailing run implicit (EOB flag per token)
  cbf+lvl cbf + run contexts conditioned on previous |level| > 1
  cbf+dcd cbf + DC DPCM (delta vs previous block's DC)

Measured (24f slow_traffic, QF50): cbf -37.4% vs v8 (shipped as v10);
cbf+lvl adds ~0.1%; cbf+dcd is WORSE (-35.7%) - P-frame residual DCs are
not spatially correlated the way intra-image DCs are.

Round-5 shootout (same harness, 24f QF50, both R-D videos; shipped as v11,
native/bitstream.cpp vcs_rc_encode_i16_sig / vcs_rc_encode_modes2d):
  * significance-map coefficient coder (H.264-CABAC style): CBF with
    (left, up, temporal co-located, luma co-located) contexts; per-position
    sig flags with (zigzag bucket, previous frame's sig at that position,
    previous position's sig); band+gt1 level contexts; explicit last flag.
    -13.9% / -11.5% vs the v10 CBF coder on the P-coefficient streams —
    the temporal sig context is the load-bearing piece (+0.6%/+2.9%
    without it).
  * mode maps: (left, up)-PAIR truncated-unary contexts: +2.3% vs the v10
    prev-symbol contexts. An H.264-style MPM-flag variant (min(left, up)
    flag + reduced alphabet) measured WORSE (-0.6%/+1.0%) — the MPM flag
    discards the full conditional the pair context keeps.
  * motion vectors: a median-of-neighbors (left/up/up-right) residual
    predictor measured WORSE than the v9 zero-flag contexts (-12%/-20%):
    most blocks are static and already ~free under the zero flag, and
    prediction turns zero MVs ADJACENT to moving regions into nonzero
    residuals. A hybrid (v10 zero flag + median-hit flag on nonzero MVs)
    was also worse (-2.5%/-1.5%). v11 keeps the v9 MV coder.

Run: JAX_PLATFORMS=cpu python tools/exp_entropy.py [--frames 24]
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PB = 12
RATE = 5
INIT = 1 << (PB - 1)
RUN_CAP = 16
LEV_CAP = 16
LOG2 = [0.0] * (1 << PB)
for _i in range(1, 1 << PB):
    LOG2[_i] = -math.log2(_i / (1 << PB))


class Est:
    """Adaptive-binary bit-cost estimator (same adaptation as the coder)."""

    def __init__(self):
        self.bits = 0.0
        self.ctx = {}

    def bit(self, key, b):
        p = self.ctx.get(key, INIT)
        if b:
            self.bits += LOG2[(1 << PB) - p]
            self.ctx[key] = p - (p >> RATE)
        else:
            self.bits += LOG2[p]
            self.ctx[key] = p + (((1 << PB) - p) >> RATE)

    def eg0(self, v):                      # bypass bits cost 1.0 each
        self.bits += 2 * (int(v + 1).bit_length() - 1) + 1

    def tu(self, key, cap, v):
        stop = min(v, cap)
        for j in range(stop):
            self.bit((key, j), 1)
        if v < cap:
            self.bit((key, v), 0)
        else:
            self.eg0(v - cap)


def band(p, bl):
    if p == 0:
        return 0
    if p < 4:
        return 1
    if p < bl // 4:
        return 2
    return 3


def tokens_of(flat):
    """(positions, values) of nonzeros."""
    nz = np.flatnonzero(flat)
    return nz, flat[nz]


def model_v8(flat, bl):
    e = Est()
    nz, vals = tokens_of(flat)
    prev = 0
    for p, v in zip(nz, vals):
        e.tu(("run",), RUN_CAP, p - prev)
        e.bit(("sign",), 1 if v < 0 else 0)
        e.tu(("lev",), LEV_CAP, abs(int(v)) - 1)
        prev = p + 1
    e.tu(("run",), RUN_CAP, len(flat) - prev)
    return e.bits / 8


def model_v9(flat, bl):
    e = Est()
    nz, vals = tokens_of(flat)
    prev = 0
    for p, v in zip(nz, vals):
        e.tu(("run", band(prev % bl, bl)), RUN_CAP, p - prev)
        b = band(p % bl, bl)
        e.bit(("sign", b), 1 if v < 0 else 0)
        e.tu(("lev", b), LEV_CAP, abs(int(v)) - 1)
        prev = p + 1
    e.tu(("run", band(prev % bl, bl)), RUN_CAP, len(flat) - prev)
    return e.bits / 8


def model_cbf(flat, bl, lvl_ctx=False):
    e = Est()
    n_blocks = len(flat) // bl
    blocks = flat.reshape(n_blocks, bl)
    nz_mask = (blocks != 0).any(axis=1)
    prev_cbf = 0
    for bi in range(n_blocks):
        cbf = int(nz_mask[bi])
        e.bit(("cbf", prev_cbf), cbf)
        prev_cbf = cbf
        if not cbf:
            continue
        blk = blocks[bi]
        nz = np.flatnonzero(blk)
        pos = 0
        prev_big = 0
        for idx, p in enumerate(nz):
            key_extra = prev_big if lvl_ctx else 0
            e.tu(("run", band(pos, bl), key_extra), RUN_CAP, p - pos)
            v = int(blk[p])
            b = band(p, bl)
            e.bit(("sign", b), 1 if v < 0 else 0)
            e.tu(("lev", b), LEV_CAP, abs(v) - 1)
            prev_big = 1 if abs(v) > 1 else 0
            pos = p + 1
            # end-of-block flag after each level (ctx: band)
            last = idx == len(nz) - 1
            e.bit(("eob", b), 1 if last else 0)
    return e.bits / 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--video",
                    default="/root/reference/videos/slow_traffic_small.mp4")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import Encoder
    from vcs_h264_tpu.io.video import VideoReader
    from vcs_h264_tpu.io.bitstream import _zigzag_plane, rc_encode, \
        rc_encode_i16_b

    cfg = CodecConfig.production(quality_factor=50.0, intra_qstep=16)
    frames = VideoReader(args.video, block_multiple=8,
                         max_frames=args.frames).read_all()
    video = Encoder(cfg, gop_batch=4).encode_frames(frames)
    bl = cfg.block_size ** 2
    streams = [_zigzag_plane(np.round(np.asarray(g.residuals))
                             .astype(np.int16), cfg.block_size)
               for g in video.gops if g.residuals is not None]
    total = sum(len(s) for s in streams)
    nnz = sum(int(np.count_nonzero(s)) for s in streams)
    print(f"{len(streams)} GOP streams, {total} coeffs, {nnz} nonzero "
          f"({100*nnz/total:.2f}%)")
    real8 = sum(len(rc_encode(s)) for s in streams)
    real9 = sum(len(rc_encode_i16_b(s, bl)) for s in streams)
    print(f"real v8 bytes {real8}   real v9 bytes {real9} "
          f"({100*(1-real9/real8):+.2f}%)")
    def model_cbf_dcd(flat, bl):
        """cbf + DC DPCM: each block's DC (zigzag pos 0) is replaced by its
        delta vs the previous block's DC before coding."""
        x = flat.reshape(-1, bl).astype(np.int32).copy()
        dc = x[:, 0].copy()
        x[1:, 0] = dc[1:] - dc[:-1]
        return model_cbf(np.clip(x, -32768, 32767).astype(np.int16).ravel(),
                         bl, False)

    for name, fn in [("v8", model_v8), ("v9", model_v9),
                     ("cbf", lambda f_, b_: model_cbf(f_, b_, False)),
                     ("cbf+lvl", lambda f_, b_: model_cbf(f_, b_, True)),
                     ("cbf+dcd", model_cbf_dcd)]:
        est = sum(fn(s, bl) for s in streams)
        print(f"model {name:8s} {est:12.0f} B  ({100*(1-est/real8):+.2f}% "
              "vs real v8)")


if __name__ == "__main__":
    main()
