"""Fused P-frame inter kernels: compensation + residual + color transform +
DCT + quantization in ONE Pallas program per (gop, block row).

The XLA production path (models/pipeline.py) round-trips every intermediate
through HBM: recon int32 [G,F,C,H,W] (Pallas compensate), resid int32, the
signed-RCT YCrCb planes f32, the block relayout, the coefficient planes f32
-> int16 — ~5.4 GB across stages at 720p/32f vs a ~6.6 ms HBM bound
(BASELINE.md roofline: the stage ran at ~25% of bound, VERDICT r3 Weak #4).
These kernels keep the whole P-frame path in VMEM:

  encode: ref strip (int8, recentered) --one-hot MXU mix--> recon
          - cur (int8) -> signed residual -> RCT (exact f32 elementwise)
          -> blockwise DCT as TWO kron matmuls on the [C*bs, W] strip
          (kron(I_C, D) on rows, kron(I_{W/bs}, D^T) on columns: the zero
          blocks contribute exact FP zeros, so the result is bitwise the
          XLA einsum's) -> /Q -> round -> int16 coefficients out.
  decode: coefficients * Q -> inverse kron matmuls -> inverse RCT -> round
          -> + recon -> clip -> int32 frames out.

Only uint8 curs (as recentered int8), int16 coefficients and the final
frames cross HBM. Semantics preserved bit-for-bit vs models/pipeline.py's
dct_compress_residual_signed / dct_decompress_residual_signed composition
(reference lineage: DCTcompressor.py:49-93 residual color roundtrip,
rounded-quant dct.py:179 semantics, decoder.py:52-60 add-back):
tests/test_inter_pallas.py (interpret mode) and tools/check_pallas_tpu.py
(hardware).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcs_h264_tpu.ops.dct import dct_matrix_np
from vcs_h264_tpu.ops.quant import quant_tables_np

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

# Signed-residual RCT constants (pipeline.py _RCT; cv2's YCrCb scale factors)
_KR, _KG, _KB = 0.299, 0.587, 0.114
_SCR, _SCB = 0.713, 0.564


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _kron_np(bs: int, n: int, transpose: bool) -> np.ndarray:
    """kron(I_n, D or D^T) as float32 (exact layout of the XLA blockwise
    einsum: zero blocks are exact FP zeros)."""
    d = dct_matrix_np(bs).astype(np.float32)
    return np.kron(np.eye(n, dtype=np.float32), d.T if transpose else d)


@functools.lru_cache(maxsize=None)
def _q_strip_np(qf: float, c: int, bs: int, w: int,
                chroma: bool = False) -> np.ndarray:
    """[C*bs, W] quantization divisor strip: q[ci, i, j % bs] tiled along
    the lane axis (Y table for channel 0, C table elsewhere — the fused path
    codes YCrCb order like quant_tables; chroma=True uses the C table for
    every channel, the 4:2:0 chroma-plane path)."""
    qy, qc = quant_tables_np(qf)
    tabs = [qc] * c if chroma else [qy] + [qc] * (c - 1)
    strip = np.concatenate([np.tile(t, (1, w // bs)) for t in tabs], axis=0)
    return strip.astype(np.float32)


def _strip_of(oct_refs, c, bs):
    """[C, rows, Wpp] int8 strip from the octet refs."""
    return jnp.concatenate(
        [r[0, 0].reshape(c, bs, r.shape[-1]) for r in oct_refs], axis=1)


def _recon_strip(strip, dipix, djpix, dmat_ref, fi, *, c, bs, reach, pad, w):
    """Recentered reconstruction strip [C, bs, W] f32 for frame fi from the
    int8 octet strip + per-pixel displacements (the branchless one-hot MXU
    mix + row select of motion_pallas._comp_kernel). dmat_ref [Wpp, W] i32
    holds s - x, so the per-frame one-hot needs ONE compare instead of two
    iotas + a full-panel add."""
    rows = strip.shape[1]
    wpp = strip.shape[-1]
    sb = strip.astype(jnp.bfloat16).reshape(c * rows, wpp)
    dj = djpix[0, 0, fi]                                       # [W]
    m = (dmat_ref[...] == dj[None, :] + pad).astype(jnp.bfloat16)
    t = lax.dot_general(sb, m, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [C*rows, W]
    t = t.reshape(c, rows, w)
    di = dipix[0, 0, fi][None, None, :]                        # [1, 1, W]
    acc = jnp.zeros((c, bs, w), jnp.float32)
    for d in range(-reach, reach + 1):
        seg = lax.slice(t, (0, pad + d, 0), (c, pad + d + bs, w))
        acc = jnp.where(di == d, seg, acc)
    return acc


def _recon_static(strip, *, c, bs, pad, w):
    """Zero-displacement reconstruction: the strip rows [pad, pad+bs) at
    columns [pad, pad+w) — a plain slice. Rows whose every MV is (0, 0)
    (the static early-out regime, ~98% of blocks on the headline content)
    take this path instead of the one-hot matmul + 33-way select."""
    seg = lax.slice(strip, (0, pad, pad), (c, pad + bs, pad + w))
    return seg.astype(jnp.float32)


def _dct_q(strip, kl_ref, kr_ref, q_ref):
    """[C*bs, W] f32 -> quantized int16 coefficients (bitwise the XLA
    dct2_blocks + round(d/q) composition; Precision.HIGHEST f32)."""
    d1 = lax.dot_general(kl_ref[...], strip,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    d2 = lax.dot_general(d1, kr_ref[...],
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    return jnp.round(d2 / q_ref[...]).astype(jnp.int16)


def _idct(coef_f32, kl_ref, kr_ref, q_ref):
    """Dequantize + inverse blockwise DCT on a [C*bs, W] f32 strip."""
    d = coef_f32 * q_ref[...]
    u1 = lax.dot_general(kl_ref[...], d,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    return lax.dot_general(u1, kr_ref[...],
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _enc_epilogue(recon, cur_ref, kl_ref, kr_ref, q_ref, out_ref, fi, c,
                  bs, w):
    cur = cur_ref[0, fi, :, 0].astype(jnp.float32)       # [C, bs, W] (-128)
    resid = cur - recon              # (cur-128) - (recon-128) = cur - recon
    if c == 3:
        # full-res BGR: signed-RCT decorrelation (pipeline.py production)
        b, g2, r = resid[0], resid[1], resid[2]
        y = _KR * r + _KG * g2 + _KB * b
        cr = (r - y) * _SCR
        cb = (b - y) * _SCB
        ycc = jnp.stack([y, cr, cb]).reshape(c * bs, w)
    else:
        # 4:2:0 planes are coded directly (pipeline420._code_planes)
        ycc = resid.reshape(c * bs, w)
    out_ref[0, fi, :, 0] = _dct_q(ycc, kl_ref, kr_ref, q_ref).reshape(
        c, bs, w)


def _enc_kernel(static_ref, dipix_ref, djpix_ref, dmat_ref, *refs, k_oct,
                bs, reach, pad, w, c, f):
    """out[g, fi, :, bi] = round(DCT(RCT(cur - recon)) / Q) as int16.

    static_ref [G, nbh] (scalar prefetch): rows whose every MV of every
    frame is (0, 0) reconstruct by a plain strip slice."""
    oct_refs = refs[:k_oct]
    cur_ref, kl_ref, kr_ref, q_ref, out_ref = refs[k_oct:k_oct + 5]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w)
        for fi in range(f):
            _enc_epilogue(recon, cur_ref, kl_ref, kr_ref, q_ref, out_ref,
                          fi, c, bs, w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        for fi in range(f):
            recon = _recon_strip(strip, dipix_ref, djpix_ref, dmat_ref, fi,
                                 c=c, bs=bs, reach=reach, pad=pad, w=w)
            _enc_epilogue(recon, cur_ref, kl_ref, kr_ref, q_ref, out_ref,
                          fi, c, bs, w)


def _dec_epilogue(recon, coef_ref, kl_ref, kr_ref, q_ref, out_ref, fi, c,
                  bs, w):
    coef = coef_ref[0, fi, :, 0].astype(jnp.float32).reshape(c * bs, w)
    ycc = _idct(coef, kl_ref, kr_ref, q_ref).reshape(c, bs, w)
    if c == 3:
        y, cr, cb = ycc[0], ycc[1], ycc[2]
        r = y + cr / _SCR
        b = y + cb / _SCB
        g2 = (y - _KR * r - _KB * b) / _KG
        resid = jnp.round(jnp.stack([b, g2, r]))
    else:
        resid = jnp.round(ycc)
    out_ref[0, fi, :, 0] = jnp.clip(recon + resid, 0, 255).astype(jnp.int32)


def _dec_kernel(static_ref, dipix_ref, djpix_ref, dmat_ref, *refs, k_oct,
                bs, reach, pad, w, c, f):
    """out[g, fi, :, bi] = clip(recon + round(RCT^-1(IDCT(coef * Q))));
    static rows (see _enc_kernel) reconstruct by a plain strip slice."""
    oct_refs = refs[:k_oct]
    coef_ref, kl_ref, kr_ref, q_ref, out_ref = refs[k_oct:k_oct + 5]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w) + 128.0
        for fi in range(f):
            _dec_epilogue(recon, coef_ref, kl_ref, kr_ref, q_ref, out_ref,
                          fi, c, bs, w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        for fi in range(f):
            recon = _recon_strip(strip, dipix_ref, djpix_ref, dmat_ref, fi,
                                 c=c, bs=bs, reach=reach, pad=pad,
                                 w=w) + 128.0
            _dec_epilogue(recon, coef_ref, kl_ref, kr_ref, q_ref, out_ref,
                          fi, c, bs, w)


@functools.lru_cache(maxsize=None)
def _dmat_np(wpp: int, w: int) -> np.ndarray:
    """[Wpp, W] i32 difference matrix s - x (one-hot compare operand)."""
    return (np.arange(wpp)[:, None] - np.arange(w)[None, :]).astype(np.int32)


# --- wide (frame-batched) reconstruction -----------------------------------
#
# The per-frame _recon_strip costs F one-hot compares + F bf16 matmuls +
# F*(2*reach+1) masked row selects per program — measured ~31 us/program of
# pure per-program latency at 720p (BASELINE.md roofline, VERDICT r4 Next
# #1). The wide form batches all F frames into ONE panel:
#
#   * the one-hot target is precomputed on the XLA side as a per-lane scalar
#     row cmpv[xf] = dj(xf) + (xf mod W) + pad, so the kernel's compare is a
#     single [Wpp, F*W] iota-vs-row compare — no [Wpp, W] dmat VMEM read at
#     all, and one compare instead of F;
#   * the mix runs as ONE INT8 MXU matmul [C*rows, Wpp] @ [Wpp, F*W] with
#     exact i32 accumulation (the one-hot selects exactly one recentered
#     int8 value per output, so int8 x {0,1} is bitwise the bf16 mix);
#   * the (2*reach+1)-way row select runs once on the [C, bs, F*W] panel
#     instead of F times.
#
# Requires W % 128 == 0 (per-frame lane slices of the wide panel must be
# lane-aligned for Mosaic); other widths take the per-frame kernels above.


def _recon_wide(strip, diall_ref, cmpv_ref, *, c, bs, reach, pad, f, w):
    """[C, bs, F*W] i32 recentered reconstruction panel for ALL F frames.

    diall/cmpv refs are [1, 1, 1, F*W] i32: per-destination-pixel row
    displacement and one-hot column target (see module note above)."""
    rows = strip.shape[1]
    wpp = strip.shape[-1]
    fw = f * w
    sb = strip.reshape(c * rows, wpp)                          # int8
    rowi = lax.broadcasted_iota(jnp.int32, (wpp, fw), 0)
    m = (rowi == cmpv_ref[0, 0, 0][None, :]).astype(jnp.int8)  # [Wpp, FW]
    t = lax.dot_general(sb, m, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)      # [C*rows, FW]
    t = t.reshape(c, rows, fw)
    di = diall_ref[0, 0, 0][None, None, :]                     # [1, 1, FW]
    acc = jnp.zeros((c, bs, fw), jnp.int32)
    for d in range(-reach, reach + 1):
        seg = lax.slice(t, (0, pad + d, 0), (c, pad + d + bs, fw))
        acc = jnp.where(di == d, seg, acc)
    return acc


def _stack_recon(wide, rbuf_ref, *, c, bs, f, w):
    """Relayout the wide recon panel [C, bs, F*W] i32 into frame-stacked
    [F*C*bs, W] f32 via the VMEM scratch (Mosaic cannot concatenate register
    values carrying different lane offsets — the scratch roundtrip is the
    supported path)."""
    cbs = c * bs
    for fi in range(f):
        seg = lax.slice(wide, (0, 0, fi * w), (c, bs, (fi + 1) * w))
        rbuf_ref[fi * cbs:(fi + 1) * cbs] = seg.reshape(cbs, w)
    return rbuf_ref[...].astype(jnp.float32)


def _tile_static(recon, *, f):
    """[C, bs, W] f32 static recon -> frame-stacked [F*C*bs, W] (every frame
    shares the zero-displacement reconstruction; same lane offsets, so the
    sublane concat is register-legal)."""
    cbs = recon.shape[0] * recon.shape[1]
    flat = recon.reshape(cbs, recon.shape[2])
    return jnp.concatenate([flat] * f, axis=0)


def _slab(panel, sbuf_ref, *, w):
    """Re-tile a [M, W] panel into [T*M, 128] slabs (T = W/128) via the
    VMEM scratch (register lane-shifts are not expressible; the scratch
    roundtrip is the supported relayout)."""
    m = panel.shape[0]
    for ti in range(w // 128):
        sbuf_ref[ti * m:(ti + 1) * m] = lax.slice(
            panel, (0, ti * 128), (m, (ti + 1) * 128))
    return sbuf_ref[...]


def _unslab(slabs, wbuf_ref, *, m, w):
    """Inverse of _slab: [T*M, 128] -> [M, W] via the f32 scratch."""
    for ti in range(w // 128):
        wbuf_ref[:, ti * 128:(ti + 1) * 128] = slabs[ti * m:(ti + 1) * m]
    return wbuf_ref[...]


def _enc_epi_stacked(recon_st, cur_ref, klf_ref, krs_ref, qts_ref, out_ref,
                     sbuf_ref, *, c, bs, f, w):
    """Frame-stacked encode epilogue. Two layout tricks vs the per-frame
    form, both bitwise identical (block-diagonal operators with exact-zero
    off-blocks give the same dot product per element):

      * the left DCT runs ONCE at M = F*C*bs (vs F matmuls at M = 24 that
        used 24 of the MXU's 128 sublanes);
      * the right DCT runs in 128-lane slab layout ([T*M, 128] @ the
        [128, 128] kron(I_16, D^T)) instead of the dense [W, W] kron —
        which did W/bs times the needed FLOPs (118M MACs/program at 720p,
        measured ~15 us of the ~24 us static-path program, round 5).

    qts is the quant divisor strip in slab layout."""
    cbs = c * bs
    m = f * cbs
    cur = cur_ref[0, :, :, 0].astype(jnp.float32).reshape(m, w)
    resid = cur - recon_st           # (cur-128) - (recon-128) = cur - recon
    if c == 3:
        rs4 = resid.reshape(f, c, bs, w)
        b, g2, r = rs4[:, 0], rs4[:, 1], rs4[:, 2]       # [f, bs, w]
        y = _KR * r + _KG * g2 + _KB * b
        cr = (r - y) * _SCR
        cb = (b - y) * _SCB
        ycc = jnp.stack([y, cr, cb], axis=1).reshape(m, w)
    else:
        ycc = resid
    d1 = lax.dot_general(klf_ref[...], ycc,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    d2s = lax.dot_general(_slab(d1, sbuf_ref, w=w), krs_ref[...],
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)  # [T*M, 128]
    res = jnp.round(d2s / qts_ref[...]).astype(jnp.int16)
    for ti in range(w // 128):
        out_ref[0, :, :, 0, :, ti * 128:(ti + 1) * 128] = (
            res[ti * m:(ti + 1) * m].reshape(f, c, bs, 128))


def _dec_epi_stacked(recon_st, coef_ref, klf_ref, krs_ref, qt_ref, out_ref,
                     sbuf_ref, wbuf_ref, *, c, bs, f, w):
    """Frame-stacked decode epilogue (see _enc_epi_stacked): recon_st is
    the RECENTERED stacked reconstruction (+128 applied here). qt is the
    quant divisor strip in WIDE layout (dequantization precedes the left
    DCT); the right DCT runs in slab layout with an unslab roundtrip
    before the elementwise tail."""
    cbs = c * bs
    m = f * cbs
    coef = coef_ref[0, :, :, 0].astype(jnp.float32).reshape(m, w)
    d = coef * qt_ref[...]
    u1 = lax.dot_general(klf_ref[...], d,
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    u2s = lax.dot_general(_slab(u1, sbuf_ref, w=w), krs_ref[...],
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)  # [T*M, 128]
    u2 = _unslab(u2s, wbuf_ref, m=m, w=w)
    ycc4 = u2.reshape(f, c, bs, w)
    if c == 3:
        y, cr, cb = ycc4[:, 0], ycc4[:, 1], ycc4[:, 2]
        r = y + cr / _SCR
        b = y + cb / _SCB
        g2 = (y - _KR * r - _KB * b) / _KG
        resid = jnp.round(jnp.stack([b, g2, r], axis=1)).reshape(m, w)
    else:
        resid = jnp.round(u2)
    out = jnp.clip(recon_st + 128.0 + resid, 0, 255).astype(jnp.int32)
    out_ref[0, :, :, 0] = out.reshape(f, c, bs, w)


def _enc_kernel_wide(static_ref, diall_ref, cmpv_ref, *refs, k_oct, bs,
                     reach, pad, w, c, f):
    """Wide variant of _enc_kernel: one one-hot matmul + row select for all
    F frames, then the frame-stacked RCT+DCT+quant epilogue."""
    oct_refs = refs[:k_oct]
    cur_ref, klf_ref, krs_ref, qts_ref, out_ref = refs[k_oct:k_oct + 5]
    rbuf_ref, sbuf_ref = refs[k_oct + 5:k_oct + 7]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w)
        _enc_epi_stacked(_tile_static(recon, f=f), cur_ref, klf_ref,
                         krs_ref, qts_ref, out_ref, sbuf_ref,
                         c=c, bs=bs, f=f, w=w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        wide = _recon_wide(strip, diall_ref, cmpv_ref, c=c, bs=bs,
                           reach=reach, pad=pad, f=f, w=w)
        recon_st = _stack_recon(wide, rbuf_ref, c=c, bs=bs, f=f, w=w)
        _enc_epi_stacked(recon_st, cur_ref, klf_ref, krs_ref, qts_ref,
                         out_ref, sbuf_ref, c=c, bs=bs, f=f, w=w)


def _dec_kernel_wide(static_ref, diall_ref, cmpv_ref, *refs, k_oct, bs,
                     reach, pad, w, c, f):
    oct_refs = refs[:k_oct]
    coef_ref, klf_ref, krs_ref, qt_ref, out_ref = refs[k_oct:k_oct + 5]
    rbuf_ref, sbuf_ref, wbuf_ref = refs[k_oct + 5:k_oct + 8]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w)
        _dec_epi_stacked(_tile_static(recon, f=f), coef_ref, klf_ref,
                         krs_ref, qt_ref, out_ref, sbuf_ref, wbuf_ref,
                         c=c, bs=bs, f=f, w=w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        wide = _recon_wide(strip, diall_ref, cmpv_ref, c=c, bs=bs,
                           reach=reach, pad=pad, f=f, w=w)
        recon_st = _stack_recon(wide, rbuf_ref, c=c, bs=bs, f=f, w=w)
        _dec_epi_stacked(recon_st, coef_ref, klf_ref, krs_ref, qt_ref,
                         out_ref, sbuf_ref, wbuf_ref, c=c, bs=bs, f=f, w=w)


def _recon_wide_2h(strip, di0_ref, cv0_ref, di1_ref, cv1_ref, *, c, bs,
                   reach, pad, f, w):
    """Two-MV-rows-per-strip reconstruction (4:2:0 chroma: the transform
    strip is bs = 8 rows but the motion grid is bs/2 = 4, so the top and
    bottom half-strips carry independent displacements). Each half gets
    its own one-hot column mix and a (2*reach+1)-way select of HALF-height
    windows; the halves concatenate on sublanes (same lane offsets, so the
    register concat is legal). -> [C, bs, F*W] i32 recentered."""
    rows = strip.shape[1]
    wpp = strip.shape[-1]
    fw = f * w
    half = bs // 2
    sb = strip.reshape(c * rows, wpp)
    rowi = lax.broadcasted_iota(jnp.int32, (wpp, fw), 0)
    accs = []
    for hi, (di_ref, cv_ref) in enumerate(((di0_ref, cv0_ref),
                                           (di1_ref, cv1_ref))):
        m = (rowi == cv_ref[0, 0, 0][None, :]).astype(jnp.int8)
        t = lax.dot_general(sb, m,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        t = t.reshape(c, rows, fw)
        di = di_ref[0, 0, 0][None, None, :]
        acc = jnp.zeros((c, half, fw), jnp.int32)
        base = pad + hi * half
        for d in range(-reach, reach + 1):
            seg = lax.slice(t, (0, base + d, 0), (c, base + d + half, fw))
            acc = jnp.where(di == d, seg, acc)
        accs.append(acc)
    return jnp.concatenate(accs, axis=1)


def _enc_kernel_wide2h(static_ref, di0, cv0, di1, cv1, *refs, k_oct, bs,
                       reach, pad, w, c, f):
    oct_refs = refs[:k_oct]
    cur_ref, klf_ref, krs_ref, qts_ref, out_ref = refs[k_oct:k_oct + 5]
    rbuf_ref, sbuf_ref = refs[k_oct + 5:k_oct + 7]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w)
        _enc_epi_stacked(_tile_static(recon, f=f), cur_ref, klf_ref,
                         krs_ref, qts_ref, out_ref, sbuf_ref,
                         c=c, bs=bs, f=f, w=w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        wide = _recon_wide_2h(strip, di0, cv0, di1, cv1, c=c, bs=bs,
                              reach=reach, pad=pad, f=f, w=w)
        recon_st = _stack_recon(wide, rbuf_ref, c=c, bs=bs, f=f, w=w)
        _enc_epi_stacked(recon_st, cur_ref, klf_ref, krs_ref, qts_ref,
                         out_ref, sbuf_ref, c=c, bs=bs, f=f, w=w)


def _dec_kernel_wide2h(static_ref, di0, cv0, di1, cv1, *refs, k_oct, bs,
                       reach, pad, w, c, f):
    oct_refs = refs[:k_oct]
    coef_ref, klf_ref, krs_ref, qt_ref, out_ref = refs[k_oct:k_oct + 5]
    rbuf_ref, sbuf_ref, wbuf_ref = refs[k_oct + 5:k_oct + 8]
    g, bi = pl.program_id(0), pl.program_id(1)
    strip = _strip_of(oct_refs, c, bs)

    @pl.when(static_ref[g, bi] == 1)
    def _():
        recon = _recon_static(strip, c=c, bs=bs, pad=pad, w=w)
        _dec_epi_stacked(_tile_static(recon, f=f), coef_ref, klf_ref,
                         krs_ref, qt_ref, out_ref, sbuf_ref, wbuf_ref,
                         c=c, bs=bs, f=f, w=w)

    @pl.when(static_ref[g, bi] == 0)
    def _():
        wide = _recon_wide_2h(strip, di0, cv0, di1, cv1, c=c, bs=bs,
                              reach=reach, pad=pad, f=f, w=w)
        recon_st = _stack_recon(wide, rbuf_ref, c=c, bs=bs, f=f, w=w)
        _dec_epi_stacked(recon_st, coef_ref, klf_ref, krs_ref, qt_ref,
                         out_ref, sbuf_ref, wbuf_ref, c=c, bs=bs, f=f, w=w)


def _prep_wide_2h(mv, refs, bs, reach):
    """Operand prep for the two-half chroma kernel: mv [G, F, nbh_mv,
    nbw_mv, 2] on the bs/2-px grid; refs [G, 1, H, W] (the Cr|Cb planes
    pre-concatenated along W by the caller — MV clamping guarantees no
    source window crosses the channel seam). Returns per-half (diall,
    cmpv) [G, nbh_t, 1, F*W] + the padded octet refs."""
    g, f, nbh_mv, nbw_mv = mv.shape[:4]
    c, h, w = refs.shape[1:]
    bs_mv = bs // 2
    nbh_t = nbh_mv // 2
    pad_top = _round_up(reach, bs)
    k_oct = -(-(pad_top + reach + bs) // bs)
    pad_bot = k_oct * bs - bs - pad_top
    wpp = _round_up(w + 2 * pad_top, 128)
    refp = jnp.pad((refs - 128).astype(jnp.int8),
                   ((0, 0), (0, 0), (pad_top, pad_bot),
                    (pad_top, wpp - w - pad_top)),
                   constant_values=np.int8(-128))
    n_oct = refp.shape[2] // bs
    refp = refp.reshape(g, c, n_oct, bs, wpp).transpose(
        0, 2, 1, 3, 4).reshape(g, n_oct, c * bs, wpp)

    colmod = jnp.tile(jnp.arange(w, dtype=jnp.int32), f)
    halves = []
    for hi in range(2):
        mvh = mv[:, :, hi::2]                        # [G, F, nbh_t, nbw, 2]
        # per-pixel maps over the half-width grid, tiled across the two
        # channel halves of the concatenated plane
        dip = jnp.repeat(mvh[..., 1], bs_mv, axis=-1).astype(jnp.int32)
        djp = jnp.repeat(mvh[..., 0], bs_mv, axis=-1).astype(jnp.int32)
        dip = jnp.tile(dip, (1, 1, 1, 2)).transpose(0, 2, 1, 3)
        djp = jnp.tile(djp, (1, 1, 1, 2)).transpose(0, 2, 1, 3)
        diall = dip.reshape(g, nbh_t, 1, f * w)
        cmpv = (djp.reshape(g, nbh_t, 1, f * w)
                + colmod[None, None, None, :] + pad_top)
        halves.append((diall, cmpv))
    return halves, refp, k_oct, pad_top, wpp


def _prep_wide(mv, refs, bs, reach):
    """Wide-kernel operand prep: flattened per-pixel displacement rows
    diall [G, nbh, 1, F*W] and one-hot targets cmpv [G, nbh, 1, F*W]
    (= dj + (x mod W) + pad), plus the int8 octet-grouped padded refs."""
    g, f, nbh, nbw = mv.shape[:4]
    c, h, w = refs.shape[1:]
    dipix, djpix, refp, k_oct, pad_top, wpp = _prep(mv, refs, bs, reach)
    diall = dipix.reshape(g, nbh, 1, f * w)
    colmod = jnp.tile(jnp.arange(w, dtype=jnp.int32), f)
    cmpv = djpix.reshape(g, nbh, 1, f * w) + colmod[None, None, None, :] \
        + pad_top
    return diall, cmpv, refp, k_oct, pad_top, wpp


def _specs_wide(f, c, bs, w, wpp, k_oct):
    fw = f * w
    lane_spec = pl.BlockSpec((1, 1, 1, fw),
                             lambda gi, bi, rs: (gi, bi, 0, 0),
                             memory_space=pltpu.VMEM)
    oct_specs = [
        pl.BlockSpec((1, 1, c * bs, wpp),
                     functools.partial(
                         lambda gi, bi, rs, q: (gi, bi + q, 0, 0), q=q),
                     memory_space=pltpu.VMEM)
        for q in range(k_oct)]
    plane_spec = pl.BlockSpec((1, f, c, 1, bs, w),
                              lambda gi, bi, rs: (gi, 0, 0, bi, 0, 0),
                              memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda gi, bi, rs: (0,) * len(shape), memory_space=pltpu.VMEM)
    return lane_spec, oct_specs, plane_spec, const_spec


def _prep(mv, refs, bs, reach):
    """Shared operand prep: displacement pixel maps + int8 octet-grouped
    padded reference (recentered by -128)."""
    g, f, nbh, nbw = mv.shape[:4]
    c, h, w = refs.shape[1:]
    pad_top = _round_up(reach, bs)
    k_oct = -(-(pad_top + reach + bs) // bs)
    pad_bot = k_oct * bs - bs - pad_top
    wpp = _round_up(w + 2 * pad_top, 128)
    refp = jnp.pad((refs - 128).astype(jnp.int8),
                   ((0, 0), (0, 0), (pad_top, pad_bot),
                    (pad_top, wpp - w - pad_top)),
                   constant_values=np.int8(-128))
    n_oct = refp.shape[2] // bs
    # octet-grouped int8 layout [G, n_oct, C*bs, Wpp]: trailing block dims
    # equal the array's (the int8 (32, 128) tile constraint is waived then)
    refp = refp.reshape(g, c, n_oct, bs, wpp).transpose(
        0, 2, 1, 3, 4).reshape(g, n_oct, c * bs, wpp)

    dipix = jnp.repeat(mv[..., 1], bs, axis=-1).astype(jnp.int32)
    djpix = jnp.repeat(mv[..., 0], bs, axis=-1).astype(jnp.int32)
    dipix = dipix.transpose(0, 2, 1, 3)                        # [G,nbh,F,W]
    djpix = djpix.transpose(0, 2, 1, 3)
    return dipix, djpix, refp, k_oct, pad_top, wpp


def _specs(f, c, bs, w, wpp, k_oct):
    # index maps take (gi, bi, rs): rs is the scalar-prefetched static-row
    # flag array (unused for addressing)
    pix_spec = pl.BlockSpec((1, 1, f, w), lambda gi, bi, rs: (gi, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    oct_specs = [
        pl.BlockSpec((1, 1, c * bs, wpp),
                     functools.partial(
                         lambda gi, bi, rs, q: (gi, bi + q, 0, 0), q=q),
                     memory_space=pltpu.VMEM)
        for q in range(k_oct)]
    plane_spec = pl.BlockSpec((1, f, c, 1, bs, w),
                              lambda gi, bi, rs: (gi, 0, 0, bi, 0, 0),
                              memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda gi, bi, rs: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pix_spec, oct_specs, plane_spec, const_spec


def _fused_call(mv, refs, planes, bs, reach, qf, *, decode, wide=None):
    """Shared driver for the fused encode/decode kernels: picks the wide
    (frame-batched) kernel when W is lane-aligned, else the per-frame one;
    both are bitwise-identical compositions. `wide` forces the choice
    (A/B benchmarking only)."""
    g, f, nbh, nbw = mv.shape[:4]
    c, h, w = refs.shape[1:]
    if wide is None:
        wide = w % 128 == 0
    n_kl = f * c if wide else c                  # frame-stacked vs per-frame
    n_kr = 128 // bs if wide else w // bs        # slab vs dense right DCT
    if decode:
        planes = planes.astype(jnp.int16).reshape(g, f, c, nbh, bs, w)
        kl = jnp.asarray(_kron_np(bs, n_kl, True))           # kron(I, D^T)
        kr = jnp.asarray(_kron_np(bs, n_kr, False))          # kron(I, D)
        out_dtype = jnp.int32
    else:
        planes = (planes - 128).astype(jnp.int8).reshape(g, f, c, nbh, bs, w)
        kl = jnp.asarray(_kron_np(bs, n_kl, False))
        kr = jnp.asarray(_kron_np(bs, n_kr, True))
        out_dtype = jnp.int16
    q = _q_strip_np(qf, c, bs, w)                            # [C*bs, W]
    if wide:
        q = np.tile(q, (f, 1))                               # [F*C*bs, W]
        if not decode:
            # slab layout for the encode quantizer (matches _dct_right_slab)
            m = f * c * bs
            q = q.reshape(m, w // 128, 128).transpose(1, 0, 2).reshape(
                (w // 128) * m, 128)
    q = jnp.asarray(q)
    row_static = jnp.all(mv == 0, axis=(1, 3, 4)).astype(jnp.int32)

    scratch = []
    if wide:
        m = f * c * bs
        diall, cmpv, refp, k_oct, pad_top, wpp = _prep_wide(
            mv, refs, bs, reach)
        lane_spec, oct_specs, plane_spec, const_spec = _specs_wide(
            f, c, bs, w, wpp, k_oct)
        body = _dec_kernel_wide if decode else _enc_kernel_wide
        lead_specs = [lane_spec, lane_spec]
        lead_ops = (diall, cmpv)
        scratch = [pltpu.VMEM((m, w), jnp.int32),            # recon stack
                   pltpu.VMEM(((w // 128) * m, 128), jnp.float32)]  # slabs
        if decode:
            scratch.append(pltpu.VMEM((m, w), jnp.float32))  # unslab
    else:
        dipix, djpix, refp, k_oct, pad_top, wpp = _prep(mv, refs, bs, reach)
        pix_spec, oct_specs, plane_spec, const_spec = _specs(
            f, c, bs, w, wpp, k_oct)
        body = _dec_kernel if decode else _enc_kernel
        lead_specs = [pix_spec, pix_spec, const_spec((wpp, w))]
        lead_ops = (dipix, djpix, jnp.asarray(_dmat_np(wpp, w)))

    kernel = functools.partial(body, k_oct=k_oct, bs=bs, reach=reach,
                               pad=pad_top, w=w, c=c, f=f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nbh),
        in_specs=lead_specs + oct_specs
        + [plane_spec, const_spec(kl.shape), const_spec(kr.shape),
           const_spec(q.shape)],
        out_specs=plane_spec,
        scratch_shapes=scratch)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, f, c, nbh, bs, w), out_dtype),
        compiler_params=_COMPILER_PARAMS,
    )(row_static, *lead_ops, *([refp] * k_oct), planes, kl, kr, q)
    return out.reshape(g, f, c, h, w)


def encode_p_coeffs_fused(mv: jnp.ndarray, refs: jnp.ndarray,
                          curs: jnp.ndarray, bs: int, reach: int,
                          qf: float) -> jnp.ndarray:
    """mv [G, F, nbh, nbw, 2]; refs [G, C, H, W] int; curs [G, F, C, H, W]
    uint8-valued int -> quantized residual coefficients int16
    [G, F, C, H, W]. C == 3: the full-res production path (signed RCT +
    Y/C quant tables; == pipeline.dct_compress_residual_signed(curs -
    recon) bitwise). C == 1: a bare plane (QY table, no color transform;
    == pipeline420._code_planes of the luma residual)."""
    return _fused_call(mv, refs, curs, bs, reach, qf, decode=False)


def decode_p_frames_fused(mv: jnp.ndarray, refs: jnp.ndarray,
                          coeffs: jnp.ndarray, bs: int, reach: int,
                          qf: float) -> jnp.ndarray:
    """Inverse of encode_p_coeffs_fused composed with compensation:
    [G, F, C, H, W] int32 decoded frames (== clip(recon +
    dct_decompress_residual_signed(coeffs)) bitwise)."""
    return _fused_call(mv, refs, coeffs, bs, reach, qf, decode=True)


# --- 4:2:0 chroma: fused compensate + DCT + quant ---------------------------
#
# The chroma planes' 4-px motion grid under the 8-px transform grid means
# TWO MV rows per transform strip — which the luma kernels cannot model —
# and the half-width planes (W/2 = 320 at the headline point) are not
# 128-lane-aligned. Both constraints dissolve together (VERDICT r4 Next
# #4): the Cr|Cb planes concatenate along W into ONE [H/2, W] plane
# (restoring lane alignment; MV clamping keeps every source window inside
# its own channel half, so the seam is never read across), and the
# reconstruction runs per half-strip with independent displacement maps
# (_recon_wide_2h). Epilogues are the shared frame-stacked slab forms with
# the C quant table. Bitwise-equal to pipeline420's XLA composition
# (chroma-halved compensation + _code_planes/_decode_planes).


def _fused_call_c420(mv_c, c_refs, planes, bs, reach_c, qf, *, decode):
    g = mv_c.shape[0]
    f = mv_c.shape[1]
    hc, wc = c_refs.shape[-2:]
    w = 2 * wc
    refs = jnp.concatenate([c_refs[:, 0], c_refs[:, 1]], axis=-1)[:, None]
    c = 1
    nbh_t = hc // bs
    if decode:
        planes = jnp.concatenate([planes[:, :, 0], planes[:, :, 1]],
                                 axis=-1)[:, :, None]
        planes = planes.astype(jnp.int16).reshape(g, f, c, nbh_t, bs, w)
        kl = jnp.asarray(_kron_np(bs, f * c, True))
        kr = jnp.asarray(_kron_np(bs, 128 // bs, False))
        out_dtype = jnp.int32
    else:
        planes = jnp.concatenate([planes[:, :, 0], planes[:, :, 1]],
                                 axis=-1)[:, :, None]
        planes = (planes - 128).astype(jnp.int8).reshape(
            g, f, c, nbh_t, bs, w)
        kl = jnp.asarray(_kron_np(bs, f * c, False))
        kr = jnp.asarray(_kron_np(bs, 128 // bs, True))
        out_dtype = jnp.int16
    q = np.tile(_q_strip_np(qf, c, bs, w, chroma=True), (f, 1))
    if not decode:
        m = f * c * bs
        q = q.reshape(m, w // 128, 128).transpose(1, 0, 2).reshape(
            (w // 128) * m, 128)
    q = jnp.asarray(q)
    # a strip is static iff BOTH of its MV rows are all-zero
    row_static = jnp.all(mv_c == 0, axis=(1, 3, 4))
    row_static = jnp.all(
        row_static.reshape(g, nbh_t, 2), axis=-1).astype(jnp.int32)

    halves, refp, k_oct, pad_top, wpp = _prep_wide_2h(
        mv_c, refs, bs, reach_c)
    lane_spec, oct_specs, plane_spec, const_spec = _specs_wide(
        f, c, bs, w, wpp, k_oct)
    body = _dec_kernel_wide2h if decode else _enc_kernel_wide2h
    m = f * c * bs
    scratch = [pltpu.VMEM((m, w), jnp.int32),
               pltpu.VMEM(((w // 128) * m, 128), jnp.float32)]
    if decode:
        scratch.append(pltpu.VMEM((m, w), jnp.float32))

    kernel = functools.partial(body, k_oct=k_oct, bs=bs, reach=reach_c,
                               pad=pad_top, w=w, c=c, f=f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nbh_t),
        in_specs=[lane_spec] * 4 + oct_specs
        + [plane_spec, const_spec(kl.shape), const_spec(kr.shape),
           const_spec(q.shape)],
        out_specs=plane_spec,
        scratch_shapes=scratch)
    (di0, cv0), (di1, cv1) = halves
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, f, c, nbh_t, bs, w), out_dtype),
        compiler_params=_COMPILER_PARAMS,
    )(row_static, di0, cv0, di1, cv1, *([refp] * k_oct), planes, kl, kr, q)
    out = out.reshape(g, f, hc, w)
    return jnp.stack([out[..., :wc], out[..., wc:]], axis=2)


def encode_c420_coeffs_fused(mv_c: jnp.ndarray, c_refs: jnp.ndarray,
                             c_curs: jnp.ndarray, bs: int, reach_c: int,
                             qf: float) -> jnp.ndarray:
    """mv_c [G, F, nbh_mv, nbw_mv, 2] (CHROMA vectors, bs/2-px grid);
    c_refs [G, 2, H/2, W/2] int; c_curs [G, F, 2, H/2, W/2] -> int16
    coefficients [G, F, 2, H/2, W/2] (== pipeline420._code_planes of
    c_curs - compensate(mv_c) with the C table, bitwise)."""
    return _fused_call_c420(mv_c, c_refs, c_curs, bs, reach_c, qf,
                            decode=False)


def decode_c420_frames_fused(mv_c: jnp.ndarray, c_refs: jnp.ndarray,
                             coeffs: jnp.ndarray, bs: int, reach_c: int,
                             qf: float) -> jnp.ndarray:
    """[G, F, 2, H/2, W/2] int32 decoded chroma planes (== clip(compensate
    + _decode_planes) bitwise)."""
    return _fused_call_c420(mv_c, c_refs, coeffs, bs, reach_c, qf,
                            decode=True)
