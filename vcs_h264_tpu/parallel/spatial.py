"""Spatially-sharded GOP pipeline: row tiles + ppermute halo exchange.

Each frame's rows are sharded over the mesh "tile" axis; the GOP batch axis is
sharded over "gop". Motion search inside a tile needs reference-frame rows up
to `reach + bs` beyond the tile edges (the +/-16 px window of motion.py:18,
plus the block extent), so each tile exchanges `halo = reach + bs` boundary
rows of the I-frame with its neighbors via `jax.lax.ppermute` over ICI before
searching — the CP/ring-analog communication pattern of this domain
(SURVEY.md §2.3, §5 "long-context" plan).

The tile-local search mirrors ops/motion.py's family decomposition in strip
coordinates: global row g of tile t lives at strip row g - t*th + halo, so the
"relative displacement" family is the same uniform shift, and the global-top
"absolute grid" family lands at static strip rows on tile 0 (selected by
`axis_index == 0`; other tiles compute and discard it — two block rows of
wasted work). Candidate validity and global candidate rows are data (sharded
[nbh, K] arrays from the host plan), because the bottom clamp i_max = min(c +
reach, H) (motion.py:127) crosses tile boundaries.

Layout is planar [C, H, W] like the rest of the device pipeline.

Bit-exactness vs the unsharded path is asserted in tests/test_parallel.py.
Constraint: tile height must be a multiple of bs and >= halo = reach + bs
(each halo comes from a single neighbor).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models.gop import EncodedGOP
from vcs_h264_tpu.models.pipeline import (_b_mode_select, dct_compress_residual,
                                          dct_compress_residual_signed,
                                          dct_decompress_residual,
                                          dct_decompress_residual_signed,
                                          gop_layout)
from vcs_h264_tpu.ops import motion as M
from vcs_h264_tpu.ops.motion import (_INIT_SENTINEL, _MASKED, _tile_sums,
                                     _wrap_abs_diff, make_plan)


def _halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """[..., C, th, W] -> [..., C, th + 2*halo, W] with neighbor rows.

    Missing neighbors (frame edges) contribute zeros — those rows are only
    reachable by masked candidates."""
    n = lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]       # my bottom rows -> next tile
    up = [(i, i - 1) for i in range(1, n)]          # my top rows -> prev tile
    top_halo = lax.ppermute(x[..., -halo:, :], axis_name, down)
    bot_halo = lax.ppermute(x[..., :halo, :], axis_name, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=-2)


def _tile_search(cur_t, strip, valid_i_t, pos_i_t, tile_idx, plan, th):
    """Search one tile. cur_t [C, th, W] int32; strip [C, th+2h, W];
    valid_i_t/pos_i_t [nbh_t, K]; returns (pi, pj, hit)."""
    bs, reach, step, k = plan.bs, plan.reach, plan.step, plan.k
    w = plan.w
    ne_i, ne_j = plan.n_edge_i, plan.n_edge_j
    nbw = plan.nbw
    nbh_t = th // bs
    c = cur_t.shape[0]
    halo = reach + bs
    pad_j = reach + bs
    stripp = jnp.pad(strip, ((0, 0), (0, 0), (pad_j, pad_j)))
    wp = w + 2 * pad_j
    strip_h = strip.shape[-2]

    # ---- relative-rows stack [K, C, th, Wp] --------------------------------
    row_rel = jnp.stack([
        lax.slice(stripp, (0, halo - reach + step * ki, 0),
                  (c, halo - reach + step * ki + th, wp))
        for ki in range(k)])
    # ---- absolute-rows stack (global top grid; tile-0 strip rows) ----------
    row_abs = jnp.stack([
        lax.slice(stripp, (0, min(halo + step * ki, strip_h - bs), 0),
                  (c, min(halo + step * ki, strip_h - bs) + bs, wp))
        for ki in range(k)])                                  # [K, C, bs, Wp]
    cur_top = cur_t[:, : ne_i * bs].reshape(c, ne_i, bs, w)
    cur_top = cur_top.transpose(1, 0, 2, 3)                   # [ne_i, C, bs, W]

    rel_list, abs_list = [], []
    for kj in range(k):
        dj = step * kj - reach
        shifted = lax.slice(row_rel, (0, 0, 0, pad_j + dj),
                            (k, c, th, pad_j + dj + w))
        rel_list.append(_tile_sums(_wrap_abs_diff(shifted, cur_t[None]), bs))
        s = lax.slice(row_abs, (0, 0, 0, pad_j + dj),
                      (k, c, bs, pad_j + dj + w))
        d = _wrap_abs_diff(s[None], cur_top[:, None])         # [ne_i,K,C,bs,W]
        abs_list.append(_tile_sums(d, bs)[..., 0, :])         # [ne_i,K,nbw]
    s_rel = jnp.stack(rel_list, 1).transpose(2, 3, 0, 1)      # [nbh_t,nbw,K,K]
    s_abs_i = jnp.stack(abs_list, 2).transpose(0, 3, 1, 2)    # [ne_i,nbw,K,K]

    # ---- absolute-cols family (global left edge, present on every tile) ----
    cjp = np.minimum(plan.pos_j[:ne_j], w - bs)               # [ne_j, K]
    col_idx = pad_j + cjp[:, :, None] + np.arange(bs)[None, None, :]
    col_abs = stripp[:, :, jnp.asarray(col_idx)]              # [C, SH, ne_j, K, bs]
    col_abs = col_abs.transpose(2, 3, 0, 1, 4)                # [ne_j, K, C, SH, bs]
    cur_left = cur_t[:, :, : ne_j * bs].reshape(c, th, ne_j, bs)
    cur_left = cur_left.transpose(2, 0, 1, 3)                 # [ne_j, C, th, bs]
    rel_abs = []
    for ki in range(k):
        s = lax.slice(col_abs, (0, 0, 0, halo - reach + step * ki, 0),
                      (ne_j, k, c, halo - reach + step * ki + th, bs))
        d = _wrap_abs_diff(s, cur_left[:, None])              # [ne_j,K,C,th,bs]
        rel_abs.append(_tile_sums(d, bs)[..., 0])             # [ne_j,K(kj),nbh_t]
    s_abs_j = jnp.stack(rel_abs, 2).transpose(3, 0, 2, 1)     # [nbh_t,ne_j,K,K]

    # ---- corner family (global top-left; tile 0 strip rows) ----------------
    # indices [ne_j, K(ki), K(kj), bs, bs] into the (unpadded-cols) strip
    ri = np.minimum(halo + step * np.arange(k), strip_h - bs)  # [K]
    ii = np.broadcast_to(ri[None, :, None, None, None]
                         + np.arange(bs)[None, None, None, :, None],
                         (ne_j, k, k, bs, bs))
    jj = np.broadcast_to(cjp[:, None, :, None, None]
                         + np.arange(bs)[None, None, None, None, :],
                         (ne_j, k, k, bs, bs))
    patches = strip[:, jnp.asarray(ii), jnp.asarray(jj)]  # [C,ne_j,K,K,bs,bs]
    cur_c = cur_t[:, : ne_i * bs, : ne_j * bs].reshape(c, ne_i, bs, ne_j, bs)
    cur_c = cur_c.transpose(0, 1, 3, 2, 4)                # [C,ne_i,ne_j,bs,bs]
    s_corner = _wrap_abs_diff(patches[:, None],
                              cur_c[:, :, :, None, None]).sum(
        axis=(0, -2, -1), dtype=jnp.int32)                # [ne_i,ne_j,K,K]

    # ---- stitch ------------------------------------------------------------
    is_top_tile = tile_idx == 0
    top_tile0 = jnp.concatenate([s_corner, s_abs_i[:, ne_j:]], axis=1)
    top_other = jnp.concatenate([s_abs_j[:ne_i], s_rel[:ne_i, ne_j:]], axis=1)
    top = jnp.where(is_top_tile, top_tile0, top_other)
    rest = jnp.concatenate([s_abs_j[ne_i:], s_rel[ne_i:, ne_j:]], axis=1)
    sad = jnp.concatenate([top, rest], axis=0)            # [nbh_t,nbw,K,K]

    # ---- select ------------------------------------------------------------
    valid = valid_i_t[:, None, :, None] & jnp.asarray(plan.valid_j)[None, :, None, :]
    masked = jnp.where(valid, sad, _MASKED)
    flat = masked.reshape(nbh_t, nbw, k * k)
    with_init = jnp.concatenate(
        [jnp.full((nbh_t, nbw, 1), _INIT_SENTINEL, jnp.int32), flat], axis=-1)
    best = jnp.argmin(with_init, axis=-1)
    hit = best > 0
    ki_sel = (best - 1) // k
    kj_sel = (best - 1) % k

    bj = jnp.arange(nbw)[None, :]
    pi = jnp.where(hit, jnp.take_along_axis(
        jnp.broadcast_to(pos_i_t[:, None, :], (nbh_t, nbw, k)),
        ki_sel[..., None], axis=2)[..., 0], 0)
    pos_j = jnp.asarray(plan.pos_j)
    pj = jnp.where(hit, pos_j[bj, kj_sel], 0)
    return pi, pj, hit


def _finish_mv(pi, pj, cur_t, strip, tile_idx, plan, th, static_threshold):
    bs = plan.bs
    halo = plan.reach + bs
    nbh_t = th // bs
    nbw = plan.nbw
    ref_t = strip[:, halo:halo + th]
    stat = M.static_sad(cur_t, ref_t, bs) <= static_threshold
    ci = tile_idx * th + jnp.arange(nbh_t)[:, None] * bs
    cj = jnp.arange(nbw)[None, :] * bs
    pi = jnp.where(stat, ci, pi)
    pj = jnp.where(stat, cj, pj)
    return jnp.stack([pj - cj, pi - ci], axis=-1).astype(jnp.int32)


def tile_motion_search(cur_t, strip, valid_i_t, pos_i_t, tile_idx,
                       cfg: CodecConfig, h: int, w: int, th: int):
    plan = make_plan(h, w, cfg.block_size, cfg.search_reach, cfg.search_step)
    # cfg.search_luma_only: G-channel SAD with a 1/3-scaled static threshold,
    # mirroring models/pipeline.py _search_inputs so sharded == unsharded.
    static_th = cfg.static_threshold
    if cfg.search_luma_only:
        cur_t, strip = cur_t[1:2], strip[1:2]
        static_th //= 3
    pi, pj, _ = _tile_search(cur_t, strip, valid_i_t, pos_i_t, tile_idx,
                             plan, th)
    return _finish_mv(pi, pj, cur_t, strip, tile_idx, plan, th,
                      static_th)


def tile_motion_compensate(mv_t, strip, tile_idx, bs: int, th: int, halo: int):
    """mv_t [nbh_t, nbw, 2]; strip [C, th+2h, W] -> recon tile [C, th, W]."""
    c, sh, w = strip.shape
    nbh_t, nbw = mv_t.shape[:2]
    # global row pi = tile_idx*th + bi*bs + dy  -> strip row pi - tile_idx*th + halo
    li = jnp.arange(nbh_t)[:, None] * bs + mv_t[..., 1] + halo
    # fallback mv may point at global row 0 (motion.py:102): clamp; unreachable
    # when th >= halo (see module docstring)
    li = jnp.clip(li, 0, sh - bs)
    lj = jnp.clip(jnp.arange(nbw)[None, :] * bs + mv_t[..., 0], 0, w - bs)

    def grab(i0, j0):
        return lax.dynamic_slice(strip, (0, i0, j0), (c, bs, bs))

    blocks = jax.vmap(jax.vmap(grab))(li, lj)          # [nbh_t, nbw, C, bs, bs]
    return blocks.transpose(2, 0, 3, 1, 4).reshape(c, th, w)


# ---------------------------------------------------------------------------
# Sharded batch pipelines


_I_SPEC = P("gop", None, "tile", None)                 # [B, 3, H, W]
_P_SPEC = P("gop", None, None, "tile", None)           # [B, P, 3, H, W]
_MV_SPEC = P("gop", None, "tile", None, None)          # [B, P, nbh, nbw, 2]
_RES_SPEC = P("gop", None, None, "tile", None)         # [B, P, 3, H, W]
_FRAMES_SPEC = P("gop", None, None, "tile", None)      # [B, 1+P, 3, H, W]
_PLAN_SPEC = P("tile", None)
_BMV_SPEC = P("gop", None, None, "tile", None, None)   # [B, NB, 2, nbh, nbw, 2]
_BMODE_SPEC = P("gop", None, "tile", None)             # [B, NB, nbh, nbw]


def _tile_encode_residual(cur, recon, cfg: CodecConfig):
    """Tile-local residual coding (cur/recon [..., C, th, W]); same math as
    pipeline._encode_residual — blockwise, so tiles are independent."""
    if not cfg.with_residual:
        return None
    if cfg.with_dct and cfg.quant_mode == "rounded":
        return dct_compress_residual_signed(cur - recon, cfg)
    resid = M.residuals_wrap(cur, recon)
    if cfg.with_dct:
        resid = dct_compress_residual(resid, cfg)
    return resid


def _tile_apply_residual(recon, resid, cfg: CodecConfig):
    """Tile-local decoder-side residual add-back (pipeline._apply_residual)."""
    if not cfg.with_residual or resid is None:
        return recon
    if cfg.with_dct and cfg.quant_mode == "rounded":
        return jnp.clip(recon + dct_decompress_residual_signed(resid, cfg),
                        0, 255)
    if cfg.with_dct:
        resid = dct_decompress_residual(resid, cfg)
    return M.reconstruct_wrap(recon, resid)


@functools.lru_cache(maxsize=None)
def make_sharded_encoder(mesh: Mesh, cfg: CodecConfig, h: int, w: int):
    """Returns jitted fn(i_frames [B,3,H,W] i32, p_frames [B,P,3,H,W] i32)
    -> EncodedGOP batch sharded over (gop, tile).

    Supports the full config space of the unsharded pipeline: B-frame
    patterns (anchors decoded tile-locally, then a second ppermute halo
    exchange of the decoded-anchor stack feeds the bidirectional tile
    searches) and lossy intra-coded I-frames (the wavefront intra stage runs
    gop-parallel before the spatial shard — it is raster-sequential per
    frame, so its parallel axis is the GOP batch, not tiles). p_frames must
    hold complete GOPs (F == gop_len-1) when the pattern has B frames."""
    n_tile = mesh.shape["tile"]
    th = h // n_tile
    bs = cfg.block_size
    halo = cfg.search_reach + bs
    if th % bs or (n_tile > 1 and th < halo):
        raise ValueError(f"tile height {th} must be a multiple of {bs} and "
                         f">= halo {halo} (reach + block)")
    plan = make_plan(h, w, bs, cfg.search_reach, cfg.search_step)
    valid_i = jnp.asarray(plan.valid_i)            # [nbh, K]
    pos_i = jnp.asarray(plan.pos_i)
    use_b = cfg.has_b
    if use_b:
        _, _, prev_slot, next_slot, p_sel, b_sel = gop_layout(cfg.gop_pattern)

    def local_fn(i_t, p_t, valid_i_t, pos_i_t):
        # i_t [Bl, 3, th, W]; p_t [Bl, Pf, 3, th, W] (all non-I, display order)
        tile_idx = lax.axis_index("tile")
        strip = _halo_exchange(i_t, halo, "tile")  # [Bl, 3, th+2h, W]
        p_f = p_t[:, np.array(p_sel)] if use_b else p_t

        def search_frames(ref_strip, frames):
            return jax.vmap(lambda p: tile_motion_search(
                p, ref_strip, valid_i_t, pos_i_t, tile_idx, cfg, h, w, th)
            )(frames)

        def compensate_frames(mv, ref_strip):
            return jax.vmap(lambda m: tile_motion_compensate(
                m, ref_strip, tile_idx, bs, th, halo))(mv)

        def p_stage(i_strip, p_frames):
            mv = search_frames(i_strip, p_frames)
            if not cfg.with_residual and not use_b:
                return mv, None, None
            recon = compensate_frames(mv, i_strip)
            resid = _tile_encode_residual(p_frames, recon, cfg)
            dec_p = _tile_apply_residual(recon, resid, cfg) if use_b else None
            return mv, resid, dec_p

        mv, resid, dec_p = jax.vmap(p_stage)(strip, p_f)
        out = {"i": i_t, "mv": mv}
        if resid is not None:
            out["res"] = resid
        if not use_b:
            return out

        b_f = p_t[:, np.array(b_sel)]                # [Bl, NB, C, th, W]
        anchors = jnp.concatenate([i_t[:, None], dec_p], axis=1)
        a_strip = _halo_exchange(anchors, halo, "tile")  # [Bl, NA, C, th+2h, W]
        prev_s = a_strip[:, np.array(prev_slot)]     # [Bl, NB, C, th+2h, W]
        next_s = a_strip[:, np.array(next_slot)]

        def b_stage(prev_strips, next_strips, b_frames):
            def search_one(s, p):
                return tile_motion_search(p, s, valid_i_t, pos_i_t, tile_idx,
                                          cfg, h, w, th)
            mv_f = jax.vmap(search_one)(prev_strips, b_frames)
            mv_b = jax.vmap(search_one)(next_strips, b_frames)
            comp = lambda m, s: tile_motion_compensate(m, s, tile_idx, bs,
                                                       th, halo)
            pred_f = jax.vmap(comp)(mv_f, prev_strips)
            pred_b = jax.vmap(comp)(mv_b, next_strips)
            mode, pred = _b_mode_select(b_frames, pred_f, pred_b, bs)
            b_resid = _tile_encode_residual(b_frames, pred, cfg)
            return jnp.stack([mv_f, mv_b], axis=1), mode, b_resid

        b_mv, b_mode, b_res = jax.vmap(b_stage)(prev_s, next_s, b_f)
        out["bmv"], out["bmode"] = b_mv, b_mode
        if b_res is not None:
            out["bres"] = b_res
        return out

    out_specs = {"i": _I_SPEC, "mv": _MV_SPEC}
    if cfg.with_residual:
        out_specs["res"] = _RES_SPEC
    if use_b:
        out_specs["bmv"], out_specs["bmode"] = _BMV_SPEC, _BMODE_SPEC
        if cfg.with_residual:
            out_specs["bres"] = _RES_SPEC
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(_I_SPEC, _P_SPEC, _PLAN_SPEC, _PLAN_SPEC),
                       out_specs=out_specs, check_vma=False)

    @jax.jit
    def run(i_frames, p_frames):
        payload = None
        if cfg.intra_qstep:
            from jax.sharding import NamedSharding
            from vcs_h264_tpu.models import intra_codec
            # gop-parallel intra stage: frames replicated spatially (the
            # wavefront is raster-sequential within a frame)
            i_rep = lax.with_sharding_constraint(
                i_frames, NamedSharding(mesh, P("gop")))
            payload, i_rec = intra_codec.encode_intra_frames_lossy_batch(
                i_rep, cfg.intra_qstep)
            i_frames = lax.with_sharding_constraint(
                i_rec, NamedSharding(mesh, _I_SPEC))
        out = fn(i_frames, p_frames, valid_i, pos_i)
        return EncodedGOP(
            i_frame=out["i"], mv=out["mv"], residuals=out.get("res"),
            b_mv=out.get("bmv"), b_mode=out.get("bmode"),
            b_residuals=out.get("bres"),
            i_qcoef=None if payload is None else payload.qcoef,
            i_modes=None if payload is None else payload.modes,
            i_escape=None if payload is None else payload.escape)

    return run


@functools.lru_cache(maxsize=None)
def make_sharded_decoder(mesh: Mesh, cfg: CodecConfig, h: int, w: int):
    """Returns jitted fn(EncodedGOP batch) -> frames [B, gop_len, 3, H, W]
    i32 in display order. Handles B-bearing patterns (anchors reconstructed
    tile-locally, decoded-anchor halo exchange feeds B compensation)."""
    n_tile = mesh.shape["tile"]
    th = h // n_tile
    bs = cfg.block_size
    halo = cfg.search_reach + bs
    use_b = cfg.has_b
    if use_b:
        anchor_pos, b_pos, prev_slot, next_slot, _, _ = \
            gop_layout(cfg.gop_pattern)

    def local_fn(ins):
        i_t, mv_t = ins["i"], ins["mv"]
        resid_t = ins.get("res")
        tile_idx = lax.axis_index("tile")
        strip = _halo_exchange(i_t, halo, "tile")

        def compensate_frames(mv, ref_strip):
            return jax.vmap(lambda m: tile_motion_compensate(
                m, ref_strip, tile_idx, bs, th, halo))(mv)

        def per_gop(i_strip, i_tile, mv, resid):
            recon = compensate_frames(mv, i_strip)
            out_p = _tile_apply_residual(recon, resid, cfg)
            return jnp.concatenate([i_tile[None], out_p], axis=0)

        if resid_t is None:
            anchors = jax.vmap(lambda s, i, m: per_gop(s, i, m, None))(
                strip, i_t, mv_t)
        else:
            anchors = jax.vmap(per_gop)(strip, i_t, mv_t, resid_t)
        if not use_b:
            return anchors                          # [Bl, NA, C, th, W]

        bmv_t, bmode_t = ins["bmv"], ins["bmode"]
        bres_t = ins.get("bres")
        a_strip = _halo_exchange(anchors, halo, "tile")
        prev_s = a_strip[:, np.array(prev_slot)]
        next_s = a_strip[:, np.array(next_slot)]

        def b_gop(prev_strips, next_strips, bmv, bmode, bres):
            comp = lambda m, s: tile_motion_compensate(m, s, tile_idx, bs,
                                                       th, halo)
            pred_f = jax.vmap(comp)(bmv[:, 0], prev_strips)
            pred_b = jax.vmap(comp)(bmv[:, 1], next_strips)
            pred_bi = (pred_f + pred_b + 1) >> 1
            mpix = jnp.repeat(jnp.repeat(bmode, bs, axis=-2), bs, axis=-1)
            mpix = mpix[:, None].astype(jnp.int32)
            pred = jnp.where(mpix == 0, pred_f,
                             jnp.where(mpix == 1, pred_b, pred_bi))
            return _tile_apply_residual(pred, bres, cfg)

        if bres_t is None:
            out_b = jax.vmap(lambda p, n, m, md: b_gop(p, n, m, md, None))(
                prev_s, next_s, bmv_t, bmode_t)
        else:
            out_b = jax.vmap(b_gop)(prev_s, next_s, bmv_t, bmode_t, bres_t)
        bl = anchors.shape[0]
        out = jnp.zeros((bl, cfg.gop_len, *anchors.shape[2:]), jnp.int32)
        out = out.at[:, np.array(anchor_pos)].set(anchors)
        return out.at[:, np.array(b_pos)].set(out_b)

    def specs_for(gop: EncodedGOP):
        ins = {"i": gop.i_frame, "mv": gop.mv}
        in_specs = {"i": _I_SPEC, "mv": _MV_SPEC}
        if gop.residuals is not None:
            ins["res"], in_specs["res"] = gop.residuals, _RES_SPEC
        if use_b:
            ins["bmv"], in_specs["bmv"] = gop.b_mv, _BMV_SPEC
            ins["bmode"], in_specs["bmode"] = gop.b_mode, _BMODE_SPEC
            if gop.b_residuals is not None:
                ins["bres"], in_specs["bres"] = gop.b_residuals, _RES_SPEC
        return ins, in_specs

    @jax.jit
    def run(gop: EncodedGOP):
        ins, in_specs = specs_for(gop)
        fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(in_specs,),
                           out_specs=_FRAMES_SPEC, check_vma=False)
        return fn(ins)

    return run


def sharded_encode_gop_batch(i_frames, p_frames, cfg: CodecConfig, mesh: Mesh):
    h, w = i_frames.shape[-2:]
    return make_sharded_encoder(mesh, cfg, h, w)(i_frames, p_frames)


def sharded_decode_gop_batch(gop: EncodedGOP, cfg: CodecConfig, mesh: Mesh):
    h, w = gop.i_frame.shape[-2:]
    return make_sharded_decoder(mesh, cfg, h, w)(gop)


# ---------------------------------------------------------------------------
# Sharded 4:2:0 pipeline (models/pipeline420.py on the (gop x tile) mesh).
# Luma rows shard over "tile" exactly like the full-res path; chroma planes
# shard over the same axis at half the tile height, with their own (halved)
# halo exchange, and ride the halved luma vectors. The optional lossy-intra
# stage runs gop-parallel ahead of the shard (raster-sequential per frame).

_Y_SPEC = P("gop", "tile", None)                       # [B, H, W]
_C_SPEC = P("gop", None, "tile", None)                 # [B, 2, H/2, W/2]
_YF_SPEC = P("gop", None, "tile", None)                # [B, F, H, W]
_CF_SPEC = P("gop", None, None, "tile", None)          # [B, F, 2, H/2, W/2]


@functools.lru_cache(maxsize=None)
def make_sharded_encoder_420(mesh: Mesh, cfg: CodecConfig, h: int, w: int):
    """fn(i_frames [B,3,H,W] BGR i32, p_frames [B,F,3,H,W]) -> EncodedGOP420
    batch sharded over (gop, tile). Tile height must be a multiple of
    2*block_size (half-res chroma DCT blocks) and >= halo.

    B-bearing patterns mirror the full-res sharded B path: anchors are
    decoded tile-locally, then a second ppermute halo exchange of the
    decoded-anchor stacks (luma at full halo, chroma at the halved halo)
    feeds the bidirectional tile searches; chroma rides the halved B
    vectors. p_frames must hold complete GOPs (F == gop_len-1) when the
    pattern has B frames."""
    from vcs_h264_tpu.models import pipeline420 as p420

    n_tile = mesh.shape["tile"]
    th = h // n_tile
    bs = cfg.block_size
    halo = cfg.search_reach + bs
    if th % (2 * bs) or (n_tile > 1 and th < halo):
        raise ValueError(f"tile height {th} must be a multiple of {2 * bs} "
                         f"and >= halo {halo}")
    bs_c = bs // 2
    halo_c = max(1, cfg.search_reach // 2) + bs_c
    th_c = th // 2
    plan = make_plan(h, w, bs, cfg.search_reach, cfg.search_step)
    valid_i = jnp.asarray(plan.valid_i)
    pos_i = jnp.asarray(plan.pos_i)
    static_t = cfg.static_threshold // 3       # luma-only SAD (pipeline420)
    scfg = CodecConfig(block_size=bs, search_reach=cfg.search_reach,
                       search_step=cfg.search_step,
                       static_threshold=static_t,
                       quality_factor=cfg.quality_factor)
    qy, qc = p420._tables(cfg)
    use_b = cfg.has_b
    if use_b:
        _, _, prev_slot, next_slot, p_sel, b_sel = gop_layout(cfg.gop_pattern)

    def local_fn(y_t, c_t, yp_t, cp_t, valid_i_t, pos_i_t):
        # y_t [Bl, th, W]; c_t [Bl, 2, th/2, W/2]; yp_t [Bl, F, th, W];
        # cp_t [Bl, F, 2, th/2, W/2] (all non-I frames, display order)
        tile_idx = lax.axis_index("tile")
        y_strip = _halo_exchange(y_t[:, None], halo, "tile")   # [Bl,1,th+2h,W]
        c_strip = _halo_exchange(c_t, halo_c, "tile")
        yp_f = yp_t[:, np.array(p_sel)] if use_b else yp_t
        cp_f = cp_t[:, np.array(p_sel)] if use_b else cp_t

        def comp_y(mv, ys):
            """[F, nbh_t, nbw, 2] x luma strip [1, th+2h, W] -> [F, th, W]."""
            return jax.vmap(lambda m: tile_motion_compensate(
                m, ys, tile_idx, bs, th, halo))(mv)[:, 0]

        def comp_c(mv, cs):
            """Chroma rides the halved luma vectors on half-res strips."""
            return jax.vmap(lambda m: tile_motion_compensate(
                m, cs, tile_idx, bs_c, th_c, halo_c))(jnp.floor_divide(mv, 2))

        def per_gop(ys, cs, yp, cp):
            mv = jax.vmap(lambda p: tile_motion_search(
                p[None], ys, valid_i_t, pos_i_t, tile_idx, scfg, h, w, th)
            )(yp)                                       # [F, nbh_t, nbw, 2]
            rec_y = comp_y(mv, ys)
            rec_c = comp_c(mv, cs)
            res_y = p420._code_planes(yp - rec_y, qy, bs)
            res_c = p420._code_planes(cp - rec_c, qc, bs)
            if not use_b:
                return mv, res_y, res_c, None, None
            # closed loop: B frames reference the *decoded* anchors
            dec_y = jnp.clip(rec_y + p420._decode_planes(res_y, qy, bs),
                             0, 255)
            dec_c = jnp.clip(rec_c + p420._decode_planes(res_c, qc, bs),
                             0, 255)
            return mv, res_y, res_c, dec_y, dec_c

        mv, res_y, res_c, dec_y, dec_c = jax.vmap(per_gop)(
            y_strip, c_strip, yp_f, cp_f)
        out = {"y": y_t, "c": c_t, "mv": mv, "resy": res_y, "resc": res_c}
        if not use_b:
            return out

        yb = yp_t[:, np.array(b_sel)]                # [Bl, NB, th, W]
        cb = cp_t[:, np.array(b_sel)]                # [Bl, NB, 2, th_c, Wc]
        anch_y = jnp.concatenate([y_t[:, None], dec_y], axis=1)
        anch_c = jnp.concatenate([c_t[:, None], dec_c], axis=1)
        ay = _halo_exchange(anch_y, halo, "tile")    # [Bl, NA, th+2h, W]
        ac = _halo_exchange(anch_c, halo_c, "tile")
        prev_ys, next_ys = ay[:, np.array(prev_slot)], ay[:, np.array(next_slot)]
        prev_cs, next_cs = ac[:, np.array(prev_slot)], ac[:, np.array(next_slot)]

        def b_stage(p_ys, n_ys, p_cs, n_cs, ybf, cbf):
            def search_one(s, p):
                return tile_motion_search(p[None], s[None], valid_i_t,
                                          pos_i_t, tile_idx, scfg, h, w, th)
            mv_f = jax.vmap(search_one)(p_ys, ybf)   # [NB, nbh_t, nbw, 2]
            mv_b = jax.vmap(search_one)(n_ys, ybf)
            comp1_y = lambda m, s: tile_motion_compensate(
                m, s[None], tile_idx, bs, th, halo)[0]
            comp1_c = lambda m, cs2: tile_motion_compensate(
                jnp.floor_divide(m, 2), cs2, tile_idx, bs_c, th_c, halo_c)
            pf_y = jax.vmap(comp1_y)(mv_f, p_ys)
            pb_y = jax.vmap(comp1_y)(mv_b, n_ys)
            pf_c = jax.vmap(comp1_c)(mv_f, p_cs)
            pb_c = jax.vmap(comp1_c)(mv_b, n_cs)
            # per-block fwd/bwd/bi decision on luma SAD (first-minimum wins,
            # pipeline420.encode_gop_batch_420 semantics)
            bi_y = (pf_y + pb_y + 1) >> 1
            sads = jnp.stack([_tile_sums(jnp.abs(p - ybf)[:, None], bs)
                              for p in (pf_y, pb_y, bi_y)])
            mode = jnp.argmin(sads, axis=0).astype(jnp.int8)
            mpy = jnp.repeat(jnp.repeat(mode, bs, -2), bs, -1)
            mpy = mpy.astype(jnp.int32)
            pred_by = jnp.where(mpy == 0, pf_y,
                                jnp.where(mpy == 1, pb_y, bi_y))
            mpc = jnp.repeat(jnp.repeat(mode, bs_c, -2), bs_c, -1)[:, None]
            mpc = mpc.astype(jnp.int32)
            bi_c = (pf_c + pb_c + 1) >> 1
            pred_bc = jnp.where(mpc == 0, pf_c,
                                jnp.where(mpc == 1, pb_c, bi_c))
            bres_y = p420._code_planes(ybf - pred_by, qy, bs)
            bres_c = p420._code_planes(cbf - pred_bc, qc, bs)
            return jnp.stack([mv_f, mv_b], axis=1), mode, bres_y, bres_c

        b_mv, b_mode, bres_y, bres_c = jax.vmap(b_stage)(
            prev_ys, next_ys, prev_cs, next_cs, yb, cb)
        out.update(bmv=b_mv, bmode=b_mode, bresy=bres_y, bresc=bres_c)
        return out

    out_specs = {"y": _Y_SPEC, "c": _C_SPEC, "mv": _MV_SPEC,
                 "resy": _YF_SPEC, "resc": _CF_SPEC}
    if use_b:
        out_specs.update(bmv=_BMV_SPEC, bmode=_BMODE_SPEC,
                         bresy=_YF_SPEC, bresc=_CF_SPEC)
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(_Y_SPEC, _C_SPEC, _YF_SPEC, _CF_SPEC,
                                 _PLAN_SPEC, _PLAN_SPEC),
                       out_specs=out_specs, check_vma=False)

    @jax.jit
    def run(i_frames, p_frames):
        from jax.sharding import NamedSharding
        y_i, c_i = p420.ingest_420(i_frames.astype(jnp.int32))
        y_p, c_p = p420.ingest_420(p_frames.astype(jnp.int32))
        payload = None
        if cfg.intra_qstep:
            from vcs_h264_tpu.models import intra_codec
            rep = lambda x: lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("gop")))
            pay_y, rec_y = intra_codec.encode_intra_frames_lossy_batch(
                rep(y_i)[:, None], cfg.intra_qstep)
            pay_c, rec_c = intra_codec.encode_intra_frames_lossy_batch(
                rep(c_i), cfg.intra_qstep)
            y_i = lax.with_sharding_constraint(
                rec_y[:, 0], NamedSharding(mesh, _Y_SPEC))
            c_i = lax.with_sharding_constraint(
                rec_c, NamedSharding(mesh, _C_SPEC))
            payload = (pay_y, pay_c)
        out = fn(y_i, c_i, y_p, c_p, valid_i, pos_i)
        pay_y, pay_c = payload if payload else (None, None)
        return p420.EncodedGOP420(
            i_y=out["y"], i_c=out["c"], mv=out["mv"],
            res_y=out["resy"], res_c=out["resc"],
            iq_y=None if pay_y is None else pay_y.qcoef,
            im_y=None if pay_y is None else pay_y.modes,
            ie_y=None if pay_y is None else pay_y.escape,
            iq_c=None if pay_c is None else pay_c.qcoef,
            im_c=None if pay_c is None else pay_c.modes,
            ie_c=None if pay_c is None else pay_c.escape,
            b_mv=out.get("bmv"), b_mode=out.get("bmode"),
            bres_y=out.get("bresy"), bres_c=out.get("bresc"))

    return run


@functools.lru_cache(maxsize=None)
def make_sharded_decoder_420(mesh: Mesh, cfg: CodecConfig, h: int, w: int):
    """fn(EncodedGOP420 batch) -> BGR frames [B, gop_len, 3, H, W] i32.

    B-bearing patterns reconstruct anchors tile-locally, halo-exchange the
    decoded-anchor stacks (luma + half-res chroma), and compensate B frames
    bidirectionally — mirroring make_sharded_decoder."""
    from vcs_h264_tpu.models import pipeline420 as p420

    n_tile = mesh.shape["tile"]
    th = h // n_tile
    bs = cfg.block_size
    halo = cfg.search_reach + bs
    bs_c = bs // 2
    halo_c = max(1, cfg.search_reach // 2) + bs_c
    th_c = th // 2
    qy, qc = p420._tables(cfg)
    use_b = cfg.has_b
    if use_b:
        anchor_pos, b_pos, prev_slot, next_slot, _, _ = \
            gop_layout(cfg.gop_pattern)

    def local_fn(ins):
        y_t, c_t, mv_t = ins["y"], ins["c"], ins["mv"]
        resy_t, resc_t = ins["resy"], ins["resc"]
        tile_idx = lax.axis_index("tile")
        y_strip = _halo_exchange(y_t[:, None], halo, "tile")
        c_strip = _halo_exchange(c_t, halo_c, "tile")

        def per_gop(ys, cs, y_tile, c_tile, mv, res_y, res_c):
            rec_y = jax.vmap(lambda m: tile_motion_compensate(
                m, ys, tile_idx, bs, th, halo))(mv)[:, 0]
            mv_c = jnp.floor_divide(mv, 2)
            rec_c = jax.vmap(lambda m: tile_motion_compensate(
                m, cs, tile_idx, bs_c, th_c, halo_c))(mv_c)
            rec_y = jnp.clip(rec_y + p420._decode_planes(res_y, qy, bs),
                             0, 255)
            rec_c = jnp.clip(rec_c + p420._decode_planes(res_c, qc, bs),
                             0, 255)
            y = jnp.concatenate([y_tile[None], rec_y], axis=0)
            c = jnp.concatenate([c_tile[None], rec_c], axis=0)
            return y, c

        y, c = jax.vmap(per_gop)(y_strip, c_strip, y_t, c_t,
                                 mv_t, resy_t, resc_t)
        if not use_b:
            return y, c                               # [Bl,1+F,th,W], chroma

        bmv_t, bmode_t = ins["bmv"], ins["bmode"]
        bresy_t, bresc_t = ins["bresy"], ins["bresc"]
        ay = _halo_exchange(y, halo, "tile")          # [Bl, NA, th+2h, W]
        ac = _halo_exchange(c, halo_c, "tile")
        prev_ys, next_ys = ay[:, np.array(prev_slot)], ay[:, np.array(next_slot)]
        prev_cs, next_cs = ac[:, np.array(prev_slot)], ac[:, np.array(next_slot)]

        def b_gop(p_ys, n_ys, p_cs, n_cs, bmv, bmode, bres_y, bres_c):
            comp1_y = lambda m, s: tile_motion_compensate(
                m, s[None], tile_idx, bs, th, halo)[0]
            comp1_c = lambda m, cs2: tile_motion_compensate(
                jnp.floor_divide(m, 2), cs2, tile_idx, bs_c, th_c, halo_c)
            pf_y = jax.vmap(comp1_y)(bmv[:, 0], p_ys)
            pb_y = jax.vmap(comp1_y)(bmv[:, 1], n_ys)
            pf_c = jax.vmap(comp1_c)(bmv[:, 0], p_cs)
            pb_c = jax.vmap(comp1_c)(bmv[:, 1], n_cs)
            mpy = jnp.repeat(jnp.repeat(bmode, bs, -2), bs, -1)
            mpy = mpy.astype(jnp.int32)
            by = jnp.where(mpy == 0, pf_y,
                           jnp.where(mpy == 1, pb_y, (pf_y + pb_y + 1) >> 1))
            mpc = jnp.repeat(jnp.repeat(bmode, bs_c, -2), bs_c, -1)[:, None]
            mpc = mpc.astype(jnp.int32)
            bc = jnp.where(mpc == 0, pf_c,
                           jnp.where(mpc == 1, pb_c, (pf_c + pb_c + 1) >> 1))
            by = jnp.clip(by + p420._decode_planes(bres_y, qy, bs), 0, 255)
            bc = jnp.clip(bc + p420._decode_planes(bres_c, qc, bs), 0, 255)
            return by, bc

        by, bc = jax.vmap(b_gop)(prev_ys, next_ys, prev_cs, next_cs,
                                 bmv_t, bmode_t, bresy_t, bresc_t)
        bl = y.shape[0]
        yo = jnp.zeros((bl, cfg.gop_len, *y.shape[2:]), jnp.int32)
        co = jnp.zeros((bl, cfg.gop_len, *c.shape[2:]), jnp.int32)
        y = yo.at[:, np.array(anchor_pos)].set(y).at[:, np.array(b_pos)].set(by)
        c = co.at[:, np.array(anchor_pos)].set(c).at[:, np.array(b_pos)].set(bc)
        return y, c

    in_specs = {"y": _Y_SPEC, "c": _C_SPEC, "mv": _MV_SPEC,
                "resy": _YF_SPEC, "resc": _CF_SPEC}
    if use_b:
        in_specs.update(bmv=_BMV_SPEC, bmode=_BMODE_SPEC,
                        bresy=_YF_SPEC, bresc=_CF_SPEC)
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(in_specs,),
                       out_specs=(_YF_SPEC, _CF_SPEC), check_vma=False)

    @jax.jit
    def run(gop):
        ins = {"y": gop.i_y.astype(jnp.int32),
               "c": gop.i_c.astype(jnp.int32),
               "mv": gop.mv, "resy": gop.res_y, "resc": gop.res_c}
        if use_b:
            ins.update(bmv=gop.b_mv, bmode=gop.b_mode,
                       bresy=gop.bres_y, bresc=gop.bres_c)
        y, c = fn(ins)
        return p420.emit_bgr(y, c)

    return run


def sharded_encode_gop_batch_420(i_frames, p_frames, cfg: CodecConfig,
                                 mesh: Mesh):
    h, w = i_frames.shape[-2:]
    return make_sharded_encoder_420(mesh, cfg, h, w)(i_frames, p_frames)


def sharded_decode_gop_batch_420(gop, cfg: CodecConfig, mesh: Mesh):
    h, w = gop.i_y.shape[-2:]
    return make_sharded_decoder_420(mesh, cfg, h, w)(gop)
