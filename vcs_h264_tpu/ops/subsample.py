"""4:2:0 chroma subsampling (reference C1: `ChromaSubsampling/chroma.py`).

The reference pipeline is: BGR -> YCrCb (`chroma.py:9`), 2x2 box filter on Cr
and Cb (`chroma.py:16-17`), stride-2 decimation (`chroma.py:20-21`), then a
per-pixel nearest-neighbor upsample + hand-rolled float YCrCb->RGB with
clamping (`chroma.py:29-40`) written into a uint8 image (truncating).

cv2.boxFilter's uint8 2x2 path was characterized empirically (see
tests/test_subsample.py): out(i, j) = ceil((x[i-1,j-1]+x[i-1,j]+x[i,j-1]+
x[i,j]) / 4) with BORDER_REFLECT_101. We reproduce that bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vcs_h264_tpu.ops import color


def box_filter_2x2(plane: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact cv2.boxFilter(uint8, ksize=(2,2), normalize=True).

    plane: int32 [..., H, W] uint8-valued."""
    x = plane.astype(jnp.int32)
    # BORDER_REFLECT_101 one row/col at top/left: index -1 -> 1
    top = x[..., 1:2, :]
    xp = jnp.concatenate([top, x], axis=-2)
    left = xp[..., :, 1:2]
    xp = jnp.concatenate([left, xp], axis=-1)
    s = (xp[..., :-1, :-1] + xp[..., :-1, 1:]
         + xp[..., 1:, :-1] + xp[..., 1:, 1:])
    return (s + 3) // 4        # empirical cv2 rounding: ceil


def subsample_420(plane: jnp.ndarray) -> jnp.ndarray:
    """Box-filter + stride-2 decimation (chroma.py:16-21)."""
    return box_filter_2x2(plane)[..., ::2, ::2]


def upsample_nearest(plane: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample, index = full_res // factor (chroma.py:31-33)."""
    x = jnp.repeat(plane, factor, axis=-2)
    return jnp.repeat(x, factor, axis=-1)


@jax.jit
def chroma_420_roundtrip(bgr_planes: jnp.ndarray) -> jnp.ndarray:
    """The complete chroma study (chroma.py end-to-end): BGR planes
    [..., 3, H, W] -> 4:2:0 subsample -> reconstructed BGR planes (uint8
    values, truncated like the reference's float->uint8 assignment).

    H and W must be even (the reference indexes cr[i//2, j//2], which for odd
    dims still works; we keep the general path via nearest upsampling to the
    original size)."""
    ycc = color.bgr_to_ycrcb_planes(bgr_planes)
    y = ycc[..., 0, :, :]
    cr = subsample_420(ycc[..., 1, :, :])
    cb = subsample_420(ycc[..., 2, :, :])
    h, w = y.shape[-2:]
    cr_up = upsample_nearest(cr)[..., :h, :w]
    cb_up = upsample_nearest(cb)[..., :h, :w]
    r, g, b = color.ycrcb_to_rgb_float(y, cr_up, cb_up)
    # float -> uint8 image assignment truncates toward zero (values already
    # clamped to [0, 255])
    to_u8 = lambda v: v.astype(jnp.int32)
    return jnp.stack([to_u8(b), to_u8(g), to_u8(r)], axis=-3)


def encode_420(ycc_planes: jnp.ndarray):
    """[..., 3, H, W] YCrCb -> (Y [..., H, W], Cr [..., H/2, W/2], Cb).

    The storage-format primitive for a real 4:2:0 pipeline (frames as planar
    Y + quarter-res chroma in HBM, SURVEY.md §7)."""
    y = ycc_planes[..., 0, :, :]
    cr = subsample_420(ycc_planes[..., 1, :, :])
    cb = subsample_420(ycc_planes[..., 2, :, :])
    return y, cr, cb


def decode_420(y: jnp.ndarray, cr: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """(Y, Cr/2, Cb/2) -> [..., 3, H, W] YCrCb via nearest upsample."""
    h, w = y.shape[-2:]
    cr_up = upsample_nearest(cr)[..., :h, :w]
    cb_up = upsample_nearest(cb)[..., :h, :w]
    return jnp.stack([y, cr_up, cb_up], axis=-3)
