"""BGR <-> YCrCb color conversion, bit-exact with OpenCV's uint8 path.

The reference calls `cv2.cvtColor(..., cv2.COLOR_BGR2YCR_CB)` at every stage
(`InterframeCompression/DCTcompressor.py:55`, `IntraframeCompression/
intraframe.py:326`, `ChromaSubsampling/chroma.py:9`) and the inverse at
`DCTcompressor.py:92`. OpenCV's 8-bit path is fixed-point: 14-bit coefficient
tables with round-half-up descaling. We reproduce that exactly in int32 so the
device pipeline is bit-identical to the host reference (verified in
tests/test_color.py against cv2 itself).

All functions are pure jnp, batched over arbitrary leading dims, and operate on
channel-last uint8/int32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV fixed-point constants (yuv_shift = 14).
_SHIFT = 14
_HALF = 1 << (_SHIFT - 1)
_R2Y, _G2Y, _B2Y = 4899, 9617, 1868
_CR_COEF = 11682          # (R - Y) * 11682 >> 14  + 128
_CB_COEF = 9241           # (B - Y) * 9241  >> 14  + 128
_CR2R = 22987             # R = Y + ((Cr-128) * 22987 >> 14)
_CB2B = 29049             # B = Y + ((Cb-128) * 29049 >> 14)
_CR2G = -11698
_CB2G = -5636


def _descale(x: jnp.ndarray) -> jnp.ndarray:
    return (x + _HALF) >> _SHIFT


# float32 fast path: int32 multiplies are multi-pass on the TPU VPU (measured
# ~27 ms per bgr->ycrcb over 48 640x360 frames, dominating the residual-DCT
# stage), while f32 multiplies are single-pass. Every fixed-point
# intermediate here is an integer of magnitude < 2^23 (max |product sum| =
# 255 * 16384 = 4.2e6), so f32 arithmetic is EXACT and `floor` reproduces the
# arithmetic right shift (floor division) for both signs. Bit-exactness vs
# cv2 is asserted in tests/test_color.py.


def _descale_f(x: jnp.ndarray) -> jnp.ndarray:
    """f32 equivalent of (x + HALF) >> SHIFT for exact-integer-valued x."""
    return jnp.floor((x + float(_HALF)) * (1.0 / (1 << _SHIFT)))


def bgr_to_ycrcb(bgr: jnp.ndarray) -> jnp.ndarray:
    """uint8/int BGR [..., 3] -> uint8-valued int32 YCrCb [..., 3].

    Bit-exact with cv2.COLOR_BGR2YCR_CB on uint8 input.
    """
    x = bgr.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(r * _R2Y + g * _G2Y + b * _B2Y)
    cr = _descale((r - y) * _CR_COEF + (128 << _SHIFT))
    cb = _descale((b - y) * _CB_COEF + (128 << _SHIFT))
    out = jnp.stack([y, cr, cb], axis=-1)
    return jnp.clip(out, 0, 255)


def ycrcb_to_bgr(ycrcb: jnp.ndarray) -> jnp.ndarray:
    """uint8-valued YCrCb [..., 3] -> uint8-valued int32 BGR [..., 3].

    Bit-exact with cv2.COLOR_YCR_CB2BGR on uint8 input.
    """
    x = ycrcb.astype(jnp.int32)
    y, cr, cb = x[..., 0], x[..., 1], x[..., 2]
    b = y + _descale((cb - 128) * _CB2B)
    g = y + _descale((cb - 128) * _CB2G + (cr - 128) * _CR2G)
    r = y + _descale((cr - 128) * _CR2R)
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(out, 0, 255)


def bgr_to_ycrcb_planes(x: jnp.ndarray) -> jnp.ndarray:
    """Planar [..., 3, H, W] BGR -> planar [..., 3, H, W] YCrCb (int32).

    Same fixed-point math as bgr_to_ycrcb (bit-exact with cv2), computed in
    the f32 fast path, in the TPU-native planar layout (channel as a leading
    axis; W on lanes)."""
    x = x.astype(jnp.float32)
    b = x[..., 0, :, :]
    g = x[..., 1, :, :]
    r = x[..., 2, :, :]
    y = _descale_f(r * _R2Y + g * _G2Y + b * _B2Y)
    cr = _descale_f((r - y) * _CR_COEF + float(128 << _SHIFT))
    cb = _descale_f((b - y) * _CB_COEF + float(128 << _SHIFT))
    out = jnp.clip(jnp.stack([y, cr, cb], axis=-3), 0, 255)
    return out.astype(jnp.int32)


def ycrcb_to_bgr_planes(x: jnp.ndarray) -> jnp.ndarray:
    """Planar [..., 3, H, W] YCrCb -> planar [..., 3, H, W] BGR (int32).

    f32 fast path, bit-exact with cv2.COLOR_YCR_CB2BGR."""
    x = x.astype(jnp.float32)
    y = x[..., 0, :, :]
    cr = x[..., 1, :, :]
    cb = x[..., 2, :, :]
    b = y + _descale_f((cb - 128) * _CB2B)
    g = y + _descale_f((cb - 128) * _CB2G + (cr - 128) * _CR2G)
    r = y + _descale_f((cr - 128) * _CR2R)
    out = jnp.clip(jnp.stack([b, g, r], axis=-3), 0, 255)
    return out.astype(jnp.int32)


def ycrcb_to_rgb_float(y: jnp.ndarray, cr: jnp.ndarray, cb: jnp.ndarray):
    """Float YCrCb -> clamped RGB, the hand-rolled constants of the chroma
    study (`ChromaSubsampling/chroma.py:33-40`): 1.4022 / 0.34414 / 0.71414 /
    1.772 with clamping to [0, 255]. Returns float arrays (r, g, b)."""
    yf = y.astype(jnp.float32)
    crf = cr.astype(jnp.float32) - 128.0
    cbf = cb.astype(jnp.float32) - 128.0
    r = yf + 1.4022 * crf
    g = yf - 0.34414 * cbf - 0.71414 * crf
    b = yf + 1.772 * cbf
    clip = lambda v: jnp.clip(v, 0.0, 255.0)
    return clip(r), clip(g), clip(b)
