"""Plane <-> block-batch layout transforms.

The reference iterates blocks with Python double loops everywhere
(`DCTcompressor.py:66-72`, `motion.py:82-95`, `intraframe.py:34-35`). On TPU
the same decomposition is a pair of reshapes/transposes that XLA fuses away,
so every per-block op becomes one batched tensor op.
"""

from __future__ import annotations

import jax.numpy as jnp


def plane_to_blocks(plane: jnp.ndarray, bs: int) -> jnp.ndarray:
    """[..., H, W] -> [..., H//bs, W//bs, bs, bs]. H and W must divide bs."""
    *lead, h, w = plane.shape
    if h % bs or w % bs:
        raise ValueError(f"plane {h}x{w} not a multiple of block {bs}")
    nbh, nbw = h // bs, w // bs
    x = plane.reshape(*lead, nbh, bs, nbw, bs)
    # [..., nbh, bs, nbw, bs] -> [..., nbh, nbw, bs, bs]
    return jnp.moveaxis(x, -3, -2)


def blocks_to_plane(blocks: jnp.ndarray) -> jnp.ndarray:
    """[..., nbh, nbw, bs, bs] -> [..., H, W]."""
    *lead, nbh, nbw, bs1, bs2 = blocks.shape
    x = jnp.moveaxis(blocks, -2, -3)   # [..., nbh, bs, nbw, bs]
    return x.reshape(*lead, nbh * bs1, nbw * bs2)


def pad_to_multiple(plane: jnp.ndarray, bs: int, value=0) -> jnp.ndarray:
    """Pad trailing two dims up to the next multiple of bs."""
    *_, h, w = plane.shape
    ph = (-h) % bs
    pw = (-w) % bs
    if ph == 0 and pw == 0:
        return plane
    pad = [(0, 0)] * (plane.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(plane, pad, constant_values=value)


def crop_to_multiple(plane: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Crop trailing two dims down to a multiple of bs (drops edge remainder,
    matching the reference's partial-block dropping, motion.py:83-87)."""
    *_, h, w = plane.shape
    return plane[..., : h - h % bs, : w - w % bs]
