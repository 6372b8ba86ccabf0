"""Blockwise 2-D DCT-II / inverse, batched for the MXU.

The reference computes per-block `D @ B @ D.T` in a Python double loop
(`InterframeCompression/DCTcompressor.py:66-72,111-121`; study version
`DCTCompression/dct.py:104-115`). Here the whole plane is reshaped to a block
batch and transformed with two einsums — thousands of 8x8 matmuls become a
single pair of MXU-shaped contractions, fused with quantization by XLA.

The transform matrix matches `dctMatrix()` (`DCTcompressor.py:124-133`):
row 0 = 1/sqrt(N), row i = sqrt(2/N) cos((2j+1) i pi / 2N) — the orthonormal
DCT-II, so inverse = transpose.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

from vcs_h264_tpu.ops.blocks import plane_to_blocks, blocks_to_plane


@functools.lru_cache(maxsize=None)
def dct_matrix_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (float64, computed once on host)."""
    j = np.arange(n)[None, :]
    i = np.arange(n)[:, None]
    m = np.sqrt(2.0 / n) * np.cos((2 * j + 1) * i * np.pi / (2 * n))
    m[0, :] = 1.0 / np.sqrt(n)
    return m


def dct_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(dct_matrix_np(n), dtype=dtype)


def _blockwise(mat_l: jnp.ndarray, x: jnp.ndarray, mat_r: jnp.ndarray):
    """Batched D_l @ block @ D_r over [..., bs, bs] blocks."""
    y = jnp.einsum("ij,...jk->...ik", mat_l, x,
                   preferred_element_type=x.dtype,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("...ij,jk->...ik", y, mat_r,
                      preferred_element_type=x.dtype,
                      precision=lax.Precision.HIGHEST)


def dct2_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward DCT on [..., bs, bs] float blocks (ref: _dct2)."""
    d = dct_matrix(blocks.shape[-1], blocks.dtype)
    return _blockwise(d, blocks, d.T)


def idct2_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse DCT on [..., bs, bs] float blocks (ref: _idct2)."""
    d = dct_matrix(blocks.shape[-1], blocks.dtype)
    return _blockwise(d.T, blocks, d)


def dct2_plane(plane: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Forward blockwise DCT over a [..., H, W] plane."""
    return blocks_to_plane(dct2_blocks(plane_to_blocks(plane, bs)))


def idct2_plane(plane: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Inverse blockwise DCT over a [..., H, W] plane."""
    return blocks_to_plane(idct2_blocks(plane_to_blocks(plane, bs)))
