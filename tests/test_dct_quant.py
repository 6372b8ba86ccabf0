"""DCT / quantization numerics vs float64 scalar oracles."""

import numpy as np
import jax.numpy as jnp

from vcs_h264_tpu.ops import dct, quant, blocks
from oracles import (oracle_dct2, oracle_idct2, oracle_dct_matrix,
                     oracle_quant_tables, oracle_compress_plane,
                     oracle_decompress_plane)


def test_dct_matrix_matches_reference_form():
    np.testing.assert_allclose(dct.dct_matrix_np(8), oracle_dct_matrix(8),
                               rtol=0, atol=1e-12)
    # orthonormality -> inverse is transpose
    m = dct.dct_matrix_np(8)
    np.testing.assert_allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_dct2_known_flat_block():
    """DCT of the flat 255 block: single DC = 8*255 (dct.py dctTest, :59-66,
    modulo their 4/(h*w) normalization; with the orthonormal matrix the DC of
    a flat c block is c*N)."""
    block = np.full((8, 8), 255.0)
    got = np.asarray(dct.dct2_blocks(jnp.asarray(block, jnp.float32)))
    want = np.zeros((8, 8)); want[0, 0] = 255 * 8
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dct2_tutorial_worked_example():
    """The dct2Test worked example (DCTCompression/dct.py:118-134): the
    tutorial block the reference verified its matrix DCT against, pinned
    here with its known transform (Cabeen & Gent DCT tutorial, computed in
    float64 from the orthonormal matrix)."""
    block = np.array([
        [26, -5, -5, -5, -5, -5, -5, 8],
        [64, 52, 8, 26, 26, 26, 8, -18],
        [126, 70, 26, 26, 52, 26, -5, -5],
        [111, 52, 8, 52, 52, 38, -5, -5],
        [52, 26, 8, 39, 38, 21, 8, 8],
        [0, 8, -5, 8, 26, 52, 70, 26],
        [-5, -23, -18, 21, 8, 8, 52, 38],
        [-18, 8, -5, -5, -5, 8, 26, 8]], dtype=np.float32)
    want = np.array([
        [162.25, 40.60, 20.00, 72.33, 30.25, 12.48, -19.65, -11.50],
        [30.48, 108.42, 10.47, 32.29, 27.70, -15.50, 18.41, -2.00],
        [-94.14, -60.05, 12.30, -43.42, -31.29, 6.07, -3.33, 7.14],
        [-38.57, -83.36, -5.41, -22.17, -13.52, 15.49, -1.33, 3.53],
        [-31.25, 17.93, -5.52, -12.36, 14.25, -5.96, 11.49, -6.02],
        [-0.86, -11.76, 12.78, 0.18, 28.07, 12.57, 8.35, 2.94],
        [4.63, -2.42, 12.17, 6.56, -18.70, -12.75, 7.70, 12.03],
        [-9.95, 11.19, 7.81, -16.29, 21.46, 0.02, 5.91, 10.68]])
    got = np.asarray(dct.dct2_blocks(jnp.asarray(block)))
    np.testing.assert_allclose(got, want, atol=0.02)
    # and the float64 oracle agrees with the pin to its printed precision
    np.testing.assert_allclose(oracle_dct2(block.astype(np.float64)), want,
                               atol=5e-3)


def test_dct2_matches_naive_o_n4_definition(rng):
    """The separable matrix DCT equals the O(N^4) textbook sum the reference
    wrote out first (DCTCompression/dct.py:42-56 `dct`), up to the constant
    normalization gap between the two forms the reference itself carries:
    the naive loop scales by 4/(h*w) * C(i)C(j) while the orthonormal matrix
    (dct.py:90-100 `dctMatrix`) scales by 2/sqrt(h*w) * C(i)C(j) — a factor
    of exactly sqrt(h*w)/2 (= 4 at 8x8). Float64 oracle, random block."""
    h = w = 8
    block = rng.standard_normal((h, w)).astype(np.float64) * 128

    def cu(i):
        return 1 / np.sqrt(2) if i == 0 else 1.0

    naive = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            s = 0.0
            for k in range(h):
                for l in range(w):
                    s += (block[k, l]
                          * np.cos((2 * k + 1) * i * np.pi / (2 * h))
                          * np.cos((2 * l + 1) * j * np.pi / (2 * w)))
            naive[i, j] = (4 / (h * w)) * cu(i) * cu(j) * s

    got = np.asarray(dct.dct2_blocks(jnp.asarray(block, jnp.float32)))
    np.testing.assert_allclose(got, naive * (np.sqrt(h * w) / 2),
                               rtol=0, atol=2e-3)


def test_dct_idct_roundtrip(rng):
    x = rng.integers(-128, 128, (50, 8, 8)).astype(np.float32)
    y = np.asarray(dct.idct2_blocks(dct.dct2_blocks(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_dct2_blocks_vs_oracle(rng):
    x = rng.integers(-128, 128, (20, 8, 8)).astype(np.float64)
    got = np.asarray(dct.dct2_blocks(jnp.asarray(x, jnp.float32)))
    want = np.stack([oracle_dct2(b) for b in x])
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_plane_roundtrip_layout(rng):
    plane = rng.standard_normal((24, 40)).astype(np.float32)
    b = blocks.plane_to_blocks(jnp.asarray(plane), 8)
    assert b.shape == (3, 5, 8, 8)
    np.testing.assert_array_equal(np.asarray(blocks.blocks_to_plane(b)), plane)
    # block (1,2) really is plane[8:16, 16:24]
    np.testing.assert_array_equal(np.asarray(b)[1, 2], plane[8:16, 16:24])


def test_quant_tables_match(rng):
    for qf in (10.0, 50.0, 75.0, 99.0):
        qy, qc = oracle_quant_tables(qf)
        ours = np.asarray(quant.quant_tables(qf, jnp.float32))
        np.testing.assert_array_equal(ours[0], qy)
        np.testing.assert_array_equal(ours[1], qc)
        np.testing.assert_array_equal(ours[2], qc)


def test_compress_plane_vs_oracle(rng):
    plane = rng.integers(-128, 128, (32, 32)).astype(np.int16)
    qy, _ = oracle_quant_tables(50.0)
    want = oracle_compress_plane(plane, qy, 8, rounded=False)
    got_blocks = quant.quantize(
        dct.dct2_blocks(blocks.plane_to_blocks(
            jnp.asarray(plane, jnp.float32), 8)),
        jnp.asarray(qy, jnp.float32), rounded=False)
    got = np.asarray(blocks.blocks_to_plane(got_blocks))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_rounded_roundtrip_bit_exact(rng):
    """Production mode: int coefficients -> dequant -> idct -> round gives a
    deterministic integer reconstruction (north-star bit-exact roundtrip)."""
    plane = rng.integers(-128, 128, (16, 16)).astype(np.float32)
    q = quant.quant_tables(50.0, jnp.float32)[0]
    bb = blocks.plane_to_blocks(jnp.asarray(plane), 8)
    coeffs = quant.quantize(dct.dct2_blocks(bb), q, rounded=True)
    # coefficients are exactly representable ints
    assert np.allclose(np.asarray(coeffs), np.round(np.asarray(coeffs)))
    recon1 = np.asarray(dct.idct2_blocks(quant.dequantize(coeffs, q)))
    recon2 = np.asarray(dct.idct2_blocks(quant.dequantize(coeffs, q)))
    np.testing.assert_array_equal(recon1, recon2)


def test_zigzag_8x8_standard_order():
    z = quant.zigzag_order_np(8)
    # canonical first 10 JPEG zigzag flat indices
    assert list(z[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(z) == list(range(64))


def test_zigzag_roundtrip(rng):
    x = rng.standard_normal((5, 8, 8)).astype(np.float32)
    back = np.asarray(quant.unzigzag(quant.zigzag(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)
