"""Codec contract tests: Python core bit-exact vs the C++ oracle.

Covers BASELINE.json config 1: quantize a 1M-float32 array to 8-bit bins,
byte-pack, unpack, dequantize; codes bit-exact vs the C++ reference oracle,
MSE within the stated bound.
"""

import numpy as np
import pytest

from quant_tpu.core import codec, oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="C++ oracle not buildable"
)


def _rand(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * scale).astype(np.float32)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("seed,n", [(0, 1024), (1, 4097), (2, 31), (3, 100000)])
def test_codes_bit_exact_vs_oracle(bits, seed, n):
    x = _rand(n, seed)
    codes_py, scale_py = codec.quantize(x, bits)
    codes_cc, scale_cc = oracle.quantize(x, bits)
    assert np.float32(scale_py) == np.float32(scale_cc)
    np.testing.assert_array_equal(codes_py, codes_cc)


@pytest.mark.parametrize("bits", [4, 8])
def test_grouped_bit_exact_vs_oracle(bits):
    x = _rand(8 * 256, seed=5).reshape(8, 256)
    codes_py, scales_py = codec.quantize(x, bits, group_size=64)
    codes_cc, scales_cc = oracle.quantize_grouped(x, bits, 64)
    np.testing.assert_array_equal(codes_py, codes_cc)
    np.testing.assert_array_equal(scales_py, scales_cc)


def test_baseline_config1_1m_roundtrip():
    """BASELINE.json:7 — 1M float32, 8-bit bins, pack, unpack, dequantize."""
    x = _rand(1_000_000, seed=42)
    codes, scale = codec.quantize(x, 8)
    codes_cc, scale_cc = oracle.quantize(x, 8)
    np.testing.assert_array_equal(codes, codes_cc)
    # byte-pack for 8-bit is the identity on int8 bytes; round-trip via the
    # entropy container instead (the at-rest path).
    recon = codec.dequantize(codes, scale)
    recon_cc = oracle.dequantize(codes_cc, scale_cc)
    np.testing.assert_array_equal(recon, recon_cc)
    d = x.astype(np.float64) - recon.astype(np.float64)
    mse = float((d * d).mean())
    assert mse == pytest.approx(oracle.mse(x, recon), rel=1e-9)
    # Stated Δ for symmetric uniform quantization: step = scale, worst-case
    # MSE step²/4, expected step²/12. Assert within 2× of expected.
    assert mse <= (float(scale) ** 2) / 12 * 2.0


@pytest.mark.parametrize("n", [1, 2, 7, 256, 1001])
def test_pack_int4_bit_exact_vs_oracle(n):
    codes = (_rand(n, seed=n) * 4).clip(-7, 7).astype(np.int8)
    packed_py = codec.pack_int4(codes)
    packed_cc = oracle.pack_int4(codes)
    np.testing.assert_array_equal(packed_py, packed_cc)
    np.testing.assert_array_equal(codec.unpack_int4(packed_py, n), codes)
    np.testing.assert_array_equal(oracle.unpack_int4(packed_cc, n), codes)


def test_pack_int4_matmul_layout():
    codes = (_rand(64 * 16, seed=9) * 4).clip(-7, 7).astype(np.int8).reshape(64, 16)
    packed = codec.pack_int4_matmul(codes)
    assert packed.shape == (32, 16)
    np.testing.assert_array_equal(codec.unpack_int4_matmul(packed), codes)
    # low nibble of row i is code[i], high nibble is code[i + K/2]
    assert (int(packed[0, 0]) & 0xF) - 8 == codes[0, 0]
    assert (int(packed[0, 0]) >> 4) - 8 == codes[32, 0]


def test_zero_input():
    x = np.zeros(128, dtype=np.float32)
    codes, scale = codec.quantize(x, 8)
    codes_cc, scale_cc = oracle.quantize(x, 8)
    assert scale == 1.0 and scale_cc == 1.0
    np.testing.assert_array_equal(codes, np.zeros(128, dtype=np.int8))
    np.testing.assert_array_equal(codes, codes_cc)


def test_half_to_even_rounding():
    """Exact .5 multiples of scale must round to even (the contract)."""
    # absmax 127 → scale 1.0 at 8 bits; then x=0.5 → code 0, x=1.5 → code 2.
    x = np.array([127.0, 0.5, 1.5, 2.5, -0.5, -1.5], dtype=np.float32)
    codes, scale = codec.quantize(x, 8)
    assert scale == 1.0
    np.testing.assert_array_equal(codes, [127, 0, 2, 2, 0, -2])
    codes_cc, _ = oracle.quantize(x, 8)
    np.testing.assert_array_equal(codes, codes_cc)


# ── Codebook ("bin-lookup") variant — cpp/quantref.h "Codebook" spec ────


@pytest.mark.parametrize("seed,n", [(0, 1024), (1, 4097), (2, 31),
                                    (3, 100000)])
def test_lut_codes_bit_exact_vs_oracle(seed, n):
    x = _rand(n, seed)
    codes_py, scale_py = codec.quantize_lut(x)
    codes_cc, scale_cc = oracle.quantize_lut(x, oracle.nf4_table())
    assert np.float32(scale_py) == np.float32(scale_cc)
    np.testing.assert_array_equal(codes_py, codes_cc)
    # dequant matches too (same float32 multiply both sides)
    d_py = codec.dequantize_lut(codes_py, scale_py)
    d_cc = oracle.dequantize_lut(codes_cc, oracle.nf4_table(), scale_cc)
    np.testing.assert_array_equal(d_py, d_cc)


def test_lut_grouped_bit_exact_vs_oracle():
    x = _rand(8 * 256, seed=5).reshape(8, 256)
    codes_py, scales_py = codec.quantize_lut(x, group_size=64)
    codes_cc, scales_cc = oracle.quantize_lut_grouped(
        x, oracle.nf4_table(), 64)
    np.testing.assert_array_equal(codes_py, codes_cc)
    np.testing.assert_array_equal(scales_py, scales_cc)


def test_nf4_table_matches_oracle():
    np.testing.assert_array_equal(codec.NF4_TABLE, oracle.nf4_table())
    assert np.all(codec.NF4_TABLE[:-1] < codec.NF4_TABLE[1:])
    assert codec.NF4_TABLE[0] == -1.0 and codec.NF4_TABLE[15] == 1.0
    assert codec.NF4_TABLE[7] == 0.0


def test_lut_midpoint_ties_bit_exact():
    """Values exactly AT codebook midpoints must tie-break identically
    (the lower bin) in both implementations."""
    lut = codec.NF4_TABLE
    mids = ((lut[:-1] + lut[1:]) / np.float32(2.0)).astype(np.float32)
    # scale: absmax 2.0 → xn = x/2 exact halving keeps midpoints exact
    x = np.concatenate([mids * np.float32(2.0), [np.float32(2.0)]])
    codes_py, _ = codec.quantize_lut(x)
    codes_cc, _ = oracle.quantize_lut(x, lut)
    np.testing.assert_array_equal(codes_py, codes_cc)
    # midpoint i sits between entries i and i+1 → lower bin i → code i-8
    np.testing.assert_array_equal(codes_py[:-1], np.arange(15) - 8)


def test_lut_codes_range_and_packing_domain():
    x = _rand(4096, seed=7)
    codes, _ = codec.quantize_lut(x)
    assert codes.min() >= -8 and codes.max() <= 7
    # the [-8, 7] domain means the at-rest nibble pack round-trips
    packed = codec.pack_int4(codes)
    np.testing.assert_array_equal(codec.unpack_int4(packed, codes.size),
                                  codes)


def test_lut_reconstruction_beats_linear_on_gaussian():
    """NF4 bins are MSE-optimal for N(0,1) — on Gaussian weights the
    codebook must reconstruct better than linear int4 RTN."""
    x = _rand(65536, seed=11)
    c_lin, s_lin = codec.quantize(x, 4, group_size=128)
    d_lin = codec.dequantize(c_lin, s_lin, group_size=128)
    c_lut, s_lut = codec.quantize_lut(x, group_size=128)
    d_lut = codec.dequantize_lut(c_lut, s_lut, group_size=128)
    mse_lin = np.mean((x - d_lin) ** 2)
    mse_lut = np.mean((x - d_lut) ** 2)
    assert mse_lut < mse_lin


def test_lloyd_max_fit_improves_on_nf4_for_nongaussian():
    """Lloyd-Max adapts the codebook to the data distribution: on a
    bimodal distribution the fitted table must beat the NF4 constants."""
    rng = np.random.default_rng(13)
    x = np.concatenate([
        rng.normal(0.7, 0.05, 32768), rng.normal(-0.7, 0.05, 32768)
    ]).astype(np.float32)
    lut = codec.lloyd_max_fit(x)
    assert np.all(lut[:-1] < lut[1:])
    for table, label in [(codec.NF4_TABLE, "nf4"), (lut, "fit")]:
        c, s = codec.quantize_lut(x, table, group_size=128)
        d = codec.dequantize_lut(c, s, table, group_size=128)
        if label == "nf4":
            mse_nf4 = np.mean((x - d) ** 2)
        else:
            mse_fit = np.mean((x - d) ** 2)
    assert mse_fit < mse_nf4


def test_lut_zero_input():
    x = np.zeros(64, np.float32)
    codes, scale = codec.quantize_lut(x)
    assert scale == 1.0
    # 0 is entry 7 (code -1): exact zero reconstruction
    assert np.all(codes == -1)
    np.testing.assert_array_equal(codec.dequantize_lut(codes, scale), x)
