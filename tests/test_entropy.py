"""Entropy-stage tests: Python canonical Huffman byte-exact vs C++ oracle."""

import numpy as np
import pytest

from quant_tpu.core import entropy, oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="C++ oracle not buildable"
)


def _cases():
    rng = np.random.default_rng(7)
    return {
        "empty": b"",
        "single_byte": b"A",
        "one_symbol_run": b"\x42" * 1000,
        "two_symbols": bytes((rng.integers(0, 2, 5000) * 7).astype(np.uint8)),
        "skewed": bytes(
            np.clip(rng.normal(128, 6, 20000), 0, 255).astype(np.uint8)
        ),
        "uniform_random": bytes(rng.integers(0, 256, 4096).astype(np.uint8)),
        "all_symbols": bytes(np.arange(256, dtype=np.uint8)),
    }


@pytest.mark.parametrize("name", list(_cases().keys()))
def test_encode_byte_exact_vs_oracle(name):
    data = _cases()[name]
    enc_py = entropy.encode(data)
    enc_cc = oracle.entropy_encode(data)
    assert enc_py == enc_cc, f"frame mismatch for case {name}"


@pytest.mark.parametrize("name", list(_cases().keys()))
def test_roundtrip_all_decoder_pairs(name):
    data = _cases()[name]
    enc = entropy.encode(data)
    assert entropy.decode(enc) == data
    assert oracle.entropy_decode(enc) == data
    enc_cc = oracle.entropy_encode(data)
    assert entropy.decode(enc_cc) == data


def test_skewed_data_compresses():
    data = _cases()["skewed"]
    enc = entropy.encode(data)
    assert len(enc) < len(data) * 0.7


def test_incompressible_uses_stored_mode():
    # Exactly equal symbol frequencies → all code lengths 8 → payload == n,
    # which triggers stored mode (payload_bytes >= n).
    data = bytes(np.tile(np.arange(256, dtype=np.uint8), 16))
    enc = entropy.encode(data)
    assert enc[5] & 1 == 1  # stored flag
    assert len(enc) == 14 + len(data)
    assert enc == oracle.entropy_encode(data)


def test_quantized_codes_compress_well():
    """Gaussian weights at 4-bit → packed nibbles have low entropy."""
    from quant_tpu.core import codec

    rng = np.random.default_rng(3)
    w = rng.standard_normal(65536).astype(np.float32)
    codes, _ = codec.quantize(w, 4)
    packed = codec.pack_int4(codes)
    enc = entropy.encode(packed)
    # int4-of-gaussian has ≈3.1 bits/code entropy → expect < 90% of packed.
    assert len(enc) < len(packed) * 0.9
