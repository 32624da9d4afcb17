"""Fused dequant+matmul kernel vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.core.qtensor import quantize_tensor
from quant_tpu.kernels import (
    dequant_matmul,
    dequant_matmul_reference,
    unpack_int4_device,
)
from quant_tpu.core import codec


def _mk(m, k, n, bits, gs, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32)
    qt = quantize_tensor(w, bits=bits, group_size=gs)
    return jnp.asarray(x, dtype), qt


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("gs", [None, 128])
@pytest.mark.parametrize("m", [1, 16, 300])
def test_kernel_matches_reference(bits, gs, m):
    x, qt = _mk(m, 512, 384, bits, gs, jnp.float32)
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=128, tile_k=256, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_kernel_bf16(bits):
    x, qt = _mk(8, 256, 256, bits, 64, jnp.bfloat16, seed=3)
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=128, tile_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-1,
    )


def test_group_spans_multiple_tiles():
    # gs=256 > tk=128: each tile inside one group (post-dot scaling path).
    x, qt = _mk(4, 512, 128, 8, 256, jnp.float32, seed=5)
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=128, tile_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_leading_dims():
    x, qt = _mk(6, 256, 128, 8, None, jnp.float32, seed=7)
    x3 = x.reshape(2, 3, 256)
    out = dequant_matmul(x3, qt, tile_n=128, tile_k=128, interpret=True)
    ref = dequant_matmul_reference(x, qt).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_untileable_falls_back():
    # K=200 has no 128-multiple tile → XLA fallback, still correct.
    x, qt = _mk(3, 200, 100, 8, None, jnp.float32, seed=9)
    out = dequant_matmul(x, qt, interpret=True)
    ref = dequant_matmul_reference(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_unpack_int4_device_matches_host():
    rng = np.random.default_rng(11)
    codes = rng.integers(-8, 8, size=(256, 256), dtype=np.int8)
    packed = codec.pack_int4_matmul(codes)
    out = unpack_int4_device(jnp.asarray(packed), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), codes)


@pytest.mark.parametrize("bits", [8, 4])
def test_stacked_layer_select(bits):
    """Stacked [L, ...] QTensor + traced layer index == per-layer matmul."""
    import jax

    qts = [_mk(4, 256, 128, bits, 64, jnp.float32, seed=100 + i)[1]
           for i in range(3)]
    x = _mk(4, 256, 128, bits, 64, jnp.float32, seed=0)[0]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *qts)
    for i, qt in enumerate(qts):
        ref = dequant_matmul_reference(x, qt)
        out = dequant_matmul(x, stacked, jnp.int32(i), tile_n=128,
                             tile_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)


def test_stacked_inside_scan():
    import jax

    qts = [_mk(4, 256, 128, 8, 64, jnp.float32, seed=200 + i)[1]
           for i in range(3)]
    x = _mk(4, 256, 128, 8, 64, jnp.float32, seed=1)[0]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *qts)

    def body(c, i):
        y = dequant_matmul(c[:, :256], stacked, i, tile_n=128, tile_k=128,
                           interpret=True)
        return jnp.concatenate([y, y], axis=-1)[:, :256], y

    _, ys = jax.lax.scan(body, x, jnp.arange(3))
    c = x
    for i in range(3):
        ref = dequant_matmul_reference(c[:, :256], qts[i])
        # accumulation-order noise compounds through the chain
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(ref),
                                   rtol=5e-3, atol=1e-2)
        c = jnp.concatenate([ref, ref], axis=-1)[:, :256]


@pytest.mark.parametrize("bits", [8, 4])
def test_act_quant_mode(bits):
    """W8A8/W4A8 kernels track the fp reference within activation-quant
    error."""
    x, qt = _mk(8, 512, 256, bits, 128, jnp.float32, seed=42)
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=256, tile_k=256, interpret=True,
                         act_quant=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-1)
    # correlation sanity — errors are small perturbations, not structure
    c = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.999


# ── codebook ("bin-lookup") kernel path ─────────────────────────────────


def _lut_qt(k=512, n=256, gs=128, seed=0, codebook="nf4"):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n)).astype(np.float32)
    return w, quantize_tensor(w, 4, gs, codebook=codebook)


def test_lut_kernel_exact_matches_reference():
    """lut_exact=True (f32 select tree) must match the XLA lut dequant to
    matmul tolerance."""
    w, qt = _lut_qt()
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (8, 512)).astype(np.float32))
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=128, tile_k=128, interpret=True,
                         lut_exact=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_lut_kernel_word4_requant_error_bounded():
    """The fast path's int8-requantized codebook adds <= absmax/254 per
    weight — the matmul outputs must stay within linear-int4-cast-level
    tolerance of the exact reference."""
    w, qt = _lut_qt(seed=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (8, 512)).astype(np.float32))
    ref = dequant_matmul_reference(x, qt)
    out = dequant_matmul(x, qt, tile_n=128, tile_k=128, interpret=True)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 3e-2, rel


def test_lut_stacked_per_layer_tables():
    """Stacked layers may carry DIFFERENT codebooks (lloyd per tensor) —
    the kernel's layer-indexed SMEM table read must pick the right one."""
    import jax
    import dataclasses

    rng = np.random.default_rng(5)
    qts, ws = [], []
    for i in range(2):
        w = rng.standard_normal((256, 128)).astype(np.float32) * (i + 1)
        lut = codec.lloyd_max_fit(w) if i else codec.NF4_TABLE
        ws.append(w)
        qts.append(quantize_tensor(w, 4, 64, codebook=lut))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    for i in range(2):
        ref = dequant_matmul_reference(x, qts[i])
        out = dequant_matmul(x, stacked, jnp.int32(i), tile_n=128,
                             tile_k=128, interpret=True)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 3e-2, (i, rel)


def test_lut_reference_dequantize_exact():
    """QTensor.dequantize with a lut reproduces the host codec exactly."""
    w, qt = _lut_qt(k=256, n=128, gs=64, seed=7)
    codes_nk, scales_ng = codec.quantize_lut(w.T, group_size=64)
    want = codec.dequantize_lut(codes_nk, scales_ng,
                                group_size=64).T
    got = np.asarray(qt.dequantize(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_lut_aq_falls_back_to_reference():
    w, qt = _lut_qt(seed=9)
    x = jnp.asarray(np.random.default_rng(9).standard_normal(
        (4, 512)).astype(np.float32))
    out = dequant_matmul(x, qt, interpret=True, act_quant=True)
    ref = dequant_matmul_reference(x, qt, act_quant=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
