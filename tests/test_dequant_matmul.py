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
