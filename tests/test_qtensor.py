"""QTensor format tests: pytree registration, dequant correctness, layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.core import codec
from quant_tpu.core.qtensor import QTensor, quantize_tensor


def _w(k=128, n=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, n)).astype(np.float32)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [None, 32])
def test_dequantize_matches_numpy_reference(bits, group_size):
    w = _w()
    qt = quantize_tensor(w, bits, group_size)
    # NumPy reference: quantize over K per output channel via codec on w.T
    gs = w.shape[0] if group_size is None else group_size
    codes_nk, scales_ng = codec.quantize(w.T, bits, group_size=gs)
    ref = codec.dequantize(codes_nk, scales_ng, group_size=gs).T
    got = np.asarray(qt.dequantize())
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_int4_codes_shape_and_layout():
    w = _w(64, 32)
    qt = quantize_tensor(w, 4, group_size=16)
    assert qt.codes.shape == (32, 32) and qt.codes.dtype == np.uint8
    assert qt.scales.shape == (4, 32)
    dense = codec.unpack_int4_matmul(np.asarray(qt.codes))
    assert dense.shape == (64, 32)
    assert np.abs(dense).max() <= 7


def test_qtensor_is_pytree():
    qt = quantize_tensor(_w(32, 16), 8, None)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    assert len(leaves) == 2
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.bits == 8 and qt2.shape == (32, 16)
    # jittable as an argument
    f = jax.jit(lambda q: q.dequantize().sum())
    f(qt)


def test_quantization_error_bound():
    w = _w(256, 128, seed=2)
    for bits, rtol in [(8, 0.001), (4, 0.05)]:
        qt = quantize_tensor(w, bits, group_size=64)
        err = np.abs(np.asarray(qt.dequantize()) - w)
        step = np.asarray(qt.scales).max()
        assert err.max() <= step / 2 + 1e-6
        rel = np.linalg.norm(err) / np.linalg.norm(w)
        assert rel < rtol * 20


def test_device_quantize_bit_exact_vs_host():
    """jnp on-device quantization must produce identical codes/scales."""
    import jax.numpy as jnp
    import numpy as np
    from quant_tpu.core.qtensor import quantize_tensor, quantize_tensor_device

    rng = np.random.default_rng(42)
    w = rng.standard_normal((256, 128), dtype=np.float32)
    for bits, gs in [(8, None), (8, 64), (4, None), (4, 128)]:
        host = quantize_tensor(w, bits=bits, group_size=gs)
        dev = quantize_tensor_device(jnp.asarray(w), bits=bits, group_size=gs)
        np.testing.assert_array_equal(np.asarray(dev.codes), host.codes)
        np.testing.assert_array_equal(np.asarray(dev.scales), host.scales)


def test_device_quantize_kshards_matches_host():
    import jax.numpy as jnp
    import numpy as np
    from quant_tpu.core.qtensor import quantize_tensor, quantize_tensor_device

    rng = np.random.default_rng(7)
    w = rng.standard_normal((128, 64), dtype=np.float32)
    host = quantize_tensor(w, bits=4, group_size=32, kshards=4)
    dev = quantize_tensor_device(jnp.asarray(w), 4, 32, kshards=4)
    np.testing.assert_array_equal(np.asarray(dev.codes), host.codes)
    assert dev.kshards == 4
