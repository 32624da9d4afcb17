"""TP/DP sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.3).

Sharded-vs-unsharded logit equality is the whole contract: the shard_map'd
step with column/row-split packed weights, sharded int8 KV cache, psums and
vocab all-gather must reproduce the single-device forward bit-for-bit-ish
(fp tolerance only, same math different reduction order).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.models import PRESETS, llama
from quant_tpu.parallel import (
    make_mesh, shard_params, shard_cache, make_sharded_forward,
)

CFG = PRESETS["test-tiny"]


def _run_pair(cfg, data, model, tp_pack, batch=4, steps=2):
    # tp-packed params interleave fused columns per shard — mathematically
    # the same weights as tp=1 packing (init_params draws identical dense
    # weights for any tp), but only consumable under the matching shard_map.
    # The reference therefore uses the tp=1 packing.
    params_ref = llama.init_params(cfg, seed=0, tp=1)
    params = llama.init_params(cfg, seed=0, tp=tp_pack)
    cache0 = llama.init_cache(cfg, batch=batch, max_seq=16)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (batch, 5)),
        jnp.int32,
    )

    ref_logits, ref_cache = llama.forward(params_ref, toks, cache0, cfg)

    mesh = make_mesh(data=data, model=model)
    sp = shard_params(params, mesh)
    sc = shard_cache(llama.init_cache(cfg, batch=batch, max_seq=16), mesh)
    step = make_sharded_forward(cfg, mesh, sp, sc)
    out_logits, out_cache = step(sp, toks, sc)

    np.testing.assert_allclose(
        np.asarray(out_logits, np.float32),
        np.asarray(ref_logits, np.float32), rtol=2e-4, atol=2e-4,
    )
    # Decode a step on top to exercise cache reuse under sharding.
    nxt = jnp.argmax(ref_logits[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = llama.forward(params_ref, nxt, ref_cache, cfg)
    out2, _ = step(sp, nxt, out_cache)
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(ref2, np.float32),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("data,model", [(1, 2), (2, 2), (4, 2), (1, 1)])
def test_tp_dp_matches_single_device(data, model):
    _run_pair(CFG, data, model, tp_pack=model)


def test_tp_qk_norm():
    """Qwen3 QK-RMSNorm under TP: the [Dh] norm weights replicate across
    head shards — sharded forward must equal single-device."""
    cfg = dataclasses.replace(CFG, qk_norm=True)
    _run_pair(cfg, 2, 2, tp_pack=2)


def test_tp_int8():
    cfg = dataclasses.replace(CFG, bits=8)
    _run_pair(cfg, 2, 2, tp_pack=2)


def test_tp_requires_head_divisibility():
    mesh = make_mesh(data=1, model=8)
    params = llama.init_params(CFG, seed=0)
    cache = llama.init_cache(CFG, batch=2, max_seq=8)
    with pytest.raises(ValueError, match="must divide"):
        make_sharded_forward(CFG, mesh, params, cache)


def test_int4_kshards_roundtrip():
    """Shard-blocked int4 packing dequantizes identically to unblocked."""
    from quant_tpu.core.qtensor import quantize_tensor
    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 64), dtype=np.float32)
    a = quantize_tensor(w, bits=4, group_size=32, kshards=1)
    b = quantize_tensor(w, bits=4, group_size=32, kshards=4)
    np.testing.assert_allclose(
        np.asarray(a.dequantize()), np.asarray(b.dequantize()),
        rtol=0, atol=0,
    )
