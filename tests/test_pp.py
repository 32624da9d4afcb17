"""Pipeline-parallel forward vs single-device (CPU 8-device mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.models import PRESETS, llama
from quant_tpu.parallel import (
    make_mesh, make_pp_forward, shard_params_pp, shard_cache_pp,
)

CFG = PRESETS["test-tiny"]  # 2 layers


def _run(pipe, data=1, model=1, tp_pack=1):
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=tp_pack)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (2 * data, 6)),
        jnp.int32,
    )
    cache0 = llama.init_cache(CFG, 2 * data, 16)
    ref1, ref_cache = llama.forward(params_ref, toks, cache0, CFG)
    ref2, _ = llama.forward(params_ref, toks[:, :1], ref_cache, CFG)

    mesh = make_mesh(data=data, model=model, pipe=pipe)
    sp_params = shard_params_pp(params, mesh)
    sc = shard_cache_pp(llama.init_cache(CFG, 2 * data, 16), mesh)
    step = make_pp_forward(CFG, mesh, sp_params, sc)
    out1, out_cache = step(sp_params, toks, sc)
    out2, _ = step(sp_params, toks[:, :1], out_cache)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(ref1, np.float32),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pipe,data,model,tp_pack", [
    (2, 1, 1, 1),   # pure PP
    (2, 2, 1, 1),   # PP x DP
    (2, 1, 2, 2),   # PP x TP
    (2, 2, 2, 2),   # PP x DP x TP (8 devices)
])
def test_pp_matches_single_device(pipe, data, model, tp_pack):
    _run(pipe, data, model, tp_pack)


def test_pp_requires_layer_divisibility():
    mesh = make_mesh(pipe=4)  # 2 layers % 4 != 0
    params = llama.init_params(CFG, seed=0)
    cache = llama.init_cache(CFG, 2, 16)
    with pytest.raises(ValueError, match="must divide the staged"):
        make_pp_forward(CFG, mesh, params, cache)


@pytest.mark.parametrize("n_micro,embed_bits", [
    (2, 16), (4, 16),
    (2, 8),   # embed_bits=8 is the PRODUCTION default (r1 crash regression)
])
def test_pp_microbatched_matches_single_device(n_micro, embed_bits):
    """GPipe microbatch schedule == single-device forward."""
    import dataclasses
    CFG = dataclasses.replace(PRESETS["test-tiny"], embed_bits=embed_bits)
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=1)
    batch = 4
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, CFG.vocab_size, (batch, 5)),
        jnp.int32,
    )
    cache0 = llama.init_cache(CFG, batch, 16)
    ref1, ref_cache = llama.forward(params_ref, toks, cache0, CFG)
    ref2, _ = llama.forward(params_ref, toks[:, :1], ref_cache, CFG)

    mesh = make_mesh(pipe=2)
    sp_params = shard_params_pp(params, mesh)
    sc = shard_cache_pp(llama.init_cache(CFG, batch, 16), mesh)
    step = make_pp_forward(CFG, mesh, sp_params, sc, n_micro=n_micro)
    out1, out_cache = step(sp_params, toks, sc)
    out2, _ = step(sp_params, toks[:, :1], out_cache)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(ref1, np.float32),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_pp_moe_expert_stacks_match_single_device():
    """r5 regression pin: expert-major stacks [E, L, ...] must slice
    their LAYER dim (dim 1) over pipe — the old pp_param_specs put pipe
    on dim 0, silently routing over a fraction of the experts per stage
    (wrong results, no error)."""
    import dataclasses

    cfg = dataclasses.replace(PRESETS["test-tiny-moe"], dtype="float32")
    params = llama.init_params(cfg, seed=3)
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 6)),
        jnp.int32)
    ref, _ = llama.forward(params, toks, llama.init_cache(cfg, 2, 16),
                           cfg)
    mesh = make_mesh(pipe=2)
    sp = shard_params_pp(params, mesh)
    sc = shard_cache_pp(llama.init_cache(cfg, 2, 16), mesh)
    step = make_pp_forward(cfg, mesh, sp, sc)
    out, _ = step(sp, toks, sc)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)
