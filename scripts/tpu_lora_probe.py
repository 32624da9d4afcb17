"""LoRA decode overhead on the real chip: 2-layer 8B-geometry slice,
B=48, adapters r=16 — per-step cost of the masked multi-adapter delta
vs the base decode step.

    PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    timeout 2000 python scripts/tpu_lora_probe.py [n_adapters] [r]
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.models.lora import make_lora_stack
from quant_tpu.utils.timing import differential_time

CFG = ModelConfig(
    vocab_size=4096, dim=4096, n_layers=2, n_heads=32, n_kv_heads=8,
    intermediate=14336, group_size=128, kernel_mode="pallas",
)
B, S = 48, 1024


def _adapter(rng, cfg, r):
    d, hd, it = cfg.dim, cfg.head_dim, cfg.intermediate
    k_in = {"wq": d, "wk": d, "wv": d, "wo": cfg.n_heads * hd,
            "w_gate": d, "w_up": d, "w_down": it}
    n_out = {"wq": cfg.n_heads * hd, "wk": cfg.n_kv_heads * hd,
             "wv": cfg.n_kv_heads * hd, "wo": d, "w_gate": it,
             "w_up": it, "w_down": d}
    ad = {"alpha": float(r)}
    for i in range(cfg.n_layers):
        for p in k_in:
            ad[f"layers.{i}.{p}.a"] = rng.standard_normal(
                (k_in[p], r)).astype(np.float32) * 0.01
            ad[f"layers.{i}.{p}.b"] = rng.standard_normal(
                (r, n_out[p])).astype(np.float32) * 0.01
    return ad


def step_time(params, ids):
    cache = llama.init_cache(CFG, B, S)
    cache = dataclasses.replace(
        cache, lengths=jnp.full((B,), S - 4, jnp.int32))
    tok = jnp.ones((B, 1), jnp.int32)

    def make(n):
        @jax.jit
        def run(params, tok, cache, ids):
            def body(_, carry):
                tok, cache = carry
                logits, cache = llama.forward(params, tok, cache, CFG,
                                              adapter_ids=ids)
                cache = dataclasses.replace(cache,
                                            lengths=cache.lengths - 1)
                nxt = (tok + (logits[0, -1, 0] * 0).astype(jnp.int32))
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return run
    return differential_time(make, (params, tok, cache, ids), 6, 62,
                             iters=3)


def main():
    n_ad = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    params = llama.init_params_device(CFG, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    base = step_time(params, None)
    print(f"base decode        : {base*1e3:.3f} ms/step", flush=True)
    rng = np.random.default_rng(0)
    stack = make_lora_stack([_adapter(rng, CFG, r)
                             for _ in range(n_ad)], CFG)
    params_l = dataclasses.replace(params, lora=stack)
    ids = jnp.asarray(np.arange(B) % (n_ad + 1), jnp.int32)
    lt = step_time(params_l, ids)
    print(f"+{n_ad} adapters r={r}: {lt*1e3:.3f} ms/step "
          f"(+{(lt-base)*1e3:.3f} ms, {lt/base:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
