"""Prefill throughput probe: tokens/s for a T=512 chunk, Llama-3-8B INT4.

Repeats the same prefill (lengths reset each iteration) inside one jit;
differential timing as usual.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import PRESETS, llama
from quant_tpu.utils.timing import differential_time


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b, t, s = 2, 512, 1024
    cfg = PRESETS["llama-3-8b"]
    if layers:
        cfg = dataclasses.replace(cfg, n_layers=layers)
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    print(f"L={cfg.n_layers} B={b} T={t}", flush=True)
    cache0 = llama.init_cache(cfg, b, s)
    toks = jnp.ones((b, t), jnp.int32)

    def make(n):
        @jax.jit
        def run(params, toks, cache):
            def body(i, acc):
                logits, c2 = llama.forward(params, toks, cache, cfg)
                return acc + logits[0, -1, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    t0 = time.perf_counter()
    per = differential_time(make, (params, toks, cache0), 1, 5, iters=3)
    toks_per_s = b * t / per
    print(f"prefill {per*1e3:.1f} ms/chunk → {toks_per_s:.0f} tok/s "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)

    # W4A8 prefill
    cfg = dataclasses.replace(cfg, act_quant=True)

    def make_aq(n):
        @jax.jit
        def run(params, toks, cache):
            def body(i, acc):
                logits, c2 = llama.forward(params, toks, cache, cfg)
                return acc + logits[0, -1, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run

    t0 = time.perf_counter()
    per = differential_time(make_aq, (params, toks, cache0), 1, 5, iters=3)
    print(f"prefill W4A8 {per*1e3:.1f} ms/chunk → {b*t/per:.0f} tok/s "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
