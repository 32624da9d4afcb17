"""Attempt a jax.profiler trace of the decode step on the real chip
(VERDICT r1 #8: "profile and prove" — or document that the relay can't).

Writes the trace under /tmp/quant_tpu_trace_hw and lists what landed.
If the axon relay exposes no device-side tracing, only host/python events
appear — the script reports which case happened so README can cite it.
"""
import dataclasses
import functools
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.utils.profiling import trace

OUT = "/tmp/quant_tpu_trace_hw"

cfg = ModelConfig(
    vocab_size=4096, dim=4096, n_layers=2, n_heads=32, n_kv_heads=8,
    intermediate=14336, group_size=128, kernel_mode="pallas",
)


def main():
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    import sys
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cache = llama.init_cache(cfg, b, 1024)
    cache = dataclasses.replace(cache,
                                lengths=jnp.full((b,), 900, jnp.int32))
    tok = jnp.ones((b, 1), jnp.int32)

    # donate the cache exactly like the production engine jits — without
    # donation XLA must preserve the input buffers against the in-place
    # loop carry and inserts full k/v-codes copies (~105 us each per step
    # at B=16/S=1024, measured in the first capture of this trace)
    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, cache):
        logits, cache = llama.forward(params, tok, cache, cfg)
        return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32), cache

    # warm/compile outside the trace
    t, c = step(params, tok, cache)
    np.asarray(t)
    print("compiled; tracing 20 steps", flush=True)

    with trace(OUT):
        for _ in range(20):
            t, c = step(params, t, c)
        np.asarray(t)

    files = glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
    files = [f for f in files if os.path.isfile(f)]
    print(f"{len(files)} artifact files:", flush=True)
    for f in files:
        print(f"  {os.path.getsize(f):>10d}  {f}", flush=True)
    has_device = any("trace.json" in f or "xplane" in f for f in files)
    print(f"device-side trace present: {has_device}", flush=True)


if __name__ == "__main__":
    main()
