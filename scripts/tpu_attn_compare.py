"""Compare decode step: attn_kernel=xla vs flash(+aliased insert), on HW."""
import dataclasses
import time

import jax, jax.numpy as jnp, numpy as np
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.utils.timing import differential_time

B, S = 8, 1024
BASE = ModelConfig(
    vocab_size=4096, dim=4096, n_layers=2, n_heads=32, n_kv_heads=8,
    intermediate=14336, group_size=128, kernel_mode="pallas",
)


def run(cfg, params, label):
    cache = llama.init_cache(cfg, B, S)
    cache = dataclasses.replace(cache,
                                lengths=jnp.full((B,), 900, jnp.int32))
    tok = jnp.ones((B, 1), jnp.int32)

    def make(n):
        @jax.jit
        def f(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                cache = dataclasses.replace(cache,
                                            lengths=cache.lengths - 1)
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return f
    t0 = time.perf_counter()
    per = differential_time(make, (params, tok, cache), 2, 14, iters=3)
    print(f"{label}: {per*1e3:.2f} ms/step (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)


def main():
    params = llama.init_params_device(BASE, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    run(dataclasses.replace(BASE, attn_kernel="xla"), params, "xla_attn ")
    run(dataclasses.replace(BASE, attn_kernel="flash"), params, "flash+ali")


if __name__ == "__main__":
    main()
