"""70B-geometry sharded dryrun on the virtual CPU mesh (config 5 shape).

Real Llama-3-70B layer dimensions (dim 8192, inter 28672, 64 q / 8 kv
heads), depth cut to 4 layers, over a pipe=2 x data=1 x model=4 mesh —
validates that the full PP x TP sharded program (packed int4 row/column
splits, kshards, fused columns, GPipe microbatching) compiles and executes
at the big-model shapes without 16 real chips.
"""

import dataclasses
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from quant_tpu.models import PRESETS, llama  # noqa: E402
from quant_tpu.parallel import (  # noqa: E402
    make_mesh, make_pp_forward, shard_cache_pp, shard_params_pp,
)


def main():
    cfg = dataclasses.replace(
        PRESETS["llama-3-70b"], n_layers=4, vocab_size=8192,
        kernel_mode="xla",
    )
    t0 = time.perf_counter()
    params = llama.init_params(cfg, seed=0, tp=4)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)
    mesh = make_mesh(pipe=2, data=1, model=4)
    sp = shard_params_pp(params, mesh)
    sc = shard_cache_pp(llama.init_cache(cfg, 4, 64), mesh)
    step = make_pp_forward(cfg, mesh, sp, sc, n_micro=2)
    toks = jnp.ones((4, 1), jnp.int32)
    t0 = time.perf_counter()
    logits, sc = step(sp, toks, sc)
    jax.block_until_ready(logits)
    print(f"step1 (compile) {time.perf_counter()-t0:.0f}s "
          f"logits={logits.shape}", flush=True)
    logits, sc = step(sp, toks, sc)
    jax.block_until_ready(logits)
    assert logits.shape == (4, 1, cfg.vocab_size)
    assert int(sc.lengths[0]) == 2
    print("70B-geometry PPxTP dryrun ok", flush=True)


if __name__ == "__main__":
    main()
