"""Scaling-efficiency bench (SURVEY.md §2.2 #16; BASELINE ">=80% tokens/s
scaling 1 chip → 1 host → 2+ hosts").

Runs the sharded decode step over increasing mesh sizes and reports
tokens/s + efficiency vs linear scaling. On this box only one real TPU chip
is visible, so by default it runs on the virtual CPU mesh — numbers are then
only a LOGICAL validation of the sharded program (collectives execute, no
retraces); real efficiency requires a pod slice, where this same script runs
unchanged (differential timing works there too).

Usage: python scripts/scaling_bench.py [n_devices ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.parallel import (
    make_mesh, make_sharded_forward, shard_cache, shard_params,
)
from quant_tpu.utils.timing import differential_time

CFG = ModelConfig(
    vocab_size=2048, dim=512, n_layers=4, n_heads=8, n_kv_heads=4,
    intermediate=1024, group_size=128, kernel_mode="auto",
)


def bench_mesh(n: int, batch_per_shard: int = 4, max_seq: int = 256):
    tp = min(4, n)
    data = n // tp
    mesh = make_mesh(data=data, model=tp)
    batch = batch_per_shard * data
    params = shard_params(llama.init_params(CFG, seed=0, tp=tp), mesh)
    cache = shard_cache(llama.init_cache(CFG, batch, max_seq), mesh)
    step = make_sharded_forward(CFG, mesh, params, cache)

    def make_fn(reps):
        @jax.jit
        def run(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = step(params, tok, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, reps, body, (tok, cache))
            return jnp.sum(tok)
        return run

    tok = jnp.ones((batch, 1), jnp.int32)
    per_step = differential_time(
        make_fn, (params, tok, cache), 2, 10, iters=3
    )
    return batch / per_step, per_step


def proxy_efficiency(sizes, batch_per_shard: int = 4, max_seq: int = 256,
                     tp: int = 1):
    """Cost-normalized scaling-efficiency proxy for the VIRTUAL CPU mesh
    (VERDICT r3 #7). Wall-clock on n virtual devices sharing one host CPU
    scales with TOTAL work, so raw tokens/s cannot show scaling; instead
    normalize throughput by the compiled step's total bytes accessed
    (XLA cost analysis):

        eff(n) = [batch(n) / (t(n) * W(n))] / [batch(1) / (t(1) * W(1))]

    A perfectly sharded program keeps eff ~= 1 (work grows linearly with
    data, no sharding-induced copies/retraces); halo copies, resharding
    or per-shard overheads shrink it. Returns {n: eff}."""
    out = {}
    base = None
    for n in sizes:
        data = n // tp
        mesh = make_mesh(data=data, model=tp)
        batch = batch_per_shard * data
        params = shard_params(llama.init_params(CFG, seed=0, tp=tp), mesh)
        cache = shard_cache(llama.init_cache(CFG, batch, max_seq), mesh)
        step = make_sharded_forward(CFG, mesh, params, cache)
        tok = jnp.ones((batch, 1), jnp.int32)
        cost = jax.jit(step).lower(params, tok, cache).compile(
        ).cost_analysis()
        w = float(cost.get("bytes accessed", 0.0)) or float(
            cost.get("flops", 1.0))

        def make_fn(reps, step=step):
            @jax.jit
            def run(params, tok, cache):
                def body(_, carry):
                    tok, cache = carry
                    logits, cache = step(params, tok, cache)
                    nxt = jnp.argmax(logits[:, -1:],
                                     axis=-1).astype(jnp.int32)
                    return nxt, cache
                tok, cache = jax.lax.fori_loop(0, reps, body, (tok, cache))
                return jnp.sum(tok)
            return run

        per = differential_time(make_fn, (params, tok, cache), 2, 10,
                                iters=5)
        score = batch / (per * w)
        if base is None:
            base = score
        out[n] = score / base
    return out


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    sizes = [s for s in sizes if s <= len(jax.devices())]
    base = None
    for n in sizes:
        tps, per = bench_mesh(n)
        if base is None:
            base = tps / n
        eff = 100.0 * tps / (base * n)
        print(f"devices={n}: {tps:.1f} tok/s ({per*1e3:.2f} ms/step, "
              f"scaling efficiency {eff:.0f}%)", flush=True)
    effs = proxy_efficiency(sizes)
    for n, e in effs.items():
        print(f"devices={n}: cost-normalized proxy efficiency {100*e:.0f}%",
              flush=True)


if __name__ == "__main__":
    main()
