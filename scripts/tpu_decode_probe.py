"""Whole-model decode probe on the real chip: tokens/s for Llama-3-8B INT4.

Params are generated + quantized ON DEVICE (init_params_device) — the relay
upload path is ~MB/s. Decode steps chain inside one jit (greedy argmax
feeds the next step), timed differentially over two step counts.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import PRESETS, llama


def timed(fn, *a, iters=3):
    np.asarray(fn(*a)); ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama-3-8b"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_seq = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    kv_bits = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    cfg = PRESETS[preset]
    if layers:
        cfg = dataclasses.replace(cfg, n_layers=layers)
    if kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=kv_bits)
    print(f"{preset} L={cfg.n_layers} bits={cfg.bits} gs={cfg.group_size} "
          f"B={batch} S={max_seq} kv={cfg.kv_bits}", flush=True)

    t0 = time.perf_counter()
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    print(f"device init: {time.perf_counter()-t0:.1f}s", flush=True)

    def steps_fn(n):
        @jax.jit
        def run(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return run

    tok = jnp.ones((batch, 1), jnp.int32)
    # warm the cache with ~128 tokens so attention reads something real;
    # sub-batched to keep transient memory small (prefill logits + the
    # second full cache would otherwise double-allocate)
    sub = min(batch, 4)
    pre = jnp.ones((sub, 128), jnp.int32)
    pf = jax.jit(lambda p, t, c: llama.forward(p, t, c, cfg))
    small = llama.init_cache(cfg, sub, max_seq)
    _, small = pf(params, pre, small)
    jax.block_until_ready(small.lengths)
    reps = batch // sub
    cache = llama.KVCache(
        k_codes=jnp.tile(small.k_codes, (1, reps, 1, 1, 1)),
        k_scale=jnp.tile(small.k_scale, (1, reps, 1, 1)),
        v_codes=jnp.tile(small.v_codes, (1, reps, 1, 1, 1)),
        v_scale=jnp.tile(small.v_scale, (1, reps, 1, 1)),
        lengths=jnp.tile(small.lengths, (reps,)),
    )
    del small
    print("prefill done", flush=True)

    n_lo, n_hi = 2, 18
    t0 = time.perf_counter()
    t_lo = timed(steps_fn(n_lo), params, tok, cache)
    print(f"lo done {time.perf_counter()-t0:.0f}s", flush=True)
    t_hi = timed(steps_fn(n_hi), params, tok, cache)
    per_step = (t_hi - t_lo) / (n_hi - n_lo)
    tps = batch / per_step
    # weight-read-bound reference: codes bytes / 730 GB/s
    wb = sum(
        int(np.prod(c.shape))
        for c in jax.tree.leaves(params)
        if hasattr(c, "dtype") and c.dtype in (jnp.int8.dtype, jnp.uint8.dtype)
    )
    floor = wb / 730e9
    print(f"per-step {per_step*1e3:.2f} ms  tokens/s {tps:.0f}  "
          f"(weight-BW floor {floor*1e3:.2f} ms → "
          f"{100*floor/per_step:.0f}% of BW-bound)", flush=True)


if __name__ == "__main__":
    main()
