"""Speculative decoding on the real chip: what a verify dispatch costs.

Two measurements on the 2-layer Llama-3-8B-geometry slice:

1. DEVICE cost: differential time of the T=1 decode forward vs the
   T=gamma+1 verify forward at B=16. Decode is weight-bandwidth bound, so
   the gamma extra query rows should be nearly free — the ratio bounds the
   acceptance rate needed to break even (ratio r means any
   tokens/dispatch > r wins).
2. ENGINE wall-clock: Engine.generate over self-repetitive prompts with
   spec_gamma in {0, 4}, tokens/s + acceptance stats. On this relay each
   dispatch carries 40-80 ms RPC, so multi-token commits also amortize
   dispatch latency — the relay-side win is larger than the device-side
   one (stated explicitly when recording numbers).
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.engine import Engine, Request
from quant_tpu.models import PRESETS, llama
from quant_tpu.utils.timing import differential_time

B = 16
GAMMAS = (1, 4, 8)

cfg = dataclasses.replace(
    PRESETS["llama-3-8b"], n_layers=2, vocab_size=8192,
    kernel_mode="pallas", embed_bits=8,
)


def step_fn(t: int):
    def make(outer: int):
        @jax.jit
        def run(params, cache, toks):
            def body(i, carry):
                cache, s = carry
                logits, cache = llama.forward(params, toks, cache, cfg)
                # keep lengths fixed so every iteration costs the same
                cache = dataclasses.replace(
                    cache, lengths=jnp.full_like(cache.lengths, 900))
                return cache, s + jnp.sum(logits[:, -1, :8])
            cache, s = jax.lax.fori_loop(0, outer, body,
                                         (cache, jnp.float32(0)))
            return s
        return run
    return make


def main():
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)

    print("device-side dispatch cost (B=16, S=1024, fill 900):", flush=True)
    cache = llama.init_cache(cfg, B, 1024)
    cache = dataclasses.replace(
        cache, lengths=jnp.full((B,), 900, jnp.int32))
    base = None
    for t in (1,) + tuple(g + 1 for g in GAMMAS):
        toks = jnp.ones((B, t), jnp.int32)
        per = differential_time(step_fn(t), (params, cache, toks), 4, 64,
                                iters=4)
        if base is None:
            base = per
        print(f"  T={t}: {per*1e3:.3f} ms/dispatch "
              f"({per/base:.2f}x of T=1 decode)", flush=True)

    print("engine wall-clock (repetitive prompts, greedy):", flush=True)
    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(B):
        motif = list(map(int, rng.integers(3, 8000, 8)))
        prompts.append((motif * 12)[:64])
    for gamma in (0, 4):
        eng = Engine(llama.init_params_device(cfg, seed=0), cfg,
                     max_slots=B, max_seq=512, eos_id=-1, spec_gamma=gamma)
        reqs = [Request(req_id=i, prompt=p, max_new_tokens=128)
                for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add_request(r)
        while eng._prefilling is not None or eng.pending:
            eng._advance_admission()
        t0 = time.perf_counter()
        while eng.has_work():
            eng.step()
        dt = time.perf_counter() - t0
        n_tok = sum(len(r.output) for r in reqs)
        print(f"  spec_gamma={gamma}: {n_tok} tokens in {dt:.2f}s = "
              f"{n_tok/dt:.0f} tok/s (relay dispatch-bound)  "
              f"stats={eng.stats}", flush=True)


if __name__ == "__main__":
    main()
