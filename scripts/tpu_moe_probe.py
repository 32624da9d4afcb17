"""MoE decode on the real chip: ms/step + expert-weight stream rate for a
2-layer Mixtral-8x7B-geometry slice (SURVEY §2.2 #14).

The inference MoE computes every expert densely (llama.mlp_block) — per
step it must stream ALL experts' packed codes once, so the figure of
merit is (expert bytes + attn bytes) / step vs the chip's measured
streaming ceiling, and the comparison point is the dense-MLP slice of
the same geometry (the MoE step should cost ~E x the MLP-weight bytes,
NOT E x the step time, at decode batch sizes).

Usage: tpu_moe_probe.py [B] [layers] [experts]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import PRESETS, llama


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_exp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    base = dataclasses.replace(
        PRESETS["mixtral-8x7b"], n_layers=n_layers, n_experts=n_exp,
        vocab_size=4096, embed_bits=16, kernel_mode="pallas",
    )
    dense = dataclasses.replace(
        base, n_experts=0)

    for name, cfg in (("dense-mlp", dense), ("moe", base)):
        t0 = time.perf_counter()
        params = llama.init_params_device(cfg, seed=0)
        jax.block_until_ready(params.layers.wqkv.codes)
        print(f"{name}: device init {time.perf_counter()-t0:.0f}s",
              flush=True)
        cache = llama.init_cache(cfg, b, 1024)
        cache = dataclasses.replace(
            cache, lengths=jnp.full((b,), 900, jnp.int32))
        # DIVERSE per-slot tokens: identical slots route identically, so
        # the zero-routed-expert skip (mlp_block lax.cond) would read only
        # k experts/layer and overstate tok/s ~2x (measured: 1.4 ms/step
        # for 16 identical slots vs 2.7 with all experts hot).
        tok = jnp.asarray(
            np.random.default_rng(0).integers(1, cfg.vocab_size, (b, 1)),
            jnp.int32)

        def steps_fn(n):
            @jax.jit
            def run(params, tok, cache):
                def body(_, carry):
                    tok, cache = carry
                    lg, cache = llama.forward(params, tok, cache, cfg)
                    nxt = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
                    cache = dataclasses.replace(
                        cache, lengths=cache.lengths - 1)
                    return nxt, cache
                tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
                return jnp.sum(tok)
            return run

        def timed(fn, *a, iters=3):
            np.asarray(fn(*a))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                np.asarray(fn(*a))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_lo = timed(steps_fn(2), params, tok, cache)
        t_hi = timed(steps_fn(10), params, tok, cache)
        per = (t_hi - t_lo) / 8
        wb = sum(
            int(np.prod(c.shape))
            for c in jax.tree.leaves(params)
            if hasattr(c, "dtype")
            and c.dtype in (jnp.int8.dtype, jnp.uint8.dtype))
        print(f"{name}: {per*1e3:.2f} ms/step  {b/per:.0f} tok/s  "
              f"packed weights {wb/1e9:.2f} GB -> {wb/per/1e9:.0f} GB/s "
              f"stream", flush=True)


def prefill_timing(b=4, t=512, n_layers=2, n_exp=8):
    """MoE prefill: dense-all-experts vs capacity dispatch (MXU-bound
    phase; capacity should approach k*cf/E of the dense MoE-MLP time)."""
    base = dataclasses.replace(
        PRESETS["mixtral-8x7b"], n_layers=n_layers, n_experts=n_exp,
        vocab_size=4096, embed_bits=16, kernel_mode="pallas",
    )
    params = llama.init_params_device(base, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    toks = jax.random.randint(jax.random.key(1), (b, t), 1, 4096,
                              jnp.int32)

    def timed(fn, *a, iters=5):
        np.asarray(fn(*a))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, cfg in (
        ("dense", base),
        ("capacity", dataclasses.replace(base, moe_prefill="capacity")),
    ):
        @jax.jit
        def pf(params, toks):
            cache = llama.init_cache(cfg, b, t)
            lg, _ = llama.forward(params, toks, cache, cfg)
            return jnp.sum(lg) * 1e-9
        dt_s = timed(pf, params, toks)
        print(f"prefill {name}: {dt_s*1e3:.1f} ms for {b}x{t} tokens "
              f"({b*t/dt_s:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "prefill":
        prefill_timing(*(int(a) for a in sys.argv[2:]))
    else:
        main()
