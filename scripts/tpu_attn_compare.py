"""Decode-step attention crossover sweep (VERDICT r1 #5): attn_kernel=xla
vs flash(+aliased insert) vs paged(flash+table), on hardware, at
S x B points. Drives the production default in ModelConfig/_resolve_mode.

Usage: tpu_attn_compare.py [B] [S] [fill] [modes]
  modes: comma list of xla,flash,paged (default all)
Model: 2-layer 8B-geometry slice (per-layer cost × n_layers extrapolates).
"""
import dataclasses
import sys
import time

import jax, jax.numpy as jnp, numpy as np
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.utils.timing import differential_time

BASE = ModelConfig(
    vocab_size=4096, dim=4096, n_layers=2, n_heads=32, n_kv_heads=8,
    intermediate=14336, group_size=128, kernel_mode="pallas",
)


def run(cfg, params, label, b, s, fill, paged, page=128):
    if paged:
        n_pages = 1 + b * (s // page)
        cache = llama.init_paged_cache(cfg, b, s, n_pages, page)
        # slot i owns pages [1 + i*s/page, ...) — contiguous table, full fill
        tbl = (1 + np.arange(b * (s // page))).reshape(b, s // page)
        cache = dataclasses.replace(
            cache, page_tbl=jnp.asarray(tbl, jnp.int32),
            lengths=jnp.full((b,), fill, jnp.int32))
    else:
        cache = llama.init_cache(cfg, b, s)
        cache = dataclasses.replace(
            cache, lengths=jnp.full((b,), fill, jnp.int32))
    tok = jnp.ones((b, 1), jnp.int32)

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
    # Wide repetition spread: with the relay's 40-80 ms RPC jitter, a
    # (2,14) spread leaves ~±1 ms/cell noise (observed: a 0.39 ms reading
    # at a 0.56 ms physical floor); (6,62) divides the jitter by 56.
    t0 = time.perf_counter()
    per = differential_time(make, (params, tok, cache), 6, 62, iters=5)
    print(f"B={b} S={s} fill={fill} {label}: {per*1e3:7.3f} ms/step "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
    return per


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    fill = int(sys.argv[3]) if len(sys.argv) > 3 else int(s * 0.9)
    modes = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ["xla", "flash", "paged"])
    page = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    params = llama.init_params_device(BASE, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    for m in modes:
        cfg = dataclasses.replace(
            BASE, attn_kernel="flash" if m != "xla" else "xla")
        run(cfg, params, f"{m:5s}", b, s, fill, paged=(m == "paged"),
            page=page)


if __name__ == "__main__":
    main()
