"""Whole-model decode probe with the PAGED KV pool (VERDICT r1 #4 "Done"
criterion: >= parity with the contiguous cache at B=48, plus a larger
feasible B via page oversubscription).

Usage: tpu_paged_decode_probe.py [preset] [layers] [B] [max_seq] [fill]
                                 [pages_frac] [page_size]
``pages_frac`` < 1 oversubscribes the pool (e.g. 0.5 = half the pages the
contiguous layout would need — the HBM saving that unlocks larger B).
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
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    max_seq = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    fill = int(sys.argv[5]) if len(sys.argv) > 5 else 900
    frac = float(sys.argv[6]) if len(sys.argv) > 6 else 1.0
    page = int(sys.argv[7]) if len(sys.argv) > 7 else 128
    cfg = dataclasses.replace(
        PRESETS[preset], attn_kernel="flash", kernel_mode="pallas")
    if layers:
        cfg = dataclasses.replace(cfg, n_layers=layers)
    n_pages = 1 + int(batch * (max_seq // page) * frac)
    print(f"{preset} L={cfg.n_layers} B={batch} S={max_seq} fill={fill} "
          f"pool={n_pages}p (frac {frac})", flush=True)

    t0 = time.perf_counter()
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    print(f"device init: {time.perf_counter()-t0:.1f}s", flush=True)

    cache = llama.init_paged_cache(cfg, batch, max_seq, n_pages, page)
    # pages to cover fill + the one in-flight token (the probe's decode
    # loop holds position, so the chain never advances past fill+1)
    need = min(-(-(fill + 1) // page), max_seq // page)
    if batch * need > n_pages - 1:
        raise SystemExit(f"fill {fill} needs {batch*need} pages > pool")
    tbl = np.zeros((batch, max_seq // page), np.int32)
    ids = np.arange(1, 1 + batch * need).reshape(batch, need)
    tbl[:, :need] = ids
    cache = dataclasses.replace(
        cache, page_tbl=jnp.asarray(tbl),
        lengths=jnp.full((batch,), fill, jnp.int32))

    def steps_fn(n):
        @jax.jit
        def run(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                # hold position so a long chain never outruns the pages
                cache = dataclasses.replace(cache,
                                            lengths=cache.lengths - 1)
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return run

    tok = jnp.ones((batch, 1), jnp.int32)
    n_lo, n_hi = 6, 62  # wide spread: relay jitter / 56 (see README note)
    t0 = time.perf_counter()
    t_lo = timed(steps_fn(n_lo), params, tok, cache)
    print(f"lo done {time.perf_counter()-t0:.0f}s", flush=True)
    t_hi = timed(steps_fn(n_hi), params, tok, cache)
    per_step = (t_hi - t_lo) / (n_hi - n_lo)
    tps = batch / per_step
    kv_gb = 2 * cfg.n_layers * n_pages * cfg.n_kv_heads * page * (
        cfg.head_dim + 4) / 1e9
    print(f"per-step {per_step*1e3:.2f} ms  tokens/s {tps:.0f}  "
          f"pool HBM {kv_gb:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
