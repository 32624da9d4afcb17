"""Whole-model decode probe with end-to-end byte-floor accounting.

VERDICT r3 #1: the per-kernel numbers (85-94% of stream BW) hid an
end-to-end gap — this probe writes the floor math down. For one decode
step it counts every HBM byte the step must move (packed weight codes +
scales, KV-cache reads on the resolved attention path, embed row gathers,
logits write+argmax) and divides by the SAME-WINDOW measured dense-stream
bandwidth (the bench.py speed-of-light chain, re-measured here so chip
clock drift can't skew the ratio). Prints achieved ms/step, tokens/s, the
computed byte floor, and achieved-as-%-of-floor.

Params are generated + quantized ON DEVICE (init_params_device) — the
relay upload path is ~MB/s. Decode steps chain inside one jit (greedy
argmax feeds the next step), timed differentially over two step counts.
Cache lengths are pinned at ``fill`` (decremented each step) so flash
block-skip and XLA masking see a constant context size.

Usage: tpu_decode_probe.py [preset] [layers] [batch] [seq] [kv_bits] [fill]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import PRESETS, llama
from quant_tpu.core.qtensor import QTensor
from quant_tpu.utils.timing import differential_time

NOMINAL_GBPS = 819.0  # v5e HBM spec; the virtualized chip streams less


def measure_sol_bw():
    """Same-window dense bf16 stream bandwidth (bench.py's denominator)."""
    k = n = 4096
    nw = 8
    ws = jax.random.normal(jax.random.key(2), (nw, k, n),
                           jnp.float32).astype(jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (16, k),
                          jnp.float32).astype(jnp.bfloat16)

    def make(outer):
        @jax.jit
        def run(x, ws):
            def outer_body(_, a):
                def body(c, w):
                    y = jnp.dot(c, w, preferred_element_type=jnp.float32)
                    y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                    return y[:, :k].astype(jnp.bfloat16), None
                a, _ = jax.lax.scan(body, a, ws)
                return a
            a = jax.lax.fori_loop(0, outer, outer_body, x)
            return jnp.sum(a.astype(jnp.float32))
        return run

    per = differential_time(make, (x, ws), 8, 256, iters=4) / nw
    return (k * n * 2) / per


def qt_bytes(qt: QTensor) -> int:
    return (qt.codes.size * qt.codes.dtype.itemsize
            + qt.scales.size * qt.scales.dtype.itemsize)


def step_bytes(cfg, params, batch, max_seq, fill, ak) -> dict:
    """HBM bytes one decode step must move, itemized."""
    L = cfg.n_layers
    # Stacked layer weights: every code+scale byte streams once per step.
    w = sum(qt_bytes(t) for t in
            (params.layers.wqkv, params.layers.wo,
             params.layers.w_gate_up, params.layers.w_down))
    # norms / biases (f32 [L, D]-ish)
    w += sum(a.size * a.dtype.itemsize for a in
             (params.layers.attn_norm, params.layers.mlp_norm,
              params.layers.qkv_bias, params.final_norm))
    head = qt_bytes(params.lm_head)
    # embed: gather of `batch` rows
    if hasattr(params.embed, "codes"):
        d = params.embed.codes.shape[-1]
        emb = batch * (d + 4)
    else:
        emb = batch * params.embed.shape[-1] * params.embed.dtype.itemsize
    # KV reads per layer on the resolved attention path
    hkv, dh = cfg.n_kv_heads, cfg.head_dim
    dcode = dh // 2 if cfg.kv_bits == 4 else dh
    if ak == "flash":
        s_blk = 512 if max_seq % 512 == 0 else max_seq
        tok_read = min(max_seq, -(-fill // s_blk) * s_blk)
    else:  # xla masks but reads the whole static cache
        tok_read = max_seq
    kv_read = L * batch * tok_read * hkv * (2 * dcode + 2 * 4)
    kv_write = L * batch * hkv * (2 * dcode + 2 * 4)
    vpad = params.lm_head.shape[1]
    logits = 2 * batch * vpad * 4  # f32 write + argmax read
    total = w + head + emb + kv_read + kv_write + logits
    return dict(weights=w, lm_head=head, embed=emb, kv_read=kv_read,
                kv_write=kv_write, logits=logits, total=total)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "llama-3-8b"
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_seq = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    kv_bits = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    fill = int(sys.argv[6]) if len(sys.argv) > 6 else int(max_seq * 0.9)
    cfg = PRESETS[preset]
    if layers:
        cfg = dataclasses.replace(cfg, n_layers=layers)
    import os
    if os.environ.get("PROBE_VOCAB"):
        # geometry probes for huge-vocab models (Gemma-2's 256k embeds
        # OOM the worker via the dense f32 init transients): shrink the
        # vocab — attention/MLP geometry, the thing under test, is
        # untouched; the floor math scales with the actual lm_head
        cfg = dataclasses.replace(
            cfg, vocab_size=int(os.environ["PROBE_VOCAB"]))
    if kv_bits:
        cfg = dataclasses.replace(cfg, kv_bits=kv_bits)
    mode = llama._resolve_mode(cfg)
    ak = llama._resolve_attn_kernel(cfg, batch, max_seq, mode)
    print(f"{preset} L={cfg.n_layers} bits={cfg.bits} gs={cfg.group_size} "
          f"B={batch} S={max_seq} fill={fill} kv={cfg.kv_bits} attn={ak}",
          flush=True)

    t0 = time.perf_counter()
    params = llama.init_params_device(cfg, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    print(f"device init: {time.perf_counter()-t0:.1f}s", flush=True)

    sol0 = measure_sol_bw()
    print(f"stream BW (pre): {sol0/1e9:.0f} GB/s", flush=True)

    def make(n):
        @jax.jit
        def run(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                # pin the context size: forward advanced lengths by 1
                cache = dataclasses.replace(cache,
                                            lengths=cache.lengths - 1)
                return nxt, cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return run

    tok = jnp.ones((batch, 1), jnp.int32)
    cache = llama.init_cache(cfg, batch, max_seq)
    cache = dataclasses.replace(
        cache, lengths=jnp.full((batch,), fill, jnp.int32))

    t0 = time.perf_counter()
    per_step = differential_time(make, (params, tok, cache), 6, 62, iters=5)
    print(f"measured in {time.perf_counter()-t0:.0f}s", flush=True)
    sol1 = measure_sol_bw()
    sol = max(sol0, sol1)
    print(f"stream BW (post): {sol1/1e9:.0f} GB/s", flush=True)

    tps = batch / per_step
    by = step_bytes(cfg, params, batch, max_seq, fill, ak)
    floor = by["total"] / sol
    floor_nom = by["total"] / (NOMINAL_GBPS * 1e9)
    print(f"bytes/step: weights {by['weights']/1e9:.2f} GB + "
          f"lm_head {by['lm_head']/1e9:.2f} + kv_read "
          f"{by['kv_read']/1e9:.2f} + other "
          f"{(by['embed']+by['kv_write']+by['logits'])/1e9:.3f} "
          f"= {by['total']/1e9:.2f} GB", flush=True)
    print(f"per-step {per_step*1e3:.2f} ms  tokens/s {tps:.0f}", flush=True)
    print(f"byte floor {floor*1e3:.2f} ms @ measured {sol/1e9:.0f} GB/s "
          f"-> achieved {100*floor/per_step:.1f}% of floor "
          f"(floor @ nominal {NOMINAL_GBPS:.0f}: {floor_nom*1e3:.2f} ms, "
          f"{100*floor_nom/per_step:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
