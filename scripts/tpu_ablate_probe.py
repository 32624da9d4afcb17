"""Ablation probe: which part of the decode step burns the time?

Small model (fast compiles), B=8, S=1024. Variants toggle cache insert,
attention, and matmul paths to isolate costs on the real chip.
"""
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.utils.timing import differential_time

import os
CFG = ModelConfig(
    vocab_size=int(os.environ.get("ABLATE_V", "4096")),
    dim=4096, n_layers=int(os.environ.get("ABLATE_L", "2")),
    n_heads=32, n_kv_heads=8,
    intermediate=14336, group_size=128, kernel_mode="pallas",
    kv_bits=int(os.environ.get("ABLATE_KV", "8")),
    embed_bits=int(os.environ.get("ABLATE_EMB", "16")),
)
B = int(os.environ.get("ABLATE_B", "8"))
S = int(os.environ.get("ABLATE_S", "1024"))
T = int(os.environ.get("ABLATE_T", "1"))


def build():
    params = llama.init_params_device(CFG, seed=0)
    jax.block_until_ready(params.layers.wqkv.codes)
    cache = llama.init_cache(CFG, B, S)
    cache = dataclasses.replace(
        cache, lengths=jnp.full((B,), 1024 - T - 2, jnp.int32))
    return params, cache


def make_step(variant):
    cfg = CFG

    def step_fn(params, tok, cache):
        mm = llama._mm(cfg)
        b, _ = tok.shape
        t = tok.shape[1]
        dt = llama._act_dtype(cfg)
        positions = cache.lengths[:, None]
        new_lengths = cache.lengths + 1
        h = llama._embed_lookup(params.embed, tok, dt, cfg)

        def layer_step(carry, xs):
            h, kc, ks, vc, vs = carry
            attn_norm, mlp_norm, qkv_bias, idx = xs
            x = llama.rmsnorm(h, attn_norm, cfg.norm_eps)
            qkv = mm(x, params.layers.wqkv, idx)
            units = cfg.n_heads + 2 * cfg.n_kv_heads
            nq = (qkv.shape[-1] * cfg.n_heads) // units
            nkv = (qkv.shape[-1] * cfg.n_kv_heads) // units
            q = qkv[..., :nq].reshape(b, t, -1, cfg.head_dim)
            k = qkv[..., nq:nq + nkv].reshape(b, t, -1, cfg.head_dim)
            v = qkv[..., nq + nkv:].reshape(b, t, -1, cfg.head_dim)
            q = llama._rope(q, positions, cfg.rope_theta)
            k = llama._rope(k, positions, cfg.rope_theta)
            k_q, k_s = llama.quantize_kv(k)
            v_q, v_s = llama.quantize_kv(v)
            if variant == "xla_attn":
                # XLA path pairs with the scatter insert (production's
                # xla mode)
                kc, ks = llama._cache_insert_at_layer(
                    kc, ks, k_q, k_s, cache.lengths, idx)
                vc, vs = llama._cache_insert_at_layer(
                    vc, vs, v_q, v_s, cache.lengths, idx)
            elif variant != "noinsert":
                # flash variants use the ALIASED Pallas insert exactly
                # like llama.forward — an XLA scatter feeding the opaque
                # flash kernel forces a full cache copy per layer
                # (measured 2026-08-20: 332 ms/step vs 14 at the
                # flagship shape — the very pathology forward avoids)
                from quant_tpu.kernels.cache_insert import (
                    cache_insert_int8,
                )
                kc, ks, vc, vs = cache_insert_int8(
                    kc, ks, vc, vs, k_q, k_s, v_q, v_s, cache.lengths,
                    idx, 0)
            if variant == "noattn":
                attn = q
            elif variant == "xla_attn":
                sl = lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, False)
                attn = llama.attention_blockwise(
                    q, sl(kc), sl(ks), sl(vc), sl(vs),
                    positions, new_lengths, cfg) if t > 1 else \
                    llama.attention(q, sl(kc), sl(ks), sl(vc), sl(vs),
                                    positions, new_lengths, cfg)
            else:
                from quant_tpu.kernels.attention import flash_decode_int8
                attn = flash_decode_int8(q[:, 0], kc, ks, vc, vs,
                                         new_lengths, idx)[:, None]
            h = h + mm(attn.reshape(b, t, -1), params.layers.wo, idx,
                       out_dtype=jnp.float32).astype(dt)
            x = llama.rmsnorm(h, mlp_norm, cfg.norm_eps)
            if variant != "nomlp":
                gu = mm(x, params.layers.w_gate_up, idx)
                gate, up = jnp.split(gu, 2, axis=-1)
                h = h + mm(
                    jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up,
                    params.layers.w_down, idx,
                    out_dtype=jnp.float32).astype(dt)
            return (h, kc, ks, vc, vs), None

        if variant == "nolayers":
            kc, ks, vc, vs = (cache.k_codes, cache.k_scale, cache.v_codes,
                              cache.v_scale)
        else:
            (h, kc, ks, vc, vs), _ = jax.lax.scan(
                layer_step,
                (h, cache.k_codes, cache.k_scale, cache.v_codes,
                 cache.v_scale),
                (params.layers.attn_norm, params.layers.mlp_norm,
                 params.layers.qkv_bias, jnp.arange(cfg.n_layers)),
            )
        h = llama.rmsnorm(h, params.final_norm, cfg.norm_eps)
        if variant == "nolmhead":
            logits = h[..., :1]
        else:
            logits = mm(h, params.lm_head, out_dtype=jnp.float32)
        cache2 = llama.KVCache(k_codes=kc, k_scale=ks, v_codes=vc,
                               v_scale=vs, lengths=new_lengths)
        return logits, cache2

    def make(n):
        @jax.jit
        def run(params, tok, cache):
            def body(_, carry):
                tok, cache = carry
                logits, cache = step_fn(params, tok, cache)
                cache = dataclasses.replace(
                    cache, lengths=cache.lengths - T)  # keep S fixed
                return tok + (logits[0, -1, 0] * 0).astype(jnp.int32), cache
            tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
            return jnp.sum(tok)
        return run
    return make


def main():
    params, cache = build()
    tok = jnp.ones((B, T), jnp.int32)
    variants = os.environ.get(
        "ABLATE_VARIANTS",
        "full,noinsert,noattn,xla_attn,nolayers").split(",")
    lo = int(os.environ.get("ABLATE_LO", "2"))
    hi = int(os.environ.get("ABLATE_HI", "14"))
    res = {}
    for variant in variants:
        try:
            t0 = time.perf_counter()
            per = differential_time(
                make_step(variant), (params, tok, cache), lo, hi, iters=3)
            res[variant] = per
            print(f"{variant:10s}: {per*1e3:.2f} ms/step "
                  f"(compile+run {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{variant:10s}: FAIL {repr(e)[:200]}", flush=True)
    # Differential per-phase breakdown (VERDICT r4 #4: itemize the decode
    # residue): each phase = full minus the variant with that phase
    # removed; "qkv/wo+fixed" is what remains after subtracting them all.
    if "full" in res:
        t = res["full"]
        phases = {}
        if "noattn" in res:
            phases["attention read+compute"] = t - res["noattn"]
        if "noinsert" in res:
            phases["kv insert"] = t - res["noinsert"]
        if "nomlp" in res:
            phases["mlp matmuls"] = t - res["nomlp"]
        if "nolmhead" in res:
            phases["lm_head+logits"] = t - res["nolmhead"]
        if phases:
            rem = t - sum(phases.values())
            print("-- breakdown (differential vs full) --", flush=True)
            for k, v in phases.items():
                print(f"  {k:22s}: {v*1e3:6.2f} ms ({100*v/t:4.1f}%)",
                      flush=True)
            print(f"  {'qkv/wo + norms + fixed':22s}: {rem*1e3:6.2f} ms "
                  f"({100*rem/t:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
