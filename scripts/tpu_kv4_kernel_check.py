"""INT4-KV Pallas kernels on REAL hardware: Mosaic compile + exactness
+ bandwidth (interpret mode passing does NOT imply Mosaic compiles —
CLAUDE.md rule; this is the follow-up run for the kv4 kernel commits).

1. flash_decode_int8 with packed uint8 codes (contiguous + stacked-layer)
   vs the XLA attention on the same codes: must match to fp tolerance.
2. paged pair (paged_flash_decode_int8) vs gather reference.
3. Timing at 8B geometry (B=48, S=1024): int4 vs int8 flash — int4 should
   approach half the KV bytes/step.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses

from quant_tpu.kernels.attention import flash_decode_int8
from quant_tpu.kernels.paged_attention import (
    paged_attention_reference, paged_flash_decode_int8,
)
from quant_tpu.models import PRESETS, llama
from quant_tpu.utils.timing import differential_time

CFG4 = dataclasses.replace(PRESETS["test-tiny"], kv_bits=4)


def exact_attention(q, kq, ks, vq, vs, ln):
    """Host float64 attention over dequantized kv4 codes — the kernel
    runs its dots at Precision.HIGHEST so it should match this to ~1e-5;
    the XLA path (llama.attention) uses default MXU precision and sits
    ~2e-3 away on hardware (measured 2026-08-18), so it is NOT a valid
    exactness oracle here."""
    def dq4(codes, scales):
        # head-pair unpack (r4 layout): codes [B, Hkv/2, S, D], packed
        # head j = real heads 2j (low nibble) / 2j+1 (high)
        c = np.asarray(codes).astype(np.int32)
        lo, hi = (c & 0xF) - 8, (c >> 4) - 8
        b, h2, ss, dd = c.shape
        full = np.stack([lo, hi], axis=2).reshape(b, h2 * 2, ss, dd)
        return full.astype(np.float64) * np.asarray(
            scales, np.float64)[..., None]
    kf, vf = dq4(kq, ks), dq4(vq, vs)          # [B, Hkv, S, Dh]
    b, hkv, _, dh = kf.shape
    hq = q.shape[-2]
    qn = np.asarray(q)[:, 0].reshape(
        b, hkv, hq // hkv, dh).astype(np.float64)
    out = np.zeros_like(qn)
    for bb in range(b):
        s_valid = int(ln[bb])
        for h in range(hkv):
            logits = qn[bb, h] @ kf[bb, h, :s_valid].T / np.sqrt(dh)
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bb, h] = p @ vf[bb, h, :s_valid]
    return out.reshape(b, hq, dh)


def check_contiguous():
    rng = np.random.default_rng(0)
    # s=256 / s_blk=128: two blocks, so the online-softmax carry and the
    # block-skip (@pl.when) paths run under Mosaic, with 128 the smallest
    # lane-legal block (scale blocks are [1, hkv, s_blk]).
    b, s, hq, hkv, dh = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, 1, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, dh)), jnp.float32)
    kq, ks = llama.quantize_kv(k, 4)
    vq, vs = llama.quantize_kv(v, 4)
    kq, vq = kq.transpose(0, 2, 1, 3), vq.transpose(0, 2, 1, 3)
    ks, vs = ks.transpose(0, 2, 1), vs.transpose(0, 2, 1)
    ln = jnp.asarray([200, 37], jnp.int32)
    ref = exact_attention(q, kq, ks, vq, vs, ln)
    ref_xla = np.asarray(llama.attention(
        q, kq, ks, vq, vs, (ln - 1)[:, None], ln, CFG4))[:, 0]
    out = np.asarray(flash_decode_int8(q[:, 0], kq, ks, vq, vs, ln,
                                       s_blk=128, precision="highest"))
    err = np.abs(out - ref).max()
    print(f"contiguous kv4 flash vs exact: max|d|={err:.2e} "
          f"(XLA path sits at {np.abs(ref_xla - ref).max():.2e})",
          flush=True)
    assert err < 1e-5

    # stacked-layer scalar prefetch
    kq2, ks2 = jnp.stack([kq, vq]), jnp.stack([ks, vs])
    vq2, vs2 = jnp.stack([vq, kq]), jnp.stack([vs, ks])
    for layer in range(2):
        ref = exact_attention(q, kq2[layer], ks2[layer], vq2[layer],
                              vs2[layer], ln)
        out = np.asarray(flash_decode_int8(
            q[:, 0], kq2, ks2, vq2, vs2, ln, layer=jnp.int32(layer),
            s_blk=128, precision="highest"))
        err = np.abs(out - ref).max()
        print(f"stacked layer {layer}: max|d|={err:.2e}", flush=True)
        assert err < 1e-5


def check_paged():
    rng = np.random.default_rng(1)
    l, b, h, d, page, n_pages, s_max = 2, 3, 2, 64, 8, 32, 32
    hc = h // 2   # head-pair packed code heads
    pool = [jnp.asarray(rng.integers(0, 255, (l, n_pages, hc, page, d)
                                     ).astype(np.uint8)),
            jnp.asarray(rng.random((l, n_pages, h, page)).astype(
                np.float32) + 0.5),
            jnp.asarray(rng.integers(0, 255, (l, n_pages, hc, page, d)
                                     ).astype(np.uint8)),
            jnp.asarray(rng.random((l, n_pages, h, page)).astype(
                np.float32) + 0.5)]
    tbl = jnp.asarray(rng.permutation(np.arange(1, n_pages))[
        : b * (s_max // page)].reshape(b, -1).astype(np.int32))
    lens = jnp.asarray([9, 32, 17], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, 4, d)), jnp.float32)

    def host_gather(p, layer):
        g = np.asarray(p)[layer][np.asarray(tbl)]   # [b, np, h?, page, ..]
        g = np.moveaxis(g, 2, 1)
        return g.reshape(b, g.shape[1], -1, *g.shape[4:])

    for layer in range(l):
        kq = host_gather(pool[0], layer)
        ks = host_gather(pool[1], layer)
        vq = host_gather(pool[2], layer)
        vs = host_gather(pool[3], layer)
        ref = exact_attention(q[:, None], kq, ks, vq, vs, lens)
        ref_xla = np.asarray(paged_attention_reference(
            q, *pool, tbl, lens, layer))
        out = np.asarray(paged_flash_decode_int8(
            q, *pool, tbl, lens, layer, precision="highest"))
        err = np.abs(out - ref).max()
        print(f"paged kv4 layer {layer}: max|d|={err:.2e} (XLA path "
              f"{np.abs(ref_xla - ref).max():.2e})", flush=True)
        assert err < 1e-4


def timing():
    b, hkv, rep, s, d = 48, 8, 4, 1024, 128
    key = jax.random.key(0)
    ks_ = jax.random.split(key, 6)
    q = jax.random.normal(ks_[0], (b, hkv * rep, d), jnp.float32)
    ln = jnp.full((b,), s, jnp.int32)
    sc = jnp.abs(jax.random.normal(ks_[1], (b, hkv, s), jnp.float32))

    def run_case(name, kc, vc, s_blk):
        def make(n):
            @jax.jit
            def f(q, kc, sc, vc, ln):
                def body(i, acc):
                    out = flash_decode_int8(
                        q + acc * 1e-20, kc, sc, vc, sc, ln, s_blk=s_blk)
                    return jnp.sum(out) * 1e-9
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return f
        per = differential_time(make, (q, kc, sc, vc, ln), 4, 40, iters=4)
        byt = 2 * b * kc.shape[1] * s * kc.shape[-1]
        print(f"  {name} [s_blk={s_blk}]: {per*1e3:.3f} ms "
              f"({byt/per/1e9:.0f} GB/s of cache bytes)", flush=True)
        return per

    kc8 = jax.random.randint(ks_[2], (b, hkv, s, d), -127, 127, jnp.int8)
    vc8 = jax.random.randint(ks_[3], (b, hkv, s, d), -127, 127, jnp.int8)
    kc4 = jax.random.randint(ks_[4], (b, hkv // 2, s, d), 0, 255
                             ).astype(jnp.uint8)
    vc4 = jax.random.randint(ks_[5], (b, hkv // 2, s, d), 0, 255
                             ).astype(jnp.uint8)
    p8 = p4 = None
    for s_blk in (256, 512, 1024):
        t8 = run_case("int8 flash", kc8, vc8, s_blk)
        t4 = run_case("int4 flash", kc4, vc4, s_blk)
        p8 = t8 if p8 is None else min(p8, t8)
        p4 = t4 if p4 is None else min(p4, t4)
    print(f"  int4/int8 step ratio: {p4/p8:.2f} (ideal ~0.5 + unpack)",
          flush=True)


if __name__ == "__main__":
    check_contiguous()
    check_paged()
    timing()
    print("kv4 kernels OK on hardware", flush=True)
