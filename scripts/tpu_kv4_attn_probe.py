"""INT4-KV attention formulations on hardware: why is kv4 slow, what fixes it.

Isolated decode attention at 8B geometry (B=48, Hkv=8, S=1024, D=128,
rep=4), differential-timed:

  kv8       — int8 codes, the production fused-XLA path
  kv4cat    — packed uint8, unpack = concat(lo, hi) (production today)
  kv4split  — two half-depth einsums on lo/hi separately (no concat, so
              the bitwise unpack has a chance to fuse into each dot)
  kv4bf16   — split variant with bf16 unpack intermediates (halves the
              spill bytes if fusion fails)

Whichever wins becomes the kv4 XLA path. NOTE: all arrays must be jit
ARGUMENTS — closure-captured arrays become HLO literal constants that
ship through the ~MB/s relay (first version of this probe hung an hour
on exactly that).
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from quant_tpu.utils.timing import differential_time

B, HKV, REP, S, D = 48, 8, 4, 1024, 128


def build():
    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, HKV, REP, D), jnp.float32)
    kc8 = jax.random.randint(ks[1], (B, HKV, S, D), -127, 127, jnp.int8)
    vc8 = jax.random.randint(ks[2], (B, HKV, S, D), -127, 127, jnp.int8)
    kc4 = jax.random.randint(ks[3], (B, HKV, S, D // 2), 0, 255
                             ).astype(jnp.uint8)
    vc4 = jax.random.randint(ks[4], (B, HKV, S, D // 2), 0, 255
                             ).astype(jnp.uint8)
    ksc = jnp.abs(jax.random.normal(ks[5], (B, HKV, S), jnp.float32))
    return q, kc8, vc8, kc4, vc4, ksc


def attn(q, kf, vf, ksc, vsc):
    logits = jnp.einsum("bhrd,bhsd->bhrs", q, kf) * ksc[:, :, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * vsc[:, :, None, :]
    return jnp.einsum("bhrs,bhsd->bhrd", pv, vf)


def attn_split(q, kc4, vc4, ksc, vsc, odt=jnp.float32):
    lo = lambda p: ((p & 0xF).astype(odt) - 8)
    hi = lambda p: ((p >> 4).astype(odt) - 8)
    h = D // 2
    qf = q.astype(odt)
    logits = (jnp.einsum("bhrd,bhsd->bhrs", qf[..., :h], lo(kc4))
              + jnp.einsum("bhrd,bhsd->bhrs", qf[..., h:], hi(kc4)))
    logits = logits.astype(jnp.float32) * ksc[:, :, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    pv = (probs * vsc[:, :, None, :]).astype(odt)
    out = jnp.concatenate([
        jnp.einsum("bhrs,bhsd->bhrd", pv, lo(vc4)),
        jnp.einsum("bhrs,bhsd->bhrd", pv, hi(vc4))], axis=-1)
    return out.astype(jnp.float32)


FNS = {
    "kv8": lambda q, kc8, vc8, kc4, vc4, ksc: attn(
        q, kc8.astype(jnp.float32), vc8.astype(jnp.float32), ksc, ksc),
    "kv4cat": lambda q, kc8, vc8, kc4, vc4, ksc: attn(
        q,
        jnp.concatenate([(kc4 & 0xF).astype(jnp.float32) - 8,
                         (kc4 >> 4).astype(jnp.float32) - 8], axis=-1),
        jnp.concatenate([(vc4 & 0xF).astype(jnp.float32) - 8,
                         (vc4 >> 4).astype(jnp.float32) - 8], axis=-1),
        ksc, ksc),
    "kv4split": lambda q, kc8, vc8, kc4, vc4, ksc: attn_split(
        q, kc4, vc4, ksc, ksc),
    "kv4bf16": lambda q, kc8, vc8, kc4, vc4, ksc: attn_split(
        q, kc4, vc4, ksc, ksc, odt=jnp.bfloat16),
}


def variant(name):
    f = FNS[name]

    def make(n):
        @jax.jit
        def run(q0, kc8, vc8, kc4, vc4, ksc):
            def body(i, acc):
                # q depends on the carry so the body can't be hoisted
                out = f(q0 + acc * 1e-20, kc8, vc8, kc4, vc4, ksc)
                return jnp.sum(out) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    return make


def main():
    args = build()
    jax.block_until_ready(args[0])
    for name in ("kv8", "kv4cat", "kv4split", "kv4bf16"):
        per = differential_time(variant(name), args, 4, 40, iters=4)
        gb = (2 * B * HKV * S * (D if name == "kv8" else D // 2)) / 1e9
        print(f"  {name:9s}: {per*1e3:7.3f} ms  "
              f"({gb/per:.0f} GB/s of cache bytes)", flush=True)


if __name__ == "__main__":
    main()
