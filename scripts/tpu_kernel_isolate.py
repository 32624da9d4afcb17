"""Compile/run cache_insert_int8 and flash_decode_int8 standalone on HW."""
import jax, jax.numpy as jnp, numpy as np
from quant_tpu.kernels.cache_insert import cache_insert_int8
from quant_tpu.kernels.attention import flash_decode_int8

L, B, H, S, D = 2, 8, 8, 1024, 128
rep = 4

def main():
    key = jax.random.key(0)
    kc = jax.random.randint(key, (L, B, H, S, D), -127, 127, jnp.int8)
    ks = jax.random.normal(key, (L, B, H, S), jnp.float32)
    vc, vs = kc, ks
    kn = jax.random.randint(key, (B, 1, H, D), -127, 127, jnp.int8)
    kns = jax.random.normal(key, (B, 1, H), jnp.float32)
    lengths = jnp.full((B,), 900, jnp.int32)
    try:
        out = cache_insert_int8(kc, ks, vc, vs, kn, kns, kn, kns,
                                lengths, jnp.int32(1))
        print("insert kernel: ok", np.asarray(out[0][1, 0, 0, 900, :4]),
              flush=True)
    except Exception as e:
        print("insert kernel FAIL:", repr(e)[:300], flush=True)
    try:
        q = jax.random.normal(key, (B, H * rep, D), jnp.bfloat16)
        o = flash_decode_int8(q, kc, ks, vc, vs, lengths, jnp.int32(1))
        print("flash kernel: ok", np.asarray(o).shape, flush=True)
    except Exception as e:
        print("flash kernel FAIL:", repr(e)[:300], flush=True)

if __name__ == "__main__":
    main()
