"""Probe achievable HBM BW / dispatch overhead on this axon chip.

Separates per-dispatch latency from streaming bandwidth by chaining many
weight-reads inside ONE jit: each iteration must re-stream its own weight
from HBM (weights differ per step, so nothing can be cached/hoisted).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core.qtensor import quantize_tensor, to_device
from quant_tpu.kernels import dequant_matmul


def timeit(fn, *a, iters=20):
    np.asarray(fn(*a))  # warm + force completion via host transfer
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    np.asarray(o)  # device->host read: cannot complete before execution
    return (time.perf_counter() - t0) / iters


def main():
    k = n = 4096
    m = 16
    import sys
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)

    # 1) dispatch overhead: trivial op
    x0 = jnp.ones((8, 128), jnp.float32)
    f0 = jax.jit(lambda a: a + 1)
    print(f"dispatch overhead (tiny add): {timeit(f0, x0)*1e6:.0f} us")

    # 2) plain XLA bf16 matmul chain — machine BW ceiling
    ws = jnp.asarray(rng.standard_normal((reps, k, n), dtype=np.float32),
                     jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32),
                    jnp.bfloat16)

    @jax.jit
    def xla_chain(x, ws):
        def body(a, w):
            return jnp.dot(a, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16), None
        a, _ = jax.lax.scan(body, x, ws)
        return a

    dt = timeit(xla_chain, x, ws)
    bw = reps * k * n * 2 / dt / 1e9
    print(f"xla bf16 chain: {dt*1e6:.0f} us total, {bw:.0f} GB/s weight-stream")

    # 3) pallas dequant_matmul chain (int8 / int4)
    for bits in (8, 4):
        qts = [
            to_device(quantize_tensor(
                rng.standard_normal((k, n), dtype=np.float32), bits=bits,
                group_size=128))
            for _ in range(reps)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)

        @jax.jit
        def pl_chain(x, qt_s):
            def body(a, qt):
                return dequant_matmul(a, qt).astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, x, qt_s)
            return a

        dt = timeit(pl_chain, x, stacked)
        wb = reps * k * n * (1 if bits == 8 else 0.5)
        print(f"pallas int{bits} chain: {dt*1e6:.0f} us, "
              f"{wb/dt/1e9:.0f} GB/s weight-stream")


if __name__ == "__main__":
    main()
