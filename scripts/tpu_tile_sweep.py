"""Differential-timing sweep: XLA bf16 ceiling vs pallas kernel tile sizes.

Method matches bench.py (nested fori_loop/scan chains, scalar fetch, t_hi -
t_lo differential) so the numbers are comparable.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels import dequant_matmul

K = N = 4096
M = 16
NW = 8
R_LO, R_HI = 8, 256


def timed(fn, *a, iters=4):
    np.asarray(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain(mm, outer):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, w):
                y = mm(c, w)
                yf = y.astype(jnp.float32)
                y = yf * jax.lax.rsqrt(jnp.mean(yf * yf) + 1e-6)
                return y[:, :K].astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, a, ws)
            return a
        a = jax.lax.fori_loop(0, outer, outer_body, x)
        return jnp.sum(a.astype(jnp.float32))
    return run


def diff_gbps(mm, x, ws, wbytes):
    t_lo = timed(chain(mm, R_LO), x, ws)
    t_hi = timed(chain(mm, R_HI), x, ws)
    per = (t_hi - t_lo) / ((R_HI - R_LO) * NW)
    return wbytes / per / 1e9, per


def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32
                          ).astype(jnp.bfloat16)

    # XLA bf16 ceiling
    ws = jax.random.normal(jax.random.key(0), (NW, K, N), jnp.float32
                           ).astype(jnp.bfloat16)
    g, per = diff_gbps(lambda c, w: jnp.dot(
        c, w, preferred_element_type=jnp.float32), x, ws, K * N * 2)
    print(f"XLA bf16 dense: {g:.0f} GB/s ({per*1e6:.1f} us/mm)", flush=True)

    for bits in (8, 4):
        keys = jax.random.split(jax.random.key(2), NW)
        qts = [quantize_tensor_device(jax.random.normal(k, (K, N)), bits, 128)
               for k in keys]
        ws = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        wbytes = K * N * (1 if bits == 8 else 0.5)
        for tn, tk in [(512, 512), (1024, 512), (512, 1024), (2048, 512),
                       (1024, 1024), (4096, 512), (512, 2048), (256, 512)]:
            try:
                mm = lambda c, w: dequant_matmul(c, w, tile_n=tn, tile_k=tk)
                g, per = diff_gbps(mm, x, ws, wbytes)
                print(f"int{bits} tn={tn} tk={tk}: {g:.0f} GB/s "
                      f"({per*1e6:.1f} us/mm)", flush=True)
            except Exception as e:
                print(f"int{bits} tn={tn} tk={tk}: FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
