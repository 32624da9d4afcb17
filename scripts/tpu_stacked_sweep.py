"""Tile sweep for the STACKED kernel path (the production decode path)."""
import time
import jax, jax.numpy as jnp, numpy as np
from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels import dequant_matmul

import os, sys
K = N = 4096
M = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NW = 8; R_LO, R_HI = 8, 256

def timed(fn, *a, iters=4):
    np.asarray(fn(*a)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); np.asarray(fn(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)

def chain(tn, tk, outer, ws):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, i):
                y = dequant_matmul(c, ws, i, tile_n=tn, tile_k=tk)
                yf = y.astype(jnp.float32)
                return (yf * jax.lax.rsqrt(jnp.mean(yf*yf)+1e-6))[:, :K].astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, a, jnp.arange(NW))
            return a
        return jnp.sum(jax.lax.fori_loop(0, outer, outer_body, x).astype(jnp.float32))
    return run

def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    for bits in (8, 4):
        qts = [quantize_tensor_device(jax.random.normal(k, (K, N)), bits, 128)
               for k in jax.random.split(jax.random.key(2), NW)]
        ws = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        wb = K * N * (1 if bits == 8 else 0.5)
        for tn, tk in [(2048, 512), (4096, 512), (4096, 1024), (2048, 1024),
                       (4096, 2048)]:
            try:
                t_lo = timed(chain(tn, tk, R_LO, ws), x, ws)
                t_hi = timed(chain(tn, tk, R_HI, ws), x, ws)
                per = (t_hi - t_lo)/((R_HI-R_LO)*NW)
                print(f"int{bits} stacked tn={tn} tk={tk}: {per*1e6:.1f} us "
                      f"({wb/per/1e9:.0f} GB/s)", flush=True)
            except Exception as e:
                print(f"int{bits} tn={tn} tk={tk}: FAIL {repr(e)[:120]}", flush=True)

if __name__ == "__main__":
    main()
