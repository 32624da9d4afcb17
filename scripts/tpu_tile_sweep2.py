"""Tile-size sweep for the bench.py chain (stacked weights + layer index —
the EXACT production/bench path), to close the gap to the XLA bf16 ceiling.

r1 shipped tn=4096/tk=512 (84-86% of measured SoL, run-dependent). Theory:
per-call pipeline ramp = first K-tile's DMA is exposed (grid (1,1,K/tk) has
no overlap for step 0), so smaller tk amortizes the ramp over more steps
while too-small tk pays per-step overhead. Sweep confirms on hardware.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels import dequant_matmul
from quant_tpu.utils.timing import differential_time

K = N = 4096
M = 16
BITS = 8
NW = 8


def build(bits):
    keys = jax.random.split(jax.random.key(0), NW)
    qts = [quantize_tensor_device(
        jax.random.normal(k, (K, N), jnp.float32), bits, 128) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32
                          ).astype(jnp.bfloat16)
    return x, stacked


def chain_fn(tn, tk):
    def make(outer):
        @jax.jit
        def run(x, qts):
            def outer_body(_, a):
                def body(c, i):
                    y = dequant_matmul(c, qts, i, tile_n=tn, tile_k=tk)
                    yf = y.astype(jnp.float32)
                    y = yf * jax.lax.rsqrt(jnp.mean(yf * yf) + 1e-6)
                    return y[:, :K].astype(jnp.bfloat16), None
                a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                return a
            a = jax.lax.fori_loop(0, outer, outer_body, x)
            return jnp.sum(a.astype(jnp.float32))
        return run
    return make


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else BITS
    x, qts = build(bits)
    wbytes = K * N * (1 if bits == 8 else 0.5)
    import ast
    configs = (ast.literal_eval(sys.argv[2]) if len(sys.argv) > 2 else
               [(4096, 512), (4096, 256), (4096, 1024), (2048, 512),
                (2048, 256), (1024, 512), (1024, 256), (4096, 128),
                (2048, 1024), (1024, 1024)])
    for tn, tk in configs:
        try:
            t0 = time.time()
            per = differential_time(chain_fn(tn, tk), (x, qts), 8, 512,
                                    iters=5) / NW
            g = wbytes / per / 1e9
            print(f"int{bits} tn={tn} tk={tk}: {g:.0f} GB/s "
                  f"({per*1e6:.2f} us/mm) [wall {time.time()-t0:.0f}s]",
                  flush=True)
        except Exception as e:
            print(f"int{bits} tn={tn} tk={tk}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
