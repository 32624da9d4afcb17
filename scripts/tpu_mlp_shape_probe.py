"""Why is the in-model MLP phase slow? (r5 decode-residue breakdown:
mlp matmuls = 8.49 ms of the 15.26 ms flagship step = ~370 GB/s
effective vs the 637 the 4096x4096 stacked sweep hits.)

Times the two REAL MLP shapes (llama-3-8b geometry, stacked 8 layers,
one dispatch) in isolation at decode M, sweeping tiles:
  gate_up  [4096 -> 28672]  (fused gate|up columns)
  down     [14336 -> 4096]
and the silu+mul elementwise between them.

Usage: tpu_mlp_shape_probe.py [M]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels import dequant_matmul
from quant_tpu.utils.timing import differential_time

D, I = 4096, 14336
NW = 8


def stack_qt(k, n, bits=4, seed=2):
    qts = [quantize_tensor_device(
        jax.random.normal(kk, (k, n)) * 0.02, bits, 128)
        for kk in jax.random.split(jax.random.key(seed), NW)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qts)


def time_case(name, make, args, byt):
    per = differential_time(make, args, 8, 136, iters=4) / NW
    print(f"  {name:28s}: {per*1e3:.3f} ms/layer "
          f"({byt/per/1e9:.0f} GB/s of packed bytes)", flush=True)
    return per


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    x = jax.random.normal(jax.random.key(1), (m, D), jnp.float32)
    xi = jax.random.normal(jax.random.key(3), (m, I), jnp.float32)
    gu = stack_qt(D, 2 * I)
    dn = stack_qt(I, D, seed=4)
    b_gu = gu.codes.size // NW + gu.scales.size * 4 // NW
    b_dn = dn.codes.size // NW + dn.scales.size * 4 // NW

    def mk_one(qt, tn, tk):
        def make(nrep):
            @jax.jit
            def f(x, codes, scales):
                import dataclasses as dc
                q = dc.replace(qt, codes=codes, scales=scales)

                def outer(_, a):
                    def body(c, i):
                        y = dequant_matmul(c, q, i, tile_n=tn, tile_k=tk,
                                           out_dtype=jnp.float32)
                        return c + jnp.sum(y) * 1e-20, None
                    a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                    return a
                return jnp.sum(jax.lax.fori_loop(0, nrep, outer, x))
            return f
        return make

    def mk_mlp(tn, tk):
        """the real composition: gate_up -> silu*up -> down, per layer"""
        def make(nrep):
            @jax.jit
            def f(x, guc, gus, dnc, dns):
                import dataclasses as dc
                qgu = dc.replace(gu, codes=guc, scales=gus)
                qdn = dc.replace(dn, codes=dnc, scales=dns)

                def outer(_, a):
                    def body(c, i):
                        y = dequant_matmul(c, qgu, i, tile_n=tn,
                                           tile_k=tk,
                                           out_dtype=jnp.float32)
                        g, u = jnp.split(y, 2, axis=-1)
                        z = jax.nn.silu(g) * u
                        o = dequant_matmul(z, qdn, i, tile_n=tn,
                                           tile_k=tk,
                                           out_dtype=jnp.float32)
                        return c + jnp.sum(o) * 1e-20, None
                    a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                    return a
                return jnp.sum(jax.lax.fori_loop(0, nrep, outer, x))
            return f
        return make

    print(f"M={m}  gate_up {b_gu/1e6:.0f} MB/layer  down "
          f"{b_dn/1e6:.0f} MB/layer", flush=True)
    for tn, tk in ((4096, 512), (2048, 512), (4096, 1024), (8192, 512)):
        try:
            t_gu = time_case(f"gate_up tn={tn} tk={tk}",
                             mk_one(gu, tn, tk), (x, gu.codes, gu.scales),
                             b_gu)
            t_dn = time_case(f"down    tn={tn} tk={tk}",
                             mk_one(dn, tn, tk),
                             (xi, dn.codes, dn.scales), b_dn)
            t_all = time_case(f"mlp     tn={tn} tk={tk}",
                              mk_mlp(tn, tk),
                              (x, gu.codes, gu.scales, dn.codes,
                               dn.scales), b_gu + b_dn)
            print(f"    composition overhead: "
                  f"{(t_all-t_gu-t_dn)*1e3:.3f} ms/layer", flush=True)
        except Exception as e:
            print(f"  tn={tn} tk={tk}: FAIL {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
