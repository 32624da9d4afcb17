"""Fused one-launch MoE matmuls vs the per-expert loop at DeepSeek-
V2-Lite geometry (64 experts, width 1408, gs=64) — r5 re-measure after
the batched-group _scaled_dots rewrite (r4 measured fused SLOWER, 50.8
vs 38.6 ms full-model: the per-group scaling loop degraded to 11 skinny
[M, 64] dots per tile).

Times ONE MoE layer's gate_up+down over 8 stacked layers (production
stacked path, scan + fori), M = decode batch.

Usage: tpu_moe_fused_probe.py [M] [E]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels.dequant_matmul import dequant_matmul, dequant_matmul_moe
from quant_tpu.utils.timing import differential_time

import os

D, I, GS = 2048, 1408, 64
NW = int(os.environ.get("PROBE_L", "8"))
# "expert" = production [E, L] expert-major merge (row = e*L + l);
# "layer" = [L, E] layer-major (row = l*E + e): one layer's experts are
# CONTIGUOUS (l*E..(l+1)*E), probing whether the strided expert walk
# over a multi-GB stack is what makes per-layer cost grow with depth
LAYOUT = os.environ.get("PROBE_LAYOUT", "expert")


def stack_qt(e, k, n, seed=2):
    # one representative tensor replicated E*NW times (device init time;
    # the DMA pattern, not the values, is under test)
    qt0 = quantize_tensor_device(
        jax.random.normal(jax.random.key(seed), (k, n)) * 0.02, 4, GS)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (e * NW,) + a.shape) + 0,
        qt0)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    x = jax.random.normal(jax.random.key(1), (m, 1, D), jnp.float32)
    w = jax.nn.softmax(jax.random.normal(
        jax.random.key(5), (m, 1, e)), axis=-1)
    gu = stack_qt(e, D, 2 * I)       # [E*NW, D, 2I]
    dn = stack_qt(e, I, D, seed=4)
    byt = (gu.codes.size + dn.codes.size) // NW \
        + (gu.scales.size + dn.scales.size) * 4 // NW

    def mk_fused(nrep):
        @jax.jit
        def f(x, w, guc, gus, dnc, dns):
            import dataclasses as dc
            qgu = dc.replace(gu, codes=guc, scales=gus)
            qdn = dc.replace(dn, codes=dnc, scales=dns)

            def outer(_, a):
                def body(c, i):
                    lidx = i if LAYOUT == "expert" else i * e
                    stride = NW if LAYOUT == "expert" else 1
                    g_all = dequant_matmul_moe(
                        c, qgu, lidx, n_experts=e, stride=stride,
                        mode="concat")                # [M, 1, E*2I]
                    g_all = g_all.reshape(m, 1, e, 2 * I)
                    g, u = jnp.split(g_all, 2, axis=-1)
                    z = jax.nn.silu(g.astype(jnp.float32)).astype(
                        c.dtype) * u
                    z = z * w.astype(c.dtype)[..., None]
                    xs_ = jnp.moveaxis(z, 2, 0)       # [E, M, 1, I]
                    o = dequant_matmul_moe(
                        xs_, qdn, lidx, n_experts=e, stride=stride,
                        mode="psum", out_dtype=jnp.float32)
                    return c + jnp.sum(o)[None, None] * 1e-20, None
                a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                return a
            return jnp.sum(jax.lax.fori_loop(0, nrep, outer, x))
        return f

    def mk_loop(nrep):
        @jax.jit
        def f(x, w, guc, gus, dnc, dns):
            import dataclasses as dc
            qgu = dc.replace(gu, codes=guc, scales=gus)
            qdn = dc.replace(dn, codes=dnc, scales=dns)

            def outer(_, a):
                def body(c, i):
                    out = jnp.zeros((m, 1, D), jnp.float32)
                    for ee in range(e):
                        eidx = (ee * NW + i if LAYOUT == "expert"
                                else i * e + ee)
                        g_ = dequant_matmul(c, qgu, eidx)
                        g, u = jnp.split(g_, 2, axis=-1)
                        z = jax.nn.silu(g.astype(jnp.float32)).astype(
                            c.dtype) * u
                        y = dequant_matmul(z, qdn, eidx,
                                           out_dtype=jnp.float32)
                        out = out + y * w[..., ee:ee + 1]
                    return c + jnp.sum(out)[None, None] * 1e-20, None
                a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                return a
            return jnp.sum(jax.lax.fori_loop(0, nrep, outer, x))
        return f

    args = (x, w, gu.codes, gu.scales, dn.codes, dn.scales)
    print(f"M={m} E={e}: {byt/1e6:.0f} MB expert bytes/layer", flush=True)
    t_f = differential_time(mk_fused, args, 4, 36, iters=4) / NW
    print(f"  fused one-launch: {t_f*1e3:.3f} ms/layer "
          f"({byt/t_f/1e9:.0f} GB/s)", flush=True)
    t_l = differential_time(mk_loop, args, 2, 6, iters=3) / NW
    print(f"  per-expert loop : {t_l*1e3:.3f} ms/layer "
          f"({byt/t_l/1e9:.0f} GB/s)", flush=True)
    print(f"  fused speedup: {t_l/t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
