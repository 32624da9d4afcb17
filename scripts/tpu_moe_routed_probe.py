"""Routed-hot vs dense-all-experts MoE decode crossover at DeepSeek-V3
expert geometry (E=256, k=8, dim 7168, moe-intermediate 2048) — VERDICT
r4 #7's measured table.

At decode batch B, top-8 routing hits ~E*(1-(1-8/256)^B) distinct
experts; the routed path streams only a hot-slot BUCKET covering those
(lax.switch over static slot counts E/8..E — models/llama.py
_routed_buckets), dense streams all 256. The crossover is where
expected coverage approaches 1 (the moe_routed="auto" policy gates at
7/8 coverage).

Measured negative finding (2026-08-20, this probe's first run): the
original clamp-only design — full-E grid, cold slots clamped to a
repeated block index on the scalar-prefetch path — saved NOTHING
(routed == dense +-1% at every B; Mosaic does not elide those fetches
even though consecutive indices are equal). The bucketed grid is what
actually cuts the bytes.

Real-V3 shapes on purpose (not a scaled-down proxy): both contraction
dims are 512-aligned (7168, 2048 → the fast tk=512 stream path), the
psum down output at E*7168 columns is too big for XLA to pin in VMEM
(the D=2048 proxy geometry died on exactly that), and at E=256 the
down stage runs the per-expert-x-block path at EVERY batch (the
resident-x block would blow the 16 MiB scoped-vmem limit —
kernels/dequant_matmul.py::_SCOPED_VMEM_BUDGET). L=1: the 6.3 GB single-layer
expert stack is what fits the chip beside the activations.

Usage: tpu_moe_routed_probe.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels.dequant_matmul import dequant_matmul_moe
from quant_tpu.models.llama import _routed_buckets
from quant_tpu.utils.timing import differential_time

D, I, GS, E, K, L = 7168, 2048, 64, 256, 8, 1


def stack_qt(k, n, seed=2):
    qt0 = quantize_tensor_device(
        jax.random.normal(jax.random.key(seed), (k, n)) * 0.02, 4, GS)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (E * L,) + a.shape) + 0, qt0)


def main():
    gu = stack_qt(D, 2 * I)
    dn = stack_qt(I, D, seed=4)
    byt = (gu.codes.size + dn.codes.size) // L \
        + (gu.scales.size + dn.scales.size) * 4 // L

    def run_case(b, routed):
        x = jax.random.normal(jax.random.key(1), (b, 1, D),
                              jnp.float32).astype(jnp.bfloat16)
        # top-8 routing per token (fixed seed — the hot set is what the
        # routed path's cost depends on)
        rng = np.random.default_rng(b)
        w_np = np.zeros((b, 1, E), np.float32)
        for i in range(b):
            sel = rng.choice(E, K, replace=False)
            w_np[i, 0, sel] = 1.0 / K
        w = jnp.asarray(w_np)
        n_hot_true = int((w_np.sum((0, 1)) > 0).sum())

        def mk(nrep):
            @jax.jit
            def f(x, w, guc, gus, dnc, dns):
                import dataclasses as dc
                qgu = dc.replace(gu, codes=guc, scales=gus)
                qdn = dc.replace(dn, codes=dnc, scales=dns)

                def body(c, i):
                    if routed:
                        any_e = jnp.any(w > 0, axis=(0, 1))
                        n_hot = jnp.sum(any_e.astype(jnp.int32))
                        order = jnp.argsort(
                            jnp.logical_not(any_e),
                            stable=True).astype(jnp.int32)
                        hotc = order[jnp.minimum(
                            jnp.arange(E),
                            jnp.maximum(n_hot - 1, 0))]

                    def step(ns):
                        # mirrors models/llama.py moe_mlp._fused: the
                        # bucketed hot-slot grid is where the byte
                        # savings come from (clamped cold slots on a
                        # full-E grid measured ZERO savings)
                        if ns is None:
                            hot, w_eff, ns = None, w, E
                        else:
                            hot = jnp.concatenate(
                                [n_hot[None], hotc[:ns]])
                            w_eff = (jnp.take(w, hotc[:ns], axis=-1)
                                     * (jnp.arange(ns) < n_hot))
                        g_all = dequant_matmul_moe(
                            c, qgu, i, n_experts=ns, stride=L,
                            mode="concat", hot=hot)
                        g_all = g_all.reshape(b, 1, ns, 2 * I)
                        g, u = jnp.split(g_all, 2, axis=-1)
                        z = jax.nn.silu(g.astype(jnp.float32)) * u
                        z = (z * w_eff[..., None]).astype(jnp.bfloat16)
                        xs_ = jnp.moveaxis(z, 2, 0)
                        return dequant_matmul_moe(
                            xs_, qdn, i, n_experts=ns, stride=L,
                            mode="psum", out_dtype=jnp.float32,
                            hot=hot)

                    if routed:
                        buckets = _routed_buckets(E)
                        bidx = sum((n_hot > nb).astype(jnp.int32)
                                   for nb in buckets[:-1])
                        o = jax.lax.switch(
                            bidx,
                            [functools.partial(step, nb)
                             for nb in buckets])
                    else:
                        o = step(None)
                    return (c + jnp.sum(o)[None, None] * 1e-20
                            ).astype(c.dtype), None

                c, _ = jax.lax.scan(
                    body, x,
                    jnp.tile(jnp.arange(L, dtype=jnp.int32), nrep))
                return jnp.sum(c)
            return f
        reps = (2, 10) if not routed else (4, 24)
        per = differential_time(
            mk, (x, w, gu.codes, gu.scales, dn.codes, dn.scales),
            *reps, iters=4) / L
        return per, n_hot_true

    print(f"E={E} k={K} D={D} I={I}: {byt/1e6:.0f} MB expert bytes "
          f"(dense, per step)", flush=True)
    for b in (4, 16, 32, 64, 128):
        t_d, _ = run_case(b, False)
        t_r, nh = run_case(b, True)
        print(f"  B={b:3d} hot={nh:3d}/{E}: dense {t_d*1e3:7.3f} ms  "
              f"routed {t_r*1e3:7.3f} ms  ({t_d/t_r:4.2f}x)  "
              f"[dense {byt/t_d/1e9:.0f} GB/s]", flush=True)


if __name__ == "__main__":
    main()
