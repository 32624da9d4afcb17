"""Dense all-experts MoE decode at HIGH batch (DeepSeek-V3 geometry):
where does the B>=64 degradation come from and what recovers it?

tpu_moe_routed_probe measured dense 527-588 GB/s through B=32 but
415 GB/s at B=64 and 178 GB/s at B=128. First sweep (2026-08-21,
psum-f32 vs psum-bf16 vs in-kernel sum): B=64 15.34/15.30/13.95 ms,
B=128 35.59/36.30/33.95 — the slot-output materialization is NOT the
story; dense all-experts is COMPUTE-bound at high batch (B=128 runs
2 x 128 x 256 x 44.1 MFLOP = 2.9 PFLOP/layer = a 14.7 ms MXU floor at
peak bf16). The recovery is the capacity dispatch: gather the routed
rows (B*k/E per expert ~ cap) and run ONE fused grouped-GEMM pair
(mode="grouped") — 16x fewer FLOPs at B=128/top-8, weights stream
once either way. Current arms:

* psum-f32  — the production dense path (baseline)
* capacity — vectorized slotting + grouped-GEMM pair + scatter-add
  (llama._moe_capacity's fused branch, cf=1.5)

Usage: tpu_moe_bigbatch_probe.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels.dequant_matmul import dequant_matmul_moe
from quant_tpu.utils.timing import differential_time

D, I, GS, E, L = 7168, 2048, 64, 256, 1


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

    def run_case(b, arm):
        import numpy as np
        x = jax.random.normal(jax.random.key(1), (b, 1, D),
                              jnp.float32).astype(jnp.bfloat16)
        if arm == "capacity":
            # top-8 sparse routing: what the capacity slotting consumes
            rng = np.random.default_rng(b)
            w_np = np.zeros((b, 1, E), np.float32)
            for i in range(b):
                w_np[i, 0, rng.choice(E, 8, replace=False)] = 1.0 / 8
            w = jnp.asarray(w_np)
            cap = max(8, -(-int(np.ceil(b * 8 / E * 1.5)) // 8) * 8)
        else:
            w = jax.nn.softmax(jax.random.normal(
                jax.random.key(2), (b, 1, E)), axis=-1)

        def mk(nrep):
            @jax.jit
            def f(x, w, guc, gus, dnc, dns):
                import dataclasses as dc
                qgu = dc.replace(gu, codes=guc, scales=gus)
                qdn = dc.replace(dn, codes=dnc, scales=dns)

                def body(c, i):
                    if arm == "capacity":
                        # the model's vectorized capacity dispatch
                        # (llama._moe_capacity fused branch): gather
                        # routed rows, ONE grouped-GEMM pair, scatter
                        x2 = c.reshape(b, D)
                        w2 = w.reshape(b, E)
                        sel = w2 > 0
                        pos = jnp.cumsum(sel.astype(jnp.int32),
                                         axis=0) - 1
                        slot = jnp.where(sel & (pos < cap), pos, cap).T
                        er = jnp.arange(E, dtype=jnp.int32)[:, None]
                        st = jnp.zeros((E, cap + 1), jnp.int32).at[
                            er, slot].set(jnp.broadcast_to(
                                jnp.arange(b, dtype=jnp.int32),
                                (E, b)), mode="drop")[:, :cap]
                        sw = jnp.zeros((E, cap + 1), jnp.float32).at[
                            er, slot].set(w2.T, mode="drop")[:, :cap]
                        xs_ = x2[st]                   # [E, C, D]
                        gu_ = dequant_matmul_moe(
                            xs_, qgu, i, n_experts=E, stride=L,
                            mode="grouped")            # [E, C, 2I]
                        g, u = jnp.split(gu_, 2, axis=-1)
                        z = (jax.nn.silu(g.astype(jnp.float32)) * u
                             ).astype(jnp.bfloat16)
                        y = dequant_matmul_moe(
                            z, qdn, i, n_experts=E, stride=L,
                            mode="grouped",
                            out_dtype=jnp.float32)     # [E, C, D]
                        o = jnp.zeros((b, D), jnp.float32).at[
                            st.reshape(-1)].add(
                            y.reshape(E * cap, -1)
                            * sw.reshape(-1, 1))
                        return (c + jnp.sum(o)[None, None] * 1e-20
                                ).astype(c.dtype), None
                    g_all = dequant_matmul_moe(
                        c, qgu, i, n_experts=E, stride=L,
                        mode="concat")
                    g_all = g_all.reshape(b, 1, E, 2 * I)
                    g, u = jnp.split(g_all, 2, axis=-1)
                    z = jax.nn.silu(g.astype(jnp.float32)) * u
                    z = (z * w[..., None]).astype(jnp.bfloat16)
                    if arm == "sum":
                        xs_ = jnp.moveaxis(z, 2, 0)
                        o = dequant_matmul_moe(
                            xs_, qdn, i, n_experts=E, stride=L,
                            mode="sum", out_dtype=jnp.float32)
                    else:
                        xs_ = jnp.moveaxis(z, 2, 0)
                        o = dequant_matmul_moe(
                            xs_, qdn, i, n_experts=E, stride=L,
                            mode="psum",
                            out_dtype=(jnp.float32 if arm == "psum-f32"
                                       else jnp.bfloat16))
                    return (c + jnp.sum(o.astype(jnp.float32))[
                        None, None] * 1e-20).astype(c.dtype), None

                c, _ = jax.lax.scan(
                    body, x,
                    jnp.tile(jnp.arange(L, dtype=jnp.int32), nrep))
                return jnp.sum(c)
            return f
        return differential_time(
            mk, (x, w, gu.codes, gu.scales, dn.codes, dn.scales),
            2, 8, iters=4) / L

    print(f"E={E} D={D} I={I}: {byt/1e6:.0f} MB expert bytes/step",
          flush=True)
    for b in (32, 64, 128):
        for arm in ("psum-f32", "capacity"):
            t = run_case(b, arm)
            print(f"  B={b:3d} {arm:9s}: {t*1e3:7.3f} ms  "
                  f"[{byt/t/1e9:.0f} GB/s of expert bytes]", flush=True)


if __name__ == "__main__":
    main()
