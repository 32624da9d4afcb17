"""Micro-probe v2: stacked weights + scalar-prefetch layer index (the REAL
production access pattern — no scan-slice copy like tpu_micro_probe.py had),
isolating DMA ceiling vs cast vs dot vs full kernel.

Interpretation: if sum-only ~= XLA dense ceiling, the dequant kernel's gap
is exposed compute; if sum-only ~= the kernel, it's the DMA pipeline.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from quant_tpu.core.qtensor import quantize_tensor_device  # noqa: E402
from quant_tpu.kernels import dequant_matmul  # noqa: E402
from quant_tpu.utils.timing import differential_time  # noqa: E402

K = N = 4096
M = 16
NW = 8
TK = 512
TN = 4096


def stacked_pallas(body, out_dt=jnp.float32):
    """pallas_call over stacked [NW, K, N] weights, layer via prefetch."""
    def mm(x, w, i):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TN, K // TK),
            in_specs=[
                pl.BlockSpec((M, TK), lambda n, k, lr: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, TN), lambda n, k, lr: (lr[0], k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, TN), lambda n, k, lr: (0, n),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
        )
        return pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dt),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(jnp.asarray(i, jnp.int32).reshape(1), x, w)
    return mm


def body_sum_only(lr, x_ref, w_ref, o_ref, acc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    s = jnp.sum(w_ref[0].astype(jnp.int32), axis=0)  # [TN]
    acc[:] += jnp.broadcast_to(s.astype(jnp.float32)[None, :],
                               acc.shape) * 1e-6

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def body_cast_dot(lr, x_ref, w_ref, o_ref, acc):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w_ref[0].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def body_bf16cast_dot(lr, x_ref, w_ref, o_ref, acc):
    # int8 → bf16 cast (EXACT for |v| ≤ 127: bf16 has 8 mantissa bits) +
    # bf16×bf16 MXU dot at 2x the f32 rate, f32 accumulation
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    acc[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def body_i8_dot(lr, x_ref, w_ref, o_ref, acc):
    # int8 x int8 MXU dot, f32 accumulate at the end of each tile
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    xi = jnp.round(x_ref[:].astype(jnp.float32) * 16.0).astype(jnp.int8)
    pi = jax.lax.dot_general(
        xi, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc[:] += pi.astype(jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def chain(mm, outer):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, i):
                y = mm(c, ws, i).astype(jnp.float32)
                y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                return y[:, :K].astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, a, jnp.arange(NW))
            return a
        a = jax.lax.fori_loop(0, outer, outer_body, x)
        return jnp.sum(a.astype(jnp.float32))
    return run


def bw(label, mm, x, ws, wbytes):
    t0 = time.time()
    per = differential_time(lambda n: chain(mm, n), (x, ws), 8, 512,
                            iters=5) / NW
    print(f"{label}: {wbytes / per / 1e9:.0f} GB/s ({per*1e6:.2f} us/mm) "
          f"[wall {time.time()-t0:.0f}s]", flush=True)


def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32
                          ).astype(jnp.bfloat16)
    wi = jax.random.randint(jax.random.key(2), (NW, K, N), -127, 127,
                            jnp.int8)
    wbytes = K * N
    bw("int8 sum-only (stream ceiling)", stacked_pallas(body_sum_only),
       x, wi, wbytes)
    bw("int8 f32cast+dot              ", stacked_pallas(body_cast_dot),
       x, wi, wbytes)
    bw("int8 bf16cast+dot             ", stacked_pallas(body_bf16cast_dot),
       x, wi, wbytes)
    bw("int8 int8-MXU dot             ", stacked_pallas(body_i8_dot),
       x, wi, wbytes)

    # XLA-native: stacked int8 weights, dynamic layer slice + cast + dot —
    # does XLA's fused operand-convert beat the Pallas DMA ceiling?
    bw("int8 XLA cast+dot (no scales) ",
       lambda c, ws, i: jnp.dot(
           c, jax.lax.dynamic_index_in_dim(ws, i, 0, False).astype(
               jnp.bfloat16), preferred_element_type=jnp.float32),
       x, wi, wbytes)

    # full production kernel, weight-only and W8A8
    keys = jax.random.split(jax.random.key(0), NW)
    qts = [quantize_tensor_device(
        jax.random.normal(k, (K, N), jnp.float32), 8, 128) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    bw("dequant_matmul int8 (prod)    ",
       lambda c, w, i: dequant_matmul(c, w, i), x, stacked, wbytes)
    bw("dequant_matmul int8 aq (W8A8) ",
       lambda c, w, i: dequant_matmul(c, w, i, act_quant=True), x, stacked,
       wbytes)


if __name__ == "__main__":
    main()
