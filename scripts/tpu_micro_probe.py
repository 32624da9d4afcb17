"""Micro-probes: isolate DMA vs cast vs dot cost in the weight-stream loop."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = N = 4096; M = 16; NW = 8; R_LO, R_HI = 8, 256; TK = 512

def timed(fn, *a, iters=4):
    np.asarray(fn(*a)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); np.asarray(fn(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)

def chain(mm, outer, xdt):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, w):
                y = mm(c, w).astype(jnp.float32)
                return (y * jax.lax.rsqrt(jnp.mean(y*y)+1e-6))[:, :K].astype(xdt), None
            a, _ = jax.lax.scan(body, a, ws)
            return a
        return jnp.sum(jax.lax.fori_loop(0, outer, outer_body, x).astype(jnp.float32))
    return run

def diff_us(mm, x, ws, xdt=jnp.bfloat16):
    t_lo = timed(chain(mm, R_LO, xdt), x, ws)
    t_hi = timed(chain(mm, R_HI, xdt), x, ws)
    return (t_hi - t_lo)/((R_HI-R_LO)*NW)*1e6

def pallas_mm(body, out_dt=jnp.float32):
    def mm(x, w):
        return pl.pallas_call(
            body, grid=(w.shape[0]//TK,),
            in_specs=[pl.BlockSpec((M, TK), lambda k: (0, k), memory_space=pltpu.VMEM),
                      pl.BlockSpec((TK, N), lambda k: (k, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dt),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(x, w)
    return mm

def body_dot_bf16(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def body_sum_only(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    # minimal compute touching every byte: int8 row-reduce via MXU-free path
    s = jnp.sum(w_ref[:].astype(jnp.int32), axis=0)  # [N]
    acc[:] += jnp.broadcast_to(s.astype(jnp.float32)[None, :], acc.shape) * 1e-6
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def body_cast_sum(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    wb = w_ref[:].astype(jnp.bfloat16)
    s = jnp.sum(wb.astype(jnp.float32), axis=0)
    acc[:] += jnp.broadcast_to(s[None, :], acc.shape) * 1e-6
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def body_cast_dot(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def body_f32cast_dot(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += jnp.dot(x_ref[:].astype(jnp.float32), w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def main():
    xb = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    wb = jax.random.normal(jax.random.key(0), (NW, K, N), jnp.float32).astype(jnp.bfloat16)
    wi = jax.random.randint(jax.random.key(2), (NW, K, N), -127, 127, jnp.int8)
    print(f"pallas bf16 dot (33.5MB):   {diff_us(pallas_mm(body_dot_bf16), xb, wb):.1f} us", flush=True)
    print(f"pallas int8 sum-only:       {diff_us(pallas_mm(body_sum_only), xb, wi):.1f} us", flush=True)
    print(f"pallas int8 cast+sum:       {diff_us(pallas_mm(body_cast_sum), xb, wi):.1f} us", flush=True)
    print(f"pallas int8 cast+dot:       {diff_us(pallas_mm(body_cast_dot), xb, wi):.1f} us", flush=True)
    print(f"pallas int8 f32cast+dot:    {diff_us(pallas_mm(body_f32cast_dot), xb, wi):.1f} us", flush=True)

if __name__ == "__main__":
    main()
