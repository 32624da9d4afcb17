"""Probe kernel variants on hardware: mixed-dtype dot, int16 unpack, etc."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels import dequant_matmul

K = N = 4096; M = 16; NW = 8; R_LO, R_HI = 8, 256

def timed(fn, *a, iters=4):
    np.asarray(fn(*a)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); np.asarray(fn(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)

def chain(mm, outer):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, w):
                y = mm(c, w)
                yf = y.astype(jnp.float32)
                return (yf * jax.lax.rsqrt(jnp.mean(yf*yf)+1e-6))[:, :K].astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, a, ws)
            return a
        return jnp.sum(jax.lax.fori_loop(0, outer, outer_body, x).astype(jnp.float32))
    return run

def diff_us(mm, x, ws):
    t_lo = timed(chain(mm, R_LO), x, ws)
    t_hi = timed(chain(mm, R_HI), x, ws)
    return (t_hi - t_lo)/((R_HI-R_LO)*NW)*1e6

def make_pallas(body, w_dtype):
    TK = 512
    def mm(x, w):
        grid = (K//TK,)
        return pl.pallas_call(
            body, grid=grid,
            in_specs=[pl.BlockSpec((M, TK), lambda k: (0, k), memory_space=pltpu.VMEM),
                      pl.BlockSpec((TK, N), lambda k: (k, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(x, w)
    return mm

def body_cast(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def body_mixed(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    acc[:] += jax.lax.dot_general(x_ref[:], w_ref[:], (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    wi8 = jax.random.randint(jax.random.key(2), (NW, K, N), -127, 127, jnp.int8)
    # A: cast-in-kernel (isolated: no scales)
    try: print(f"A cast+dot      : {diff_us(make_pallas(body_cast, jnp.int8), x, wi8):.1f} us", flush=True)
    except Exception as e: print("A FAIL", repr(e)[:200], flush=True)
    # B: mixed bf16 x int8 dot
    try: print(f"B mixed dot     : {diff_us(make_pallas(body_mixed, jnp.int8), x, wi8):.1f} us", flush=True)
    except Exception as e: print("B FAIL", repr(e)[:200], flush=True)
    # C: int8 x int8 dot (W8A8 MXU rate probe)
    xi8 = jax.random.randint(jax.random.key(3), (M, K), -127, 127, jnp.int8)
    def body_i8(x_ref, w_ref, o_ref, acc):
        k = pl.program_id(0)
        @pl.when(k == 0)
        def _(): acc[:] = jnp.zeros_like(acc)
        acc[:] += jax.lax.dot_general(x_ref[:], w_ref[:], (((1,),(0,)),((),())), preferred_element_type=jnp.int32).astype(jnp.float32)
        @pl.when(k == pl.num_programs(0)-1)
        def _(): o_ref[:] = acc[:]
    try:
        mm = make_pallas(body_i8, jnp.int8)
        print(f"C int8xint8 dot : {diff_us(mm, xi8, wi8):.1f} us", flush=True)
    except Exception as e: print("C FAIL", repr(e)[:200], flush=True)
    # D: current production kernel int4 (fixed int16 path)
    qts = [quantize_tensor_device(jax.random.normal(k, (K, N)), 4, 128)
           for k in jax.random.split(jax.random.key(5), NW)]
    ws = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    try: print(f"D int4 prod tn4096: {diff_us(lambda c, w: dequant_matmul(c, w, tile_n=4096, tile_k=512), x, ws):.1f} us", flush=True)
    except Exception as e: print("D FAIL", repr(e)[:300], flush=True)

if __name__ == "__main__":
    main()
