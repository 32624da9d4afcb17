"""Round 2: interleaved cast/dot scheduling variants for the int8/int4 path."""
import time
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

def make(body, TK, n_bufs=None):
    def mm(x, w):
        return pl.pallas_call(
            body, grid=(K//TK,),
            in_specs=[pl.BlockSpec((M, TK), lambda k: (0, k), memory_space=pltpu.VMEM),
                      pl.BlockSpec((TK, N), lambda k: (k, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((M, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(x, w)
    return mm

def body_chunked(chunk):
    def body(x_ref, w_ref, o_ref, acc):
        k = pl.program_id(0)
        @pl.when(k == 0)
        def _(): acc[:] = jnp.zeros_like(acc)
        TK = w_ref.shape[0]
        a = acc[:]
        for c in range(TK // chunk):
            wg = w_ref[c*chunk:(c+1)*chunk, :].astype(jnp.bfloat16)
            a = a + jnp.dot(x_ref[:, c*chunk:(c+1)*chunk], wg, preferred_element_type=jnp.float32)
        acc[:] = a
        @pl.when(k == pl.num_programs(0)-1)
        def _(): o_ref[:] = acc[:]
    return body

def body_mixed_chunk(chunk):
    def body(x_ref, w_ref, o_ref, acc):
        k = pl.program_id(0)
        @pl.when(k == 0)
        def _(): acc[:] = jnp.zeros_like(acc)
        TK = w_ref.shape[0]
        a = acc[:]
        for c in range(TK // chunk):
            a = a + jax.lax.dot_general(
                x_ref[:, c*chunk:(c+1)*chunk], w_ref[c*chunk:(c+1)*chunk, :],
                (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
        acc[:] = a
        @pl.when(k == pl.num_programs(0)-1)
        def _(): o_ref[:] = acc[:]
    return body

def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    wi8 = jax.random.randint(jax.random.key(2), (NW, K, N), -127, 127, jnp.int8)
    for tk in (512, 1024):
        for chunk in (128, 256, tk):
            try:
                print(f"cast tk={tk} chunk={chunk}: {diff_us(make(body_chunked(chunk), tk), x, wi8):.1f} us", flush=True)
            except Exception as e: print(f"cast tk={tk} chunk={chunk} FAIL {repr(e)[:120]}", flush=True)
    for tk in (512,):
        for chunk in (128, 512):
            try:
                print(f"mixd tk={tk} chunk={chunk}: {diff_us(make(body_mixed_chunk(chunk), tk), x, wi8):.1f} us", flush=True)
            except Exception as e: print(f"mixd tk={tk} chunk={chunk} FAIL {repr(e)[:120]}", flush=True)
    # production int4 at tn=2048 (compile-safe) with int16 path
    qts = [quantize_tensor_device(jax.random.normal(k, (K, N)), 4, 128)
           for k in jax.random.split(jax.random.key(5), NW)]
    ws = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    for tn, tk in [(2048, 512), (1024, 1024), (2048, 1024)]:
        try:
            print(f"int4 prod tn={tn} tk={tk}: {diff_us(lambda c, w: dequant_matmul(c, w, tile_n=tn, tile_k=tk), x, ws):.1f} us", flush=True)
        except Exception as e: print(f"int4 tn={tn} FAIL {repr(e)[:120]}", flush=True)

if __name__ == "__main__":
    main()
