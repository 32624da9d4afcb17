"""Probe: does Mosaic lower int8 x int8 dot_general (MXU int8 rate)?"""
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

def diff_us(mm, x, ws):
    def chain(outer):
        @jax.jit
        def run(x, ws):
            def outer_body(_, a):
                def body(c, i):
                    y = mm(c, ws, i).astype(jnp.float32)
                    return (y * jax.lax.rsqrt(jnp.mean(y*y)+1e-6))[:, :K].astype(jnp.bfloat16), None
                a, _ = jax.lax.scan(body, a, jnp.arange(NW))
                return a
            return jnp.sum(jax.lax.fori_loop(0, outer, outer_body, x).astype(jnp.float32))
        return run
    t_lo = timed(chain(R_LO), x, ws)
    t_hi = timed(chain(R_HI), x, ws)
    return (t_hi - t_lo)/((R_HI-R_LO)*NW)*1e6

def body_w8a8(x_ref, w_ref, o_ref, acc):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    # dynamic per-row activation quant for this k-tile
    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    sx = jnp.where(sx == 0, 1.0, sx)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    pi = jax.lax.dot_general(xq, w_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc[:] += pi.astype(jnp.float32) * sx
    @pl.when(k == pl.num_programs(0)-1)
    def _(): o_ref[:] = acc[:]

def mm_w8a8(x, ws, i):
    lr = jnp.asarray(i, jnp.int32).reshape(1)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(K//TK,),
        in_specs=[
            pl.BlockSpec((M, TK), lambda k, lr: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, N), lambda k, lr: (lr[0], k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, N), lambda k, lr: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
    )
    def kp(lr_ref, *rest):
        del lr_ref
        return body_w8a8(*rest)
    return pl.pallas_call(kp, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(lr, x, x if False else x)  # placeholder

def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    ws = jax.random.randint(jax.random.key(2), (NW, K, N), -127, 127, jnp.int8)
    def mm(c, w, i):
        lr = jnp.asarray(i, jnp.int32).reshape(1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(K//TK,),
            in_specs=[
                pl.BlockSpec((M, TK), lambda k, lr: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, N), lambda k, lr: (lr[0], k, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda k, lr: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        )
        def kp(lr_ref, *rest):
            del lr_ref
            return body_w8a8(*rest)
        return pl.pallas_call(kp, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(lr, c, w)
    try:
        # correctness vs f32 reference on one layer
        ref = jnp.dot(x.astype(jnp.float32), ws[0].astype(jnp.float32))
        out = mm(x, ws, jnp.int32(0))
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"w8a8 rel_err={err:.2e}", flush=True)
        print(f"w8a8 int8xint8: {diff_us(mm, x, ws):.1f} us", flush=True)
    except Exception as e:
        print("w8a8 FAIL", repr(e)[:200], flush=True)

if __name__ == "__main__":
    main()
