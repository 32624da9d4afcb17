"""int4 unpack arithmetic variants: int32 (current), int16, f32-floor."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = N = 4096; M = 16; NW = 8; R_LO, R_HI = 8, 256; TK = 512  # packed rows

def timed(fn, *a, iters=4):
    np.asarray(fn(*a)); ts=[]
    for _ in range(iters):
        t0=time.perf_counter(); np.asarray(fn(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)

def chain(mm, outer):
    @jax.jit
    def run(x, ws):
        def outer_body(_, a):
            def body(c, i):
                y = mm(c, ws, i)
                yf = y.astype(jnp.float32)
                return (yf * jax.lax.rsqrt(jnp.mean(yf*yf)+1e-6))[:, :K].astype(jnp.bfloat16), None
            a, _ = jax.lax.scan(body, a, jnp.arange(NW))
            return a
        return jnp.sum(jax.lax.fori_loop(0, outer, outer_body, x).astype(jnp.float32))
    return run

def diff_us(mm, x, ws):
    t_lo = timed(chain(mm, R_LO), x, ws)
    t_hi = timed(chain(mm, R_HI), x, ws)
    return (t_hi - t_lo)/((R_HI-R_LO)*NW)*1e6

def make(unpack):
    K2 = K // 2
    def body(x_lo_ref, x_hi_ref, w_ref, o_ref, acc):
        k = pl.program_id(0)
        @pl.when(k == 0)
        def _(): acc[:] = jnp.zeros_like(acc)
        lo, hi = unpack(w_ref[0])
        acc[:] += jnp.dot(x_lo_ref[:].astype(jnp.float32), lo, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(x_hi_ref[:].astype(jnp.float32), hi, preferred_element_type=jnp.float32)
        @pl.when(k == pl.num_programs(0)-1)
        def _(): o_ref[:] = acc[:]
    n_k = K2 // TK
    def mm(x, ws, i):
        lr = jnp.asarray(i, jnp.int32).reshape(1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_k,),
            in_specs=[
                pl.BlockSpec((M, TK), lambda k, lr: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, TK), lambda k, lr: (0, k + n_k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TK, N), lambda k, lr: (lr[0], k, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda k, lr: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        )
        def kp(lr_ref, *rest):
            del lr_ref
            return body(*rest)
        return pl.pallas_call(kp, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(lr, x, x, ws)
    return mm

def unpack_i32(w):
    wi = w.astype(jnp.int32)
    return ((wi & 0xF) - 8).astype(jnp.float32), ((wi >> 4) - 8).astype(jnp.float32)

def unpack_i16(w):
    wi = w.astype(jnp.int16)
    return ((wi & 0xF) - 8).astype(jnp.float32), ((wi >> 4) & 0xF).astype(jnp.float32) - 8.0

def unpack_f32(w):
    wf = w.astype(jnp.float32)
    hi = jnp.floor(wf * (1.0 / 16.0))
    lo = wf - hi * 16.0
    return lo - 8.0, hi - 8.0

def main():
    x = jax.random.normal(jax.random.key(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    ws = jax.random.randint(jax.random.key(2), (NW, K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    for name, up in [("i32", unpack_i32), ("i16", unpack_i16), ("f32floor", unpack_f32)]:
        try:
            print(f"int4 unpack {name}: {diff_us(make(up), x, ws):.1f} us", flush=True)
        except Exception as e:
            print(f"int4 unpack {name}: FAIL {repr(e)[:150]}", flush=True)

if __name__ == "__main__":
    main()
