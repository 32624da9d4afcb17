"""Flash-decode attention variant sweep at the flagship shape (VERDICT r3 #1).

The production kernel at B=48/S=1024 runs ~260 GB/s of cache bytes while
the chip streams ~700 GB/s dense: grid (B, S/s_blk) = 96 programs whose
fixed cost (~2.6 us each vs 1.5 us of DMA) dominates. Variants:

  base           current kernels.attention.flash_decode_int8 (s_blk sweep)
  mslot<Bb>      multi-slot: grid (B/Bb, n_s), K/V blocks [Bb, hkv, s_blk, D]
                 — amortizes per-program cost over Bb slots' DMA
  dma            DMA+reduce-only kernel over the same blocks = attainable
                 ceiling for this access pattern

Usage: tpu_flash_sweep.py [B] [S] [fill] [variants]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quant_tpu.kernels.attention import flash_decode_int8
from quant_tpu.utils.timing import differential_time

L = 2


def make_inputs(b, hkv, rep, s, d, fill):
    key = jax.random.key(0)
    kc = jax.random.randint(key, (L, b, hkv, s, d), -127, 127, jnp.int8)
    ks = jnp.abs(jax.random.normal(key, (L, b, hkv, s), jnp.float32)) * 1e-2
    vc = jax.random.randint(jax.random.key(1), (L, b, hkv, s, d), -127, 127,
                            jnp.int8)
    vs = jnp.abs(jax.random.normal(key, (L, b, hkv, s), jnp.float32)) * 1e-2
    q = jax.random.normal(key, (b, hkv * rep, d), jnp.bfloat16)
    lengths = jnp.full((b,), fill, jnp.int32)
    return q, kc, ks, vc, vs, lengths


# ── multi-slot kernel ───────────────────────────────────────────────────


def _mslot_kernel(lr_ref, len_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref, *, bb, s_blk, n_s, scale,
                  hkv, rep):
    del lr_ref
    s_idx = pl.program_id(1)
    start = s_idx * s_blk
    stride = max(rep, 8)

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dot_t = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for i in range(bb):
        length = len_ref[pl.program_id(0) * bb + i]

        @pl.when(start < length)
        def _(i=i, length=length):
            for h in range(hkv):
                r0 = (i * hkv + h) * stride
                q = q_ref[i, h].astype(jnp.float32) * scale
                kf = kc_ref[0, i, h].astype(jnp.float32)
                logits = dot_t(q, kf)
                logits = logits * ks_ref[0, i, h][None, :]
                pos = start + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1)
                logits = jnp.where(pos < length, logits, -1e30)
                m_prev = m_ref[r0:r0 + rep, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(logits, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(logits - m_new)
                l_new = (alpha * l_ref[r0:r0 + rep, :1]
                         + jnp.sum(p, axis=1, keepdims=True))
                vf = vc_ref[0, i, h].astype(jnp.float32)
                ps = p * vs_ref[0, i, h][None, :]
                pv = jnp.dot(ps, vf, preferred_element_type=jnp.float32)
                acc_ref[r0:r0 + rep, :] = (
                    acc_ref[r0:r0 + rep, :] * alpha + pv)
                m_ref[r0:r0 + rep, :] = jnp.broadcast_to(m_new, (rep, 128))
                l_ref[r0:r0 + rep, :] = jnp.broadcast_to(l_new, (rep, 128))

    @pl.when(s_idx == n_s - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-20)
        out = out.reshape(bb, hkv, stride, -1)[:, :, :rep]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bb", "s_blk"))
def mslot_flash(q, kc, ks, vc, vs, lengths, layer, *, bb, s_blk):
    b, hq, dh = q.shape
    hkv, s = kc.shape[-3], kc.shape[-2]
    rep = hq // hkv
    n_s = s // s_blk
    qg = q.reshape(b, hkv, rep, dh)
    stride = max(rep, 8)
    kern = functools.partial(_mslot_kernel, bb=bb, s_blk=s_blk, n_s=n_s,
                             scale=1.0 / dh ** 0.5, hkv=hkv, rep=rep)
    kv_spec = pl.BlockSpec((1, bb, hkv, s_blk, dh),
                           lambda g, ss, lr: (lr[0], g, 0, ss, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, bb, hkv, s_blk),
                           lambda g, ss, lr: (lr[0], g, 0, ss),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb, n_s),
        in_specs=[
            pl.BlockSpec((b,), lambda g, ss, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, hkv, rep, dh), lambda g, ss, lr: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((bb, hkv, rep, dh),
                               lambda g, ss, lr: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bb * hkv * stride, 128), jnp.float32),
            pltpu.VMEM((bb * hkv * stride, 128), jnp.float32),
            pltpu.VMEM((bb * hkv * stride, dh), jnp.float32),
        ],
    )
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(lr, lengths, qg, kc, ks, vc, vs)
    return out.reshape(b, hq, dh)


# ── batched-dot single-block kernel: no head loop, no online state ──────


def _bdot_kernel(lr_ref, len_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                 o_ref, *, scale, hkv, rep):
    del lr_ref
    length = len_ref[pl.program_id(0)]
    q = q_ref[0].astype(jnp.float32) * scale           # [hkv, rep, D]
    kf = kc_ref[0, 0].astype(jnp.float32)              # [hkv, S, D]
    logits = jax.lax.dot_general(
        q, kf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [hkv, rep, S]
    logits = logits * ks_ref[0, 0][:, None, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(pos < length, logits, -1e30)
    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    vf = vc_ref[0, 0].astype(jnp.float32)
    ps = p * vs_ref[0, 0][:, None, :]
    pv = jax.lax.dot_general(
        ps, vf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [hkv, rep, D]
    o_ref[0] = (pv / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


@jax.jit
def bdot_flash(q, kc, ks, vc, vs, lengths, layer):
    b, hq, dh = q.shape
    hkv, s = kc.shape[-3], kc.shape[-2]
    rep = hq // hkv
    qg = q.reshape(b, hkv, rep, dh)
    kern = functools.partial(_bdot_kernel, scale=1.0 / dh ** 0.5,
                             hkv=hkv, rep=rep)
    kv_spec = pl.BlockSpec((1, 1, hkv, s, dh),
                           lambda bb, lr: (lr[0], bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, hkv, s),
                           lambda bb, lr: (lr[0], bb, 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b,), lambda bb, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hkv, rep, dh), lambda bb, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, hkv, rep, dh),
                               lambda bb, lr: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(lr, lengths, qg, kc, ks, vc, vs)
    return out.reshape(b, hq, dh)


# ── batched-dot multi-block online-softmax kernel ───────────────────────


def _bonline_kernel(lr_ref, len_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                    o_ref, m_ref, l_ref, acc_ref, *, s_blk, n_s, scale,
                    hkv, rep):
    del lr_ref
    s_idx = pl.program_id(1)
    length = len_ref[pl.program_id(0)]
    start = s_idx * s_blk

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(start < length)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale       # [hkv, rep, D]
        kf = kc_ref[0, 0].astype(jnp.float32)          # [hkv, S_blk, D]
        logits = jax.lax.dot_general(
            q, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [hkv, rep, S_blk]
        logits = logits * ks_ref[0, 0][:, None, :]
        pos = start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        logits = jnp.where(pos < length, logits, -1e30)
        m_prev = m_ref[:, :rep, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = alpha * l_ref[:, :rep, :1] + jnp.sum(p, 2, keepdims=True)
        vf = vc_ref[0, 0].astype(jnp.float32)
        ps = p * vs_ref[0, 0][:, None, :]
        pv = jax.lax.dot_general(
            ps, vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [hkv, rep, D]
        acc_ref[:, :rep] = acc_ref[:, :rep] * alpha + pv
        m_ref[:, :rep] = jnp.broadcast_to(m_new, m_ref[:, :rep].shape)
        l_ref[:, :rep] = jnp.broadcast_to(l_new, l_ref[:, :rep].shape)

    @pl.when(s_idx == n_s - 1)
    def _():
        out = acc_ref[:, :rep] / jnp.maximum(l_ref[:, :rep, :1], 1e-20)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_blk",))
def bonline_flash(q, kc, ks, vc, vs, lengths, layer, *, s_blk):
    b, hq, dh = q.shape
    hkv, s = kc.shape[-3], kc.shape[-2]
    rep = hq // hkv
    n_s = s // s_blk
    qg = q.reshape(b, hkv, rep, dh)
    stride = max(rep, 8)
    kern = functools.partial(_bonline_kernel, s_blk=s_blk, n_s=n_s,
                             scale=1.0 / dh ** 0.5, hkv=hkv, rep=rep)
    kv_spec = pl.BlockSpec((1, 1, hkv, s_blk, dh),
                           lambda bb, ss, lr: (lr[0], bb, 0, ss, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, hkv, s_blk),
                           lambda bb, ss, lr: (lr[0], bb, 0, ss),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((b,), lambda bb, ss, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hkv, rep, dh), lambda bb, ss, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, hkv, rep, dh),
                               lambda bb, ss, lr: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, stride, 128), jnp.float32),
            pltpu.VMEM((hkv, stride, 128), jnp.float32),
            pltpu.VMEM((hkv, stride, dh), jnp.float32),
        ],
    )
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(lr, lengths, qg, kc, ks, vc, vs)
    return out.reshape(b, hq, dh)


# ── DMA-ceiling kernel: stream the same blocks, minimal compute ─────────


def _dma_kernel(lr_ref, kc_ref, vc_ref, o_ref, *, n_s):
    del lr_ref
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    # one add per 128-wide row-sum keeps the VPU almost idle
    o_ref[:] += (jnp.sum(kc_ref[0, 0], axis=(0, 1)).astype(jnp.float32)
                 + jnp.sum(vc_ref[0, 0], axis=(0, 1)).astype(jnp.float32)
                 )[None, :]


@functools.partial(jax.jit, static_argnames=("bb", "s_blk"))
def dma_only(kc, vc, layer, *, bb, s_blk):
    b, hkv, s, dh = kc.shape[1:]
    n_s = s // s_blk
    kv_spec = pl.BlockSpec((1, bb, hkv, s_blk, dh),
                           lambda g, ss, lr: (lr[0], g, 0, ss, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb, n_s),
        in_specs=[kv_spec, kv_spec],
        out_specs=pl.BlockSpec((8, dh), lambda g, ss, lr: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(_dma_kernel, n_s=n_s), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(lr, kc, vc)


def time_variant(label, fn, q, args, bytes_per_call):
    def make(n):
        @jax.jit
        def run(q, *a):
            def body(i, qq):
                out = fn(qq, *a, i % L)
                return out.astype(qq.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, q)
                           .astype(jnp.float32))
        return run
    t0 = time.perf_counter()
    per = differential_time(make, (q, *args), 6, 62, iters=5)
    print(f"{label:18s}: {per*1e3:7.3f} ms/call  "
          f"{bytes_per_call/per/1e9:6.1f} GB/s of cache bytes "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    fill = int(sys.argv[3]) if len(sys.argv) > 3 else 921
    variants = (sys.argv[4].split(",") if len(sys.argv) > 4 else
                ["base512", "base1024", "mslot4x512", "mslot8x512",
                 "mslot4x1024", "dma4x512"])
    hkv, rep, d = 8, 4, 128
    q, kc, ks, vc, vs, lengths = make_inputs(b, hkv, rep, s, d, fill)
    jax.block_until_ready(kc)
    cache_bytes = 2 * b * hkv * s * d + 2 * b * hkv * s * 4

    import os
    if os.environ.get("CHECK", "1") == "1":
        ref = np.asarray(flash_decode_int8(
            q, kc, ks, vc, vs, lengths, 1, s_blk=512).astype(jnp.float32))
        for nm, fn in [("bdot", bdot_flash),
                       ("bonline512", lambda *a: bonline_flash(
                           *a, s_blk=512))]:
            try:
                got = np.asarray(fn(q, kc, ks, vc, vs, lengths, 1)
                                 .astype(jnp.float32))
                print(f"check {nm}: max|d|={np.abs(got-ref).max():.2e}",
                      flush=True)
            except Exception as e:
                print(f"check {nm}: FAIL {repr(e)[:200]}", flush=True)

    for v in variants:
        try:
            if v.startswith("base"):
                sb = int(v[4:])
                fn = lambda qq, *a, sb=sb: flash_decode_int8(
                    qq, *a, s_blk=sb)
                time_variant(v, fn, q, (kc, ks, vc, vs, lengths),
                             cache_bytes)
            elif v == "bdot":
                time_variant(v, bdot_flash, q, (kc, ks, vc, vs, lengths),
                             cache_bytes)
            elif v.startswith("bonline"):
                sb = int(v[7:])
                fn = lambda qq, *a, sb=sb: bonline_flash(qq, *a, s_blk=sb)
                time_variant(v, fn, q, (kc, ks, vc, vs, lengths),
                             cache_bytes)
            elif v.startswith("mslot"):
                bb, sb = map(int, v[5:].split("x"))
                fn = lambda qq, kk, kss, vv, vss, ll, lr, bb=bb, sb=sb: \
                    mslot_flash(qq, kk, kss, vv, vss, ll, lr, bb=bb,
                                s_blk=sb)
                time_variant(v, fn, q, (kc, ks, vc, vs, lengths),
                             cache_bytes)
            elif v.startswith("dma"):
                bb, sb = map(int, v[3:].split("x"))
                def fn(qq, kk, vv, lr, bb=bb, sb=sb):
                    o = dma_only(kk, vv, lr, bb=bb, s_blk=sb)
                    return qq + o[:1, None, :].astype(qq.dtype)
                time_variant(v, fn, q, (kc, vc),
                             2 * b * hkv * s * d)
        except Exception as e:
            print(f"{v:18s}: FAIL {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
