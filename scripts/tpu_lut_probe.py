"""LUT ("bin-lookup") dequant-in-kernel variants, on hardware (VERDICT r3
#2: codebook dequant gathered in VMEM before the MXU dot).

The question: how to map a 4-bit code nibble (0..15) to an arbitrary f32
codebook entry per element WITHOUT killing the int4 matmul kernel's
bandwidth (the kernel is HBM-bound with limited VPU headroom — the linear
path spends ~3 VPU ops/element on unpack+cast).

Variants (per [TK, TN] weight tile, on top of the int4 nibble unpack):
  linear   the production linear int4 kernel (baseline)
  take     w = jnp.take(lut, idx) — does Mosaic lower a 16-entry gather?
  sel15    binary select tree over 16 compile-time f32 constants (exact)
  word4    int8-quantized LUT packed into four int32 SMEM words: 4-way
           select + variable shift (≈12 int ops; value error ≤ 0.5/127 of
           absmax ≈ the bf16 cast noise the production path already has)

Usage: tpu_lut_probe.py [m] [k] [n] [variants]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quant_tpu.core import codec
from quant_tpu.core.qtensor import quantize_tensor_device
from quant_tpu.kernels.dequant_matmul import dequant_matmul
from quant_tpu.utils.timing import differential_time

LUT = codec.NF4_TABLE


def _dots(x, w, s, tile_g, gsz, acc):
    for g in range(tile_g):
        part = jnp.dot(x[:, g * gsz:(g + 1) * gsz],
                       w[g * gsz:(g + 1) * gsz],
                       preferred_element_type=jnp.float32)
        acc = acc + part * s[g:g + 1]
    return acc


def _gather_sel15(idx, lut):
    """Binary select tree over 16 compile-time constants."""
    f = [jnp.float32(v) for v in lut]
    lvl = [jnp.where((idx & 1) != 0, f[2 * i + 1], f[2 * i])
           for i in range(8)]
    for bit in (2, 4, 8):
        lvl = [jnp.where((idx & bit) != 0, lvl[2 * i + 1], lvl[2 * i])
               for i in range(len(lvl) // 2)]
    return lvl[0]


def _gather_word4(idx, words, inv):
    """(words >> (idx&3)*8) & 0xFF - 128 → int8-quantized lut * inv."""
    w = jnp.where(idx < 8,
                  jnp.where(idx < 4, words[0], words[1]),
                  jnp.where(idx < 12, words[2], words[3]))
    sh = (idx & 3) << 3
    v = (w >> sh) & 0xFF
    return (v - 128).astype(jnp.float32) * inv


def _kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, lut_ref, o_ref,
            acc_ref, *, n_k, tile_g, gsz, variant, lut_words=None,
            lut_inv=None):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wi = w_ref[:].astype(jnp.int32)
    ilo = wi & 0xF
    ihi = wi >> 4
    if variant == "linear":
        lo = (ilo - 8).astype(jnp.float32)
        hi = (ihi - 8).astype(jnp.float32)
    elif variant == "take":
        lut = lut_ref[0, :16]
        lo = jnp.take(lut, ilo, axis=0)
        hi = jnp.take(lut, ihi, axis=0)
    elif variant == "take2d":
        # 2D per-row gather: out[i, j] = lutb[i, idx[i, j]] — the form
        # Mosaic lowers natively (1D take fails "Only 2D gather")
        lutb = jnp.broadcast_to(lut_ref[0, :16][None, :],
                                (ilo.shape[0], 16))
        lo = jnp.take_along_axis(lutb, ilo, axis=1)
        hi = jnp.take_along_axis(lutb, ihi, axis=1)
    elif variant == "sel15":
        lo = _gather_sel15(ilo, LUT)
        hi = _gather_sel15(ihi, LUT)
    elif variant == "word4":
        words = [jnp.int32(w) for w in lut_words]
        inv = jnp.float32(lut_inv)
        lo = _gather_word4(ilo, words, inv)
        hi = _gather_word4(ihi, words, inv)
    s_lo = s_lo_ref[0]
    s_hi = s_hi_ref[0]
    acc = acc_ref[:]
    acc = _dots(x_lo_ref[:].astype(jnp.float32), lo, s_lo, tile_g, gsz, acc)
    acc = _dots(x_hi_ref[:].astype(jnp.float32), hi, s_hi, tile_g, gsz, acc)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def lut_matmul(x, codes, s3, *, variant):
    """Trimmed int4 matmul (non-stacked, M<=32) with LUT variants."""
    m, k2 = x.shape[0], codes.shape[0]
    k = k2 * 2
    n = codes.shape[1]
    tn, tk = 4096, 512
    gs = 128
    tile_g, gsz = tk // gs, gs
    n_k = k2 // tk
    scale_rows = k // gs
    s3r = s3.reshape(scale_rows // tile_g, tile_g, n)
    hi_off = k2 // tk

    lut_q = np.round(np.asarray(LUT, np.float64) * 127).astype(np.int64)
    words = [(int(sum(((int(lut_q[4 * wi + j]) + 128) & 0xFF) << (8 * j)
                     for j in range(4)) & 0xFFFFFFFF) + 2**31) % 2**32 - 2**31
             for wi in range(4)]
    kern = functools.partial(
        _kernel, n_k=n_k, tile_g=tile_g, gsz=gsz, variant=variant,
        lut_words=words, lut_inv=1.0 / 127.0)
    acc = pltpu.VMEM((m, tn), jnp.float32)
    grid = (1, n // tn, n_k)
    in_specs = [
        pl.BlockSpec((m, tk), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, tk), lambda i, j, kk: (i, kk + hi_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_g, tn), lambda i, j, kk: (kk, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_g, tn), lambda i, j, kk: (kk + hi_off, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i, j, kk: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    lut_pad = jnp.zeros((1, 128), jnp.float32).at[0, :16].set(
        jnp.asarray(LUT))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((m, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[acc],
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, x, codes, s3r, s3r, lut_pad)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    variants = (sys.argv[4].split(",") if len(sys.argv) > 4
                else ["linear", "take", "sel15", "word4"])
    nw = 8
    keys = jax.random.split(jax.random.key(0), nw)
    qts = [quantize_tensor_device(
        jax.random.normal(kk, (k, n), jnp.float32), 4, 128, codebook="nf4")
        for kk in keys]
    codes = jnp.stack([q.codes for q in qts])
    scales = jnp.stack([q.scales for q in qts])
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
    jax.block_until_ready(codes)
    w_bytes = (k // 2) * n

    # correctness vs the XLA LUT reference
    ref = jnp.dot(x, qts[0].dequantize(jnp.float32),
                  preferred_element_type=jnp.float32)
    for v in variants:
        try:
            got = lut_matmul(x, qts[0].codes, qts[0].scales, variant=v)
            d = float(jnp.max(jnp.abs(got - ref))
                      / jnp.max(jnp.abs(ref)))
            print(f"check {v:7s}: rel|d|={d:.2e}", flush=True)
        except Exception as e:
            print(f"check {v:7s}: FAIL {repr(e)[:250]}", flush=True)

    def chain(variant):
        def make(outer):
            @jax.jit
            def run(x, codes, scales):
                def outer_body(_, a):
                    def body(c, i):
                        y = lut_matmul(c, codes[i], scales[i],
                                       variant=variant)
                        y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                        return y[:, :k], None
                    a, _ = jax.lax.scan(body, a, jnp.arange(nw))
                    return a
                a = jax.lax.fori_loop(0, outer, outer_body, x)
                return jnp.sum(a)
            return run
        return make

    for v in variants:
        try:
            t0 = time.perf_counter()
            per = differential_time(chain(v), (x, codes, scales), 8, 256,
                                    iters=4) / nw
            print(f"{v:7s}: {per*1e6:7.1f} us/mm  "
                  f"{w_bytes/per/1e9:6.1f} GB/s of packed bytes "
                  f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{v:7s}: FAIL {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
