"""INT8-KV flash-decode attention Pallas kernel (SURVEY.md §2.2 #5).

Decode-step attention (T=1) over the quantized KV cache: KV tiles stream
from HBM as int8 + per-(token, head) f32 scales and are dequantized inline
in VMEM — the float cache is never materialized, so HBM traffic is
1 byte/elem, which is the whole point of the INT8 cache (BASELINE.json:5).

Shape/layout choices:
* q is viewed [B, Hkv, rep, Dh] (GQA: the ``rep`` query heads sharing one
  kv head form the sublane dim of a small MXU operand).
* grid (B, S/S_BLK) with ALL kv heads handled inside one program as ONE
  batched dot_general over the VMEM-resident [Hkv, S_blk, Dh] tile (hkv is
  a batch dim of the dot) — a (B, Hkv, S) grid would mean hundreds of
  micro-programs, and even an in-program per-head loop serializes 2*hkv
  tiny [rep, ...] dots whose issue latencies dominate (r4 measurement at
  B=48/S=1024: 413 GB/s head-loop → 955 GB/s batched, bit-identical —
  scripts/tpu_flash_sweep.py; the DMA-only ceiling for this access
  pattern measured 806-870 GB/s in the same windows). The sequence dim is
  innermost ("arbitrary") with an online-softmax state (m, l, acc) in
  VMEM scratch — classic flash-decoding, one pass over the cache.
* k/v scales apply to the [rep, S_blk] LOGITS after the q·k dot and to the
  softmax probs before the p·v dot — exact (scales are per token+head: they
  factor out of the D-contraction) and ~Dh× cheaper on the VPU than scaling
  the [S_blk, Dh] tiles (r2 fix: tile-scaling made the kernel
  bandwidth-starved at decode shapes).
* Blocks past a slot's ``length`` are skipped entirely (@pl.when), so cost
  scales with actual context, not max_seq.
* With a stacked [L, ...] cache and a ``layer`` index, the layer is
  selected inside the BlockSpec index maps via scalar prefetch — the
  scan-over-layers never materializes a per-layer cache copy.

Prefill (T>1) uses the XLA path in models/llama.py — decode is the
bandwidth-critical loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode_int8"]


def _kernel(len_ref, *refs, s_blk, n_s, scale, hkv, rep,
            stacked=False, kv4=False, prec=None, windowed=False,
            softcap=0.0):
    if windowed:
        win_ref, refs = refs[0], refs[1:]
    (q_ref, kc_ref, ks_ref, vc_ref, vs_ref, o_ref,
     m_ref, l_ref, acc_ref) = refs
    s_idx = pl.program_id(1)
    length = len_ref[pl.program_id(0)]
    start = s_idx * s_blk
    kv = (lambda r: r[0, 0]) if stacked else (lambda r: r[0])
    if windowed:
        # sliding window (Mistral/Gemma-2/3): at decode the single query
        # sits at position length-1, so the valid keys are
        # [length - window, length); window <= 0 means full causal for
        # this layer (Gemma's local/global alternation passes a traced
        # per-layer window scalar). Blocks fully below the window start
        # are skipped like past-the-end blocks — cost scales with
        # min(window, context), the whole point of a sliding window.
        w = win_ref[0]
        wstart = jnp.where(w > 0, jnp.maximum(length - w, 0), 0)
        run = (start < length) & (start + s_blk > wstart)
    else:
        wstart = 0
        run = start < length

    def dq_pair(tile):
        # int4 KV: HEAD-PAIR nibble unpack (llama._kv_code_dims) —
        # packed head j holds real heads 2j (low) / 2j+1 (high), so both
        # halves are FULL-D [hkv/2, S_blk, Dh] tiles and the dots below
        # run per head parity with only free major-dim reshapes (the old
        # split-D layout's sub-128 lane dim broke the insert kernel's
        # DMA and cost a whole-cache relayout per call). uint8 bitwise
        # has no Mosaic lowering on this toolchain — go through int32
        # like the matmul kernel (dequant_matmul.py) does.
        if not kv4:
            return tile.astype(jnp.float32), None
        wi = tile.astype(jnp.int32)
        return (((wi & 0xF) - 8).astype(jnp.float32),
                ((wi >> 4) - 8).astype(jnp.float32))

    # Batched dots over the head dim (r4 rewrite): ONE dot_general with
    # hkv as a batch dimension replaces the per-head python loop — the
    # loop's 2*hkv tiny [rep, ...] dots and their issue latencies were
    # the kernel's real bottleneck, measured 2026-08-19 at B=48/S=1024:
    # 413 GB/s (head loop, s_blk=512) → 955 GB/s batched, bit-identical
    # output (scripts/tpu_flash_sweep.py).
    dot_k = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dot_v = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale       # [hkv, rep, Dh]
        klo, khi = dq_pair(kv(kc_ref))               # [hkv(/2), S_blk, Dh]
        if khi is None:
            logits = dot_k(q, klo)                     # [hkv, rep, S_blk]
        else:
            q2 = q.reshape(hkv // 2, 2, rep, q.shape[2])
            logits = jnp.stack(
                [dot_k(q2[:, 0], klo), dot_k(q2[:, 1], khi)],
                axis=1).reshape(hkv, rep, s_blk)
        # per-token scale on the small logits block (exact: the scale
        # factors out of the Dh contraction)
        logits = logits * kv(ks_ref)[:, None, :]
        if softcap:
            # Gemma-2 attention-logit softcapping; BEFORE the mask so the
            # -1e30 fill is not saturated to -cap (llama._softcap_scores)
            logits = softcap * jnp.tanh(logits / softcap)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        ok = pos < length
        if windowed:
            ok &= pos >= wstart
        logits = jnp.where(ok, logits, -1e30)

        m_prev = m_ref[:, :rep, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                    # [hkv, rep, S_blk]
        l_new = (alpha * l_ref[:, :rep, :1]
                 + jnp.sum(p, axis=2, keepdims=True))

        vlo, vhi = dq_pair(kv(vc_ref))
        ps = p * kv(vs_ref)[:, None, :]
        if vhi is None:
            pv = dot_v(ps, vlo)                        # [hkv, rep, Dh]
        else:
            ps2 = ps.reshape(hkv // 2, 2, rep, s_blk)
            pv = jnp.stack(
                [dot_v(ps2[:, 0], vlo), dot_v(ps2[:, 1], vhi)],
                axis=1).reshape(hkv, rep, vlo.shape[2])
        acc_ref[:, :rep] = acc_ref[:, :rep] * alpha + pv
        m_ref[:, :rep] = jnp.broadcast_to(m_new, m_ref[:, :rep].shape)
        l_ref[:, :rep] = jnp.broadcast_to(l_new, l_ref[:, :rep].shape)

    @pl.when(s_idx == n_s - 1)
    def _():
        out = acc_ref[:, :rep] / jnp.maximum(l_ref[:, :rep, :1], 1e-20)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("s_blk", "interpret", "precision", "softcap",
                              "scale")
)
def flash_decode_int8(
    q: jax.Array,        # [B, Hq, Dh] (decode step, T=1)
    k_codes: jax.Array,  # int8 [B, Hkv, S, Dh] (or [L, ...] with ``layer``;
                         # uint8 [.., Hkv/2, S, Dh] = int4 head-pair packed)
    k_scale: jax.Array,  # f32  [B, Hkv, S]
    v_codes: jax.Array,
    v_scale: jax.Array,
    lengths: jax.Array,  # int32 [B] — valid cache length per slot
    layer=None,          # traced layer index for stacked [L, ...] caches
    window=None,         # traced int32 sliding window (<=0 = full causal);
                         # None compiles the window logic out entirely
    *,
    softcap: float = 0.0,   # Gemma-2 tanh logit softcap (0 = off)
    scale: float | None = None,  # q scale; default 1/sqrt(Dh)
                                 # (Gemma-2 passes query_pre_attn_scalar)
    # 512 from a hardware sweep (2026-08-18, B=48/Hkv=8/S=1024/D=128):
    # 256 → 191 GB/s, 512 → 638 GB/s (int8; the Pallas-attainable BW
    # ceiling), 1024 → worse for int4. Per-program fixed overhead
    # dominates below 512; block-skip granularity coarsens above it.
    s_blk: int = 512,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """Returns attention output [B, Hq, Dh] (q.dtype).

    ``precision`` feeds the two in-kernel dots. "default" (bf16 MXU
    pass, ~2e-3 abs vs a float64 oracle — far below int8-KV quant
    noise) is 1.6x faster end-to-end than "highest" on hardware
    (2026-08-18: 0.437 vs 0.709 ms at B=48/Hkv=8/S=1024/D=128): this
    kernel is program-overhead/VPU-bound at decode shapes, NOT
    HBM-bound, so the extra bf16x3 MXU passes are not hidden. Exactness
    tests pass "highest" and then match the f64 oracle to ~1e-6
    (scripts/tpu_kv4_kernel_check.py).
    """
    stacked = k_codes.ndim == 5
    b, hq, dh = q.shape
    s = k_codes.shape[-2]
    hkv = k_scale.shape[-2]      # scales are per REAL head
    hc = k_codes.shape[-3]       # = hkv, or hkv/2 for head-pair int4
    dc = k_codes.shape[-1]
    kv4 = hc != hkv
    rep = hq // hkv
    if s % s_blk:
        s_blk = s if s < s_blk else max(
            g for g in range(32, s_blk + 1, 32) if s % g == 0
        )
    if not interpret and s_blk != s and s_blk % 128:
        # Mosaic lowering requires the LAST dim of every block to be a
        # multiple of 128 or the full array dim; the per-token scale
        # blocks are [1, hkv, s_blk], so s_blk itself is lane-sized.
        # Interpret mode has no such rule (tests use s_blk=64 to get
        # multi-block coverage at tiny S) — legalize only when compiling.
        legal = [g for g in range(128, s + 1, 128) if s % g == 0]
        below = [g for g in legal if g <= s_blk]
        s_blk = max(below) if below else (min(legal) if legal else s)
    n_s = s // s_blk
    qg = q.reshape(b, hkv, rep, dh)
    windowed = window is not None

    kern = functools.partial(
        _kernel, s_blk=s_blk, n_s=n_s,
        scale=(scale if scale is not None else 1.0 / (dh ** 0.5)),
        hkv=hkv, rep=rep, stacked=stacked, kv4=kv4,
        prec=jax.lax.Precision(precision),
        windowed=windowed, softcap=float(softcap),
    )
    stride = max(rep, 8)
    scratch = [
        pltpu.VMEM((hkv, stride, 128), jnp.float32),
        pltpu.VMEM((hkv, stride, 128), jnp.float32),
        pltpu.VMEM((hkv, stride, dh), jnp.float32),
    ]
    out_shape = jax.ShapeDtypeStruct((b, hkv, rep, dh), q.dtype)

    def blk_idx(bb, ss, lens, win):
        # windowed: clamp the streamed block range to
        # [(length-window)//s_blk, (length-1)//s_blk] — repeated block
        # indices make Mosaic skip the re-fetch, so HBM traffic scales
        # with min(window, context) (hardware 2026-08-20: the @pl.when
        # compute skip alone did NOT drop the DMA — win=1024 at S=4096
        # ran 1.24x the full-causal step before this clamp)
        last = jnp.maximum(lens[bb] - 1, 0) // s_blk
        ss = jnp.minimum(ss, last)
        first = jnp.where(win[0] > 0,
                          jnp.maximum(lens[bb] - win[0], 0), 0) // s_blk
        return jnp.maximum(ss, first)

    def last_blk(bb, ss, lens):
        # clamp past-the-end blocks to the slot's LAST in-length block:
        # repeated block indices make Mosaic skip the re-fetch, so HBM
        # traffic scales with the actual context. The @pl.when compute
        # skip alone does NOT drop the DMA — measured 2026-08-20 at
        # B=48/S=4096: 0.56 ms FLAT across fill 512/1024/4096 before
        # this clamp (6x byte waste at fill=512); the paged kernel
        # always clamped (its r4 numbers were honest).
        return jnp.minimum(ss, jnp.maximum(lens[bb] - 1, 0) // s_blk)

    if not stacked and not windowed:
        kv_specs = [
            pl.BlockSpec((1, hc, s_blk, dc),
                         lambda bb, ss, lens:
                         (bb, 0, last_blk(bb, ss, lens), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, s_blk),
                         lambda bb, ss, lens:
                         (bb, 0, last_blk(bb, ss, lens)),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # lengths (drives the block clamp)
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, dh),
                             lambda bb, ss, lens: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_specs[0], kv_specs[1], kv_specs[0], kv_specs[1],
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, rep, dh), lambda bb, ss, lens: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        args = (lengths, qg, k_codes, k_scale, v_codes, v_scale)
    elif not stacked:
        # windowed: lengths + window ride scalar prefetch so the kv
        # index maps can clamp the block range (see blk_idx)
        kv_specs = [
            pl.BlockSpec((1, hc, s_blk, dc),
                         lambda bb, ss, lens, win:
                         (bb, 0, blk_idx(bb, ss, lens, win), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, s_blk),
                         lambda bb, ss, lens, win:
                         (bb, 0, blk_idx(bb, ss, lens, win)),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, dh),
                             lambda bb, ss, lens, win: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_specs[0], kv_specs[1], kv_specs[0], kv_specs[1],
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, rep, dh),
                lambda bb, ss, lens, win: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        args = (lengths, jnp.asarray(window, jnp.int32).reshape(1),
                qg, k_codes, k_scale, v_codes, v_scale)
    elif not windowed:
        kv_specs = [
            pl.BlockSpec((1, 1, hc, s_blk, dc),
                         lambda bb, ss, lr, lens:
                         (lr[0], bb, 0, last_blk(bb, ss, lens), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, s_blk),
                         lambda bb, ss, lr, lens:
                         (lr[0], bb, 0, last_blk(bb, ss, lens)),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # layer, lengths
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, dh),
                             lambda bb, ss, lr, lens: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_specs[0], kv_specs[1], kv_specs[0], kv_specs[1],
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, rep, dh),
                lambda bb, ss, lr, lens: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        base = kern

        def kern_p(lr_ref, *rest):
            del lr_ref
            return base(*rest)

        kern = kern_p
        lr = jnp.asarray(layer, jnp.int32).reshape(1)
        args = (lr, lengths, qg, k_codes, k_scale, v_codes, v_scale)
    else:
        # stacked + windowed: (layer, lengths, window) prefetch
        kv_specs = [
            pl.BlockSpec((1, 1, hc, s_blk, dc),
                         lambda bb, ss, lr, lens, win:
                         (lr[0], bb, 0, blk_idx(bb, ss, lens, win), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, s_blk),
                         lambda bb, ss, lr, lens, win:
                         (lr[0], bb, 0, blk_idx(bb, ss, lens, win)),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, dh),
                             lambda bb, ss, lr, lens, win: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_specs[0], kv_specs[1], kv_specs[0], kv_specs[1],
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, rep, dh),
                lambda bb, ss, lr, lens, win: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        base = kern

        def kern_p(lr_ref, *rest):
            del lr_ref
            return base(*rest)

        kern = kern_p
        lr = jnp.asarray(layer, jnp.int32).reshape(1)
        args = (lr, lengths, jnp.asarray(window, jnp.int32).reshape(1),
                qg, k_codes, k_scale, v_codes, v_scale)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, hq, dh)
