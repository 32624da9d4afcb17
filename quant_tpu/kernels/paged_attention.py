"""Paged INT8-KV flash-decode attention (SURVEY.md §2.2 #5/#15, VERDICT r1
#4: paged/block KV layout for continuous batching).

The KV cache lives in a PAGE POOL shared by all slots:

    pool codes  int8 [L, P, Hkv, page, Dh]
    pool scales f32  [L, P, Hkv, page]

and each slot owns an ordered list of page ids ``page_tbl int32
[B, max_pages]`` (vLLM-style block table, allocated by the engine's
free-list allocator). HBM is bounded by USED pages, not
slots × max_seq — the single biggest batch-size lever on one chip.

Kernel design (TPU-first):
* grid (B, max_pages); the page id for grid step (b, s) comes from the
  SCALAR-PREFETCHED page table inside the BlockSpec index map — the same
  mechanism the stacked-layer kernels use for the layer index, so the
  pool is never gathered/copied.
* blocks past a slot's length are CLAMPED to the slot's last used page in
  the index map: consecutive grid steps then map to the same block and
  Mosaic skips the re-fetch, so HBM traffic scales with the actual
  context length (same trick as the contiguous kernel's @pl.when skip,
  but working through the table indirection).
* online softmax state in VMEM scratch; per-token scales applied to the
  [rep, page] logits/probs (exact — they factor out of the Dh dot).

The XLA reference (:func:`paged_attention_reference`) gathers the slot's
pages into a contiguous view — O(S) copies per call, fine for tests and
CPU, never the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["paged_flash_decode_int8", "paged_attention_reference",
           "paged_gather"]


def _kernel(lr_ref, len_ref, pt_ref, *refs, page, n_pages, scale, hkv,
            rep, kv4=False, prec=None, windowed=False, softcap=0.0):
    del lr_ref, pt_ref
    if windowed:
        win_ref, refs = refs[0], refs[1:]
    (q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
     o_ref, m_ref, l_ref, acc_ref) = refs
    s_idx = pl.program_id(1)
    b = pl.program_id(0)
    length = len_ref[b]
    start = s_idx * page
    stride = max(rep, 8)
    if windowed:
        # sliding window at decode: valid keys are [length-window, length)
        # (window <= 0 = full causal). Pre-window pages are both clamped
        # in the index maps (no DMA) and compute-skipped here.
        w = win_ref[0]
        wstart = jnp.where(w > 0, jnp.maximum(length - w, 0), 0)
        run = (start < length) & (start + page > wstart)
    else:
        wstart = 0
        run = start < length

    def dq_pair(tile):
        # int4 KV: head-pair nibble unpack via int32 (see
        # attention.py dq_pair / llama._kv_code_dims)
        if not kv4:
            return tile.astype(jnp.float32), None
        wi = tile.astype(jnp.int32)
        return (((wi & 0xF) - 8).astype(jnp.float32),
                ((wi >> 4) - 8).astype(jnp.float32))

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(run)
    def _():
        # Batched dots over the head dim — same r4 rewrite as
        # attention.py._kernel (the per-head loop's tiny-dot issue
        # latencies halved the kernel's bandwidth; see that docstring).
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
        q = q_ref[0].astype(jnp.float32) * scale       # [hkv, rep, Dh]
        klo, khi = dq_pair(kc_ref[0, 0])             # [hkv(/2), page, Dh]
        if khi is None:
            logits = dot_k(q, klo)                     # [hkv, rep, page]
        else:
            q2 = q.reshape(hkv // 2, 2, rep, q.shape[2])
            logits = jnp.stack(
                [dot_k(q2[:, 0], klo), dot_k(q2[:, 1], khi)],
                axis=1).reshape(hkv, rep, page)
        logits = logits * ks_ref[0, 0][:, None, :]
        if softcap:
            # Gemma-2 logit softcapping; BEFORE the mask (tanh would
            # saturate -1e30 to -cap) — mirrors llama._softcap_scores
            logits = softcap * jnp.tanh(logits / softcap)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        ok = pos < length
        if windowed:
            ok &= pos >= wstart
        logits = jnp.where(ok, logits, -1e30)

        m_prev = m_ref[:, :rep, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                    # [hkv, rep, page]
        l_new = (alpha * l_ref[:, :rep, :1]
                 + jnp.sum(p, axis=2, keepdims=True))
        vlo, vhi = dq_pair(vc_ref[0, 0])
        ps = p * vs_ref[0, 0][:, None, :]
        if vhi is None:
            pv = dot_v(ps, vlo)                        # [hkv, rep, Dh]
        else:
            ps2 = ps.reshape(hkv // 2, 2, rep, page)
            pv = jnp.stack(
                [dot_v(ps2[:, 0], vlo), dot_v(ps2[:, 1], vhi)],
                axis=1).reshape(hkv, rep, vlo.shape[2])
        acc_ref[:, :rep] = acc_ref[:, :rep] * alpha + pv
        m_ref[:, :rep] = jnp.broadcast_to(m_new, m_ref[:, :rep].shape)
        l_ref[:, :rep] = jnp.broadcast_to(l_new, l_ref[:, :rep].shape)

    @pl.when(s_idx == n_pages - 1)
    def _():
        out = acc_ref[:, :rep] / jnp.maximum(l_ref[:, :rep, :1], 1e-20)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "softcap", "scale"))
def paged_flash_decode_int8(
    q: jax.Array,         # [B, Hq, Dh] (decode step, T=1)
    pool_kc: jax.Array,   # int8 [L, P, Hkv, page, Dh]
    pool_ks: jax.Array,   # f32  [L, P, Hkv, page]
    pool_vc: jax.Array,
    pool_vs: jax.Array,
    page_tbl: jax.Array,  # int32 [B, max_pages]
    lengths: jax.Array,   # int32 [B] — valid length per slot
    layer,                # traced layer index
    window=None,          # traced int32 sliding window (<=0 = full causal)
    *,
    interpret: bool = False,
    precision: str = "default",
    softcap: float = 0.0,        # Gemma-2 tanh logit softcap (0 = off)
    scale: float | None = None,  # q scale; default 1/sqrt(Dh)
) -> jax.Array:
    """Returns attention output [B, Hq, Dh] (q.dtype). ``precision``
    as in :func:`quant_tpu.kernels.attention.flash_decode_int8`.

    With ``window`` the page index maps clamp BOTH ends: pages fully
    below ``length - window`` map to the first in-window page (repeated
    block index → no DMA, same trick as the past-the-end clamp), so HBM
    traffic scales with min(window, context)."""
    b, hq, dh = q.shape
    _, _, hc, page, dc = pool_kc.shape   # hc = Hkv, or Hkv/2 int4-packed
    hkv = pool_ks.shape[2]               # scales are per REAL head
    kv4 = hc != hkv
    n_pages = page_tbl.shape[1]
    rep = hq // hkv
    qg = q.reshape(b, hkv, rep, dh)
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    windowed = window is not None

    def page_idx(bb, ss, lens, win):
        # clamp past-the-end pages to the slot's LAST used page (and,
        # windowed, pre-window pages to the first in-window page):
        # repeated block index → Mosaic skips the DMA, so cost scales
        # with the actual (windowed) context
        last = jnp.maximum(lens[bb] - 1, 0) // page
        ss = jnp.minimum(ss, last)
        if win is not None:
            w = win[0]
            first = jnp.where(
                w > 0, jnp.maximum(lens[bb] - w, 0), 0) // page
            ss = jnp.maximum(ss, first)
        return ss

    if windowed:
        def kv_map(bb, ss, lr, lens, pt, win):
            return (lr[0], pt[bb, page_idx(bb, ss, lens, win)], 0, 0, 0)

        def kv_map_s(bb, ss, lr, lens, pt, win):
            return (lr[0], pt[bb, page_idx(bb, ss, lens, win)], 0, 0)

        def q_map(bb, ss, lr, lens, pt, win):
            return (bb, 0, 0, 0)
    else:
        def kv_map(bb, ss, lr, lens, pt):
            return (lr[0], pt[bb, page_idx(bb, ss, lens, None)], 0, 0, 0)

        def kv_map_s(bb, ss, lr, lens, pt):
            return (lr[0], pt[bb, page_idx(bb, ss, lens, None)], 0, 0)

        def q_map(bb, ss, lr, lens, pt):
            return (bb, 0, 0, 0)

    kern = functools.partial(
        _kernel, page=page, n_pages=n_pages,
        scale=(scale if scale is not None else 1.0 / (dh ** 0.5)),
        hkv=hkv, rep=rep, kv4=kv4,
        prec=jax.lax.Precision(precision),
        windowed=windowed, softcap=float(softcap),
    )
    stride = max(rep, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # layer, lengths, page table (+ window)
        num_scalar_prefetch=4 if windowed else 3,
        grid=(b, n_pages),
        in_specs=[
            pl.BlockSpec((1, hkv, rep, dh), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hc, page, dc), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, page), kv_map_s,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hc, page, dc), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, page), kv_map_s,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, rep, dh), q_map,
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hkv, stride, 128), jnp.float32),
            pltpu.VMEM((hkv, stride, 128), jnp.float32),
            pltpu.VMEM((hkv, stride, dh), jnp.float32),
        ],
    )
    wargs = ((jnp.asarray(window, jnp.int32).reshape(1),)
             if windowed else ())
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lr, lengths, page_tbl, *wargs, qg, pool_kc, pool_ks, pool_vc,
      pool_vs)
    return out.reshape(b, hq, dh)


def paged_gather(pool, page_tbl, layer):
    """Gather a slot-contiguous [B, Hkv, S_max, ...] view of one layer's
    pages (XLA reference/prefill path — O(S) copy per call)."""
    lay = jax.lax.dynamic_index_in_dim(pool, layer, 0, False)
    g = lay[page_tbl]                       # [B, n_pages, Hkv, page, ...]
    g = jnp.moveaxis(g, 2, 1)               # [B, Hkv, n_pages, page, ...]
    b, hkv, n_pages, page = g.shape[:4]
    return g.reshape(b, hkv, n_pages * page, *g.shape[4:])


def paged_attention_reference(q, pool_kc, pool_ks, pool_vc, pool_vs,
                              page_tbl, lengths, layer):
    """XLA paged decode attention via page gather (test oracle).
    int4-packed pools (head dim = Hkv/2) are unpacked via dequant_kv."""
    from quant_tpu.models import llama

    kc = paged_gather(pool_kc, page_tbl, layer)
    ks = paged_gather(pool_ks, page_tbl, layer)
    vc = paged_gather(pool_vc, page_tbl, layer)
    vs = paged_gather(pool_vs, page_tbl, layer)
    if kc.shape[1] != ks.shape[1]:   # head-pair int4 pool
        kc = llama.dequant_kv(kc, 4)
        vc = llama.dequant_kv(vc, 4)
    positions = (lengths - 1)[:, None]
    return llama.attention(q[:, None], kc, ks, vc, vs, positions, lengths,
                           None)[:, 0]
