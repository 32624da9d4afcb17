"""In-place KV-cache insert Pallas kernel (aliased, zero-copy).

Writes the decode step's new K/V rows into the stacked [L, B, H, S, D]
int8 cache at per-slot positions — with ``input_output_aliases`` the cache
buffers pass through unchanged except for the written rows, so a chain of
insert → flash-attention → insert ... through the layer scan never copies
the cache (an XLA scatter feeding a Pallas consumer does — measured in
scripts/tpu_ablate_probe.py).

The cache's S axis is physically tiled in HBM (int8: sublane 8; the f32
scales: lane 128), so arbitrary-position single-row DMA is not expressible
— each slot gets an aligned read-modify-write instead: DMA the aligned
tile covering the target row into VMEM, overwrite the row with a masked
select (no dynamic sublane stores), DMA the tile back. Aligned offsets are
asserted to Mosaic with ``pl.multiple_of``. T=1 (decode) per call — the
engine's chunked prefill uses the XLA scatter path instead.

ONE program serves all B slots with BATCHED async copies (r4): the
original grid-(B,) formulation serialized 8 DMA waits per program — at
B=48 that is ~0.125 ms/layer of pure DMA latency for ~100 KB of actual
writes, the third-largest component of the whole decode step. Waves of
12 slots bound outstanding DMAs at 48.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cache_insert_int8", "paged_cache_insert_int8"]

_ROWS = 8     # int8 sublane tile along S
_LANES = 128  # f32 lane tile along S


def _kernel(lr_ref, len_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
            kc_in, ks_in, vc_in, vs_in,
            kc_ref, ks_ref, vc_ref, vs_ref,
            ktile, vtile, kstile, vstile, sems, *, s_loc, b, wave):
    # cache inputs are aliased to the outputs — write through the output
    # refs; the input refs exist only to satisfy the aliasing contract.
    #
    # ONE program for all B slots (r4 rewrite): the old grid-(B,) kernel
    # serialized 8 DMA waits per program x 48 programs (~0.125 ms/layer
    # of pure latency for ~100 KB of writes). Here every slot's 4
    # read-modify-writes run as BATCHED async copies in waves: all reads
    # of a wave start together, then modify, then all writes start;
    # waves bound the number of outstanding DMAs.
    del kc_in, ks_in, vc_in, vs_in
    lr = lr_ref[0]
    s0 = lr_ref[1]
    crows = ktile.shape[2]
    srows = kstile.shape[2]

    def pos_of(i):
        rel = len_ref[i] - s0
        owned = (rel >= 0) & (rel < s_loc)
        return jnp.where(owned, rel, 0), owned

    def copies(i, to_vmem):
        pos, _ = pos_of(i)
        cbase = pl.multiple_of((pos // crows) * crows, crows)
        sbase = pl.multiple_of((pos // srows) * srows, srows)
        pairs = [
            (kc_ref.at[lr, i, :, pl.ds(cbase, crows)], ktile.at[i]),
            (vc_ref.at[lr, i, :, pl.ds(cbase, crows)], vtile.at[i]),
            (ks_ref.at[lr, i, :, pl.ds(sbase, srows)], kstile.at[i]),
            (vs_ref.at[lr, i, :, pl.ds(sbase, srows)], vstile.at[i]),
        ]
        out = []
        for j, (hbm, vm) in enumerate(pairs):
            src, dst = (hbm, vm) if to_vmem else (vm, hbm)
            out.append(pltpu.make_async_copy(src, dst, sems.at[i % wave, j]))
        return out

    def modify(i):
        pos, owned = pos_of(i)
        coff = pos - (pos // crows) * crows
        soff = pos - (pos // srows) * srows
        for new_ref, tile, off in ((kn_ref, ktile, coff),
                                   (vn_ref, vtile, coff)):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape[1:], 1)
            new = new_ref[i, 0][:, None, :]               # [H, 1, D]
            tile[i] = jnp.where((ids == off) & owned, new, tile[i])
        for new_ref, tile, off in ((ksn_ref, kstile, soff),
                                   (vsn_ref, vstile, soff)):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape[1:], 1)
            new = new_ref[i, 0][:, None]                  # [H, 1]
            tile[i] = jnp.where((ids == off) & owned, new, tile[i])

    for w0 in range(0, b, wave):
        lane = range(w0, min(w0 + wave, b))
        reads = [c for i in lane for c in copies(i, True)]
        for c in reads:
            c.start()
        for c in reads:
            c.wait()
        for i in lane:
            modify(i)
        writes = [c for i in lane for c in copies(i, False)]
        for c in writes:
            c.start()
        for c in writes:
            c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_insert_int8(
    kc, ks, vc, vs,        # stacked caches [L, B, H, S, D] / [L, B, H, S]
    k_new, k_s, v_new, v_s,  # [B, 1, H, D] int8 / [B, 1, H] f32 (T=1)
    lengths,               # [B] int32 — write position per slot
    layer,                 # traced layer index
    s0=0,                  # this shard's S offset (sequence sharding)
    *,
    interpret: bool = False,
):
    """Returns the four cache arrays with the new row written in place."""
    b, t = k_new.shape[0], k_new.shape[1]
    if t != 1:
        raise ValueError("cache_insert_int8 is the decode (T=1) path")
    s_loc = kc.shape[3]
    crows = _ROWS if s_loc % _ROWS == 0 else s_loc
    srows = s_loc if s_loc < _LANES else _LANES
    if s_loc % srows or s_loc % crows:
        raise ValueError(
            f"max_seq per shard ({s_loc}) must divide by {_LANES} (or be "
            f"smaller than it) for aligned RMW tiles")
    h, d = k_new.shape[2], k_new.shape[3]

    lr = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(s0, jnp.int32)])

    wave = min(b, 12)  # <= 48 outstanding DMAs per wave
    kern = functools.partial(_kernel, s_loc=s_loc, b=b, wave=wave)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b,), lambda g, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, h, d), lambda g, lr: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h, d), lambda g, lr: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=[
            pltpu.VMEM((b, h, crows, d), kc.dtype),
            pltpu.VMEM((b, h, crows, d), vc.dtype),
            pltpu.VMEM((b, h, srows), ks.dtype),
            pltpu.VMEM((b, h, srows), vs.dtype),
            pltpu.SemaphoreType.DMA((wave, 4)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (kc, ks, vc, vs)
    )
    # args: (lr, lengths, kn, ksn, vn, vsn, kc, ks, vc, vs); aliases map the
    # cache inputs (indices 6..9 incl. the scalar-prefetch arg) to outputs.
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lr, lengths, k_new, k_s, v_new, v_s, kc, ks, vc, vs)


def _paged_kernel(lr_ref, pt_ref, len_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
                  kc_in, ks_in, vc_in, vs_in,
                  kc_ref, ks_ref, vc_ref, vs_ref,
                  ktile, vtile, kstile, vstile, sems, *, page, cap, b,
                  wave):
    # single-program batched-DMA structure — see _kernel above
    del kc_in, ks_in, vc_in, vs_in
    lr = lr_ref[0]
    crows = ktile.shape[2]
    srows = kstile.shape[2]

    def pos_of(i):
        pos = len_ref[i]
        owned = (pos >= 0) & (pos < cap)
        pos = jnp.where(owned, pos, 0)
        # finished slots park at the reserved scratch page via row 0
        pg = pt_ref[i, pos // page]
        return pos % page, pg, owned

    def copies(i, to_vmem):
        off, pg, _ = pos_of(i)
        cbase = pl.multiple_of((off // crows) * crows, crows)
        sbase = pl.multiple_of((off // srows) * srows, srows)
        pairs = [
            (kc_ref.at[lr, pg, :, pl.ds(cbase, crows)], ktile.at[i]),
            (vc_ref.at[lr, pg, :, pl.ds(cbase, crows)], vtile.at[i]),
            (ks_ref.at[lr, pg, :, pl.ds(sbase, srows)], kstile.at[i]),
            (vs_ref.at[lr, pg, :, pl.ds(sbase, srows)], vstile.at[i]),
        ]
        out = []
        for j, (hbm, vm) in enumerate(pairs):
            src, dst = (hbm, vm) if to_vmem else (vm, hbm)
            out.append(pltpu.make_async_copy(src, dst, sems.at[i % wave, j]))
        return out

    def modify(i):
        off, _, owned = pos_of(i)
        coff = off - (off // crows) * crows
        soff = off - (off // srows) * srows
        for new_ref, tile, o in ((kn_ref, ktile, coff),
                                 (vn_ref, vtile, coff)):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape[1:], 1)
            new = new_ref[i, 0][:, None, :]
            tile[i] = jnp.where((ids == o) & owned, new, tile[i])
        for new_ref, tile, o in ((ksn_ref, kstile, soff),
                                 (vsn_ref, vstile, soff)):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape[1:], 1)
            new = new_ref[i, 0][:, None]
            tile[i] = jnp.where((ids == o) & owned, new, tile[i])

    for w0 in range(0, b, wave):
        lane = range(w0, min(w0 + wave, b))
        reads = [c for i in lane for c in copies(i, True)]
        for c in reads:
            c.start()
        for c in reads:
            c.wait()
        for i in lane:
            modify(i)
        writes = [c for i in lane for c in copies(i, False)]
        for c in writes:
            c.start()
        for c in writes:
            c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_cache_insert_int8(
    kc, ks, vc, vs,        # page pools [L, P, H, page, D] / [L, P, H, page]
    k_new, k_s, v_new, v_s,  # [B, 1, H, D] int8 / [B, 1, H] f32 (T=1)
    lengths,               # [B] int32 — logical write position per slot
    layer,                 # traced layer index
    page_tbl,              # int32 [B, max_pages]
    *,
    interpret: bool = False,
):
    """Paged variant of :func:`cache_insert_int8`: the write target is
    (page_tbl[b, pos//page], pos%page) in the shared pool. Positions at or
    beyond the table capacity are skipped (finished slots park at
    lengths=0 / table rows=reserved page 0, so stale slots can never
    corrupt reallocated pages)."""
    b, t = k_new.shape[0], k_new.shape[1]
    if t != 1:
        raise ValueError("paged_cache_insert_int8 is the decode (T=1) path")
    page = kc.shape[3]
    cap = page_tbl.shape[1] * page
    crows = _ROWS if page % _ROWS == 0 else page
    srows = page if page < _LANES else _LANES
    if page % srows or page % crows:
        raise ValueError(f"page size {page} must divide by {_LANES} (or be "
                         f"smaller than it) for aligned RMW tiles")
    h, d = k_new.shape[2], k_new.shape[3]
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    wave = min(b, 12)  # <= 48 outstanding DMAs per wave
    kern = functools.partial(_paged_kernel, page=page, cap=cap, b=b,
                             wave=wave)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, page table
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b,), lambda g, lr, pt: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, h, d), lambda g, lr, pt: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h), lambda g, lr, pt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h, d), lambda g, lr, pt: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, h), lambda g, lr, pt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=[
            pltpu.VMEM((b, h, crows, d), kc.dtype),
            pltpu.VMEM((b, h, crows, d), vc.dtype),
            pltpu.VMEM((b, h, srows), ks.dtype),
            pltpu.VMEM((b, h, srows), vs.dtype),
            pltpu.SemaphoreType.DMA((wave, 4)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (kc, ks, vc, vs)
    )
    # args: (lr, pt, lengths, kn, ksn, vn, vsn, kc, ks, vc, vs); aliases
    # map the pool inputs (7..10, counting both prefetch args) to outputs.
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lr, page_tbl, lengths, k_new, k_s, v_new, v_s, kc, ks, vc, vs)
