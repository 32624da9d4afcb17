"""In-place KV-cache insert Pallas kernel (aliased, zero-copy).

Writes the decode step's new K/V rows into the stacked [L, B, H, S, D]
int8 cache at per-slot positions — with ``input_output_aliases`` the cache
buffers pass through unchanged except for the written rows, so a chain of
insert → flash-attention → insert ... through the layer scan never copies
the cache (an XLA scatter feeding a Pallas consumer does — measured in
scripts/tpu_ablate_probe.py).

The cache's S axis is physically tiled in HBM (int8: sublane 8; the f32
scales: lane 128), so arbitrary-position single-row DMA is not expressible
— each program does an aligned read-modify-write instead: DMA the aligned
tile covering the target row into VMEM, overwrite the row with a masked
select (no dynamic sublane stores), DMA the tile back. Aligned offsets are
asserted to Mosaic with ``pl.multiple_of``. Grid (B,); T=1 (decode) per
call — the engine's chunked prefill uses the XLA scatter path instead.
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
            ctile, stile, sems, *, s_loc):
    # cache inputs are aliased to the outputs — write through the output
    # refs; the input refs exist only to satisfy the aliasing contract
    del kc_in, ks_in, vc_in, vs_in
    b = pl.program_id(0)
    lr = lr_ref[0]
    s0 = lr_ref[1]
    rel = len_ref[b] - s0

    @pl.when((rel >= 0) & (rel < s_loc))
    def _():
        pos = jnp.maximum(rel, 0)

        def rmw(new_ref, cache_ref, tile, rows, sem, is_codes):
            base = pl.multiple_of((pos // rows) * rows, rows)
            off = pos - base
            rd = pltpu.make_async_copy(
                cache_ref.at[lr, b, :, pl.ds(base, rows)], tile, sem)
            rd.start()
            rd.wait()
            if is_codes:
                row_ids = jax.lax.broadcasted_iota(
                    jnp.int32, tile.shape, 1)            # [H, rows, D]
                new = new_ref[0, 0][:, None, :]          # [H, 1, D]
                tile[:] = jnp.where(row_ids == off, new, tile[:])
            else:
                col_ids = jax.lax.broadcasted_iota(
                    jnp.int32, tile.shape, 1)            # [H, rows]
                new = new_ref[0, 0][:, None]             # [H, 1]
                tile[:] = jnp.where(col_ids == off, new, tile[:])
            wr = pltpu.make_async_copy(
                tile, cache_ref.at[lr, b, :, pl.ds(base, rows)], sem)
            wr.start()
            wr.wait()

        rmw(kn_ref, kc_ref, ctile, ctile.shape[1], sems.at[0], True)
        rmw(vn_ref, vc_ref, ctile, ctile.shape[1], sems.at[1], True)
        rmw(ksn_ref, ks_ref, stile, stile.shape[1], sems.at[2], False)
        rmw(vsn_ref, vs_ref, stile, stile.shape[1], sems.at[3], False)


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

    kern = functools.partial(_kernel, s_loc=s_loc)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b,), lambda bb, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, d), lambda bb, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda bb, lr: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, d), lambda bb, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda bb, lr: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=[
            pltpu.VMEM((h, crows, d), kc.dtype),
            pltpu.VMEM((h, srows), ks.dtype),
            pltpu.SemaphoreType.DMA((4,)),
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
                  ctile, stile, sems, *, page, cap):
    del kc_in, ks_in, vc_in, vs_in
    b = pl.program_id(0)
    lr = lr_ref[0]
    pos = len_ref[b]

    @pl.when((pos >= 0) & (pos < cap))
    def _():
        pg = pt_ref[b, pos // page]
        off = pos % page

        def rmw(new_ref, cache_ref, tile, rows, sem, is_codes):
            base = pl.multiple_of((off // rows) * rows, rows)
            rel = off - base
            rd = pltpu.make_async_copy(
                cache_ref.at[lr, pg, :, pl.ds(base, rows)], tile, sem)
            rd.start()
            rd.wait()
            if is_codes:
                row_ids = jax.lax.broadcasted_iota(
                    jnp.int32, tile.shape, 1)            # [H, rows, D]
                new = new_ref[0, 0][:, None, :]
                tile[:] = jnp.where(row_ids == rel, new, tile[:])
            else:
                col_ids = jax.lax.broadcasted_iota(
                    jnp.int32, tile.shape, 1)            # [H, rows]
                new = new_ref[0, 0][:, None]
                tile[:] = jnp.where(col_ids == rel, new, tile[:])
            wr = pltpu.make_async_copy(
                tile, cache_ref.at[lr, pg, :, pl.ds(base, rows)], sem)
            wr.start()
            wr.wait()

        rmw(kn_ref, kc_ref, ctile, ctile.shape[1], sems.at[0], True)
        rmw(vn_ref, vc_ref, ctile, ctile.shape[1], sems.at[1], True)
        rmw(ksn_ref, ks_ref, stile, stile.shape[1], sems.at[2], False)
        rmw(vsn_ref, vs_ref, stile, stile.shape[1], sems.at[3], False)


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
    kern = functools.partial(_paged_kernel, page=page, cap=cap)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, page table
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b,), lambda bb, lr, pt: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, d), lambda bb, lr, pt: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda bb, lr, pt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, d), lambda bb, lr, pt: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda bb, lr, pt: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=[
            pltpu.VMEM((h, crows, d), kc.dtype),
            pltpu.VMEM((h, srows), ks.dtype),
            pltpu.SemaphoreType.DMA((4,)),
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
