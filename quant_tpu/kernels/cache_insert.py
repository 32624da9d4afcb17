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

__all__ = ["cache_insert_int8", "paged_cache_insert_int8",
           "mla_cache_insert_int8"]

_ROWS = 8     # int8 sublane tile along S
_LANES = 128  # f32 lane tile along S


def _kernel(lr_ref, len_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
            kc_in, ks_in, vc_in, vs_in,
            kc_ref, ks_ref, vc_ref, vs_ref,
            *scratch, s_loc, b, wave, d, q, m=1):
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
    # per-wave-slot rank-3 scratch tiles (whole-buffer DMA destinations:
    # Mosaic rejects sliced rank-4 scratch dsts for sub-128-lane code
    # dims) + the [wave, 4] DMA semaphore array
    sems = scratch[-1]
    ktiles = scratch[0:wave]
    vtiles = scratch[wave:2 * wave]
    kstiles = scratch[2 * wave:3 * wave]
    vstiles = scratch[3 * wave:4 * wave]
    lr = lr_ref[0]
    s0 = lr_ref[1]
    crows = ktiles[0].shape[1]
    srows = kstiles[0].shape[1]

    def pos_of(i):
        rel = len_ref[i] - s0
        owned = (rel >= 0) & (rel < s_loc)
        return jnp.where(owned, rel, 0), owned

    def copies(i, to_vmem):
        pos, _ = pos_of(i)
        w = i % wave
        row = pos // q   # row in the [.., S/q, lanes] (lane) view
        cbase = pl.multiple_of((row // crows) * crows, crows)
        sbase = pl.multiple_of((pos // srows) * srows, srows)
        pairs = [
            (kc_ref.at[lr, i, :, pl.ds(cbase, crows)], ktiles[w]),
            (vc_ref.at[lr, i, :, pl.ds(cbase, crows)], vtiles[w]),
            (ks_ref.at[lr, i, :, pl.ds(sbase, srows)], kstiles[w]),
            (vs_ref.at[lr, i, :, pl.ds(sbase, srows)], vstiles[w]),
        ]
        out = []
        for j, (hbm, vm) in enumerate(pairs):
            src, dst = (hbm, vm) if to_vmem else (vm, hbm)
            out.append(pltpu.make_async_copy(src, dst, sems.at[w, j]))
        return out

    def modify(i):
        pos, owned = pos_of(i)
        w = i % wave
        row = pos // q
        roff = row - (row // crows) * crows
        lsel = pos - row * q          # which d-wide lane slot of the row
        soff = pos - (pos // srows) * srows
        # codes RMW in the [H, crows, 128] lane view: the new row (lane-
        # tiled to 128 by the dispatcher) selects on (row, lane-slot);
        # for d = m*128 (e.g. Gemma's head_dim 256) the token spans m
        # consecutive rows and the new data arrives [H, m, 128]
        # codes RMW: for d >= 128 the tile lanes span the whole d (one
        # token per row, lanes//d == 0 == lsel); for d < 128 the lane
        # view packs q tokens per 128-lane row
        for new_ref, tile in ((kn_ref, ktiles[w]), (vn_ref, vtiles[w])):
            rows_i = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 2)
            sel = (rows_i == roff) & (lanes // d == lsel) & owned
            tile[:] = jnp.where(sel, new_ref[i], tile[:])
        for new_ref, tile in ((ksn_ref, kstiles[w]), (vsn_ref, vstiles[w])):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
            tile[:] = jnp.where((ids == soff) & owned, new_ref[i], tile[:])

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
    l, s_loc = kc.shape[0], kc.shape[3]
    h, d = k_new.shape[2], k_new.shape[3]   # code heads (Hkv/2 for int4)
    hs = k_s.shape[2]                       # scale heads = REAL Hkv
    # Mosaic DMA slices need the code minor dim 128-aligned (measured: 64
    # and 32 fail "must be aligned to tiling"). View the codes in a
    # flattened [.., S*d/128, 128] lane layout — a free bitcast — with q
    # tokens per 128-lane row; the kernel selects (row, lane-slot) and the
    # new rows arrive lane-tiled q times.
    if d < _LANES:
        if _LANES % d:
            raise ValueError(f"code dim {d} must divide {_LANES}")
        q, m, lanes_d = _LANES // d, 1, _LANES
    else:
        # d a 128 multiple (head_dim 128, or Gemma's 256): NO lane view
        # needed — the minor dim is already DMA-aligned, so the RMW
        # tiles slice [.., S, d] directly (the d<128 lane view exists
        # only because Mosaic rejects sub-128 minor slices)
        if d % _LANES:
            raise ValueError(f"code dim {d} must be a multiple of "
                             f"{_LANES}")
        q, m, lanes_d = 1, 1, d
    if s_loc % q:
        raise ValueError(f"S per shard ({s_loc}) must divide by {q}")
    rv = s_loc // q                      # code rows in the (lane) view
    crows = _ROWS if rv % _ROWS == 0 else rv
    srows = s_loc if s_loc < _LANES else _LANES
    if s_loc % srows or rv % crows:
        raise ValueError(
            f"max_seq per shard ({s_loc}) must divide by {_LANES} (or be "
            f"smaller than it) for aligned RMW tiles")

    lr = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(s0, jnp.int32)])

    wave = min(b, 12)  # <= 48 outstanding DMAs per wave
    kcv = kc.reshape(l, b, h, rv, lanes_d)
    vcv = vc.reshape(l, b, h, rv, lanes_d)
    k_new = jnp.tile(k_new.transpose(0, 2, 1, 3), (1, 1, 1, q))
    v_new = jnp.tile(v_new.transpose(0, 2, 1, 3), (1, 1, 1, q))
    k_s = k_s.transpose(0, 2, 1)          # [B, H, 1]
    v_s = v_s.transpose(0, 2, 1)
    kern = functools.partial(_kernel, s_loc=s_loc, b=b, wave=wave, d=d,
                             q=q, m=m)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b,), lambda g, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, h, 1, lanes_d), lambda g, lr: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs, 1), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h, 1, lanes_d), lambda g, lr: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs, 1), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=(
            [pltpu.VMEM((h, crows, lanes_d), kc.dtype)
             for _ in range(wave)]
            + [pltpu.VMEM((h, crows, lanes_d), vc.dtype)
               for _ in range(wave)]
            + [pltpu.VMEM((hs, srows), ks.dtype) for _ in range(wave)]
            + [pltpu.VMEM((hs, srows), vs.dtype) for _ in range(wave)]
            + [pltpu.SemaphoreType.DMA((wave, 4))]
        ),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in (kcv, ks, vcv, vs)
    )
    # args: (lr, lengths, kn, ksn, vn, vsn, kc, ks, vc, vs); aliases map the
    # cache inputs (indices 6..9 incl. the scalar-prefetch arg) to outputs.
    kco, kso, vco, vso = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lr, lengths, k_new, k_s, v_new, v_s, kcv, ks, vcv, vs)
    return (kco.reshape(kc.shape), kso, vco.reshape(vc.shape), vso)


def _paged_kernel(lr_ref, pt_ref, len_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
                  kc_in, ks_in, vc_in, vs_in,
                  kc_ref, ks_ref, vc_ref, vs_ref,
                  *scratch, page, cap, b, wave, d, q, m=1):
    # single-program batched-DMA structure — see _kernel above
    del kc_in, ks_in, vc_in, vs_in
    sems = scratch[-1]
    ktiles = scratch[0:wave]
    vtiles = scratch[wave:2 * wave]
    kstiles = scratch[2 * wave:3 * wave]
    vstiles = scratch[3 * wave:4 * wave]
    lr = lr_ref[0]
    crows = ktiles[0].shape[1]
    srows = kstiles[0].shape[1]

    def pos_of(i):
        pos = len_ref[i]
        owned = (pos >= 0) & (pos < cap)
        pos = jnp.where(owned, pos, 0)
        # finished slots park at the reserved scratch page via row 0
        pg = pt_ref[i, pos // page]
        return pos % page, pg, owned

    def copies(i, to_vmem):
        off, pg, _ = pos_of(i)
        w = i % wave
        row = off // q   # (lane-)view row — see _kernel.copies
        cbase = pl.multiple_of((row // crows) * crows, crows)
        sbase = pl.multiple_of((off // srows) * srows, srows)
        pairs = [
            (kc_ref.at[lr, pg, :, pl.ds(cbase, crows)], ktiles[w]),
            (vc_ref.at[lr, pg, :, pl.ds(cbase, crows)], vtiles[w]),
            (ks_ref.at[lr, pg, :, pl.ds(sbase, srows)], kstiles[w]),
            (vs_ref.at[lr, pg, :, pl.ds(sbase, srows)], vstiles[w]),
        ]
        out = []
        for j, (hbm, vm) in enumerate(pairs):
            src, dst = (hbm, vm) if to_vmem else (vm, hbm)
            out.append(pltpu.make_async_copy(src, dst, sems.at[w, j]))
        return out

    def modify(i):
        off, _, owned = pos_of(i)
        w = i % wave
        row = off // q
        roff = row - (row // crows) * crows
        lsel = off - row * q
        soff = off - (off // srows) * srows
        # lane-view codes RMW — see _kernel.modify
        for new_ref, tile in ((kn_ref, ktiles[w]), (vn_ref, vtiles[w])):
            rows_i = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 2)
            sel = (rows_i == roff) & (lanes // d == lsel) & owned
            tile[:] = jnp.where(sel, new_ref[i], tile[:])
        for new_ref, tile in ((ksn_ref, kstiles[w]), (vsn_ref, vstiles[w])):
            ids = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
            tile[:] = jnp.where((ids == soff) & owned, new_ref[i], tile[:])

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
    l, n_pool, page = kc.shape[0], kc.shape[1], kc.shape[3]
    cap = page_tbl.shape[1] * page
    h, d = k_new.shape[2], k_new.shape[3]   # code heads (Hkv/2 for int4)
    hs = k_s.shape[2]                       # scale heads = REAL Hkv
    if d < _LANES:
        if _LANES % d:
            raise ValueError(f"code dim {d} must divide {_LANES}")
        q, m, lanes_d = _LANES // d, 1, _LANES
    else:
        if d % _LANES:
            raise ValueError(f"code dim {d} must be a multiple of "
                             f"{_LANES}")
        q, m, lanes_d = 1, 1, d   # direct view — see cache_insert_int8
    if page % q:
        raise ValueError(f"page size {page} must divide by {q}")
    rv = page // q
    crows = _ROWS if rv % _ROWS == 0 else rv
    srows = page if page < _LANES else _LANES
    if page % srows or rv % crows:
        raise ValueError(f"page size {page} must divide by {_LANES} (or be "
                         f"smaller than it) for aligned RMW tiles")
    lr = jnp.asarray(layer, jnp.int32).reshape(1)
    wave = min(b, 12)  # <= 48 outstanding DMAs per wave
    kcv = kc.reshape(l, n_pool, h, rv, lanes_d)
    vcv = vc.reshape(l, n_pool, h, rv, lanes_d)
    k_new = jnp.tile(k_new.transpose(0, 2, 1, 3), (1, 1, 1, q))
    v_new = jnp.tile(v_new.transpose(0, 2, 1, 3), (1, 1, 1, q))
    k_s = k_s.transpose(0, 2, 1)          # [B, H, 1]
    v_s = v_s.transpose(0, 2, 1)
    kern = functools.partial(_paged_kernel, page=page, cap=cap, b=b,
                             wave=wave, d=d, q=q, m=m)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer, page table
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b,), lambda g, lr, pt: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, h, 1, lanes_d),
                         lambda g, lr, pt: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs, 1), lambda g, lr, pt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h, 1, lanes_d),
                         lambda g, lr, pt: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, hs, 1), lambda g, lr, pt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=(
            [pltpu.VMEM((h, crows, lanes_d), kc.dtype)
             for _ in range(wave)]
            + [pltpu.VMEM((h, crows, lanes_d), vc.dtype)
               for _ in range(wave)]
            + [pltpu.VMEM((hs, srows), ks.dtype) for _ in range(wave)]
            + [pltpu.VMEM((hs, srows), vs.dtype) for _ in range(wave)]
            + [pltpu.SemaphoreType.DMA((wave, 4))]
        ),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(a.shape, a.dtype)
        for a in (kcv, ks, vcv, vs)
    )
    # args: (lr, pt, lengths, kn, ksn, vn, vsn, kc, ks, vc, vs); aliases
    # map the pool inputs (7..10, counting both prefetch args) to outputs.
    kco, kso, vco, vso = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lr, page_tbl, lengths, k_new, k_s, v_new, v_s, kcv, ks, vcv, vs)
    return (kco.reshape(kc.shape), kso, vco.reshape(vc.shape), vso)


def _mla_kernel(lr_ref, len_ref, kn_ref, ksn_ref, kc_in, ks_in,
                kc_ref, ks_ref, *scratch, s_loc, b, wave):
    """MLA latent insert: one [r+dr]-wide int8 row + one f32 scale per
    slot. The latent width (576 at DeepSeek geometry) is not a 128
    multiple, so the codes RMW uses FULL-minor-dim tiles sliced on the
    (sublane) S axis — no lane view needed. Same single-program
    batched-DMA wave structure as :func:`_kernel`."""
    del kc_in, ks_in
    sems = scratch[-1]
    ktiles = scratch[0:wave]
    kstiles = scratch[wave:2 * wave]
    lr = lr_ref[0]
    s0 = lr_ref[1]
    crows = ktiles[0].shape[0]
    srows = kstiles[0].shape[1]

    def pos_of(i):
        rel = len_ref[i] - s0
        owned = (rel >= 0) & (rel < s_loc)
        return jnp.where(owned, rel, 0), owned

    def copies(i, to_vmem):
        pos, _ = pos_of(i)
        w = i % wave
        cbase = pl.multiple_of((pos // crows) * crows, crows)
        sbase = pl.multiple_of((pos // srows) * srows, srows)
        pairs = [
            (kc_ref.at[lr, i, 0, pl.ds(cbase, crows)], ktiles[w]),
            (ks_ref.at[lr, i, :, pl.ds(sbase, srows)], kstiles[w]),
        ]
        out = []
        for j, (hbm, vm) in enumerate(pairs):
            src, dst = (hbm, vm) if to_vmem else (vm, hbm)
            out.append(pltpu.make_async_copy(src, dst, sems.at[w, j]))
        return out

    def modify(i):
        pos, owned = pos_of(i)
        w = i % wave
        roff = pos - (pos // crows) * crows
        soff = pos - (pos // srows) * srows
        tile = ktiles[w]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
        tile[:] = jnp.where((rows_i == roff) & owned, kn_ref[i],
                            tile[:])
        stile = kstiles[w]
        ids = jax.lax.broadcasted_iota(jnp.int32, stile.shape, 1)
        stile[:] = jnp.where((ids == soff) & owned, ksn_ref[i],
                             stile[:])

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
def mla_cache_insert_int8(
    kc, ks,           # stacked latent cache [L, B, 1, S, Dq] / [L, B, 1, S]
    k_new, k_s,       # [B, 1, 1, Dq] int8 / [B, 1, 1] f32 (decode T=1)
    lengths,          # [B] int32 — write position per slot
    layer,            # traced layer index
    s0=0,             # this shard's S offset (sequence sharding)
    *,
    interpret: bool = False,
):
    """Returns (kc, ks) with the new latent row written in place (the V
    side of an MLA cache is zero-width — nothing to insert)."""
    b, t = k_new.shape[0], k_new.shape[1]
    if t != 1:
        raise ValueError("mla_cache_insert_int8 is the decode (T=1) path")
    s_loc = kc.shape[3]
    crows = _ROWS if s_loc % _ROWS == 0 else s_loc
    srows = s_loc if s_loc < _LANES else _LANES
    if s_loc % srows or s_loc % crows:
        raise ValueError(
            f"max_seq per shard ({s_loc}) must divide by {_LANES} (or be "
            f"smaller than it) for aligned RMW tiles")
    dq = kc.shape[4]
    lr = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(s0, jnp.int32)])
    wave = min(b, 12)
    k_new = k_new.reshape(b, 1, dq)       # [B, 1(row), Dq]
    k_s = k_s.reshape(b, 1, 1)
    kern = functools.partial(_mla_kernel, s_loc=s_loc, b=b, wave=wave)
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b,), lambda g, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1, dq), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1), lambda g, lr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec()),
        scratch_shapes=(
            [pltpu.VMEM((crows, dq), kc.dtype) for _ in range(wave)]
            + [pltpu.VMEM((1, srows), ks.dtype) for _ in range(wave)]
            + [pltpu.SemaphoreType.DMA((wave, 2))]
        ),
    )
    out_shape = (jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                 jax.ShapeDtypeStruct(ks.shape, ks.dtype))
    # args: (lr, lengths, kn, ksn, kc, ks); aliases map the cache inputs
    # (indices 4..5 incl. the scalar-prefetch arg) to the outputs.
    kco, kso = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lr, lengths, k_new, k_s, kc, ks)
    return kco, kso
