"""In-place KV-cache insert Pallas kernel (aliased, zero-copy).

Writes the decode step's new K/V rows into the stacked [L, B, H, S, D]
int8 cache at per-slot positions — with ``input_output_aliases`` the cache
buffers pass through unchanged except for the T written rows, so a chain of
insert → flash-attention → insert ... through the layer scan never copies
the cache (an XLA scatter feeding a Pallas consumer does — measured in
scripts/tpu_ablate_probe.py).

Grid (B,); each program DMAs its slot's [H, T, D] codes (and [H, T] scales)
from VMEM into the HBM-resident cache at (layer, b, :, pos_b). Skips slots
whose row range falls outside this shard's S-slice (sequence sharding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cache_insert_int8"]


def _kernel(lr_ref, len_ref, kn_ref, ksn_ref, vn_ref, vsn_ref,
            kc_in, ks_in, vc_in, vs_in,
            kc_ref, ks_ref, vc_ref, vs_ref, sems, *, t, s_loc):
    # cache inputs are aliased to the outputs — write through the output
    # refs; the input refs exist only to satisfy the aliasing contract
    del kc_in, ks_in, vc_in, vs_in
    b = pl.program_id(0)
    lr = lr_ref[0]
    s0 = lr_ref[1]
    rel = len_ref[b] - s0

    @pl.when((rel >= 0) & (rel <= s_loc - t))
    def _():
        pos = jnp.maximum(rel, 0)
        # sources are per-batch BLOCKS ([1, H, T, D]); slicing only their
        # leading (untiled) dim keeps Mosaic's tiling rules satisfied
        copies = [
            pltpu.make_async_copy(
                kn_ref.at[0], kc_ref.at[lr, b, :, pl.ds(pos, t), :],
                sems.at[0]),
            pltpu.make_async_copy(
                ksn_ref.at[0], ks_ref.at[lr, b, :, pl.ds(pos, t)],
                sems.at[1]),
            pltpu.make_async_copy(
                vn_ref.at[0], vc_ref.at[lr, b, :, pl.ds(pos, t), :],
                sems.at[2]),
            pltpu.make_async_copy(
                vsn_ref.at[0], vs_ref.at[lr, b, :, pl.ds(pos, t)],
                sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_insert_int8(
    kc, ks, vc, vs,        # stacked caches [L, B, H, S, D] / [L, B, H, S]
    k_new, k_s, v_new, v_s,  # [B, T, H, D] int8 / [B, T, H] f32
    lengths,               # [B] int32 — write position per slot
    layer,                 # traced layer index
    s0=0,                  # this shard's S offset (sequence sharding)
    *,
    interpret: bool = False,
):
    """Returns the four cache arrays with the new rows written in place."""
    b, t = k_new.shape[0], k_new.shape[1]
    s_loc = kc.shape[3]
    kn = k_new.transpose(0, 2, 1, 3)   # [B, H, T, D]
    ksn = k_s.transpose(0, 2, 1)       # [B, H, T]
    vn = v_new.transpose(0, 2, 1, 3)
    vsn = v_s.transpose(0, 2, 1)

    lr = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(s0, jnp.int32)])

    h, d = kn.shape[1], kn.shape[3]
    kern = functools.partial(_kernel, t=t, s_loc=s_loc)
    any_spec = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b,), lambda bb, lr: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, t, d), lambda bb, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t), lambda bb, lr: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, d), lambda bb, lr: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t), lambda bb, lr: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec(), any_spec(), any_spec(), any_spec(),
        ],
        out_specs=(any_spec(), any_spec(), any_spec(), any_spec()),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
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
    )(lr, lengths, kn, ksn, vn, vsn, kc, ks, vc, vs)
