"""MLA (DeepSeek) flash-decode Pallas kernel over the int8 latent cache.

Decode attention in the ABSORBED form is MQA with ONE shared latent row
per token: queries q_eff [B, H, r+dr] against cache rows [c_kv | k_rope]
(r+dr int8 codes + one f32 scale per token), and the VALUE read is a
PREFIX SLICE of the key read — out = softmax(q_eff · k) @ c_kv. That
structure is a better TPU program than GQA flash decode:

* NO head loop and NO head batching: scores are ONE [H, r+dr] x
  [r+dr, S_blk] dot and the PV pass ONE [H, S_blk] x [S_blk, r] dot —
  both square-ish MXU ops even at H=16 (V2-Lite), perfect at H=128 (V3).
* The k tile is read from HBM ONCE and feeds both dots from VMEM
  (an XLA formulation reads the f32-materialized latent twice).
* Per-token scales apply to the [H, S_blk] logits / probs (exact: one
  joint scale per cache row factors out of both contractions).

Same online-softmax block structure, stacked-layer scalar prefetch and
block-skip as kernels/attention.py. The latent width r+dr (576 at
DeepSeek geometry) is NOT a 128 multiple — blocks use the FULL minor
dim (legal; the array's physical lane padding absorbs it) and the PV
dot contracts the full width against k[:, :r] sliced at a 128-aligned
boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mla_flash_decode_int8"]


def _kernel(len_ref, q_ref, kc_ref, ks_ref, o_ref, m_ref, l_ref, acc_ref,
            *, s_blk, n_s, scale, r, stacked, prec):
    s_idx = pl.program_id(1)
    length = len_ref[pl.program_id(0)]
    start = s_idx * s_blk
    kv = (lambda ref: ref[0, 0, 0]) if stacked else (lambda ref: ref[0, 0])

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(start < length)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale     # [H, r+dr]
        kf = kv(kc_ref).astype(jnp.float32)          # [S_blk, r+dr]
        logits = jax.lax.dot_general(
            q, kf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                            # [H, S_blk]
        logits = logits * kv(ks_ref)[None, :]
        pos = start + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(pos < length, logits, -1e30)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                  # [H, S_blk]
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        ps = p * kv(ks_ref)[None, :]
        pv = jax.lax.dot_general(
            ps, kf[:, :r], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                            # [H, r]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(s_idx == n_s - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-20)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("r", "scale", "s_blk", "interpret",
                              "precision")
)
def mla_flash_decode_int8(
    q: jax.Array,        # [B, H, r+dr] absorbed queries (decode, T=1)
    k_codes: jax.Array,  # int8 [B, 1, S, r+dr] (or [L, ...] with ``layer``)
    k_scale: jax.Array,  # f32  [B, 1, S] — ONE joint scale per latent row
    lengths: jax.Array,  # int32 [B]
    layer=None,          # traced layer index for stacked caches
    *,
    r: int,              # kv_lora_rank — output / value width
    scale: float,        # score scale (1/sqrt(qk_nope + qk_rope))
    s_blk: int = 512,
    interpret: bool = False,
    precision: str = "default",
) -> jax.Array:
    """Returns the latent attention output [B, H, r] (q.dtype)."""
    stacked = k_codes.ndim == 5
    b, h, dq = q.shape
    s = k_codes.shape[-2]
    if not interpret and r % 128:
        raise ValueError(f"kv_lora_rank {r} must be a 128 multiple "
                         "(MXU lane slice of the latent tile); interpret "
                         "mode accepts any r for tiny-shape tests")
    if s % s_blk:
        s_blk = s if s < s_blk else max(
            g for g in range(32, s_blk + 1, 32) if s % g == 0
        )
    if not interpret and s_blk != s and s_blk % 128:
        legal = [g for g in range(128, s + 1, 128) if s % g == 0]
        below = [g for g in legal if g <= s_blk]
        s_blk = max(below) if below else (min(legal) if legal else s)
    n_s = s // s_blk

    kern = functools.partial(
        _kernel, s_blk=s_blk, n_s=n_s, scale=scale, r=r,
        stacked=stacked, prec=jax.lax.Precision(precision),
    )
    scratch = [
        pltpu.VMEM((h, 128), jnp.float32),
        pltpu.VMEM((h, 128), jnp.float32),
        pltpu.VMEM((h, r), jnp.float32),
    ]
    out_shape = jax.ShapeDtypeStruct((b, h, r), q.dtype)
    if not stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((b,), lambda bb, ss: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, dq), lambda bb, ss: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_blk, dq),
                             lambda bb, ss: (bb, 0, ss, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s_blk), lambda bb, ss: (bb, 0, ss),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, r), lambda bb, ss: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        args = (lengths, q, k_codes, k_scale)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_s),
            in_specs=[
                pl.BlockSpec((b,), lambda bb, ss, lr: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, h, dq), lambda bb, ss, lr: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, s_blk, dq),
                             lambda bb, ss, lr: (lr[0], bb, 0, ss, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, s_blk),
                             lambda bb, ss, lr: (lr[0], bb, 0, ss),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, h, r), lambda bb, ss, lr: (bb, 0, 0),
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
        args = (lr, lengths, q, k_codes, k_scale)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
