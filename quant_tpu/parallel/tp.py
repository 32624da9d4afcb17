"""Tensor + data parallel sharding of the Llama step (SURVEY.md §2.2 #8/#9).

Megatron-style TP over the ``model`` mesh axis, applied to PACKED quantized
tensors (BASELINE.json:5 "quantized weights and KV-cache tensor-sharded
across chips"):

* column-split: wq/wk/wv/w_gate/w_up/lm_head — codes+scales shard along N.
* row-split: wo/w_down — codes shard along (packed) K, scales shard along G
  when grouped or replicate when per-channel; int4 tensors must be packed
  with ``kshards=tp`` so nibble pairs stay within a shard.
* KV cache shards along the kv-head axis; attention is fully local.
* activations replicate over ``model``; one psum after wo and one after
  w_down per layer; logits all-gather over vocab shards.

``data`` axis shards batch slots (tokens, cache). The whole step runs under
one ``jax.shard_map`` — XLA schedules the psums asynchronously against the
next layer's compute (collective/compute overlap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig

__all__ = [
    "param_specs", "cache_specs", "shard_params", "shard_cache",
    "sharded_forward_fn", "make_sharded_forward",
]

_COL = ("wqkv", "w_gate_up", "ws_gate_up", "w_q_b", "lm_head")
_ROW = ("wo", "w_down", "ws_down")


def _path_names(path) -> list[str]:
    names = []
    for e in path:
        if hasattr(e, "name"):
            names.append(e.name)
        elif hasattr(e, "key"):
            names.append(str(e.key))
    return names


def _spec_for(path, leaf) -> P:
    names = _path_names(path)
    field = names[-1]          # codes | scales | embed | ...
    owner = names[-2] if len(names) >= 2 else ""
    if owner == "lora":
        # LoraStack leaves [A, L, K, r] / [A, L, r, N]: fused-column
        # B's split N with the QTensors they shadow; row-split
        # projections' A's split the input dim (partials join the
        # existing psum); everything else replicates (r is tiny).
        if field in ("b_qkv", "b_gu"):
            return P(None, None, None, "model")
        if field in ("a_o", "a_down"):
            return P(None, None, "model", None)
        return P()
    stacked = owner != "lm_head" and (
        "layers" in names or "layers0" in names)
    lead = (None,) if stacked else ()
    if field == "lut":         # 16-entry codebooks: tiny, replicate
        return P()
    if field == "qkv_bias":    # column-fused bias shards with wqkv's N
        return P(*lead, "model")
    if owner == "we_gate_up":  # MoE column-split: [E, L, K|G, N]
        return P("expert", None, None, "model")
    if owner == "we_down":     # MoE row-split: [E, L, K(/2)|G, N]
        if field == "codes":
            return P("expert", None, "model", None)
        return (P("expert", None, "model", None) if leaf.shape[2] > 1
                else P("expert"))
    if owner in _COL:
        return P(*lead, None, "model")  # [L?, K(/2)|G, N] shard N
    if owner in _ROW:
        if field == "codes":
            return P(*lead, "model", None)
        # grouped scales shard along G; per-channel (G=1) replicate
        g_axis = leaf.shape[1] if stacked else leaf.shape[0]
        return P(*lead, "model", None) if g_axis > 1 else P()
    if field in ("w_uk", "w_uv"):
        # MLA absorbed up-projections [L, H, ., .]: shard the HEAD dim
        # with the q/wo head split (the latent itself is replicated)
        return P(*lead, "model", None, None)
    return P()  # embed, norms, router: replicated


def param_specs(params: llama.LlamaParams):
    """PartitionSpec pytree (same treedef as params) for TP sharding."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def cache_specs(cache, batch_axis: str | None = "data"):
    """KV cache specs: [L, B, Hkv, S(, Dh)] → batch on data, kv-heads on
    model, sequence on seq (mesh axes of size 1 are no-ops).

    ``batch_axis=None`` replicates the batch dim — used for the engine's
    batch-1 prefill cache, which every data shard computes redundantly and
    then inserts into its own slot range.

    A :class:`llama.PagedKVCache` shards its page POOL over ``data`` AND
    ``seq`` (each (data, seq) shard owns a private local pool — under
    sequence sharding a seq shard pages only its own global-S segment,
    r5) and kv-heads over ``model``; page-table rows are slot-major over
    ``data``, COLUMNS are segment-major over ``seq`` (column j addresses
    global S range [j*page, (j+1)*page), which lives in exactly one seq
    shard), and entries hold SHARD-LOCAL page ids — the engine's
    allocator maintains per-(data-group, seq-shard) free lists, so
    inside ``shard_map`` every shard sees exactly its own slots' rows /
    its own segment's columns with indices valid in its local pool.
    """
    if isinstance(cache, llama.PagedKVCache):
        def pspec(path, leaf):
            field = _path_names(path)[-1]
            if field == "lengths":
                return P(batch_axis)
            if field == "page_tbl":
                return P(batch_axis, "seq")
            if field.endswith("codes"):   # [L, P, Hkv, page, Dh]
                return P(None, (batch_axis, "seq") if batch_axis
                         else "seq", "model", None, None)
            return P(None, (batch_axis, "seq") if batch_axis
                     else "seq", "model", None)
        return jax.tree_util.tree_map_with_path(pspec, cache)

    def spec(path, leaf):
        field = _path_names(path)[-1]
        if field == "lengths":
            return P(batch_axis)
        # MLA latent caches hold ONE shared head (plus zero-width V
        # buffers): the kv-head dim replicates over model — every TP
        # shard reads the full latent and computes its own q heads
        model_ax = "model" if leaf.shape[2] > 1 else None
        if field.endswith("codes"):
            return P(None, batch_axis, model_ax, "seq", None)
        return P(None, batch_axis, model_ax, "seq")
    return jax.tree_util.tree_map_with_path(spec, cache)


def shard_params(params: llama.LlamaParams, mesh: Mesh) -> llama.LlamaParams:
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(cache: llama.KVCache, mesh: Mesh) -> llama.KVCache:
    specs = cache_specs(cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def sharded_forward_fn(cfg: ModelConfig, mesh: Mesh, params, cache,
                       batch_axis: str | None = "data"):
    """shard_map(llama.forward) over the (data, model, seq) mesh — NOT
    jitted, so callers (the engine) can fuse sampling/bookkeeping into the
    same jit. Validity: tp must divide n_kv_heads and n_heads; int4
    row-split tensors must be packed with kshards=tp; with a seq axis, the
    cache's max_seq must divide by it and prefill chunks must not straddle
    S/seq boundaries (decode never does).

    ``batch_axis=None``: batch replicated over data (the batch-1 prefill
    program).
    """
    tp = mesh.shape["model"]
    sp = mesh.shape.get("seq", 1)
    ep = mesh.shape.get("expert", 1)
    if cfg.is_mla:
        # MLA TP is a HEAD split (q_b/w_uk/w_uv/wo); the latent stays
        # replicated (each shard all-gathers its kv_a column slice)
        qw = cfg.q_lora_rank or cfg.n_heads * (
            cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
        if cfg.n_heads % tp or qw % tp or cfg.mla_kv_dim % tp:
            raise ValueError(
                f"model axis {tp} must divide n_heads={cfg.n_heads}, "
                f"the q column width {qw} and the latent width "
                f"{cfg.mla_kv_dim}")
    elif cfg.n_kv_heads % tp or cfg.n_heads % tp:
        raise ValueError(
            f"model axis {tp} must divide n_heads={cfg.n_heads} and "
            f"n_kv_heads={cfg.n_kv_heads}"
        )
    if cfg.kv_bits == 4 and (cfg.n_kv_heads // 2) % tp:
        raise ValueError(
            f"kv_bits=4 packs KV codes across head pairs ([.., Hkv/2, "
            f"S, D]) — model axis {tp} must divide "
            f"n_kv_heads/2={cfg.n_kv_heads // 2}")
    if cache.max_seq % max(sp, 1):
        raise ValueError(f"seq axis {sp} must divide max_seq "
                         f"{cache.max_seq}")
    if ep > 1 and (not cfg.n_experts or cfg.n_experts % ep):
        raise ValueError(f"expert axis {ep} must divide "
                         f"n_experts={cfg.n_experts}")
    p_specs = param_specs(params)
    c_specs = cache_specs(cache, batch_axis)

    fwd = functools.partial(
        llama.forward, cfg=cfg, axis="model",
        seq_axis="seq" if sp > 1 else None,
        expert_axis="expert" if ep > 1 else None,
    )

    sharded = jax.shard_map(
        lambda pr, tok, ca, ids: fwd(pr, tok, ca, adapter_ids=ids),
        mesh=mesh,
        in_specs=(p_specs, P(batch_axis, None), c_specs, P(batch_axis)),
        out_specs=(P(batch_axis, None, None), c_specs),
        check_vma=False,
    )

    def wrapped(pr, tok, ca, adapter_ids=None):
        if adapter_ids is None:
            adapter_ids = jnp.zeros((tok.shape[0],), jnp.int32)
        return sharded(pr, tok, ca, adapter_ids)

    return wrapped


def make_sharded_forward(cfg: ModelConfig, mesh: Mesh, params, cache):
    """jit(shard_map(llama.forward)); see :func:`sharded_forward_fn`."""
    sharded = sharded_forward_fn(cfg, mesh, params, cache)
    return jax.jit(sharded, donate_argnums=(2,))
