"""Pipeline parallelism over the ``pipe`` mesh axis (SURVEY.md §2.2 #13).

The stacked layer axis (every LayerParams leaf and the cache's L dim) shards
over ``pipe``; stage s holds layers [s*L/pp, (s+1)*L/pp) and their KV pages.
One decode/prefill step runs the stages IN TURN inside a single shard_map:
each stage applies its local ``lax.scan`` when its turn comes
(``lax.cond`` on axis_index) and the [B, T, D] activation hops to the next
stage via ``lax.ppermute`` — the payload is tiny next to weights/KV, which
never move. Embedding/final-norm/lm_head replicate across pipe; the final
hidden state broadcasts back with one masked psum.

This is memory-capacity PP (fit 70B+ by spreading layers; BASELINE.json:11);
stages idle while others compute, so combine with data parallelism for
throughput. Composes with the ``model``/``seq`` axes: the inner layer step
is the same TP/SP-aware code as llama.forward's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.parallel import tp as tp_mod

__all__ = ["pp_param_specs", "pp_cache_specs", "shard_params_pp",
           "shard_cache_pp", "pp_forward_fn", "make_pp_forward"]


def _with_pipe(spec: P, stacked: bool) -> P:
    if not stacked:
        return spec
    rest = tuple(spec)[1:] if len(spec) else ()
    return P("pipe", *rest)


def pp_param_specs(params: llama.LlamaParams):
    """TP specs + layer-stack axis sharded over pipe. LoraStack leaves
    ([A, L, ...]) slice their LAYER dim over pipe — each stage holds its
    own adapters slice, riding the stacked layout exactly like the base
    weights (VERDICT r3 #9: LoRA x PP)."""
    def fix(path, leaf):
        names = tp_mod._path_names(path)
        spec = tp_mod._spec_for(path, leaf)
        owner = names[-2] if len(names) >= 2 else ""
        if "lora" in names or owner in ("we_gate_up", "we_down"):
            # expert-major stacks [E, L, ...] (and LoRA [A, L, ...]):
            # the LAYER dim is dim 1 — putting pipe on dim 0 would
            # silently shard the EXPERTS across stages (each stage
            # would route over a fraction of the experts: wrong
            # results, caught by the r5 DSV3 x PP equality test)
            axes = list(tuple(spec))
            axes += [None] * (leaf.ndim - len(axes))
            axes[1] = "pipe"
            return P(*axes)
        # layers0 (the first_k_dense dense prefix) REPLICATES across
        # stages — stage 0 runs it (forward_pp)
        return _with_pipe(spec, "layers" in names)
    return jax.tree_util.tree_map_with_path(fix, params)


def pp_cache_specs(cache, batch_axis: str | None = "data"):
    """KV cache specs with the layer stack over ``pipe``.

    A :class:`llama.PagedKVCache` additionally shards its page POOL over
    ``data`` (per-shard local pools with shard-local table ids, exactly as
    in :func:`tp.cache_specs`) — every (pipe, data) shard holds its layer
    slice of its data group's pool pages.
    """
    if isinstance(cache, llama.PagedKVCache):
        def pspec(path, leaf):
            field = tp_mod._path_names(path)[-1]
            if field == "lengths":
                return P(batch_axis)
            if field == "page_tbl":
                return P(batch_axis, None)
            if field.endswith("codes"):   # [L, P, Hkv, page, Dh]
                return P("pipe", batch_axis, "model", None, None)
            return P("pipe", batch_axis, "model", None)
        return jax.tree_util.tree_map_with_path(pspec, cache)

    def spec(path, leaf):
        field = tp_mod._path_names(path)[-1]
        if field == "lengths":
            return P(batch_axis)
        # MLA latent caches hold ONE shared head (plus zero-width V
        # buffers): replicate the kv-head dim over model (tp.cache_specs)
        model_ax = "model" if leaf.shape[2] > 1 else None
        if field.endswith("codes"):
            return P("pipe", batch_axis, model_ax, "seq", None)
        return P("pipe", batch_axis, model_ax, "seq")
    return jax.tree_util.tree_map_with_path(spec, cache)


def shard_params_pp(params, mesh: Mesh):
    specs = pp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache_pp(cache, mesh: Mesh):
    specs = pp_cache_specs(cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def forward_pp(params, tokens, cache, cfg: ModelConfig,
               pipe_axis: str = "pipe", axis: str | None = None,
               seq_axis: str | None = None, n_micro: int = 1,
               adapter_ids=None):
    """llama.forward equivalent with layer stages over ``pipe_axis``.

    ``n_micro > 1`` enables a GPipe-style microbatch schedule: the batch
    splits into n_micro microbatches that flow through the stages with a
    tick loop of ``n_micro + pp - 1`` steps, so stages overlap (utilization
    n_micro/(n_micro+pp-1) instead of 1/pp). Batch must divide n_micro.
    """
    mm = llama._mm(cfg)
    b, t = tokens.shape
    dt = llama._act_dtype(cfg)
    paged = isinstance(cache, llama.PagedKVCache)
    if paged and seq_axis is not None:
        raise ValueError("paged cache does not compose with seq sharding")
    page_tbl = cache.page_tbl if paged else None
    if seq_axis is not None:
        s_loc = cache.k_codes.shape[3]
        s0 = jax.lax.axis_index(seq_axis) * s_loc
    else:
        s0 = 0
    positions = cache.lengths[:, None] + jnp.arange(t)[None, :]
    new_lengths = cache.lengths + t
    my = jax.lax.axis_index(pipe_axis)
    pp = jax.lax.axis_size(pipe_axis)

    # first_k_dense (DeepSeek two-stack models, r5 MLA x PP): the MoE
    # stack shards evenly over pipe ((L-k0)/pp layers per stage); the
    # tiny dense-prefix stack REPLICATES and runs on stage 0 only,
    # writing local cache rows [0, k0) (llama.cache_rows pads the cache
    # so every stage has those k0 prefix rows; only stage 0's are live).
    # The MoE layer steps then write local rows [k0, k0 + m).
    k0 = cfg.first_k_dense if params.layers0 is not None else 0
    m_local = params.layers.attn_norm.shape[0]
    # global layer offset: the sliding/global alternation (Gemma-2) and
    # the dense-prefix offset index by GLOBAL layer
    xs = llama.scan_xs(params.layers, cfg, layer0=k0 + my * m_local)
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def scan_local(layer_step, h, kc, ks, vc, vs):
        (h, kc, ks, vc, vs), _ = jax.lax.scan(
            layer_step, (h, kc, ks, vc, vs), xs)
        return h, kc, ks, vc, vs

    kc, ks = cache.k_codes, cache.k_scale
    vc, vs = cache.v_codes, cache.v_scale

    def prefix_scan(h, kc, ks, vc, vs, b_mb=None, b0=None):
        cfg0 = llama.dense_prefix_cfg(cfg)
        step0 = llama.make_layer_step(
            params.layers0, cache.lengths, cfg0, mm, b_mb or b, t,
            positions, new_lengths, s0, axis, dt, seq_axis, batch0=b0,
            page_tbl=page_tbl, lora=None, adapter_ids=None,
        )
        (h, kc, ks, vc, vs), _ = jax.lax.scan(
            step0, (h, kc, ks, vc, vs),
            llama.scan_xs(params.layers0, cfg0, layer0=0))
        return h, kc, ks, vc, vs

    if n_micro == 1:
        layer_step = llama.make_layer_step(
            params.layers, cache.lengths, cfg, mm, b, t, positions,
            new_lengths, s0, axis, dt, seq_axis, page_tbl=page_tbl,
            lora=params.lora, adapter_ids=adapter_ids,
            layer_off=k0,
        )
        h = llama._embed_lookup(params.embed, tokens, dt, cfg)
        if k0:
            h, kc, ks, vc, vs = jax.lax.cond(
                my == 0,
                lambda h: prefix_scan(h, kc, ks, vc, vs),
                lambda h: (h, kc, ks, vc, vs),
                h,
            )
        for s in range(pp):
            h2, kc2, ks2, vc2, vs2 = jax.lax.cond(
                my == s,
                lambda h: scan_local(layer_step, h, kc, ks, vc, vs),
                lambda h: (h, kc, ks, vc, vs),
                h,
            )
            kc, ks, vc, vs = kc2, ks2, vc2, vs2
            h = jax.lax.ppermute(h2, pipe_axis, perm)
        # Final h sits on stage 0 after the wrap-around hop; broadcast it.
        h = jax.lax.psum(jnp.where(my == 0, h, jnp.zeros_like(h)),
                         pipe_axis)
    else:
        if b % n_micro:
            raise ValueError(f"batch {b} must divide n_micro {n_micro}")
        b_mb = b // n_micro
        h_all = llama._embed_lookup(params.embed, tokens, dt, cfg)
        h0_buf = h_all.reshape(n_micro, b_mb, t, -1)
        out_buf = jnp.zeros_like(h0_buf)
        h_recv = jnp.zeros_like(h0_buf[0])
        for tick in range(n_micro + pp - 1):
            m = tick - my
            active = (m >= 0) & (m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            b0 = m_c * b_mb
            h_in = jnp.where(
                my == 0,
                jax.lax.dynamic_index_in_dim(h0_buf, m_c, 0, False),
                h_recv,
            )
            layer_step = llama.make_layer_step(
                params.layers, cache.lengths, cfg, mm, b_mb, t, positions,
                new_lengths, s0, axis, dt, seq_axis, batch0=b0,
                page_tbl=page_tbl,
                lora=params.lora, adapter_ids=adapter_ids,
                layer_off=k0,
            )
            if k0:
                # stage 0 runs the dense prefix on each incoming
                # microbatch before its MoE slice
                h_in, kc, ks, vc, vs = jax.lax.cond(
                    active & (my == 0),
                    lambda h: prefix_scan(h, kc, ks, vc, vs, b_mb=b_mb,
                                          b0=b0),
                    lambda h: (h, kc, ks, vc, vs),
                    h_in,
                )
            h_out, kc2, ks2, vc2, vs2 = jax.lax.cond(
                active,
                lambda h: scan_local(layer_step, h, kc, ks, vc, vs),
                lambda h: (h, kc, ks, vc, vs),
                h_in,
            )
            kc, ks, vc, vs = kc2, ks2, vc2, vs2
            out_buf = jnp.where(
                (my == pp - 1) & active,
                jax.lax.dynamic_update_index_in_dim(
                    out_buf, h_out, m_c, 0),
                out_buf,
            )
            h_recv = jax.lax.ppermute(h_out, pipe_axis, perm)
        out_buf = jax.lax.psum(
            jnp.where(my == pp - 1, out_buf, jnp.zeros_like(out_buf)),
            pipe_axis,
        )
        h = out_buf.reshape(b, t, -1)

    h = llama.rmsnorm(h, params.final_norm, cfg.norm_eps, cfg.norm_offset)
    logits = mm(h, params.lm_head, out_dtype=jnp.float32)
    if axis:
        logits = jax.lax.all_gather(logits, axis, axis=2, tiled=True)
    logits = logits[..., :cfg.vocab_size]  # drop lm_head tile padding
    if paged:
        new_cache = llama.PagedKVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            page_tbl=cache.page_tbl, lengths=new_lengths)
    else:
        new_cache = llama.KVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            lengths=new_lengths)
    return logits, new_cache


def pp_forward_fn(cfg: ModelConfig, mesh: Mesh, params, cache,
                  n_micro: int = 1, batch_axis: str | None = "data"):
    """shard_map(forward_pp) over a (pipe, data, model, seq) mesh — NOT
    jitted (see tp.sharded_forward_fn); ``batch_axis=None`` replicates the
    batch (engine batch-1 prefill)."""
    pp = mesh.shape["pipe"]
    tp = mesh.shape["model"]
    sp = mesh.shape.get("seq", 1)
    k0 = cfg.first_k_dense
    if (cfg.n_layers - k0) % pp:
        raise ValueError(
            f"pipe axis {pp} must divide the staged layer count "
            f"{cfg.n_layers - k0}"
            + (f" (n_layers {cfg.n_layers} minus the replicated "
               f"first_k_dense prefix {k0})" if k0 else ""))
    if cfg.is_mla:
        # MLA TP is a head split with the latent replicated (see
        # tp.sharded_forward_fn)
        qw = cfg.q_lora_rank or cfg.n_heads * (
            cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
        if cfg.n_heads % tp or qw % tp or cfg.mla_kv_dim % tp:
            raise ValueError(
                f"model axis {tp} must divide n_heads={cfg.n_heads}, "
                f"the q column width {qw} and the latent width "
                f"{cfg.mla_kv_dim}")
    elif cfg.n_kv_heads % tp or cfg.n_heads % tp:
        raise ValueError(f"model axis {tp} must divide head counts")
    if mesh.shape.get("expert", 1) > 1:
        # MoE composes with PP via the layer-sliced [E, L_local] stacks
        # (expert=1); sharding experts ACROSS pipe stages is unsupported.
        raise ValueError("pp does not compose with an expert axis > 1; "
                         "use (data, expert, model) meshes for MoE")
    p_specs = pp_param_specs(params)
    c_specs = pp_cache_specs(cache, batch_axis)
    fwd = functools.partial(
        forward_pp, cfg=cfg, pipe_axis="pipe", axis="model",
        seq_axis="seq" if sp > 1 else None, n_micro=n_micro,
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


def make_pp_forward(cfg: ModelConfig, mesh: Mesh, params, cache,
                    n_micro: int = 1):
    """jit(shard_map(forward_pp)) over a (pipe, data, model, seq) mesh."""
    sharded = pp_forward_fn(cfg, mesh, params, cache, n_micro)
    return jax.jit(sharded, donate_argnums=(2,))
