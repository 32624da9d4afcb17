"""Multi-LoRA serving — stacked low-rank adapters over the quantized base.

Adapters add ``y += (x @ A) @ B`` around the frozen packed projections
(the quantized QTensors are never touched), so one engine serves many
fine-tunes: each request picks an adapter and slots with different
adapters co-batch in the same decode dispatch.

TPU-first design decisions:

* **Stacked adapters, masked combine.** All registered adapters stack
  along a leading axis ([n_adapters, L, K, r] / [n_adapters, L, r, N]);
  the delta loops over adapters (a SMALL static count) computing
  ``(x @ A_a) @ B_a`` and masking by each slot's adapter id. A per-slot
  gather of adapter weights (the GPU punica/SGMV approach) would stream
  B × K × r bytes per projection per layer — ~1.6 GB/step at B=48 —
  while the masked loop reads each adapter's weights ONCE (~0.26 MB per
  projection-layer at r=16) and spends only trivially-parallel FLOPs.
  Adapter id 0 is the reserved all-zero base (skipped in the loop).
* **Fused projections stay fused.** q/k/v (and gate/up) adapters merge
  into ONE delta per fused matmul: A's concatenate column-wise
  ([D, r_q+r_k+r_v]) and B becomes block-diagonal with its columns in
  the SAME tp-interleaved fused layout as the packed weights
  (qtensor.concat_columns), so a TP column split slices B exactly like
  it slices the QTensor and the delta lands on the local columns.
* **Row-split projections psum with the base.** wo/w_down deltas are
  computed on the shard-local inputs with row-sliced A and added to the
  partial matmul BEFORE the existing TP psum — no extra collectives.
* **Scaling folded in.** Each adapter's alpha/r is multiplied into B at
  stack-build time; the runtime is a pure two-matmul delta.
* **MLA (r5).** DeepSeek adapters target the projections that keep
  their dense shape in the absorbed decode path: the fused
  down-projection's q(-a)/kv_a column slots (same block-diagonal fused-B
  machinery as GQA's qkv) and o_proj; dense-prefix (first_k_dense)
  layers additionally take the standard MLP hooks. q_b/kv_b adapters
  are rejected — kv_b folds into the per-head w_uk/w_uv at conversion,
  so a runtime delta there would have to re-absorb per step. MoE-layer
  MLP adapters are rejected on any MoE model (no single dense
  projection to shadow).

No reference counterpart (serving-side generalization, SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LoraStack", "make_lora_stack", "lora_delta",
           "load_hf_adapter"]

# projections an adapter may target, in the fused grouping
_QKV = ("wq", "wk", "wv")
_GU = ("w_gate", "w_up")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LoraStack:
    """Stacked adapters. Leaves are f32:
    a_* [A, L, K, r_tot], b_* [A, L, r_tot, N] (fused layouts for
    qkv/gate-up, see module docstring). Index 0 is the all-zero base."""
    a_qkv: Any
    b_qkv: Any
    a_o: Any
    b_o: Any
    a_gu: Any
    b_gu: Any
    a_down: Any
    b_down: Any

    @property
    def n_adapters(self) -> int:
        return self.a_qkv.shape[0]


def _block_diag_cols(bs: list[np.ndarray], widths: list[int],
                     tp: int) -> np.ndarray:
    """Block-diagonal B for a fused projection, columns in the
    tp-interleaved fused layout. ``bs[p]`` is [r_p, widths[p]]."""
    from quant_tpu.core.qtensor import concat_columns

    r_tot = sum(b.shape[0] for b in bs)
    padded = []
    row0 = 0
    for b in bs:
        full = np.zeros((r_tot, b.shape[1]), np.float32)
        full[row0:row0 + b.shape[0]] = b
        padded.append(full)
        row0 += b.shape[0]
    return concat_columns(padded, tp)


def make_lora_stack(adapters: list[dict], cfg, tp: int = 1) -> LoraStack:
    """Build the stacked LoraStack from per-adapter dicts.

    Each adapter dict: ``{"alpha": float, "layers.<i>.<proj>.a": [K, r],
    "layers.<i>.<proj>.b": [r, N], ...}`` with proj in wq/wk/wv/wo/
    w_gate/w_up/w_down — or, for MLA configs, wq (the q or q_a
    projection), wkv_a (kv_a_proj_with_mqa) and wo (missing projections
    contribute zeros; ranks may differ per projection and per adapter —
    everything pads to the per-group max). alpha/r scaling folds into
    B. A leading all-zero base adapter (id 0) is prepended. MoE MLP
    projections and the MLA q_b/kv_b (absorbed) projections are
    rejected.
    """
    mlp_projs = ("w_gate", "w_up", "w_down")
    if cfg.n_experts:
        # MoE MLPs have no single dense projection to adapt (experts
        # are [E, L, ...] stacks); attention-side adapters still
        # compose, as do MLP adapters on dense-PREFIX layers
        # (first_k_dense — those run the standard dense hooks).
        k0 = cfg.first_k_dense or 0
        bad = [k for ad in adapters for k in ad
               if any(f".{p}." in k for p in mlp_projs)
               and int(k.split(".")[1]) >= k0]
        if bad:
            raise ValueError(
                "LoRA on MoE-layer MLP projections is not supported — "
                "attention projections (and dense-prefix-layer MLPs) "
                f"only (got {bad[:3]})")
    d, hd, it = cfg.dim, cfg.head_dim, cfg.intermediate
    if cfg.n_experts:
        # the only dense MLP in an MoE model is the first_k_dense
        # prefix — its width is dense_intermediate
        it = cfg.dense_intermediate or cfg.intermediate
    if cfg.is_mla:
        # MLA (r5): adapters target the projections that keep their
        # dense shape in the ABSORBED decode path — the fused
        # down-projection wqkv = [q(-a) | kv_a] and o_proj. q_b/kv_b
        # cannot be adapted (kv_b is folded into the per-head
        # w_uk/w_uv; a delta there changes the absorption).
        bad = [k for ad in adapters for k in ad
               if ".wq_b." in k or ".wkv_b." in k]
        if bad:
            raise ValueError(
                "LoRA on q_b_proj/kv_b_proj is not supported: the MLA "
                "decode path runs the absorbed form (kv_b folds into "
                "w_uk/w_uv). Target q(_a)_proj, kv_a_proj_with_mqa "
                f"and o_proj instead (got {bad[:3]})")
        r_lat, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
        qw = cfg.q_lora_rank or cfg.n_heads * (cfg.qk_nope_head_dim
                                               + dr)
        groups = {
            "qkv": (("wq", "wkv_a"), d, (qw, r_lat + dr)),
            "o": (("wo",), cfg.n_heads * cfg.v_head_dim, (d,)),
            # dense-prefix (first_k_dense) layers reuse the standard
            # MLP hooks; MoE layers ignore these stacks (zeros unless
            # an adapter targets a dense-prefix layer's MLP)
            "gu": (_GU, d, (it, it)),
            "down": (("w_down",), it, (d,)),
        }
    else:
        nq, nkv = cfg.n_heads * hd, cfg.n_kv_heads * hd
        groups = {
            "qkv": (_QKV, d, (nq, nkv, nkv)),
            "o": (("wo",), nq, (d,)),
            "gu": (_GU, d, (it, it)),
            "down": (("w_down",), it, (d,)),
        }

    def adapter_group(ad: dict, projs, k_in, widths, i):
        """(A [k_in, r_tot], B [r_tot, sum(widths)] fused) for layer i,
        scaling folded into B."""
        alpha = float(ad.get("alpha", 1.0))
        a_parts, b_parts = [], []
        for p, w in zip(projs, widths):
            a = ad.get(f"layers.{i}.{p}.a")
            b = ad.get(f"layers.{i}.{p}.b")
            if a is None or b is None:
                a = np.zeros((k_in, 1), np.float32)
                b = np.zeros((1, w), np.float32)
            else:
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32) * (alpha / a.shape[1])
                if a.shape != (k_in, b.shape[0]) or b.shape[1] != w:
                    raise ValueError(
                        f"layers.{i}.{p}: A{a.shape}/B{b.shape} don't "
                        f"match [{k_in}, r] x [r, {w}]")
            a_parts.append(a)
            b_parts.append(b)
        a_cat = np.concatenate(a_parts, axis=1)
        b_blk = _block_diag_cols(b_parts, list(widths), tp)
        return a_cat, b_blk

    fields: dict[str, list] = {f"a_{g}": [] for g in groups}
    fields.update({f"b_{g}": [] for g in groups})
    # per-group max r_tot across adapters (for padding)
    r_max = {g: 1 for g in groups}
    per_adapter = []
    for ad in adapters:
        layers = {}
        for g, (projs, k_in, widths) in groups.items():
            ab = [adapter_group(ad, projs, k_in, widths, i)
                  for i in range(cfg.n_layers)]
            layers[g] = ab
            # max over ALL layers: PEFT layers_to_transform /
            # rank_pattern adapters vary rank (or absence) per layer
            r_max[g] = max(r_max[g],
                           max(a.shape[1] for a, _ in ab))
        per_adapter.append(layers)

    def pad_a(a, r):
        return np.pad(a, ((0, 0), (0, r - a.shape[1])))

    def pad_b(b, r):
        return np.pad(b, ((0, r - b.shape[0]), (0, 0)))

    for g, (projs, k_in, widths) in groups.items():
        n_cols = sum(widths)
        # id 0: the all-zero base adapter
        zero_a = np.zeros((cfg.n_layers, k_in, r_max[g]), np.float32)
        zero_b = np.zeros((cfg.n_layers, r_max[g], n_cols), np.float32)
        stacks_a, stacks_b = [zero_a], [zero_b]
        for layers in per_adapter:
            stacks_a.append(np.stack(
                [pad_a(a, r_max[g]) for a, _ in layers[g]]))
            stacks_b.append(np.stack(
                [pad_b(b, r_max[g]) for _, b in layers[g]]))
        fields[f"a_{g}"] = jnp.asarray(np.stack(stacks_a))
        fields[f"b_{g}"] = jnp.asarray(np.stack(stacks_b))
    return LoraStack(
        a_qkv=fields["a_qkv"], b_qkv=fields["b_qkv"],
        a_o=fields["a_o"], b_o=fields["b_o"],
        a_gu=fields["a_gu"], b_gu=fields["b_gu"],
        a_down=fields["a_down"], b_down=fields["b_down"],
    )


def lora_delta(x, a, b, idx, adapter_ids):
    """Masked multi-adapter delta: [B, T, N_local] f32.

    x [B, T, K_local]; a [A, L, K, r] (row-sliced under TP for row-split
    projections — shard_map hands the local shard); b [A, L, r, N_local];
    adapter_ids [B] int32 (0 = base, contributes nothing). Loops over
    the static adapter count — each adapter's weights are read once per
    layer regardless of batch composition.
    """
    n_ad = a.shape[0]
    out = jnp.zeros(x.shape[:-1] + (b.shape[-1],), jnp.float32)
    xf = x.astype(jnp.float32)
    for ad in range(1, n_ad):
        aa = jax.lax.dynamic_index_in_dim(a[ad], idx, 0, False)
        bb = jax.lax.dynamic_index_in_dim(b[ad], idx, 0, False)
        d = (xf @ aa) @ bb
        out = out + jnp.where((adapter_ids == ad)[:, None, None], d, 0.0)
    return out


_HF_PROJ = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
    # DeepSeek MLA names: q(-a) and the shared latent projection map to
    # the fused wqkv slots; q_b/kv_b pass through so make_lora_stack
    # can reject them with an actionable message (absorbed projections)
    "q_a_proj": "wq", "kv_a_proj_with_mqa": "wkv_a",
    "q_b_proj": "wq_b", "kv_b_proj": "wkv_b",
}


def load_hf_adapter(path) -> dict:
    """Read a HF PEFT LoRA directory (adapter_config.json +
    adapter_model.safetensors) into the make_lora_stack dict format.
    torch stores lora_A as [r, K] and lora_B as [N, r] — transposed to
    our [K, r] / [r, N]."""
    path = pathlib.Path(path)
    hf_cfg = json.loads((path / "adapter_config.json").read_text())
    out: dict = {"alpha": float(hf_cfg.get("lora_alpha", 1.0))}
    from safetensors import safe_open

    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    for f in files:
        with safe_open(str(f), framework="np") as h:
            for key in h.keys():
                parts = key.split(".")
                if "lora_A" in parts:
                    kind, tpos = "a", parts.index("lora_A")
                elif "lora_B" in parts:
                    kind, tpos = "b", parts.index("lora_B")
                else:
                    continue
                proj = _HF_PROJ.get(parts[tpos - 1])
                li = next((p for p in parts if p.isdigit()), None)
                if proj is None or li is None:
                    continue
                t = h.get_tensor(key).astype(np.float32)
                out[f"layers.{li}.{proj}.{kind}"] = \
                    np.ascontiguousarray(t.T)
    return out
