"""Packed checkpoint format (SURVEY.md §2.2 #7, §5 checkpoint/resume).

The packed checkpoint IS the at-rest format: quantized codes are
entropy-coded (canonical Huffman, QREF frames — the codec contract from
cpp/quantref.h) on top of the nibble/byte packing; scales and fp arrays are
stored raw. v2 layout (VERDICT r1 #6 — sharded + streaming):

    <dir>/manifest.json   — format version, ModelConfig, tensor index
    <dir>/data.bin        — concatenated blobs addressed by (offset, size)

* Tensors are stored PER LAYER (``layers.{i}.wqkv`` ...) so pipeline stages
  load only their own layer range, and each tensor's codes/scales are split
  into ``tp`` blobs along its tensor-parallel axis (column tensors along N,
  row tensors along packed-K / scale-groups) so a TP rank reads only its
  own slice. Replicated leaves (norms, embed) are single blobs.
* :class:`CheckpointWriter` appends tensors ONE AT A TIME — the streaming
  HF converter never materializes the whole model in RAM (70B path,
  BASELINE.json:11).
* ``load_checkpoint(mesh=...)`` builds sharded global arrays via
  ``jax.make_array_from_callback``: each process decodes only the blobs its
  addressable devices need (per-host shard loading over DCN-sharded pods).

Load path (call stack §3b): read blob → host entropy-decode (C++
``libquantref`` when available, Python mirror otherwise) → device_put the
PACKED codes (int4 stays packed; the fused matmul kernel unpacks nibbles
on-device). Resume = load; the KV cache is never checkpointed.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core import codec, entropy
from quant_tpu.core.qtensor import QTensor
from quant_tpu.models.config import ModelConfig
from quant_tpu.models.llama import LayerParams, LlamaParams, QEmbed

FORMAT = "quant-tpu-ckpt-v2"
_FORMAT_V1 = "quant-tpu-ckpt-v1"

__all__ = ["CheckpointWriter", "save_checkpoint", "load_checkpoint"]


def _entropy_encode(data: np.ndarray) -> bytes:
    try:
        from quant_tpu.core import oracle
        if oracle.available():
            return oracle.entropy_encode(data)
    except Exception:
        pass
    return entropy.encode(data)


def _entropy_decode(comp: bytes) -> bytes:
    try:
        from quant_tpu.core import oracle
        if oracle.available():
            return oracle.entropy_decode(comp)
    except Exception:
        pass
    return entropy.decode(comp)


# Tensor-parallel shard axis per leaf, mirroring parallel.tp._spec_for:
# (codes_axis, scales_axis); None → replicated. Row-split scales shard along
# groups only when grouped (G > 1) — checked at write time.
_COL = {"wqkv", "w_gate_up", "we_gate_up", "ws_gate_up", "w_q_b",
        "lm_head"}
_ROW = {"wo", "w_down", "we_down", "ws_down"}


def _shard_axes(name: str, qt: QTensor) -> tuple[int | None, int | None]:
    parts = name.split(".")
    # MoE expert tensors are stored per (layer, expert):
    # "layers.{i}.we_gate_up.{e}" — the field name sits second-to-last.
    owner = parts[-2] if parts[-1].isdigit() and len(parts) > 1 else parts[-1]
    if owner in _COL:
        return 1, 1
    if owner in _ROW:
        return 0, (0 if qt.scales.shape[0] > 1 else None)
    return None, None


class CheckpointWriter:
    """Streaming checkpoint writer: add tensors one at a time, in any
    order; peak RSS is one tensor (+ its encoded payload)."""

    def __init__(self, path, cfg: ModelConfig, tp: int = 1):
        self.path = pathlib.Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        self.tp = tp
        self.tensors: dict = {}
        self._f = open(self.path / "data.bin", "wb")
        self._off = 0

    def _put_blob(self, payload: bytes) -> dict:
        off = self._off
        self._f.write(payload)
        self._off += len(payload)
        return {"offset": off, "size": len(payload)}

    def _put(self, data: np.ndarray, codec: str, axis: int | None) -> dict:
        raw = np.ascontiguousarray(data)
        n_shards = self.tp if axis is not None else 1
        if axis is not None and raw.shape[axis] % n_shards:
            raise ValueError(
                f"dim {raw.shape[axis]} not divisible by tp={n_shards}")
        shards = []
        for s in range(n_shards):
            part = raw if n_shards == 1 else np.ascontiguousarray(
                np.split(raw, n_shards, axis=axis)[s])
            payload = (_entropy_encode(part.view(np.uint8).reshape(-1))
                       if codec == "qref-huffman" else part.tobytes())
            shards.append(self._put_blob(payload))
        return {
            "codec": codec, "dtype": str(raw.dtype),
            "shape": list(raw.shape), "axis": axis, "shards": shards,
        }

    def add(self, name: str, leaf) -> None:
        if isinstance(leaf, QEmbed):
            self.tensors[name] = {
                "kind": "qembed",
                "codes": self._put(np.asarray(leaf.codes), "qref-huffman",
                                   None),
                "scales": self._put(np.asarray(leaf.scales), "raw", None),
            }
        elif isinstance(leaf, QTensor):
            ca, sa = _shard_axes(name, leaf)
            self.tensors[name] = {
                "kind": "qtensor",
                "bits": leaf.bits, "group_size": leaf.group_size,
                "kshards": leaf.kshards, "shape": list(leaf.shape),
                "codes": self._put(np.asarray(leaf.codes), "qref-huffman",
                                   ca),
                "scales": self._put(np.asarray(leaf.scales), "raw", sa),
            }
            if leaf.lut is not None:
                # 16 floats (64 per stacked layer) — inline in the
                # manifest; float32→float64 JSON round-trips exactly
                self.tensors[name]["lut"] = np.asarray(
                    leaf.lut, np.float32).tolist()
        else:
            self.tensors[name] = {
                "kind": "array",
                "data": self._put(np.asarray(leaf), "raw", None),
            }

    def finish(self) -> dict:
        self._f.close()
        manifest = {
            "format": FORMAT,
            "config": dataclasses.asdict(self.cfg),
            "tp": self.tp,
            "tensors": self.tensors,
        }
        (self.path / "manifest.json").write_text(
            json.dumps(manifest, indent=1))
        return manifest


def _flatten_params(params: LlamaParams) -> dict:
    """Per-layer flattening: stacked leaves are sliced along L; MoE
    expert stacks ([E, L, ...]) additionally per expert — one blob per
    (layer, expert) so EP/PP shard loads stay tensor-granular. None
    fields (dense models' we_*/router, MoE models' w_gate_up/w_down)
    are simply absent from the manifest."""
    out = {
        "embed": params.embed,
        "final_norm": params.final_norm,
        "lm_head": params.lm_head,
    }
    for prefix, stack in (("layers", params.layers),
                          ("layers0", params.layers0)):
        if stack is None:
            continue
        n_layers = stack.attn_norm.shape[0]
        for i in range(n_layers):
            for f in dataclasses.fields(LayerParams):
                leaf = getattr(stack, f.name)
                if leaf is None:
                    continue
                if f.name in ("we_gate_up", "we_down"):
                    n_exp = leaf.codes.shape[0]
                    for e in range(n_exp):
                        out[f"{prefix}.{i}.{f.name}.{e}"] = jax.tree.map(
                            lambda a: a[e, i], leaf)
                else:
                    out[f"{prefix}.{i}.{f.name}"] = jax.tree.map(
                        lambda a: a[i], leaf)
    return out


def save_checkpoint(path, params: LlamaParams, cfg: ModelConfig,
                    tp: int = 1) -> dict:
    """Write the packed checkpoint from in-memory params; returns the
    manifest. ``tp``: blob shard count (must match the packing's tp)."""
    w = CheckpointWriter(path, cfg, tp=tp)
    for name, leaf in _flatten_params(params).items():
        w.add(name, leaf)
    return w.finish()


# ── loading ─────────────────────────────────────────────────────────────


class _BlobReader:
    def __init__(self, path: pathlib.Path, manifest: dict):
        self.path = path
        self.manifest = manifest
        self._f = open(path / "data.bin", "rb")
        # threaded loads: file access serialized; the expensive part
        # (entropy decode, a GIL-releasing C++ call) runs outside the lock
        self._lock = threading.Lock()

    def _read_shard(self, meta: dict, idx: int) -> np.ndarray:
        blob = meta["shards"][idx]
        with self._lock:
            self._f.seek(blob["offset"])
            payload = self._f.read(blob["size"])
        if meta["codec"] == "qref-huffman":
            payload = _entropy_decode(payload)
        shape = list(meta["shape"])
        axis = meta["axis"]
        if axis is not None:
            shape[axis] //= len(meta["shards"])
        return np.frombuffer(payload, np.dtype(meta["dtype"])).reshape(shape)

    def full(self, meta: dict) -> np.ndarray:
        parts = [self._read_shard(meta, i)
                 for i in range(len(meta["shards"]))]
        if len(parts) == 1:
            return parts[0]
        return np.concatenate(parts, axis=meta["axis"])

    def ranged(self, meta: dict, index: tuple) -> np.ndarray:
        """Read the sub-array selected by a tuple of slices (global
        coords), touching only overlapping blobs."""
        axis = meta["axis"]
        n_shards = len(meta["shards"])
        if axis is None or n_shards == 1:
            return self.full(meta)[index]
        width = meta["shape"][axis] // n_shards
        sl = index[axis]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else meta["shape"][axis]
        s0, s1 = start // width, (stop - 1) // width
        parts = [self._read_shard(meta, s) for s in range(s0, s1 + 1)]
        arr = parts[0] if len(parts) == 1 else np.concatenate(parts, axis)
        local = list(index)
        local[axis] = slice(start - s0 * width, stop - s0 * width)
        return arr[tuple(local)]


# LayerParams fields added after the first v2 checkpoints shipped:
# loaders default them instead of KeyErroring on older manifests
# (write-side always emits them; defaults mirror the converter's).
_OPTIONAL_LAYER_FIELDS = ("q_norm", "k_norm")
# Gemma-2 post-block norms: present only when cfg.post_norms (other
# families' checkpoints simply never reference them).
_POST_NORM_FIELDS = ("post_attn_norm", "post_mlp_norm")
# MoE fields: None (absent) for every dense checkpoint.
_MOE_LAYER_FIELDS = ("router", "we_gate_up", "we_down")
# MLA / DeepSeek-MoE fields: None (absent) unless the model uses them
# (write-side emits them whenever present).
_MLA_LAYER_FIELDS = ("w_q_b", "w_uk", "w_uv", "q_a_norm", "kv_a_norm",
                     "ws_gate_up", "ws_down", "router_bias")


def _default_layer_leaf(field: str, cfg: ModelConfig):
    if field in _OPTIONAL_LAYER_FIELDS:
        return np.ones((cfg.head_dim,), np.float32)
    if field in _POST_NORM_FIELDS:
        return np.ones((cfg.dim,), np.float32) if cfg.post_norms else None
    if field in _MOE_LAYER_FIELDS or field in _MLA_LAYER_FIELDS:
        return None
    if cfg.n_experts and field in ("w_gate_up", "w_down"):
        return None  # MoE checkpoints have no dense MLP
    raise KeyError(field)


def _get_leaf(rd: _BlobReader, name: str, cfg: ModelConfig | None = None):
    meta = rd.manifest["tensors"].get(name)
    if meta is None and cfg is not None:
        return _default_layer_leaf(name.rsplit(".", 1)[-1], cfg)
    if meta["kind"] == "qembed":
        return QEmbed(codes=rd.full(meta["codes"]),
                      scales=rd.full(meta["scales"]))
    if meta["kind"] == "qtensor":
        return QTensor(
            codes=rd.full(meta["codes"]), scales=rd.full(meta["scales"]),
            bits=meta["bits"], group_size=meta["group_size"],
            shape=tuple(meta["shape"]), kshards=meta["kshards"],
            lut=(np.asarray(meta["lut"], np.float32)
                 if "lut" in meta else None),
        )
    return rd.full(meta["data"])


def _canonicalize_tp(field: str, leaf, cfg: ModelConfig, tp: int):
    """Undo tp packing for a single-device (no-mesh) host load.

    A tp-packed checkpoint stores fused column tensors SHARD-MAJOR
    ([p0_s0|p1_s0|…|p0_s1|…], core.qtensor.concat_columns) and row
    tensors with split-K nibble blocks (kshards=tp). Plain blob concat
    keeps those layouts, which ``llama.forward`` must not see — it
    slices fused outputs assuming part-major columns. Quantization is
    per (K-group, column), so column permutation / K-block repacking
    commute with it: the result is bit-identical to a tp=1 conversion.
    """
    if tp == 1 or leaf is None:
        return leaf
    if field in ("wqkv", "w_gate_up", "we_gate_up", "ws_gate_up",
                 "qkv_bias"):
        hd = cfg.head_dim
        if field in ("w_gate_up", "we_gate_up"):
            widths = (cfg.intermediate,) * 2
        elif field == "ws_gate_up":
            widths = (cfg.n_shared_experts * cfg.intermediate,) * 2
        elif cfg.is_mla:
            # MLA fuses [q(_a) | kv_a]
            qw = cfg.q_lora_rank or cfg.n_heads * (
                cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
            widths = (qw, cfg.mla_kv_dim)
        else:
            widths = (cfg.n_heads * hd, cfg.n_kv_heads * hd,
                      cfg.n_kv_heads * hd)
        per = [w // tp for w in widths]
        starts, off = {}, 0
        for s in range(tp):
            for p, w in enumerate(per):
                starts[(s, p)] = off
                off += w
        idx = []  # shard-major → part-major
        for p, w in enumerate(per):
            for s in range(tp):
                idx.extend(range(starts[(s, p)], starts[(s, p)] + w))
        idx = np.asarray(idx, np.int64)
        if isinstance(leaf, QTensor):
            return dataclasses.replace(
                leaf, codes=np.ascontiguousarray(leaf.codes[:, idx]),
                scales=np.ascontiguousarray(leaf.scales[:, idx]))
        return np.ascontiguousarray(np.asarray(leaf)[idx])
    if isinstance(leaf, QTensor) and leaf.kshards > 1:
        codes = leaf.codes
        if leaf.bits == 4:
            kb = codes.shape[0] // leaf.kshards  # packed rows per block
            blocks = [codec.unpack_int4_matmul(codes[s * kb:(s + 1) * kb])
                      for s in range(leaf.kshards)]
            codes = codec.pack_int4_matmul(np.concatenate(blocks, axis=0))
        return dataclasses.replace(leaf, codes=codes, kshards=1)
    return leaf


def _load_v2_host(rd: _BlobReader, cfg: ModelConfig) -> LlamaParams:
    tp = rd.manifest.get("tp", 1)
    # entropy decode dominates load time and releases the GIL (C++ via
    # ctypes), so per-layer leaves decode in parallel; peak RSS grows by
    # only the in-flight payloads
    workers = min(8, os.cpu_count() or 1)

    def one(prefix, field, i, e=None):
        name = (f"{prefix}.{i}.{field}" if e is None
                else f"{prefix}.{i}.{field}.{e}")
        return _canonicalize_tp(field, _get_leaf(rd, name, cfg), cfg, tp)

    tm = rd.manifest["tensors"]

    def load_stack(prefix, rows):
        with ThreadPoolExecutor(max_workers=workers) as ex:
            fields = [f.name for f in dataclasses.fields(LayerParams)
                      if f.name not in ("we_gate_up", "we_down")]
            futs = {f: [ex.submit(one, prefix, f, i) for i in range(rows)]
                    for f in fields}
            # MoE expert stacks: per-(layer, expert) blobs → [E, L, ...]
            efuts = {}
            for f in ("we_gate_up", "we_down"):
                if f"{prefix}.0.{f}.0" in tm:
                    efuts[f] = [[ex.submit(one, prefix, f, i, e)
                                 for i in range(rows)]
                                for e in range(cfg.n_experts)]
            stacked = {
                f: (jax.tree.map(lambda *xs: np.stack(xs),
                                 *[fu.result() for fu in futs[f]])
                    if futs[f][0].result() is not None else None)
                for f in fields
            }
            for f, erows in efuts.items():
                per_e = [jax.tree.map(lambda *xs: np.stack(xs),
                                      *[fu.result() for fu in row])
                         for row in erows]
                stacked[f] = jax.tree.map(lambda *xs: np.stack(xs),
                                          *per_e)
            return LayerParams(**{
                f.name: stacked.get(f.name)
                for f in dataclasses.fields(LayerParams)
            })

    k0 = cfg.first_k_dense
    layers = load_stack("layers", cfg.n_layers - k0)
    layers0 = load_stack("layers0", k0) if k0 else None
    return LlamaParams(
        embed=_get_leaf(rd, "embed"), layers=layers, layers0=layers0,
        final_norm=_get_leaf(rd, "final_norm"),
        lm_head=_get_leaf(rd, "lm_head"),
    )


def _sds(meta: dict) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(meta["shape"]),
                                np.dtype(meta["dtype"]))


def _template_from_manifest(manifest: dict, cfg: ModelConfig
                            ) -> LlamaParams:
    """Abstract (shapes-only) LlamaParams matching the checkpoint — used to
    derive shardings without allocating anything."""
    tm = manifest["tensors"]
    k0 = cfg.first_k_dense
    rows_of = {"layers": cfg.n_layers - k0, "layers0": k0}

    def leaf(meta):
        if meta["kind"] == "qembed":
            return QEmbed(codes=_sds(meta["codes"]),
                          scales=_sds(meta["scales"]))
        if meta["kind"] == "qtensor":
            return QTensor(
                codes=_sds(meta["codes"]), scales=_sds(meta["scales"]),
                bits=meta["bits"], group_size=meta["group_size"],
                shape=tuple(meta["shape"]), kshards=meta["kshards"],
                lut=(np.asarray(meta["lut"], np.float32)
                     if "lut" in meta else None))
        return _sds(meta["data"])

    def stacked(field, prefix="layers"):
        rows = rows_of[prefix]
        if field in ("we_gate_up", "we_down"):
            meta = tm.get(f"{prefix}.0.{field}.0")
            if meta is None:
                return None
            return jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(
                    (cfg.n_experts, rows) + s.shape, s.dtype),
                leaf(meta))
        meta = tm.get(f"{prefix}.0.{field}")
        if meta is None:
            d = _default_layer_leaf(field, cfg)
            if d is None:
                return None
            l0 = jax.ShapeDtypeStruct(d.shape, np.float32)
        else:
            l0 = leaf(meta)
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct((rows,) + s.shape,
                                           s.dtype), l0)

    layers = LayerParams(**{
        f.name: stacked(f.name) for f in dataclasses.fields(LayerParams)
    })
    layers0 = (LayerParams(**{
        f.name: stacked(f.name, "layers0")
        for f in dataclasses.fields(LayerParams)
    }) if k0 else None)
    return LlamaParams(embed=leaf(tm["embed"]), layers=layers,
                       layers0=layers0,
                       final_norm=leaf(tm["final_norm"]),
                       lm_head=leaf(tm["lm_head"]))


def _load_v2_mesh(rd: _BlobReader, cfg: ModelConfig, mesh) -> LlamaParams:
    """Shard-native load: every array leaf is built with
    jax.make_array_from_callback — only the blobs covering THIS process's
    addressable shards are read/decoded (per-host loading)."""
    from jax.sharding import NamedSharding

    from quant_tpu.parallel import pp as pp_mod
    from quant_tpu.parallel import tp as tp_mod

    pipe = mesh.shape.get("pipe", 1)
    tp = mesh.shape.get("model", 1)
    save_tp = rd.manifest.get("tp", 1)
    if save_tp != tp:
        # fused column tensors bake the interleaving of their packing
        # tp — a different runtime tp cannot consume them (see
        # concat_columns). That includes save_tp=1 onto model>1: a
        # contiguous column split of an UNinterleaved [q|k|v] hands
        # shard 0 all-q columns while forward slices per-shard heads —
        # measured max|logit d| 5.3 on the toy model (2026-08-20), so
        # this load must refuse rather than silently corrupt. Repack
        # with convert/save tp == the mesh model axis.
        raise ValueError(
            f"checkpoint packed for tp={save_tp}, mesh model axis is "
            f"{tp}; repack the checkpoint with tp={tp}")

    # Template (shapes only) + specs from the runtime sharding rules.
    template = _template_from_manifest(rd.manifest, cfg)
    specs = (pp_mod.pp_param_specs(template) if pipe > 1
             else tp_mod.param_specs(template))

    tmeta = rd.manifest["tensors"]

    def build(path_names, struct, spec):
        name = path_names[0]
        sharding = NamedSharding(mesh, spec)
        if name in ("layers", "layers0") and path_names[1] in (
                "we_gate_up", "we_down"):
            field, leaf_field = path_names[1], path_names[-1]

            def cb(index):  # index = (expert rng, layer rng, tensor dims)
                esl, lsl = index[0], index[1]
                blocks = []
                for e in range(esl.start or 0,
                               esl.stop or struct.shape[0]):
                    rows = []
                    for li in range(lsl.start or 0,
                                    lsl.stop or struct.shape[1]):
                        meta = tmeta[f"{name}.{li}.{field}.{e}"]
                        rows.append(rd.ranged(meta[leaf_field], index[2:]))
                    blocks.append(np.stack(rows))
                return np.stack(blocks)
        elif name in ("layers", "layers0"):
            field, leaf_field = path_names[1], path_names[-1]
            present = f"{name}.0.{field}" in tmeta
            is_qt = present and tmeta[f"{name}.0.{field}"]["kind"] in (
                "qtensor", "qembed")

            def cb(index):  # index[0] = layer range (pipe sharding)
                lsl = index[0]
                rows = []
                for li in range(lsl.start or 0,
                                lsl.stop or struct.shape[0]):
                    if not present:  # optional field, older checkpoint
                        rows.append(
                            _default_layer_leaf(field, cfg)[index[1:]])
                        continue
                    meta = tmeta[f"{name}.{li}.{field}"]
                    meta = meta[leaf_field] if is_qt else meta["data"]
                    rows.append(rd.ranged(meta, index[1:]))
                return np.stack(rows)
        else:
            meta = tmeta[name]
            meta = meta.get(path_names[-1]) if meta["kind"] in (
                "qtensor", "qembed") else meta["data"]

            def cb(index):
                return rd.ranged(meta, index)

        return jax.make_array_from_callback(struct.shape, sharding, cb)

    def walk(path, struct, spec):
        names = tp_mod._path_names(path)
        if names[-1] == "lut":
            # tiny codebook tables live inline in the manifest; build the
            # host array ([16] / [L,16] / [E,L,16]) and let device_put
            # shard it per the spec (replicated, or layer-sliced by pipe)
            rows = (cfg.n_layers - cfg.first_k_dense
                    if names[0] == "layers" else cfg.first_k_dense)
            if names[0] in ("layers", "layers0") and names[1] in (
                    "we_gate_up", "we_down"):
                arr = np.stack([
                    np.stack([np.asarray(
                        tmeta[f"{names[0]}.{li}.{names[1]}.{e}"]["lut"],
                        np.float32) for li in range(rows)])
                    for e in range(cfg.n_experts)])
            elif names[0] in ("layers", "layers0"):
                arr = np.stack([np.asarray(
                    tmeta[f"{names[0]}.{li}.{names[1]}"]["lut"],
                    np.float32) for li in range(rows)])
            else:
                arr = np.asarray(tmeta[names[0]]["lut"], np.float32)
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return build(names, struct, spec)

    return jax.tree_util.tree_map_with_path(
        lambda p, s, sp: walk(p, s, sp), template, specs)


# ── legacy v1 reader (stacked single-blob format) ───────────────────────


def _read_v1(blob: bytes, meta: dict) -> np.ndarray:
    payload = blob[meta["offset"]: meta["offset"] + meta["size"]]
    if meta["codec"] == "qref-huffman":
        payload = _entropy_decode(payload)
    return np.frombuffer(payload, dtype=np.dtype(meta["dtype"])).reshape(
        meta["shape"]
    )


def _load_v1(path: pathlib.Path, manifest: dict) -> LlamaParams:
    blob = (path / "data.bin").read_bytes()

    def get(name):
        meta = manifest["tensors"][name]
        if meta["kind"] == "qembed":
            return QEmbed(
                codes=_read_v1(blob, meta["codes"]),
                scales=_read_v1(blob, meta["scales"]),
            )
        if meta["kind"] == "qtensor":
            return QTensor(
                codes=_read_v1(blob, meta["codes"]),
                scales=_read_v1(blob, meta["scales"]),
                bits=meta["bits"], group_size=meta["group_size"],
                shape=tuple(meta["shape"]), kshards=meta["kshards"],
            )
        return _read_v1(blob, meta["data"])

    def get_layer(field):
        if f"layers.{field}" not in manifest["tensors"]:
            cfg = ModelConfig(**manifest["config"])
            one = _default_layer_leaf(field, cfg)
            if one is None:  # MoE fields: absent in every v1 checkpoint
                return None
            return np.stack([one] * cfg.n_layers)
        return get(f"layers.{field}")

    layers = LayerParams(**{
        f.name: get_layer(f.name)
        for f in dataclasses.fields(LayerParams)
    })
    return LlamaParams(
        embed=get("embed"), layers=layers,
        final_norm=get("final_norm"), lm_head=get("lm_head"),
    )


def _transcode_luts(params, cfg: ModelConfig, mesh=None):
    """lut_runtime="int8" (the default): transcode codebook QTensors to
    plain linear int8 at load — numerically identical to the word4
    kernel's per-tile table gather at the linear kernel's streaming
    speed (core.qtensor.transcode_lut_int8; VERDICT r4 weak #3). On a
    mesh load the transcoded leaves are put back onto each leaf's
    original sharding (the transcode is rank-preserving: [.., K/2, N]
    packed → [.., K, N] int8)."""
    from quant_tpu.core.qtensor import transcode_lut_int8

    if cfg.lut_runtime != "int8":
        return params

    def f(leaf):
        if not (isinstance(leaf, QTensor) and leaf.lut is not None
                and leaf.bits == 4):
            return leaf
        new = transcode_lut_int8(leaf)
        if mesh is not None:
            from jax.sharding import NamedSharding
            new = dataclasses.replace(
                new,
                codes=jax.device_put(
                    new.codes,
                    NamedSharding(mesh, leaf.codes.sharding.spec)),
                scales=jax.device_put(
                    new.scales,
                    NamedSharding(mesh, leaf.scales.sharding.spec)))
        return new

    return jax.tree.map(f, params,
                        is_leaf=lambda x: isinstance(x, QTensor))


def load_checkpoint(path, device: bool = True, mesh=None,
                    lut_runtime: str | None = None
                    ) -> tuple[LlamaParams, ModelConfig]:
    """Read a packed checkpoint → (LlamaParams, ModelConfig).

    ``device=True`` device_puts leaves (packed codes stay packed — nibble
    unpack happens in the matmul kernel at use time). ``mesh``: build the
    params SHARDED over a (pipe, data, model) mesh, reading only the blobs
    this process's devices need (implies device placement).
    ``lut_runtime`` overrides the manifest's codebook execution mode
    (int8 transcode / word4 / sel15 — ModelConfig.lut_runtime).
    """
    path = pathlib.Path(path)
    manifest = json.loads((path / "manifest.json").read_text())
    cfg = ModelConfig(**manifest["config"])
    if lut_runtime is not None:
        cfg = dataclasses.replace(cfg, lut_runtime=lut_runtime)
    if manifest["format"] == _FORMAT_V1:
        if mesh is not None:
            raise ValueError("mesh loading requires a v2 checkpoint")
        params = _load_v1(path, manifest)
    elif manifest["format"] == FORMAT:
        rd = _BlobReader(path, manifest)
        if mesh is not None:
            return _transcode_luts(_load_v2_mesh(rd, cfg, mesh), cfg,
                                   mesh), cfg
        params = _load_v2_host(rd, cfg)
    else:
        raise ValueError(f"unknown checkpoint format {manifest['format']}")
    params = _transcode_luts(params, cfg)
    if device:
        params = jax.tree.map(
            lambda x: jax.device_put(
                jnp.asarray(x, jnp.dtype(cfg.dtype))
                if x.dtype == np.float64 else jnp.asarray(x)
            ),
            params,
        )
    return params, cfg
