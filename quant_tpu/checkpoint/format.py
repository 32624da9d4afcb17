"""Packed checkpoint format (SURVEY.md §2.2 #7, §5 checkpoint/resume).

The packed checkpoint IS the at-rest format: quantized codes are
entropy-coded (canonical Huffman, QREF frames — the codec contract from
cpp/quantref.h) on top of the nibble/byte packing; scales and fp arrays are
stored raw. Layout:

    <dir>/manifest.json   — format version, ModelConfig, tensor index
    <dir>/data.bin        — concatenated blobs addressed by (offset, size)

Load path (call stack §3b): read blob → host entropy-decode (C++
``libquantref`` when available, Python mirror otherwise) → device_put the
PACKED codes (int4 stays packed; the fused matmul kernel unpacks nibbles
on-device). Resume = load; the KV cache is never checkpointed.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core import entropy
from quant_tpu.core.qtensor import QTensor
from quant_tpu.models.config import ModelConfig
from quant_tpu.models.llama import LayerParams, LlamaParams, QEmbed

FORMAT = "quant-tpu-ckpt-v1"


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


def _flatten_params(params: LlamaParams) -> dict:
    out = {
        "embed": params.embed,
        "final_norm": params.final_norm,
        "lm_head": params.lm_head,
    }
    for f in dataclasses.fields(LayerParams):
        out[f"layers.{f.name}"] = getattr(params.layers, f.name)
    return out


def save_checkpoint(path, params: LlamaParams, cfg: ModelConfig) -> dict:
    """Write the packed checkpoint; returns the manifest (with sizes)."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tensors = {}
    blob = bytearray()

    def put(data: np.ndarray, codec: str) -> dict:
        raw = np.ascontiguousarray(data)
        payload = _entropy_encode(raw.view(np.uint8).reshape(-1)) \
            if codec == "qref-huffman" else raw.tobytes()
        off = len(blob)
        blob.extend(payload)
        return {
            "offset": off, "size": len(payload), "codec": codec,
            "dtype": str(raw.dtype), "shape": list(raw.shape),
        }

    for name, leaf in _flatten_params(params).items():
        if isinstance(leaf, QEmbed):
            tensors[name] = {
                "kind": "qembed",
                "codes": put(np.asarray(leaf.codes), "qref-huffman"),
                "scales": put(np.asarray(leaf.scales), "raw"),
            }
        elif isinstance(leaf, QTensor):
            tensors[name] = {
                "kind": "qtensor",
                "bits": leaf.bits, "group_size": leaf.group_size,
                "kshards": leaf.kshards, "shape": list(leaf.shape),
                "codes": put(np.asarray(leaf.codes), "qref-huffman"),
                "scales": put(np.asarray(leaf.scales), "raw"),
            }
        else:
            tensors[name] = {
                "kind": "array",
                "data": put(np.asarray(leaf), "raw"),
            }

    manifest = {
        "format": FORMAT,
        "config": dataclasses.asdict(cfg),
        "tensors": tensors,
    }
    (path / "data.bin").write_bytes(bytes(blob))
    (path / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


def _read(blob: bytes, meta: dict) -> np.ndarray:
    payload = blob[meta["offset"]: meta["offset"] + meta["size"]]
    if meta["codec"] == "qref-huffman":
        payload = _entropy_decode(payload)
    return np.frombuffer(payload, dtype=np.dtype(meta["dtype"])).reshape(
        meta["shape"]
    )


def load_checkpoint(path, device: bool = True
                    ) -> tuple[LlamaParams, ModelConfig]:
    """Read a packed checkpoint → (LlamaParams, ModelConfig).

    ``device=True`` device_puts leaves (packed codes stay packed — nibble
    unpack happens in the matmul kernel / unpack_int4_device at use time).
    """
    path = pathlib.Path(path)
    manifest = json.loads((path / "manifest.json").read_text())
    if manifest["format"] != FORMAT:
        raise ValueError(f"unknown checkpoint format {manifest['format']}")
    cfg = ModelConfig(**manifest["config"])
    blob = (path / "data.bin").read_bytes()

    def get(name):
        meta = manifest["tensors"][name]
        if meta["kind"] == "qembed":
            return QEmbed(
                codes=_read(blob, meta["codes"]),
                scales=_read(blob, meta["scales"]),
            )
        if meta["kind"] == "qtensor":
            return QTensor(
                codes=_read(blob, meta["codes"]),
                scales=_read(blob, meta["scales"]),
                bits=meta["bits"], group_size=meta["group_size"],
                shape=tuple(meta["shape"]), kshards=meta["kshards"],
            )
        return _read(blob, meta["data"])

    layers = LayerParams(**{
        f.name: get(f"layers.{f.name}")
        for f in dataclasses.fields(LayerParams)
    })
    params = LlamaParams(
        embed=get("embed"), layers=layers,
        final_norm=get("final_norm"), lm_head=get("lm_head"),
    )
    if device:
        dt = jnp.dtype(cfg.dtype)
        params = jax.tree.map(
            lambda x: jax.device_put(
                jnp.asarray(x, dt) if x.dtype == np.float64 else jnp.asarray(x)
            ),
            params,
        )
    return params, cfg
