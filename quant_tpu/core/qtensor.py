"""QTensor — the packed quantized-tensor pytree used across the framework.

Weight convention: a linear layer computing ``y = x @ W`` with ``x: [..., K]``
stores ``W`` as a QTensor of logical shape ``[K, N]``:

* INT8: ``codes`` int8 ``[K, N]``.
* INT4: ``codes`` uint8 ``[K//2, N]`` in the split-K device layout
  (:func:`quant_tpu.core.codec.pack_int4_matmul`): byte[i, n] holds code
  (i, n) in the low nibble and (i + K/2, n) in the high nibble, so on-device
  unpack is two nibble ops + concat along K — no sublane interleave.

``scales`` is float32 ``[G, N]`` with ``G = K // group_size`` groups along
the contraction axis (``G == 1`` → one scale per output channel, which
commutes with the matmul: ``y = (x @ codes) * scales[0]``).

Quantization itself uses the oracle-contract codec
(:mod:`quant_tpu.core.codec`): symmetric absmax, round-half-even, so a
converted checkpoint round-trips bit-exactly vs the C++ reference oracle.

QTensor is registered as a JAX dataclass pytree: codes/scales are leaves
(shardable with PartitionSpecs), bits/group_size/shape are static metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core import codec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QTensor:
    codes: Any  # int8 [K, N] | uint8 [K//2, N] (split-K int4)
    scales: Any  # f32 [G, N]
    bits: int = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    shape: tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    # Tensor-parallel row-sharding: int4 nibble pairing must stay WITHIN a
    # K-shard (a shard's x rows are contiguous, so its packed bytes must
    # cover only its own K range). kshards=t means rows were packed in t
    # independent K-blocks, concatenated along the packed axis; each shard's
    # local view is then an ordinary kshards=1 QTensor.
    kshards: int = dataclasses.field(default=1, metadata=dict(static=True))
    # Codebook ("bin-lookup") mode: an optional f32 [16] table (sorted
    # ascending, cpp/quantref.h "Codebook variant"). When present (bits=4
    # only) dequant is value = lut[code + 8] * scale — the nibble itself
    # is the table index, the scale is the group absmax. None = linear.
    lut: Any = None

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def num_groups(self) -> int:
        return self.shape[0] // self.group_size

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Reference dequantization to a dense [K, N] array (jnp)."""
        k, n = self.shape
        if self.bits == 4:
            p = self.codes
            lo = (p & 0xF).astype(jnp.int8) - 8
            hi = (p >> 4).astype(jnp.int8) - 8
            if self.kshards == 1:
                c = jnp.concatenate([lo, hi], axis=0)
            else:
                kb = k // self.kshards // 2  # packed rows per shard block
                parts = [
                    x
                    for s in range(self.kshards)
                    for x in (lo[s * kb:(s + 1) * kb], hi[s * kb:(s + 1) * kb])
                ]
                c = jnp.concatenate(parts, axis=0)
        else:
            c = self.codes
        if self.lut is not None:
            cf = jnp.asarray(self.lut, jnp.float32)[c.astype(jnp.int32) + 8]
        else:
            cf = c.astype(jnp.float32)
        g = cf.reshape(self.num_groups, self.group_size, n)
        w = g * self.scales[:, None, :]
        return w.reshape(k, n).astype(dtype)

    def local_view(self) -> "QTensor":
        """Rebuild metadata from the (possibly shard-local) array shapes.

        Inside ``shard_map`` the leaves are the per-device shards but the
        static metadata still describes the global tensor. The local view
        recomputes shape/group_size from the actual arrays: K_local from
        codes, group size K_local // G_local (per-channel scales replicate
        across row-shards, grouped scales shard along G), kshards resets to
        1 (packing is per-shard by construction).
        """
        n = self.codes.shape[-1]
        k = self.codes.shape[-2] * (2 if self.bits == 4 else 1)
        if (k, n) == self.shape:
            return self  # global view — metadata (incl. kshards) already true
        gs = k // self.scales.shape[-2]
        return QTensor(
            codes=self.codes, scales=self.scales, bits=self.bits,
            group_size=gs, shape=(k, n), kshards=1, lut=self.lut,
        )


def resolve_codebook(codebook, w: np.ndarray | None = None) -> np.ndarray:
    """Resolve a codebook spec to a 16-entry f32 table.

    ``"nf4"`` → the normative constants; ``"lloyd"`` → Lloyd-Max fit to
    ``w`` (calibrated per tensor); an array → used as-is (validated).
    """
    if isinstance(codebook, str):
        if codebook == "nf4":
            return codec.NF4_TABLE
        if codebook == "lloyd":
            if w is None:
                raise ValueError("codebook='lloyd' needs the weight data")
            return codec.lloyd_max_fit(np.asarray(w, np.float32))
        raise ValueError(f"unknown codebook {codebook!r}")
    lut = np.asarray(codebook, dtype=np.float32)
    if lut.shape != (16,) or not np.all(lut[:-1] < lut[1:]):
        raise ValueError("codebook must be 16 strictly-ascending floats")
    return lut


def quantize_tensor(
    w: np.ndarray, bits: int, group_size: int | None = None,
    kshards: int = 1, codebook=None,
) -> QTensor:
    """Quantize a dense [K, N] weight into a QTensor (host-side, NumPy).

    Scales are per (K-group, output-channel); ``group_size=None`` means one
    group spanning all of K (pure per-output-channel). ``kshards`` packs int4
    nibbles within K-blocks of K//kshards rows (see QTensor.kshards) so the
    tensor can be row-sharded across ``kshards`` TP ranks.

    ``codebook`` switches to the non-uniform "bin-lookup" codec
    (cpp/quantref.h "Codebook variant", bits=4 only): "nf4", "lloyd"
    (per-tensor Lloyd-Max fit), or an explicit 16-entry table.
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"expected [K, N] weight, got shape {w.shape}")
    k, n = w.shape
    gs = k if group_size is None else group_size
    if k % gs != 0:
        raise ValueError(f"group_size {gs} must divide K={k}")
    lut = None
    if codebook is not None:
        if bits != 4:
            raise ValueError("codebook mode is int4-only")
        lut = resolve_codebook(codebook, w)
        codes_nk, scales_ng = codec.quantize_lut(w.T, lut, group_size=gs)
        codes = np.ascontiguousarray(codes_nk.T)
        scales = np.ascontiguousarray(scales_ng.T).astype(np.float32)
        if k % (2 * kshards):
            raise ValueError("int4 requires even K per shard block")
        kb = k // kshards
        codes = np.concatenate(
            [codec.pack_int4_matmul(codes[s * kb:(s + 1) * kb])
             for s in range(kshards)], axis=0,
        )
        return QTensor(
            codes=codes, scales=scales, bits=4, group_size=gs, shape=(k, n),
            kshards=kshards, lut=jnp.asarray(lut),
        )
    # codec quantizes over the LAST axis → work in [N, K] then transpose back.
    codes_nk, scales_ng = codec.quantize(w.T, bits, group_size=gs)
    codes = np.ascontiguousarray(codes_nk.T)  # [K, N]
    scales = np.ascontiguousarray(scales_ng.T).astype(np.float32)  # [G, N]
    if bits == 4:
        if k % (2 * kshards):
            raise ValueError("int4 requires even K per shard block")
        kb = k // kshards
        codes = np.concatenate(
            [codec.pack_int4_matmul(codes[s * kb:(s + 1) * kb])
             for s in range(kshards)], axis=0,
        )  # uint8 [K//2, N], shard-blocked
    return QTensor(
        codes=codes, scales=scales, bits=bits, group_size=gs, shape=(k, n),
        kshards=kshards,
    )


def concat_columns(parts: list[np.ndarray], shards: int = 1) -> np.ndarray:
    """Concatenate dense [K, Ni] weights along N, interleaved per TP shard.

    With ``shards=t`` the column order is [p0_s0 | p1_s0 | ... | p0_s1 | ...]
    so an even column-split over t ranks gives every rank its own slice of
    EACH part (Megatron fused-QKV layout). Ni must all be divisible by t.
    """
    if shards == 1:
        return np.concatenate(parts, axis=1)
    chunks = []
    for s in range(shards):
        for p in parts:
            w = p.shape[1]
            if w % shards:
                raise ValueError(f"column count {w} not divisible by {shards}")
            chunks.append(p[:, s * (w // shards):(s + 1) * (w // shards)])
    return np.concatenate(chunks, axis=1)


def quantize_tensor_device(
    w: jax.Array, bits: int, group_size: int | None = None,
    kshards: int = 1, codebook=None,
) -> QTensor:
    """Quantize a dense [K, N] weight into a QTensor ON DEVICE (pure jnp).

    Same codec semantics as :func:`quantize_tensor` (symmetric absmax,
    round-half-even — jnp.round matches np.round); produces bit-identical
    codes. Used when weights are already device-resident (on-device
    quantization, benchmarks) — host↔device transfers can be slow, so
    quantizing in place is the fast path. ``codebook``: a fixed table
    ("nf4" or 16 floats; "lloyd" is host-only — it needs the data).
    """
    if w.ndim != 2:
        raise ValueError(f"expected [K, N] weight, got shape {w.shape}")
    k, n = w.shape
    gs = k if group_size is None else group_size
    if k % gs != 0:
        raise ValueError(f"group_size {gs} must divide K={k}")
    g = w.astype(jnp.float32).reshape(k // gs, gs, n)
    absmax = jnp.max(jnp.abs(g), axis=1)  # [G, N]
    lut = None
    if codebook is not None:
        if bits != 4:
            raise ValueError("codebook mode is int4-only")
        if codebook == "lloyd":
            raise ValueError("codebook='lloyd' is host-only (needs data)")
        lut = resolve_codebook(codebook)
        scales = jnp.where(absmax == 0.0, 1.0, absmax)
        mid = jnp.asarray((lut[:-1] + lut[1:]) / np.float32(2.0))
        xn = g / scales[:, None, :]
        codes = (jnp.sum(xn[..., None] > mid, axis=-1, dtype=jnp.int32)
                 - 8).astype(jnp.int8).reshape(k, n)
        lut = jnp.asarray(lut)
    else:
        qmax = float(codec.qmax_for_bits(bits))
        scales = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
        q = jnp.round(g / scales[:, None, :])
        codes = jnp.clip(q, -qmax, qmax).astype(jnp.int8).reshape(k, n)
    if bits == 4:
        if k % (2 * kshards):
            raise ValueError("int4 requires even K per shard block")
        u = (codes.astype(jnp.int32) + 8)
        kb = k // kshards
        blocks = [
            (u[s * kb: s * kb + kb // 2]
             | (u[s * kb + kb // 2:(s + 1) * kb] << 4))
            for s in range(kshards)
        ]
        codes = jnp.concatenate(blocks, axis=0).astype(jnp.uint8)
    return QTensor(
        codes=codes, scales=scales, bits=bits, group_size=gs, shape=(k, n),
        kshards=kshards, lut=lut,
    )


def transcode_lut_int8(qt: QTensor) -> QTensor:
    """Codebook fast path (r5, VERDICT r4 weak #3): one-time transcode of
    a codebook QTensor into a plain LINEAR int8 QTensor.

    The word4 kernel already requantizes the 16 table entries to int8
    (``round(lut*127)``, kernels/dequant_matmul.py _lut_word4) and folds
    the 1/127 back into the group scale — so mapping every nibble index
    through that same int8 table ONCE here yields codes whose linear
    dequant ``round(lut[idx]*127) * (scale/127)`` is numerically
    IDENTICAL to what the word4 kernel computes per tile, at the linear
    int8 kernel's streaming speed (~520 GB/s of codes vs word4's 181 —
    scripts/tpu_lut_probe.py; no <=16-entry vector gather lowers on this
    Mosaic, so the in-kernel lookup costs ~12 VPU ops/element). The cost
    is 2x the device bytes of int4 — still ~1.6x faster than word4 at
    decode shapes. ``lut_runtime="sel15"`` keeps the exact-f32 table.

    Handles stacked leading dims ([L, ...] / [E, L, ...]) with
    per-layer/per-(expert, layer) tables, and kshards-blocked packing
    (the unpacked rows come out in natural K order → kshards resets
    to 1, which row-sharding consumes directly).
    """
    if qt.lut is None or qt.bits != 4:
        return qt
    # stay in the input's array world: numpy codes transcode in numpy
    # (a host checkpoint load must NOT round-trip the codes through the
    # axon relay), device arrays in jnp
    xp = np if isinstance(qt.codes, np.ndarray) else jnp
    p = qt.codes
    lut = xp.asarray(np.asarray(qt.lut, np.float32))
    lq = xp.round(lut * np.float32(127.0)).astype(xp.int8)   # [..., 16]
    lo = (p & 0xF).astype(xp.int32)
    hi = (p >> 4).astype(xp.int32)
    if lut.ndim == 1:
        vlo, vhi = lq[lo], lq[hi]
    else:
        lead = int(np.prod(lq.shape[:-1]))
        flat = lq.reshape(lead, 16)

        def pick(idx):
            v = xp.take_along_axis(flat, idx.reshape(lead, -1), axis=1)
            return v.reshape(idx.shape)
        vlo, vhi = pick(lo), pick(hi)
    kp = p.shape[-2]
    kb = kp // qt.kshards                    # packed rows per shard block
    parts = []
    for s in range(qt.kshards):
        parts.append(vlo[..., s * kb:(s + 1) * kb, :])
        parts.append(vhi[..., s * kb:(s + 1) * kb, :])
    codes8 = xp.concatenate(parts, axis=-2).astype(xp.int8)
    scales8 = xp.asarray(qt.scales).astype(xp.float32) * np.float32(
        1 / 127.0)
    return QTensor(codes=codes8, scales=scales8, bits=8,
                   group_size=qt.group_size, shape=qt.shape, kshards=1,
                   lut=None)


def to_device(qt: QTensor, sharding=None) -> QTensor:
    """device_put the array leaves (optionally with a NamedSharding pair)."""
    codes = jax.device_put(qt.codes, sharding[0] if sharding else None)
    scales = jax.device_put(qt.scales, sharding[1] if sharding else None)
    return dataclasses.replace(qt, codes=codes, scales=scales)
