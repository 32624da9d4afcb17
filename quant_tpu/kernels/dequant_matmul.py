"""Fused dequantize + matmul Pallas TPU kernel.

The hot op of the whole framework (BASELINE.json:5: "every hot kernel is a
fused dequant(bin-lookup + scale)+matmul Pallas kernel hitting HBM-bandwidth
roofline"). Computes ``y = x @ dequantize(W)`` where ``W`` is a
:class:`quant_tpu.core.qtensor.QTensor` — codes stay packed in HBM (int8:
1 byte/weight, int4: 0.5 byte/weight) and are unpacked + dequantized in VMEM
tile-by-tile, feeding the MXU directly. At decode batch sizes the op is
weight-bandwidth bound, so halving/quartering weight bytes is the entire win.

Design notes (TPU-first; no reference counterpart — the C++ reference is a
host codec, SURVEY.md §2.2 #4). Measured on the axon v5e (scripts/
tpu_variant_probe*.py): the XLA bf16 dense ceiling is ~730 GB/s; the
kernel's floor is the int→bf16 cast + MXU dots, so every other per-element
op was moved out of the kernel:

* Grid ``(M/TM, N/TN, K/TK)``, K innermost ("arbitrary"), f32 VMEM
  accumulator — the canonical Pallas matmul schedule.
* Scales are read STRAIGHT from the scale array via BlockSpec index maps —
  no XLA-side gather/copy per call (measured: the old pre-gather cost ~2 µs
  and ~1 MB of HBM round-trip per matmul at decode M). The ``[K/G, N]``
  array is bitcast-reshaped to ``[K/G/tile_g, tile_g, N]`` so block dims
  match array dims (Mosaic's sublane-divisibility rule). Scales are applied
  AFTER each group's dot on the tiny ``[M, TN]`` partial, never on the
  ``[TK, TN]`` weight tile.
* INT4 codes are stored split-K (``codec.pack_int4_matmul``): byte row i of
  ``[K/2, N]`` holds code rows i (low nibble) and i + K/2 (high nibble), so
  a packed tile unpacks into TWO contiguous logical-K ranges with no
  sublane interleave; the kernel takes two x-slices (same array, two
  BlockSpecs) and dots each half. Unpack goes through int32 (Mosaic has no
  uint8 bitwise lowering; int16 paths ICE'd the Mosaic compiler on axon).
* A K-tile must cover whole scale groups or sit inside one
  (``TK % group_size == 0`` or ``group_size % TK == 0``).

The pure-XLA reference path (:func:`dequant_matmul_reference`) is both the
test oracle and the fallback for shapes the kernel's divisibility rules
reject.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quant_tpu.core.qtensor import QTensor

__all__ = ["dequant_matmul", "dequant_matmul_moe",
           "dequant_matmul_reference"]


def _sublane(dtype) -> int:
    """Minimum second-to-minor tile dim for a dtype (pallas_guide 'Tiling')."""
    itemsize = jnp.dtype(dtype).itemsize
    return {4: 8, 2: 16, 1: 32}[itemsize]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Scoped-VMEM budget for the psum-decode resident-x plan (all experts'
# rows in one [E*TM, tk] block, both nibble halves for int4). Mosaic
# bills the kernel's WHOLE footprint against a 16 MiB scoped-vmem limit:
# double-buffered windows for every operand (the resident block too,
# despite its constant index map) PLUS the dequantized-tile temporaries
# (~tk*tn*cdt bytes). Hardware-measured 2026-08-20 at DeepSeek-V3
# geometry (N=7168, tn=3584): a 2.1 MiB resident block billed 16.62 MiB
# total and died by 632 KiB, while the same block at V2-Lite geometry
# (N=2048) runs the validated 22 ms flagship — so the guard estimates
# the total and keeps 2 MiB headroom rather than capping x bytes alone.
# Past the budget the kernel falls back to per-expert x blocks (always
# compile).
_SCOPED_VMEM_BUDGET = 14 * 2 ** 20


def _largest_tile(dim: int, target: int, mult: int) -> int:
    """Largest t <= target with t % mult == 0 and dim % t == 0."""
    t = min(target, dim)
    t -= t % mult
    while t >= mult:
        if dim % t == 0:
            return t
        t -= mult
    raise ValueError(f"dim {dim} not tileable with multiple {mult}")


# ── reference path (XLA) ────────────────────────────────────────────────


def dequant_matmul_reference(x: jax.Array, qt: QTensor, out_dtype=None,
                             act_quant: bool = False):
    """y = x @ dequantize(W), pure XLA. Test oracle + shape fallback.

    Matches the kernel's numerics: weights dequantized to x.dtype (bf16 in
    production), matmul accumulated in float32. With ``act_quant`` it
    mirrors the W8A8 kernel instead (per-(row, K-group) dynamic int8
    activations; weights stay exact int8xscale) so the quality gate can
    ablate act_quant on the CPU/XLA path too.
    """
    out_dtype = out_dtype or x.dtype
    if act_quant:
        gsz = qt.group_size
        lead, k = x.shape[:-1], x.shape[-1]
        xg = x.astype(jnp.float32).reshape(*lead, k // gsz, gsz)
        sx = jnp.max(jnp.abs(xg), axis=-1, keepdims=True) / 127.0
        sx = jnp.where(sx == 0, 1.0, sx)
        xhat = (jnp.round(xg / sx) * sx).reshape(*lead, k)
        # weights exact (int8 codes x f32 scales — the aq kernel never
        # casts them down to bf16)
        w = qt.dequantize(jnp.float32)
        y = jnp.dot(xhat, w, preferred_element_type=jnp.float32)
        return y.astype(out_dtype)
    w = qt.dequantize(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


# ── kernels ─────────────────────────────────────────────────────────────


def _scaled_dots(x, w, s, tile_g, gsz, acc):
    """acc += sum_g (x[:, g] @ w[g]) * s[g] — scales on [M, TN] partials.

    Few groups: an unrolled loop of full-width dots (the proven dense
    flagship path, gs=128/tk=512 → 4 dots). Many groups (small
    group_size, e.g. DeepSeek's gs=64 → 8-11 per tile): the loop's
    skinny [M, gsz] dots serialize on MXU issue latency — the same
    pathology the r4 flash-decode rewrite fixed. A g-batched
    dot_general does NOT lower (Mosaic: lhs [M, G, gsz] "batch dims
    must be equal"; the [M, TK] → [M, G, gsz] lane split to 64 is also
    unsupported), so scale the WEIGHT tile instead — a sublane-split
    reshape is legal — and run ONE full-width dot. f32 compute only
    (decode tiles): scaling a bf16 tile would round w*s to bf16. Same
    math as the reference path (dequantize = codes * scales, then
    dot)."""
    if tile_g <= 4 or w.dtype != jnp.float32:
        for g in range(tile_g):
            part = jnp.dot(x[:, g * gsz:(g + 1) * gsz],
                           w[g * gsz:(g + 1) * gsz],
                           preferred_element_type=jnp.float32)
            acc = acc + part * s[g:g + 1]
        return acc
    ws = (w.reshape(tile_g, gsz, w.shape[1])
          * s[:, None, :]).reshape(w.shape)
    return acc + jnp.dot(x, ws, preferred_element_type=jnp.float32)


def _scaled_dots_aq(x, w_i8, s, tile_g, gsz, acc):
    """W8A8 path: dynamic per-(row, group) int8 activation quantization,
    int8 x int8 MXU dots (2x bf16 rate, no weight cast):
        y_g = (round(x_g/sx) @ w_g) * sx * s_g
    """
    for g in range(tile_g):
        xg = x[:, g * gsz:(g + 1) * gsz].astype(jnp.float32)
        sx = jnp.max(jnp.abs(xg), axis=1, keepdims=True) / 127.0
        sx = jnp.where(sx == 0, 1.0, sx)
        xq = jnp.round(xg / sx).astype(jnp.int8)
        pi = jax.lax.dot_general(
            xq, w_i8[g * gsz:(g + 1) * gsz],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + pi.astype(jnp.float32) * sx * s[g:g + 1]
    return acc


def _kernel_int8(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, tile_g, gsz,
                 cdt, stacked=False, aq=False, res=None):
    # ``n_k`` is the accumulation CHAIN length along grid dim 2: the
    # bracket resets/writes per chain (k % n_k), which equals the old
    # k==0 / k==grid_k-1 behavior when the whole dim is one chain and
    # lets the hot-routed MoE concat run experts as consecutive chains
    # on the sequential dim (consecutive repeated weight blocks skip
    # their DMA — the cold-expert byte savings).
    k = pl.program_id(2)

    @pl.when(k % n_k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[0] if stacked else w_ref[:]
    s = s_ref[0, 0] if stacked else s_ref[0]         # [tile_g, TN]
    xv = _x_slice(x_ref, res)
    if aq:
        # W8A8: int8 weights feed the MXU directly
        acc_ref[:] = _scaled_dots_aq(xv, w, s, tile_g, gsz,
                                     acc_ref[:])
    else:
        # cdt: f32 compute at decode M (int8→f32 converts measure faster
        # than →bf16 on this chip and the MXU is nowhere near the limit at
        # small M); bf16 for large-M prefill where MXU rate matters.
        acc_ref[:] = _scaled_dots(xv.astype(cdt), w.astype(cdt),
                                  s, tile_g, gsz, acc_ref[:])

    @pl.when(k % n_k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _lut_word4(idx, w4):
    """idx [*, *] in [0,15] → int8-quantized codebook value as f32.

    The 16 int8 entries (round(lut*127), biased +128) live packed in four
    int32 words (SMEM scalars w4): a 4-way select picks the word, a
    variable shift extracts the byte. ~12 VPU ops/element — measured 0.50x
    the linear kernel's throughput (scripts/tpu_lut_probe.py; the f32
    select-tree alternative is 0.34x, and Mosaic lowers no <=16-entry
    vector gather on this toolchain: 1D take and 2D take_along_axis both
    fail). The 1/127 requantization error (<=absmax/254) sits below the
    bf16 weight-cast noise the linear path already carries.
    """
    w = jnp.where(idx < 8,
                  jnp.where(idx < 4, w4[0], w4[1]),
                  jnp.where(idx < 12, w4[2], w4[3]))
    v = (w >> ((idx & 3) << 3)) & 0xFF
    return (v - 128).astype(jnp.float32)


def _lut_sel15(idx, f):
    """Exact f32 codebook via a binary select tree over 16 SMEM scalars
    (the slower, bit-faithful variant — used when lut_exact=True)."""
    lvl = [jnp.where((idx & 1) != 0, f[2 * i + 1], f[2 * i])
           for i in range(8)]
    for bit in (2, 4, 8):
        lvl = [jnp.where((idx & bit) != 0, lvl[2 * i + 1], lvl[2 * i])
               for i in range(len(lvl) // 2)]
    return lvl[0]


def _x_slice(x_ref, res):
    """VMEM-resident per-expert x (psum mode, r5): the WHOLE [E*TM, tk]
    x block loads once (constant index map — consecutive grid steps skip
    the re-fetch) and each expert slot slices its own TM rows here, so
    the HBM side streams ONLY weights. Fetching a different 45-90 KB x
    block per expert slot instead measured the down stage at 80-216 GB/s
    vs gate_up's 532-672 (2026-08-20) — the interleaved small strided
    DMAs defeat the weight prefetch on this chip."""
    if res is None:
        return x_ref[:]
    nn_, tm_ = res
    e = pl.program_id(1) // nn_
    return x_ref[pl.ds(e * tm_, tm_), :]


def _kernel_int4(
    x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref, *, n_k,
    tile_g, gsz, cdt, stacked=False, aq=False, lut_mode=None, lut_ref=None,
    layer_ref=None, res=None,
):
    # n_k = accumulation chain length (see _kernel_int8)
    k = pl.program_id(2)

    @pl.when(k % n_k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wi = (w_ref[0] if stacked else w_ref[:]).astype(jnp.int32)
    odt = jnp.int8 if aq else cdt
    if lut_mode is None:
        lo = ((wi & 0xF) - 8).astype(odt)
        hi = ((wi >> 4) - 8).astype(odt)
    else:
        # codebook ("bin-lookup") dequant: the nibble IS the table index
        li = layer_ref[0] if stacked else 0
        ilo, ihi = wi & 0xF, wi >> 4
        if lut_mode == "word4":
            w4 = [lut_ref[li, i] for i in range(4)]
            lo = _lut_word4(ilo, w4).astype(odt)
            hi = _lut_word4(ihi, w4).astype(odt)
        else:
            f = [lut_ref[li, i] for i in range(16)]
            lo = _lut_sel15(ilo, f).astype(odt)
            hi = _lut_sel15(ihi, f).astype(odt)
    s_lo = s_lo_ref[0, 0] if stacked else s_lo_ref[0]   # [tile_g, TN]
    s_hi = s_hi_ref[0, 0] if stacked else s_hi_ref[0]
    if lut_mode == "word4":
        # codebook values arrive x127 (int8 requant); fold 1/127 into the
        # per-group scales (absmax) on the small [tile_g, TN] blocks
        s_lo = s_lo * jnp.float32(1.0 / 127.0)
        s_hi = s_hi * jnp.float32(1.0 / 127.0)

    acc = acc_ref[:]
    if aq:
        acc = _scaled_dots_aq(_x_slice(x_lo_ref, res), lo, s_lo,
                              tile_g, gsz, acc)
        acc = _scaled_dots_aq(_x_slice(x_hi_ref, res), hi, s_hi,
                              tile_g, gsz, acc)
    else:
        acc = _scaled_dots(_x_slice(x_lo_ref, res).astype(cdt), lo,
                           s_lo, tile_g,
                           gsz, acc)
        acc = _scaled_dots(_x_slice(x_hi_ref, res).astype(cdt), hi,
                           s_hi, tile_g,
                           gsz, acc)
    acc_ref[:] = acc

    @pl.when(k % n_k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ── dispatcher ──────────────────────────────────────────────────────────


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k", "interpret",
                     "act_quant", "lut_exact"),
)
def dequant_matmul(
    x: jax.Array,
    qt: QTensor,
    layer=None,
    *,
    out_dtype=None,
    tile_m: int = 256,
    tile_n: int = 4096,
    tile_k: int = 512,
    interpret: bool = False,
    act_quant: bool = False,
    lut_exact: bool = False,
) -> jax.Array:
    """``x [.., K] @ QTensor [K, N] -> [.., N]`` via the fused Pallas kernel.

    x may have any number of leading dims (flattened to M). M is padded to
    the dtype sublane multiple; K/N must satisfy the tile divisibility rules
    or the XLA reference path is used instead (correct, slower).

    ``act_quant``: W8A8 mode — activations dynamically quantized to int8
    per (row, K-group) inside the kernel and the MXU runs int8 x int8 at
    2x the bf16 rate with no weight cast. Small accuracy cost (~1e-2
    relative on the partials); opt-in via ModelConfig.act_quant.

    ``layer``: when qt's leaves carry a stacked leading axis [L, ...] (the
    scan-over-layers case), pass the traced layer index — the kernel selects
    the layer INSIDE its BlockSpec index maps (scalar prefetch), so XLA
    never materializes a per-layer copy of the packed weights. Weight HBM
    traffic per decode step is exactly the codes once.
    """
    out_dtype = out_dtype or x.dtype
    k, n = qt.shape
    if x.shape[-1] != k:
        raise ValueError(f"x last dim {x.shape[-1]} != K {k}")
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    try:
        y = _dequant_matmul_2d(
            x2, qt, layer, out_dtype=out_dtype, tile_m=tile_m, tile_n=tile_n,
            tile_k=tile_k, interpret=interpret, act_quant=act_quant,
            lut_exact=lut_exact,
        )
    except _Untileable:
        if layer is not None:
            qt = QTensor(
                codes=jax.lax.dynamic_index_in_dim(qt.codes, layer, 0, False),
                scales=jax.lax.dynamic_index_in_dim(qt.scales, layer, 0,
                                                    False),
                bits=qt.bits, group_size=qt.group_size, shape=qt.shape,
                kshards=qt.kshards,
                lut=(jax.lax.dynamic_index_in_dim(qt.lut, layer, 0, False)
                     if qt.lut is not None and qt.lut.ndim == 2
                     else qt.lut),
            )
        y = dequant_matmul_reference(x2, qt, out_dtype,
                                     act_quant=act_quant)
    return y.reshape(*lead, n)


class _Untileable(Exception):
    pass


@functools.partial(
    jax.jit,
    static_argnames=("n_experts", "stride", "mode", "out_dtype",
                     "tile_m", "tile_n", "tile_k", "interpret",
                     "act_quant"),
)
def dequant_matmul_moe(
    x: jax.Array,
    qt: QTensor,          # merged expert stack [E*L, K, N] (expert-major)
    layer,
    *,
    n_experts: int,
    stride: int,          # stacked-index stride between experts (= L)
    mode: str = "concat",
    out_dtype=None,
    tile_m: int = 256,
    tile_n: int = 4096,
    tile_k: int = 512,
    interpret: bool = False,
    act_quant: bool = False,
    hot: jax.Array | None = None,
) -> jax.Array:
    """All-experts dense MoE matmul in ONE kernel launch.

    mode="concat": x [.., K] → [.., E*N] (every expert's gate|up
    columns side by side). mode="sum": x [E, .., K] → [.., N]
    (Σ_e x_e @ W_e — the routed down combine; fold routing weights
    into x_e first). mode="psum": like "sum" but the slots sum in XLA
    (experts ride the parallel grid). mode="grouped": x [E, .., K] →
    [E, .., N] per-expert outputs in ONE launch (the fused grouped
    GEMM of the capacity dispatch). Raises the internal untileable
    error to the caller as ValueError — callers fall back to the
    per-expert loop.

    ``hot`` (r5 routed decode, VERDICT r4 #7): [1+n_experts] int32 =
    [n_hot, compacted hot expert ids with the last id repeated past
    n_hot]. Expert SLOT j computes with expert hot[1+j]'s weights;
    slots >= n_hot clamp to one repeated weight block. Outputs are in
    HOT-SLOT order (concat) — permute the routing weights to match and
    ZERO them past n_hot (they gate the tail's garbage); for "sum" the
    tail x slots must be zero rows (they are, with zeroed weights).

    NOTE (hardware-measured 2026-08-20, scripts/tpu_moe_routed_probe):
    Mosaic does NOT elide the clamped cold slots' repeated fetches —
    with n_experts=E the hot path streams the same bytes as dense.
    Callers get real savings by passing a BUCKETED static n_experts
    (smallest of a few compiled slot counts covering n_hot; see
    models/llama.py _routed_buckets) so the grid itself shrinks; the
    clamp then only covers the bucket-rounding tail.
    """
    out_dtype = out_dtype or x.dtype
    k, n = qt.shape
    if mode in ("sum", "psum", "grouped"):
        e, *lead, kx = x.shape
        m = 1
        for d in lead:
            m *= d
        x2 = x.reshape(e, m, kx)
    else:
        *lead, kx = x.shape
        m = 1
        for d in lead:
            m *= d
        x2 = x.reshape(m, kx)
    if kx != k:
        raise ValueError(f"x last dim {kx} != K {k}")
    y = _dequant_matmul_2d(
        x2, qt, layer, out_dtype=out_dtype, tile_m=tile_m,
        tile_n=tile_n, tile_k=tile_k, interpret=interpret,
        act_quant=act_quant, experts=(n_experts, stride),
        expert_mode=("psum" if mode == "grouped" else mode), hot=hot,
    )
    if mode == "sum":
        return y.reshape(*lead, n)
    if mode == "psum":
        # per-expert-slot outputs [M, E*N]: sum the slots in XLA (tail
        # slots under ``hot`` have zero x rows → contribute 0 exactly)
        return y.reshape(m, n_experts, n).sum(axis=1).reshape(*lead, n)
    if mode == "grouped":
        # fused grouped GEMM (r5 capacity dispatch): same per-expert-x
        # grid as "psum" but each slot's output is RETURNED instead of
        # summed — y[:, e*N:(e+1)*N] = x_e @ W_e → [E, .., N]
        return jnp.moveaxis(y.reshape(m, n_experts, n), 1, 0).reshape(
            (n_experts,) + tuple(lead) + (n,))
    return y.reshape(*lead, n_experts * n)


def _dequant_matmul_2d(
    x, qt, layer=None, *, out_dtype, tile_m, tile_n, tile_k, interpret,
    act_quant=False, lut_exact=False, experts=None, expert_mode="concat",
    hot=None,
):
    """``experts=(E, stride)`` fans ONE kernel launch over E stacked
    tensors at indices layer + e*stride (the merged MoE expert stack):

    * expert_mode="concat": x [M, K] against all E experts' columns →
      [M, E*N] (the dense-all-experts gate|up in one launch — the
      per-expert loop pays launch + issue latency E times per layer,
      measured dominating the full DeepSeek-V2-Lite decode step).
      Experts ride the parallel N grid dim.
    * expert_mode="sum": x [E, M, K] per-expert inputs, output
      Σ_e x_e @ W_e → [M, N] (the routed down-projection combine —
      fold the routing weights into x_e first). Experts ride the
      sequential K grid dim, accumulating in the same output block.
    """
    stacked = qt.codes.ndim == 3
    if stacked and layer is None:
        raise ValueError("stacked QTensor requires a layer index")
    n_exp, e_stride = experts if experts is not None else (1, 0)
    if experts is not None:
        if not stacked:
            raise _Untileable()
        if qt.lut is not None:
            # the in-kernel codebook row is indexed by lr[0] only
            raise _Untileable()
        if expert_mode in ("sum", "psum"):
            n_exp_m, m, k = x.shape
            assert n_exp_m == n_exp
            x = x.reshape(n_exp * m, k)
        else:
            m, k = x.shape
    else:
        m, k = x.shape
    _, n = qt.shape
    gs = qt.group_size
    bits = qt.bits
    if bits == 4 and qt.kshards != 1:
        # Shard-blocked packing only makes sense consumed per-shard (where
        # local_view restores kshards=1); a global matmul over it falls back.
        raise _Untileable()
    lut_mode = None
    if qt.lut is not None:
        if bits != 4 or act_quant:
            # reference path handles both (dequantize() consumes the lut)
            raise _Untileable()
        lut_mode = "sel15" if lut_exact else "word4"
        lut2 = qt.lut if qt.lut.ndim == 2 else qt.lut[None]   # [L?, 16]
        if stacked and lut2.shape[0] == 1:
            # a shared (unstacked) table under a stacked weight: replicate
            # rows so the kernel's layer-indexed SMEM read stays in bounds
            lut2 = jnp.broadcast_to(lut2, (qt.codes.shape[0], 16))
        if lut_mode == "word4":
            lq = jnp.round(lut2.astype(jnp.float32) * 127.0).astype(
                jnp.int32) + 128
            sh = (jnp.arange(4, dtype=jnp.int32) * 8)[None, None]
            lut_arr = jnp.sum(
                lq.reshape(lut2.shape[0], 4, 4) << sh, axis=-1,
                dtype=jnp.int32)                               # [L?, 4]
        else:
            lut_arr = lut2.astype(jnp.float32)                 # [L?, 16]

    sub = _sublane(x.dtype)
    m_pad = _round_up(max(m, sub), sub)
    tm = min(_round_up(tile_m, sub), m_pad)
    if m_pad % tm != 0:
        tm = m_pad  # few M tiles at decode sizes; just use one
    if m_pad != m:
        if experts is not None and expert_mode in ("sum", "psum"):
            x = jnp.pad(x.reshape(n_exp, m, k),
                        ((0, 0), (0, m_pad - m), (0, 0))
                        ).reshape(n_exp * m_pad, k)
        else:
            x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    # Logical K range handled per grid step (per nibble-half for int4).
    k_eff = k // 2 if bits == 4 else k
    if tm > 32:
        # large-M (prefill) tiles: cap TN — the wide-TN decode config's
        # VMEM footprint (acc + unpack intermediates) ICEs Mosaic at
        # prefill block sizes (measured; no diagnostics from the compiler)
        tile_n = min(tile_n, 2048)
    try:
        tn = _largest_tile(n, tile_n, 128)
    except ValueError:
        raise _Untileable()
    try:
        tk = _largest_tile(k_eff, tile_k, 128)
    except ValueError:
        # No 128-multiple divides k_eff (e.g. DeepSeek-V2-Lite's int4
        # down: K=1408 → 704 packed rows). A SINGLE full-dim K tile is
        # still legal — the x operands are fed as pre-split nibble
        # halves so their block lane dim equals the array dim, and the
        # codes block's sublane dim only needs a multiple of 8. Cap the
        # tile so the VMEM working set stays sane.
        if k_eff <= 2048 and k_eff % 8 == 0:
            tk = k_eff
        else:
            raise _Untileable()
    # Scale-group alignment: a K-tile must cover whole groups or sit inside one.
    if tk % gs != 0 and gs % tk != 0:
        g = tk - tk % gs if tk > gs else 0
        while g >= 128 and (k_eff % g or g % gs):
            g -= 128
        if g < 128:
            raise _Untileable()
        tk = g
    if bits == 4 and (k // 2) % gs != 0 and gs % tk != 0 and gs != k:
        # The hi-half's group offset K/2 must land on a group boundary (or
        # everything is one group); otherwise a tile would straddle groups.
        raise _Untileable()

    n_m, n_n, n_k = m_pad // tm, n // tn, k_eff // tk
    # expert fan-out: concat mode widens the parallel N grid dim E-fold
    # (out [M, E*N]); sum mode deepens the sequential K dim E-fold (the
    # kernel's per-chain reset/write brackets the whole E*n_k chain,
    # accumulating all experts into one output block).
    #
    # Hot-routed decode (``hot`` = [1+n_exp] int32: [n_hot, compacted
    # hot expert ids, clamped-repeat tail], r5 VERDICT #7): expert slot
    # j streams expert hot[1+j]'s weights; slots >= n_hot clamp BOTH
    # the expert id (to the last hot expert) AND the K-chain block (to
    # 0). Tail outputs are garbage; the caller zeroes them with the
    # permuted routing weights (concat) / zero x rows (sum), keeping
    # the math EXACT. Concat mode moves experts onto the SEQUENTIAL
    # grid dim (chains of n_k) so the clamped repeats are consecutive.
    # Hardware note (2026-08-20): unlike the paged-attention page
    # clamp, Mosaic does NOT skip these repeated weight fetches — a
    # full-E hot grid measured byte-for-byte even with dense. The
    # caller must shrink n_exp itself (bucketed slot counts,
    # models/llama.py _routed_buckets); the clamp's job is only the
    # bucket-rounding tail's correctness.
    use_hot = hot is not None and experts is not None
    chain = grid_k_chain = None
    if use_hot and expert_mode == "concat":
        grid_n, grid_k = n_n, n_exp * n_k
        e_of = lambda i, j, kk: kk // n_k
        j_of = lambda j: j
        kk_of = lambda kk: kk % n_k
        x_row = lambda i, kk: i
        n_out = n_exp * n
        chain = n_k
    elif experts is not None and expert_mode in ("concat", "psum"):
        # "psum" (r5): the routed down combine with experts on the
        # PARALLEL grid — each expert slot reads ITS OWN x rows and
        # writes its own [M, N] slice; the caller sums over slots in
        # XLA (a few MB). The old "sum" mode chained E sequential
        # accumulation steps over strided expert rows and measured
        # 187 GB/s at L=8 collapsing to 80 at L=26 (2026-08-20) while
        # the parallel-expert grid holds 532-672 — the sequential
        # chain's prefetch never hides the strided jumps.
        grid_n, grid_k = n_exp * n_n, n_k
        e_of = lambda i, j, kk: j // n_n
        j_of = lambda j: j % n_n
        kk_of = lambda kk: kk
        if expert_mode == "psum":
            x_row = None   # per-expert x rows; see x_maps below
        else:
            x_row = lambda i, kk: i
        n_out = n_exp * n
    elif experts is not None:
        grid_n, grid_k = n_n, n_exp * n_k
        e_of = lambda i, j, kk: kk // n_k
        j_of = lambda j: j
        kk_of = lambda kk: kk % n_k
        x_row = lambda i, kk: (kk // n_k) * n_m + i
        n_out = n
    else:
        grid_n, grid_k = n_n, n_k
        e_of = lambda i, j, kk: 0
        j_of = lambda j: j
        kk_of = lambda kk: kk
        x_row = lambda i, kk: i
        n_out = n
    if chain is None:
        chain = grid_k
    tile_g = max(1, tk // gs)
    gsz = min(gs, tk)

    # Scales are read straight off the scale array via BlockSpec index
    # maps — no XLA-side gather/copy per call. The [.., K/G, N] array is
    # reshaped (a contiguous-bitcast, never a copy) to
    # [.., K/G/tile_g, tile_g, N] so the block's last-two dims EQUAL the
    # array dims — Mosaic rejects a sublane block dim that is neither a
    # multiple of 8 nor the full dim (hardware-measured failure at
    # tile_g=4). Index maps return block-row indices over the leading dim:
    # row kk when the K-tile covers whole groups; row kk*TK//G when it
    # sits inside one.
    scale_rows = k // gs
    s3 = qt.scales.reshape(*qt.scales.shape[:-2], scale_rows // tile_g,
                           tile_g, n)
    if tk >= gs:                      # tk % gs == 0: block-row kk
        lo_row = lambda kk: kk
        hi_off = k_eff // tk if bits == 4 else 0   # = (k/2)//gs / tile_g
    else:                             # gs % tk == 0: tile_g == 1
        r = gs // tk
        lo_row = lambda kk: kk // r
        # (k/2) % gs == 0 guaranteed by the fallback rules unless gs == k
        # (single group → row 0 either way).
        hi_off = (k // 2) // gs if bits == 4 else 0

    acc = pltpu.VMEM((tm, tn), jnp.float32)
    out_shape = jax.ShapeDtypeStruct((m_pad, n_out), out_dtype)
    out_spec = pl.BlockSpec(
        (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
    )
    if stacked:
        def sidx(i, j, kk, lr, *pf):
            e = e_of(i, j, kk)
            if use_hot:
                e = pf[0][1 + e]       # remap slot -> hot expert id
            return lr[0] + e * e_stride

        def kko(i, j, kk, *pf):
            # hot tail: clamp the chain block to 0 (consecutive repeats
            # -> fetch skipped); active slots keep their real block
            if use_hot:
                return jnp.where(e_of(i, j, kk) < pf[0][0],
                                 kk_of(kk), 0)
            return kk_of(kk)
        s_lo_spec = pl.BlockSpec(
            (1, 1, tile_g, tn),
            lambda i, j, kk, lr, *pf: (sidx(i, j, kk, lr, *pf),
                                       lo_row(kko(i, j, kk, *pf)), 0,
                                       j_of(j)),
            memory_space=pltpu.VMEM)
        s_hi_spec = pl.BlockSpec(
            (1, 1, tile_g, tn),
            lambda i, j, kk, lr, *pf: (sidx(i, j, kk, lr, *pf),
                                       hi_off + lo_row(kko(i, j, kk,
                                                           *pf)), 0,
                                       j_of(j)),
            memory_space=pltpu.VMEM)
    else:
        s_lo_spec = pl.BlockSpec(
            (1, tile_g, tn), lambda i, j, kk: (lo_row(kk), 0, j),
            memory_space=pltpu.VMEM)
        s_hi_spec = pl.BlockSpec(
            (1, tile_g, tn), lambda i, j, kk: (hi_off + lo_row(kk), 0, j),
            memory_space=pltpu.VMEM)

    # f32 compute through decode M (int8→f32 converts measure faster
    # than →bf16 on this chip); bf16 only for large-M prefill. An r4
    # experiment moved the threshold to 16 after the flagship trace
    # showed in-model matmuls at ~500 GB/s (vs the bench's 640) — bf16
    # tiles at M=48 made the whole step WORSE (16.8 vs 14.7 ms), so the
    # cast, not the f32 MXU rate, is the binding cost and 64 stands.
    cdt = jnp.float32 if tm <= 64 else x.dtype
    res, x_blk = None, (tm, tk)
    # Resident psum-decode x only while the estimated whole-kernel VMEM
    # footprint fits _SCOPED_VMEM_BUDGET (see the constant's comment):
    # 2 buffers per operand window + the dequantized-tile temporaries.
    # Past the budget, fall back to per-expert x blocks (slower HBM
    # pattern, but always compiles).
    halves = 2 if bits == 4 else 1
    x_res = halves * n_exp * tm * tk * jnp.dtype(x.dtype).itemsize
    est = (2 * x_res                       # resident x windows
           + 2 * tk * tn                   # packed u8 weight windows
           + tk * tn * jnp.dtype(cdt).itemsize   # dequant temporaries
           + 4 * halves * tile_g * tn * 4  # scale windows
           + tm * tn * 4                   # f32 accumulator
           + 2 * tm * tn * jnp.dtype(out_dtype).itemsize)
    res_ok = est <= _SCOPED_VMEM_BUDGET
    if bits == 8:
        kern = functools.partial(_kernel_int8, n_k=chain,
                                 tile_g=tile_g, gsz=gsz, cdt=cdt,
                                 stacked=stacked, aq=act_quant)
        if stacked:
            w_spec = pl.BlockSpec(
                (1, tk, tn),
                lambda i, j, kk, lr, *pf: (sidx(i, j, kk, lr, *pf),
                                           kko(i, j, kk, *pf),
                                           j_of(j)),
                memory_space=pltpu.VMEM)
        else:
            w_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                                  memory_space=pltpu.VMEM)
        if x_row is None and n_m == 1 and res_ok:
            # psum decode: ALL experts' x rows resident in one VMEM
            # block (constant index map → fetched once); kernel slices
            # per expert (_x_slice) so HBM streams only weights
            res = (n_n, tm)
            x_blk = (n_exp * tm, tk)
            x_maps = [lambda i, j, kk: (0, kk_of(kk))]
        elif x_row is None:    # psum prefill / big-B: per-expert blocks
            x_maps = [lambda i, j, kk: ((j // n_n) * n_m + i,
                                        kk_of(kk))]
        else:
            x_maps = [lambda i, j, kk: (x_row(i, kk), kk_of(kk))]
        in_specs_tail = [w_spec, s_lo_spec]
        args = (x, qt.codes, s3)
        w_bytes = k * n * n_exp
    else:
        k2 = k // 2
        # x arrives as SEPARATE lo/hi halves: their block lane dim can
        # then be the FULL half-array dim, which is what makes the
        # non-128-multiple k_eff fallback above legal (a (tm, 704)
        # block of a [M, 1408] array is not, of a [M, 704] array it is)
        kern = functools.partial(_kernel_int4, n_k=chain,
                                 tile_g=tile_g, gsz=gsz, cdt=cdt,
                                 stacked=stacked, aq=act_quant,
                                 lut_mode=lut_mode)
        if stacked:
            w_spec = pl.BlockSpec(
                (1, tk, tn),
                lambda i, j, kk, lr, *pf: (sidx(i, j, kk, lr, *pf),
                                           kko(i, j, kk, *pf),
                                           j_of(j)),
                memory_space=pltpu.VMEM)
        else:
            w_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                                  memory_space=pltpu.VMEM)
        if x_row is None and n_m == 1 and res_ok:
            # psum decode: resident x halves (see the int8 branch)
            res = (n_n, tm)
            x_blk = (n_exp * tm, tk)
            xm = lambda i, j, kk: (0, kk_of(kk))
            x_maps = [xm, xm]
        elif x_row is None:    # psum prefill / big-B: per-expert blocks
            xm = lambda i, j, kk: ((j // n_n) * n_m + i, kk_of(kk))
            x_maps = [xm, xm]
        else:
            x_maps = [lambda i, j, kk: (x_row(i, kk), kk_of(kk)),
                      lambda i, j, kk: (x_row(i, kk), kk_of(kk))]
        in_specs_tail = [w_spec, s_lo_spec, s_hi_spec]
        args = (x[:, :k2], x[:, k2:], qt.codes, s3, s3)
        if lut_mode is not None:
            # whole (tiny) codebook array in SMEM; kernel reads scalars,
            # stacked kernels index the layer row via the prefetched lr
            if stacked:
                lut_spec = pl.BlockSpec(
                    lut_arr.shape, lambda i, j, kk, lr: (0, 0),
                    memory_space=pltpu.SMEM)
            else:
                lut_spec = pl.BlockSpec(
                    lut_arr.shape, lambda i, j, kk: (0, 0),
                    memory_space=pltpu.SMEM)
            in_specs_tail = in_specs_tail + [lut_spec]
            args = args + (lut_arr,)

            base4 = kern

            def kern(x_lo, x_hi, w, s_lo, s_hi, lut, o, acc,
                     layer_ref=None):
                return base4(x_lo, x_hi, w, s_lo, s_hi, o, acc,
                             lut_ref=lut, layer_ref=layer_ref)
        w_bytes = (k // 2) * n * n_exp

    if res is not None:
        kern = functools.partial(kern, res=res)
    x_bytes = x.shape[0] * k * x.dtype.itemsize
    s_bytes = (k // gs) * n * 4 * n_exp
    cost = pl.CostEstimate(
        flops=2 * m_pad * n * k * n_exp,
        bytes_accessed=w_bytes + x_bytes + s_bytes
        + m_pad * n_out * jnp.dtype(out_dtype).itemsize,
        transcendentals=0,
    )
    params = dict(
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )
    if not stacked:
        in_specs = [pl.BlockSpec(x_blk, xm, memory_space=pltpu.VMEM)
                    for xm in x_maps] + in_specs_tail
        y = pl.pallas_call(
            kern, grid=(n_m, grid_n, grid_k), in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=[acc], **params,
        )(*args)
    else:
        # Scalar-prefetched layer index (and, hot-routed, the hot-expert
        # list): every index map takes the prefetch refs first; x inputs
        # use only the chain-clamped column (weight + scale specs take
        # the full remap).
        def xlift(f):
            return lambda i, j, kk, lr, *pf: (f(i, j, kk)[0],
                                              kko(i, j, kk, *pf))
        in_specs = [
            pl.BlockSpec(x_blk, xlift(xm), memory_space=pltpu.VMEM)
            for xm in x_maps
        ] + in_specs_tail
        if use_hot and expert_mode == "concat":
            # expert slots ride the sequential dim: out block j_e*n_n+j
            out_map = lambda i, j, kk, lr, *pf: (
                i, e_of(i, j, kk) * n_n + j)
        else:
            out_map = lambda i, j, kk, lr, *pf: (i, j)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if use_hot else 1,
            grid=(n_m, grid_n, grid_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[acc],
        )

        def kern_p(lr_ref, *rest):
            if use_hot:
                rest = rest[1:]        # drop the hot-list ref
            if bits == 4 and lut_mode is not None:
                return kern(*rest, layer_ref=lr_ref)
            del lr_ref
            return kern(*rest)

        lr = jnp.asarray(layer, jnp.int32).reshape(1)
        pargs = (lr, hot) if use_hot else (lr,)
        y = pl.pallas_call(kern_p, grid_spec=grid_spec,
                           **params)(*pargs, *args)
    return y[:m] if m_pad != m else y
