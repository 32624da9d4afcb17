"""Calibrated (activation-aware) weight quantization — GPTQ.

The codec's RTN (round-to-nearest with symmetric absmax scales,
core/codec.py) treats every weight entry alike. GPTQ [Frantar et al.,
2023] instead minimizes the LAYER OUTPUT error ``||XW - XQ||_F`` over a
calibration activation sample X: input dimensions are quantized one at a
time and the (Hessian-weighted) rounding error of each is folded back
into the not-yet-quantized rows, so correlated input features compensate
for each other's rounding. The result is bit-for-bit the SAME storage
format as RTN — a :class:`~quant_tpu.core.qtensor.QTensor` with
per-(group, column) scales and the split-K int4 packing — so kernels,
checkpoints, sharding and serving are untouched; only the codes/scales
get smarter.

Two entry points:

* :func:`gptq_quantize_tensor` — one [K, N] weight + a Hessian proxy
  ``H = Xᵀ diag(wgt) X`` over its calibration inputs.
* :class:`GPTQCalibrator` — the sequential model-level pipeline: runs a
  float32 forward of each decoder layer on calibration tokens (with the
  DEPLOYED KV quantization and attention semantics, including Gemma-2
  windows/softcap), captures each projection's inputs, GPTQ-quantizes
  it, and propagates the QUANTIZED layer's outputs to the next layer —
  the standard error-compounding-aware schedule. Consumed by
  :func:`gptq_quantize_dense` (in-memory dense dicts, mirrors
  ``llama.quantize_dense_params``) and by the HF converter's
  ``algo="gptq"`` streaming path (checkpoint/hf.py).

No reference counterpart (the C++ oracle is a round-trip codec —
SURVEY.md §0); this generalizes its scheme exactly as the fused kernels
do [B:5], on the calibration side instead of the serving side.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core import codec
from quant_tpu.core.qtensor import QTensor, concat_columns

__all__ = [
    "accumulate_hessian", "gptq_quantize_tensor", "awq_scales",
    "GPTQCalibrator", "gptq_quantize_dense",
]


def awq_scales(w: np.ndarray, x: np.ndarray, bits: int,
               group_size: int | None = None,
               alphas=(0.0, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9)
               ) -> np.ndarray:
    """AWQ-style per-input-channel equalization scales s [K].

    Protects activation-salient channels from quantization error: the
    runtime computes ``(x/s) @ Q(s·W)`` — s is folded into the PRECEDING
    op (norm weights / up-proj columns), so serving kernels are
    untouched. s = (mean|x| / geo-mean)^α with α grid-searched to
    minimize ``‖x Q_eff(W) − x W‖²`` on the calibration sample
    [Lin et al., AWQ 2023 — pattern only].
    """
    from quant_tpu.core.qtensor import quantize_tensor

    w = np.asarray(w, np.float32)
    x = np.asarray(x, np.float32).reshape(-1, w.shape[0])
    xm = np.mean(np.abs(x), axis=0) + 1e-8
    xm = xm / np.exp(np.mean(np.log(xm)))  # geo-mean normalized
    ref = x @ w
    best_s, best_err = np.ones(w.shape[0], np.float32), np.inf
    for a in alphas:
        s = np.clip(xm ** a, 1e-4, 1e4).astype(np.float32)
        dq = np.asarray(quantize_tensor(
            w * s[:, None], bits, group_size).dequantize())
        err = float(np.mean((x @ (dq / s[:, None]) - ref) ** 2))
        if err < best_err:
            best_s, best_err = s, err
    return best_s


def accumulate_hessian(x: np.ndarray, wgt: np.ndarray | None = None,
                       h: np.ndarray | None = None) -> np.ndarray:
    """H += 2 · Xᵀ diag(wgt) X for calibration inputs x [M, K].

    ``wgt`` [M] weights samples (MoE: a token's routing weight scales its
    contribution to that expert's objective); None → all-ones."""
    x = np.asarray(x, np.float32).reshape(-1, x.shape[-1])
    if wgt is not None:
        x = x * np.sqrt(np.maximum(
            np.asarray(wgt, np.float32).reshape(-1), 0.0))[:, None]
    g = 2.0 * (x.T @ x)
    return g if h is None else h + g


def gptq_quantize_tensor(
    w: np.ndarray,
    hessian: np.ndarray,
    bits: int,
    group_size: int | None = None,
    kshards: int = 1,
    percdamp: float = 0.01,
    blocksize: int = 128,
) -> QTensor:
    """GPTQ-quantize a dense [K, N] weight into a QTensor.

    ``hessian`` [K, K] from :func:`accumulate_hessian`. Same storage
    contract as :func:`~quant_tpu.core.qtensor.quantize_tensor` (scales
    per (K-group, column), round-half-even, split-K int4 packing with
    ``kshards`` row blocks); only the code VALUES differ — each input
    dim's rounding error is propagated into later rows via the inverse
    Hessian's Cholesky factor, lazily in ``blocksize`` row blocks so the
    cross-block update is one BLAS matmul.
    """
    w = np.array(w, dtype=np.float32, copy=True)
    if w.ndim != 2:
        raise ValueError(f"expected [K, N] weight, got shape {w.shape}")
    k, n = w.shape
    gs = k if group_size is None else group_size
    if k % gs:
        raise ValueError(f"group_size {gs} must divide K={k}")
    qmax = np.float32(codec.qmax_for_bits(bits))

    h = np.array(hessian, dtype=np.float64, copy=True)
    if h.shape != (k, k):
        raise ValueError(f"hessian shape {h.shape} != ({k}, {k})")
    dead = np.diag(h) <= 0
    h[dead, dead] = 1.0
    w[dead, :] = 0.0
    # damping keeps the Cholesky well-posed on rank-deficient samples
    h[np.arange(k), np.arange(k)] += percdamp * np.mean(np.diag(h))
    # upper factor U with UᵀU = H⁻¹: d_i = U[i,i], update row U[i, i+1:]
    hinv = np.linalg.inv(h)
    u = np.linalg.cholesky(hinv).T.astype(np.float32)

    codes = np.zeros((k, n), np.int8)
    scales = np.zeros((k // gs, n), np.float32)
    for i1 in range(0, k, blocksize):
        i2 = min(i1 + blocksize, k)
        w1 = w[i1:i2].copy()
        err1 = np.zeros_like(w1)
        u1 = u[i1:i2, i1:i2]
        for j in range(i2 - i1):
            i = i1 + j
            if i % gs == 0:
                # group scale from the CURRENT (error-compensated so
                # far) weights: rows inside this block live in w1 (w is
                # only written back at block end), rows past it in w —
                # reading only w would miss the in-block compensation
                # and clip-saturate compensated values (codec absmax
                # semantics on the freshest data)
                hi = min(i + gs, i2)
                seg = w1[j:hi - i1]
                if i + gs > i2:
                    seg = np.concatenate([seg, w[i2:i + gs]], axis=0)
                absmax = np.max(np.abs(seg), axis=0)
                scales[i // gs] = np.where(absmax == 0.0, 1.0,
                                           absmax / qmax)
            s = scales[i // gs]
            q = np.clip(np.round(w1[j] / s), -qmax, qmax)
            codes[i] = q.astype(np.int8)
            err = (w1[j] - q * s) / u1[j, j]
            if j + 1 < i2 - i1:
                w1[j + 1:] -= np.outer(u1[j, j + 1:], err)
            err1[j] = err
        w[i1:i2] = w1
        if i2 < k:
            w[i2:] -= u[i1:i2, i2:].T @ err1

    if bits == 4:
        if k % (2 * kshards):
            raise ValueError("int4 requires even K per shard block")
        kb = k // kshards
        codes = np.concatenate(
            [codec.pack_int4_matmul(codes[s * kb:(s + 1) * kb])
             for s in range(kshards)], axis=0)
    return QTensor(codes=codes, scales=scales, bits=bits, group_size=gs,
                   shape=(k, n), kshards=kshards)


# ── model-level sequential calibration ──────────────────────────────────


class GPTQCalibrator:
    """Sequential layer-wise GPTQ over a float32 calibration forward.

    Feed decoder layers in order via :meth:`layer` (dense [K, N] numpy
    weights in the ``quantize_dense_params`` naming); each call captures
    the projections' inputs from the running hidden state, quantizes
    them with GPTQ, recomputes the layer with the QUANTIZED weights and
    advances the state. :meth:`finish` quantizes lm_head against the
    final-norm output. The forward mirrors deployment semantics: the
    configured KV quantization, per-layer sliding windows, softcaps,
    post-norms, QK-norms and MoE routing all apply (llama.forward's
    math, batch-prefill shape [B, T]).
    """

    def __init__(self, cfg, tokens: np.ndarray, embed,
                 percdamp: float = 0.01, blocksize: int = 128,
                 tp: int = 1, algo: str = "gptq", awq: bool = False):
        from quant_tpu.models import llama

        if algo not in ("gptq", "rtn"):
            raise ValueError(f"algo must be gptq|rtn, got {algo!r}")
        if awq and cfg.n_experts:
            raise ValueError("awq scale folding is not supported for "
                             "MoE models (expert up-proj folds would "
                             "need per-expert scales)")
        if cfg.is_mla and awq:
            raise ValueError("MLA calibration has no AWQ fold (the "
                             "low-rank a-projections feed norms whose "
                             "gains the fold would have to split "
                             "across two parts)")
        self.cfg = cfg
        self.percdamp = percdamp
        self.blocksize = blocksize
        self.tp = tp
        self.algo = algo
        self.awq = awq
        self._llama = llama
        tokens = np.asarray(tokens, np.int64)
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        self.b, self.t = tokens.shape
        # deployment-faithful embedding (embed_bits=8 noise included)
        table = llama._make_embed(np.asarray(embed, np.float32), cfg)
        self.h = np.asarray(
            llama._embed_lookup(table, jnp.asarray(tokens), jnp.float32,
                                cfg), np.float32)
        self.positions = jnp.broadcast_to(
            jnp.arange(self.t)[None, :], (self.b, self.t))
        self._windows = np.asarray(llama.layer_windows(cfg))
        self._layer_idx = 0

    # -- helpers --------------------------------------------------------

    def _norm(self, x, wn):
        cfg = self.cfg
        return np.asarray(self._llama.rmsnorm(
            jnp.asarray(x), jnp.asarray(wn, jnp.float32), cfg.norm_eps,
            cfg.norm_offset), np.float32)

    def _gptq(self, w, x, kshards=1, wgt=None):
        if self.algo == "rtn":
            from quant_tpu.core.qtensor import quantize_tensor

            return quantize_tensor(np.asarray(w, np.float32),
                                   self.cfg.bits, self.cfg.group_size,
                                   kshards=kshards)
        h = accumulate_hessian(x, wgt)
        return gptq_quantize_tensor(
            w, h, self.cfg.bits, self.cfg.group_size, kshards=kshards,
            percdamp=self.percdamp, blocksize=self.blocksize)

    def _awq_fold_norm(self, w, x, norm):
        """AWQ for a norm-fed projection: search s, fold into the norm's
        effective gain (offset + w)/s, return (scaled W, x/s, norm')."""
        s = awq_scales(w, x, self.cfg.bits, self.cfg.group_size)
        off = self.cfg.norm_offset
        norm2 = (off + np.asarray(norm, np.float32)) / s - off
        return w * s[:, None], x / s[None, :], norm2

    def _mm(self, x, qt: QTensor):
        return np.asarray(
            jnp.asarray(x) @ qt.dequantize(jnp.float32), np.float32)

    def _attn(self, q, k, v, window: int):
        """Deployment-semantics attention: KV quantized at cfg.kv_bits,
        full causal prefill over [B, T]."""
        llama, cfg = self._llama, self.cfg
        k_q, k_s = llama.quantize_kv(jnp.asarray(k), cfg.kv_bits)
        v_q, v_s = llama.quantize_kv(jnp.asarray(v), cfg.kv_bits)
        out = llama.attention(
            jnp.asarray(q),
            jnp.moveaxis(k_q, 1, 2), jnp.moveaxis(k_s, 1, 2),
            jnp.moveaxis(v_q, 1, 2), jnp.moveaxis(v_s, 1, 2),
            self.positions, jnp.full((self.b,), self.t, jnp.int32), cfg,
            window=jnp.int32(window) if cfg.sliding_window else None)
        return np.asarray(out, np.float32)

    # -- pipeline -------------------------------------------------------

    def _layer_mla(self, dense: dict) -> dict:
        """One DeepSeek MLA layer: GPTQ the fused [q(_a)|kv_a] against
        the normed hidden state, w_q_b against the normed low-rank q,
        and wo against the absorbed attention output; the absorbed
        w_uk/w_uv pass through raw (they fold into einsums, not the
        stacked matmul kernel). The forward mirrors deployment: joint
        int8 latent quantization, value = prefix slice of the key."""
        llama, cfg = self._llama, self.cfg
        r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
        dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
        out: dict = {}

        attn_norm = np.asarray(dense["attn_norm"], np.float32)
        x1 = self._norm(self.h, attn_norm)
        qpart = np.asarray(
            dense["w_q_a" if cfg.q_lora_rank else "wq"], np.float32)
        # tp > 1 (r5): the fused [q(_a)|kv_a] packs with the deployment
        # concat_columns interleave (GPTQ columns are independent given
        # the shared Hessian, so interleaving before quantization
        # changes nothing numerically); the calibration forward
        # de-interleaves the OUTPUT back to part-major, mirroring
        # layer()'s GQA handling. w_q_b / w_uk / w_uv shard
        # contiguously in deployment — no interleave.
        wqkv = self._gptq(concat_columns(
            [qpart, np.asarray(dense["w_kv_a"], np.float32)], self.tp),
            x1)
        out["wqkv"], out["attn_norm"] = wqkv, attn_norm
        akv = self._mm(x1, wqkv)
        if self.tp > 1:
            akv = _departition_columns(
                akv, (qpart.shape[1], r + dr), self.tp)
        qp, ckv = akv[..., :-(r + dr)], akv[..., -(r + dr):]
        if cfg.q_lora_rank:
            q_a_norm = np.asarray(dense["q_a_norm"], np.float32)
            qa = self._norm(qp, q_a_norm)
            w_q_b = self._gptq(np.asarray(dense["w_q_b"], np.float32),
                               qa)
            out["w_q_b"], out["q_a_norm"] = w_q_b, q_a_norm
            qp = self._mm(qa, w_q_b)
        qh = qp.reshape(self.b, self.t, -1, dn + dr)
        q_nope, q_pe = qh[..., :dn], qh[..., dn:]
        kv_a_norm = np.asarray(dense["kv_a_norm"], np.float32)
        out["kv_a_norm"] = kv_a_norm
        c = self._norm(ckv[..., :r], kv_a_norm)
        k_pe = ckv[..., r:][:, :, None, :]
        q_pe = np.asarray(llama._rope(
            jnp.asarray(q_pe), self.positions, cfg.rope_theta, cfg),
            np.float32)
        k_pe = np.asarray(llama._rope(
            jnp.asarray(k_pe), self.positions, cfg.rope_theta, cfg),
            np.float32)
        w_uk = np.asarray(dense["w_uk"], np.float32)
        w_uv = np.asarray(dense["w_uv"], np.float32)
        out["w_uk"], out["w_uv"] = w_uk, w_uv
        q_eff = np.concatenate(
            [np.einsum("bthn,hnr->bthr", q_nope, w_uk), q_pe], axis=-1)
        lat = np.concatenate([c, k_pe[:, :, 0]], axis=-1)[:, :, None, :]
        k_q, k_s = llama.quantize_kv(jnp.asarray(lat), cfg.kv_bits)
        k_q, k_s = jnp.moveaxis(k_q, 1, 2), jnp.moveaxis(k_s, 1, 2)
        o_lat = np.asarray(llama.attention(
            jnp.asarray(q_eff), k_q, k_s, k_q[..., :r], k_s,
            self.positions, jnp.full((self.b,), self.t, jnp.int32),
            cfg), np.float32)
        attn = np.einsum("bthr,hrv->bthv", o_lat, w_uv).reshape(
            self.b, self.t, -1)
        wo = self._gptq(np.asarray(dense["wo"], np.float32), attn,
                        kshards=self.tp)
        out["wo"] = wo
        self.h = self.h + self._mm(attn, wo)

        mlp_norm = np.asarray(dense["mlp_norm"], np.float32)
        out["mlp_norm"] = mlp_norm
        x2 = self._norm(self.h, mlp_norm)
        act = jax.nn.silu
        d = cfg.dim

        def glu(wgu_qt, wdn_dense, it_w, wgt=None):
            gu = self._mm(x2, wgu_qt)
            if self.tp > 1:
                gu = _departition_columns(gu, (it_w, it_w), self.tp)
            gate, up = np.split(gu, 2, axis=-1)
            a = np.asarray(act(jnp.asarray(gate)), np.float32) * up
            wdn = self._gptq(np.asarray(wdn_dense, np.float32), a,
                             wgt=wgt, kshards=self.tp)
            return wdn, self._mm(a, wdn)

        moe_l = cfg.n_experts and self._layer_idx >= cfg.first_k_dense
        if not moe_l:
            wg = np.asarray(dense["w_gate"], np.float32)
            wgu = self._gptq(concat_columns(
                [wg, np.asarray(dense["w_up"], np.float32)], self.tp),
                x2)
            wdn, m = glu(wgu, dense["w_down"], wg.shape[1])
            out["w_gate_up"], out["w_down"] = wgu, wdn
        else:
            router = np.asarray(dense["router"], np.float32)
            bias = (np.asarray(dense["router_bias"], np.float32)
                    if cfg.router_bias else None)
            rw = np.asarray(llama.moe_route(
                jnp.asarray(x2), jnp.asarray(router), cfg,
                bias=None if bias is None else jnp.asarray(bias)),
                np.float32)
            out["router"] = router
            if bias is not None:
                out["router_bias"] = bias
            # always-on shared expert: plain GPTQ against x2
            wsg = np.asarray(dense["shared.w_gate"], np.float32)
            wsgu = self._gptq(concat_columns(
                [wsg, np.asarray(dense["shared.w_up"], np.float32)],
                self.tp), x2)
            wsdn, m = glu(wsgu, dense["shared.w_down"], wsg.shape[1])
            out["ws_gate_up"], out["ws_down"] = wsgu, wsdn
            x2_flat = x2.reshape(-1, d)
            for e in range(cfg.n_experts):
                wgt = rw[..., e].reshape(-1)
                h_e = accumulate_hessian(x2_flat, wgt)
                weg = np.asarray(dense[f"expert{e}.w_gate"], np.float32)
                wgu = gptq_quantize_tensor(
                    concat_columns(
                        [weg, np.asarray(dense[f"expert{e}.w_up"],
                                         np.float32)], self.tp),
                    h_e, cfg.bits, cfg.group_size,
                    percdamp=self.percdamp, blocksize=self.blocksize)
                gu_e = self._mm(x2, wgu)
                if self.tp > 1:
                    gu_e = _departition_columns(
                        gu_e, (weg.shape[1], weg.shape[1]), self.tp)
                gate, up = np.split(gu_e, 2, axis=-1)
                a = np.asarray(act(jnp.asarray(gate)), np.float32) * up
                wdn_d = llama._pad_moe_down_k(np.asarray(
                    dense[f"expert{e}.w_down"], np.float32), self.tp)
                a = np.asarray(llama._pad_x_to_k(
                    jnp.asarray(a), wdn_d.shape[0], self.tp),
                    np.float32)
                wdn = self._gptq(wdn_d, a, wgt=wgt, kshards=self.tp)
                out[f"we_gate_up.{e}"], out[f"we_down.{e}"] = wgu, wdn
                m = m + self._mm(a, wdn) * rw[..., e:e + 1]
        self.h = self.h + m
        self._layer_idx += 1
        return out

    def layer(self, dense: dict) -> dict:
        """Quantize one decoder layer; returns {name: QTensor | array}
        in quantize_dense_params' per-layer naming (wqkv/wo fused with
        the calibrator's ``tp`` interleave, MoE experts included).
        MLA configs dispatch to :meth:`_layer_mla` (its own naming)."""
        llama, cfg = self._llama, self.cfg
        if cfg.is_mla:
            return self._layer_mla(dense)
        d, hd = cfg.dim, cfg.head_dim
        nq, nkv = cfg.n_heads * hd, cfg.n_kv_heads * hd
        out: dict = {}
        moe = cfg.n_experts > 0

        attn_norm = np.asarray(dense["attn_norm"], np.float32)
        x1 = self._norm(self.h, attn_norm)
        wqkv_dense = concat_columns(
            [np.asarray(dense["wq"], np.float32),
             np.asarray(dense["wk"], np.float32),
             np.asarray(dense["wv"], np.float32)], self.tp)
        if self.awq:
            x1f = x1.reshape(-1, d)
            wqkv_dense, x1f, attn_norm = self._awq_fold_norm(
                wqkv_dense, x1f, attn_norm)
            x1 = x1f.reshape(x1.shape)
        wqkv = self._gptq(wqkv_dense, x1)
        out["wqkv"] = wqkv
        out["attn_norm"] = attn_norm

        bias = dense.get("qkv_bias")
        if bias is None and "q_bias" in dense:
            bias = concat_columns(
                [np.asarray(dense["q_bias"], np.float32)[None, :],
                 np.asarray(dense["k_bias"], np.float32)[None, :],
                 np.asarray(dense["v_bias"], np.float32)[None, :]],
                self.tp)[0]
        qkv = self._mm(x1, wqkv)
        if bias is not None:
            # un-interleave not needed: bias rides the fused column order
            qkv = qkv + np.asarray(bias, np.float32)
        if self.tp > 1:
            # fused shard-major columns → part-major for the head split
            qkv = _departition_columns(qkv, (nq, nkv, nkv), self.tp)
        q = qkv[..., :nq].reshape(self.b, self.t, -1, hd)
        k = qkv[..., nq:nq + nkv].reshape(self.b, self.t, -1, hd)
        v = qkv[..., nq + nkv:].reshape(self.b, self.t, -1, hd)
        if cfg.qk_norm:
            q = np.asarray(llama.rmsnorm(
                jnp.asarray(q), jnp.asarray(dense["q_norm"], jnp.float32),
                cfg.norm_eps, cfg.norm_offset), np.float32)
            k = np.asarray(llama.rmsnorm(
                jnp.asarray(k), jnp.asarray(dense["k_norm"], jnp.float32),
                cfg.norm_eps, cfg.norm_offset), np.float32)
        tov = llama._layer_theta(
            cfg, jnp.int32(self._windows[self._layer_idx]))
        q = np.asarray(llama._rope(jnp.asarray(q), self.positions,
                                   cfg.rope_theta, cfg,
                                   theta_override=tov), np.float32)
        k = np.asarray(llama._rope(jnp.asarray(k), self.positions,
                                   cfg.rope_theta, cfg,
                                   theta_override=tov), np.float32)
        attn = self._attn(q, k, v, int(self._windows[self._layer_idx]))
        attn = attn.reshape(self.b, self.t, -1)

        wo = self._gptq(np.asarray(dense["wo"], np.float32), attn,
                        kshards=self.tp)
        out["wo"] = wo
        o = self._mm(attn, wo)
        if cfg.post_norms:
            o = self._norm(o, dense["post_attn_norm"])
        self.h = self.h + o

        mlp_norm = np.asarray(dense["mlp_norm"], np.float32)
        x2 = self._norm(self.h, mlp_norm)
        act = (jax.nn.gelu if cfg.act_fn == "gelu_tanh" else jax.nn.silu)
        it = cfg.intermediate

        def split_gu(gu):
            # fused gate|up products are shard-major under tp interleave
            if self.tp > 1:
                gu = _departition_columns(gu, (it, it), self.tp)
            return np.split(gu, 2, axis=-1)

        def mlp(wgu_qt: QTensor, wdn_dense, wgt=None):
            gate, up = split_gu(self._mm(x2, wgu_qt))
            a = np.asarray(act(jnp.asarray(gate)), np.float32) * up
            wdn = self._gptq(np.asarray(wdn_dense, np.float32), a,
                             kshards=self.tp, wgt=wgt)
            return wdn, self._mm(a, wdn)

        if not moe:
            fused = concat_columns(
                [np.asarray(dense["w_gate"], np.float32),
                 np.asarray(dense["w_up"], np.float32)], self.tp)
            wdn_dense = np.asarray(dense["w_down"], np.float32)
            if self.awq:
                x2f = x2.reshape(-1, d)
                fused, x2f, mlp_norm = self._awq_fold_norm(
                    fused, x2f, mlp_norm)
                x2 = x2f.reshape(x2.shape)
                # down-proj scales search on the FP activations; fold
                # 1/s into w_up's columns (runtime unchanged) and s
                # into w_down's rows
                gate_fp, up_fp = split_gu(
                    x2.reshape(-1, d) @ fused)
                a_fp = np.asarray(act(jnp.asarray(gate_fp)),
                                  np.float32) * up_fp
                s3 = awq_scales(wdn_dense, a_fp, cfg.bits,
                                cfg.group_size)
                w = it // self.tp
                for sh in range(self.tp):
                    off = (2 * sh + 1) * w
                    fused[:, off:off + w] /= s3[None, sh * w:(sh + 1) * w]
                wdn_dense = wdn_dense * s3[:, None]
            wgu = self._gptq(fused, x2)
            wdn, m = mlp(wgu, wdn_dense)
            out["w_gate_up"], out["w_down"] = wgu, wdn
        else:
            router = np.asarray(dense["router"], np.float32)
            rw = np.asarray(llama.moe_route(
                jnp.asarray(x2), jnp.asarray(router), cfg), np.float32)
            out["router"] = router
            m = np.zeros_like(x2)
            x2_flat = x2.reshape(-1, d)
            for e in range(cfg.n_experts):
                wgt = rw[..., e].reshape(-1)
                # expert Hessian weighted by the token's routing weight:
                # unrouted tokens contribute nothing to its objective
                h_e = accumulate_hessian(x2_flat, wgt)
                wgu = gptq_quantize_tensor(
                    concat_columns(
                        [np.asarray(dense[f"expert{e}.w_gate"],
                                    np.float32),
                         np.asarray(dense[f"expert{e}.w_up"],
                                    np.float32)], self.tp),
                    h_e, cfg.bits, cfg.group_size,
                    percdamp=self.percdamp, blocksize=self.blocksize)
                gate, up = split_gu(self._mm(x2, wgu))
                a = np.asarray(act(jnp.asarray(gate)), np.float32) * up
                wdn = self._gptq(
                    np.asarray(dense[f"expert{e}.w_down"], np.float32),
                    a, kshards=self.tp, wgt=wgt)
                out[f"we_gate_up.{e}"], out[f"we_down.{e}"] = wgu, wdn
                m = m + self._mm(a, wdn) * rw[..., e:e + 1]
        if cfg.post_norms:
            m = self._norm(m, dense["post_mlp_norm"])
        self.h = self.h + m
        self._layer_idx += 1
        out["mlp_norm"] = mlp_norm
        return out

    def finish(self, final_norm, lm_head_dense: np.ndarray) -> QTensor:
        """GPTQ lm_head against the final-norm output (call after every
        layer; ``lm_head_dense`` [D, V_padded])."""
        xf = self._norm(self.h, final_norm)
        return self._gptq(np.asarray(lm_head_dense, np.float32), xf)


def _departition_columns(y: np.ndarray, widths: tuple, tp: int):
    """Undo concat_columns' shard-major interleave on a fused OUTPUT
    [..., sum(widths)] so it can be split part-major (q|k|v)."""
    parts = [[] for _ in widths]
    off = 0
    for _ in range(tp):
        for p, w in enumerate(widths):
            parts[p].append(y[..., off:off + w // tp])
            off += w // tp
    return np.concatenate([np.concatenate(c, axis=-1) for c in parts],
                          axis=-1)


def gptq_quantize_dense(dense: dict, cfg, tokens: np.ndarray, tp: int = 1,
                        percdamp: float = 0.01, blocksize: int = 128,
                        algo: str = "gptq", awq: bool = False):
    """Calibrated counterpart of ``llama.quantize_dense_params``: same
    input dict / output LlamaParams, but every linear projection is
    quantized with sequential error compensation over ``tokens`` [B, T]
    (int ids). ``awq=True`` prepends activation-aware scale folding
    (norm gains / up-proj columns absorb the scales — runtime
    unchanged); ``algo="rtn"`` + awq gives pure AWQ. Bias/embed handling
    is identical to the RTN path; norms may come back folded."""
    from quant_tpu.models import llama

    cal = GPTQCalibrator(cfg, tokens, dense["embed"],
                         percdamp=percdamp, blocksize=blocksize, tp=tp,
                         algo=algo, awq=awq)
    per_layer = []
    layer_qds = []
    moe = cfg.n_experts > 0
    for i in range(cfg.n_layers):
        ld = {k[len(f"layers.{i}."):]: v for k, v in dense.items()
              if k.startswith(f"layers.{i}.")}
        qd = cal.layer(ld)
        layer_qds.append(qd)
        nqd = cfg.n_heads * cfg.head_dim
        nkv = cfg.n_kv_heads * cfg.head_dim
        per_layer.append(llama.LayerParams(
            wqkv=qd["wqkv"], wo=qd["wo"],
            w_gate_up=qd.get("w_gate_up"), w_down=qd.get("w_down"),
            router=(jnp.asarray(qd["router"], jnp.float32)
                    if moe else None),
            attn_norm=jnp.asarray(qd["attn_norm"], jnp.float32),
            mlp_norm=jnp.asarray(qd["mlp_norm"], jnp.float32),
            qkv_bias=jnp.asarray(
                concat_columns(
                    [ld["q_bias"][None, :], ld["k_bias"][None, :],
                     ld["v_bias"][None, :]], tp)[0]
                if "q_bias" in ld
                else np.zeros((nqd + 2 * nkv,), np.float32), jnp.float32),
            q_norm=jnp.asarray(
                ld.get("q_norm", np.ones((cfg.head_dim,), np.float32)),
                jnp.float32),
            k_norm=jnp.asarray(
                ld.get("k_norm", np.ones((cfg.head_dim,), np.float32)),
                jnp.float32),
            post_attn_norm=(jnp.asarray(ld["post_attn_norm"], jnp.float32)
                            if cfg.post_norms else None),
            post_mlp_norm=(jnp.asarray(ld["post_mlp_norm"], jnp.float32)
                           if cfg.post_norms else None),
        ))
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if moe:
        # [E, L, ...] expert-major stacks from the per-layer GPTQ dicts
        cal_fields = {}
        for f in ("we_gate_up", "we_down"):
            per_e = [
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[layer_qds[i][f"{f}.{e}"]
                      for i in range(cfg.n_layers)])
                for e in range(cfg.n_experts)
            ]
            cal_fields[f] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *per_e)
        layers = dataclasses.replace(layers, **cal_fields)
    return llama.LlamaParams(
        embed=llama._make_embed(np.asarray(dense["embed"], np.float32),
                                cfg),
        layers=layers,
        final_norm=jnp.asarray(dense["final_norm"], jnp.float32),
        lm_head=cal.finish(
            dense["final_norm"],
            llama._pad_cols(np.asarray(dense["lm_head"], np.float32),
                            llama._pad_vocab(cfg.vocab_size))),
    )
