"""Perplexity evaluation (SURVEY.md §2.2 #17; BASELINE.json:9's WikiText-2
quality gate — the quantized model must stay within Δ of an fp baseline).

Operates on a pre-tokenized int32 stream (tokenizers are a host concern;
``tokens_from_file`` uses a HF tokenizer directory when one is available —
this image has no network, so datasets/tokenizers must be local files).
Sliding non-overlapping windows, teacher-forced next-token NLL, computed in
one jit per window length.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig

__all__ = ["perplexity", "tokens_from_file"]


def perplexity(
    params: llama.LlamaParams,
    cfg: ModelConfig,
    tokens: np.ndarray,
    window: int = 512,
    limit_windows: int | None = None,
) -> dict:
    """Mean NLL / perplexity of ``tokens`` under the model.

    Windows are non-overlapping; the first token of each window is context
    only. Returns {"nll", "ppl", "tokens"}.
    """
    toks = np.asarray(tokens, np.int32).reshape(-1)
    n_win = (toks.size - 1) // window
    if limit_windows is not None:
        n_win = min(n_win, limit_windows)
    if n_win < 1:
        raise ValueError(f"need > {window} tokens, got {toks.size}")

    @jax.jit
    def window_nll(win):  # [1, window+1]
        cache = llama.init_cache(cfg, 1, window)
        logits, _ = llama.forward(params, win[:, :-1], cache, cfg)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = win[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), tgt.size

    total, count = 0.0, 0
    for i in range(n_win):
        win = toks[i * window: i * window + window + 1][None, :]
        s, c = window_nll(jnp.asarray(win))
        total += float(s)
        count += int(c)
    nll = total / count
    return {"nll": nll, "ppl": math.exp(nll), "tokens": count}


def tokens_from_file(path: str, tokenizer_dir: str | None = None
                     ) -> np.ndarray:
    """Tokenize a text file; falls back to byte-level ids if no tokenizer."""
    text = open(path, "r", encoding="utf-8", errors="replace").read()
    if tokenizer_dir:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tokenizer_dir)
        return np.asarray(tok(text)["input_ids"], np.int32)
    return np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int32)
