"""Token sampling (jit-friendly; static config, traced logits/key)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0   # 0 → greedy
    top_k: int = 0             # 0 → disabled
    top_p: float = 1.0         # 1 → disabled

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


def sample(logits: jax.Array, key, cfg: SamplingConfig) -> jax.Array:
    """logits [B, V] → token ids [B]."""
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k > 0:
        kth = jnp.sort(lg, axis=-1)[:, -cfg.top_k][:, None]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if cfg.top_p < 1.0:
        sorted_lg = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p.
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_lg, cutoff_idx[:, None], axis=-1)
        lg = jnp.where(lg < cutoff, -jnp.inf, lg)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def sample_batch(logits: jax.Array, key, temps: jax.Array,
                 topks: jax.Array, topps: jax.Array) -> jax.Array:
    """Fully-traced per-slot sampling: logits [B, V] → ids [B].

    Per-slot traced knobs (so one jit serves every mix of configs — the
    engine's fused decode block samples on device without retracing):
    ``temps[B]`` f32 (0 → greedy), ``topks[B]`` int32 (0 → off),
    ``topps[B]`` f32 (1 → off). Matches :func:`sample` per slot.
    """
    lg = logits.astype(jnp.float32)
    v = lg.shape[-1]
    greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    l2 = lg / jnp.maximum(temps, 1e-6)[:, None]
    sorted_desc = jnp.sort(l2, axis=-1)[:, ::-1]
    # top-k: per-slot kth-largest threshold
    kth = jnp.take_along_axis(
        sorted_desc, jnp.clip(topks - 1, 0, v - 1)[:, None], axis=-1)
    topk_on = (topks > 0)[:, None]
    l2 = jnp.where(topk_on & (l2 < kth), -jnp.inf, l2)
    # top-p over the top-k-masked distribution (same composition as
    # :func:`sample`): smallest prefix with cumulative mass >= top_p.
    sorted_desc = jnp.where(topk_on & (sorted_desc < kth), -jnp.inf,
                            sorted_desc)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < topps[:, None], axis=-1)
    cutoff = jnp.take_along_axis(
        sorted_desc, jnp.clip(cutoff_idx, 0, v - 1)[:, None], axis=-1)
    l2 = jnp.where((topps < 1.0)[:, None] & (l2 < cutoff), -jnp.inf, l2)
    sampled = jax.random.categorical(key, l2, axis=-1).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)
