"""Token sampling: greedy / temperature / top-p, jit-friendly.

Matches the sampling surface the reference exercises through vLLM's OpenAI
server (temperature ladder 0.0→1.0 — karanta/pipeline.py:281,287-301; top_p
defaults to 1.0). Temperature 0 must be exactly greedy, including under jit,
so the switch is a lax.cond on the traced temperature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(logits: jnp.ndarray,       # (B, V) float
                  key: jax.Array,
                  temperature: jnp.ndarray,  # (B,) float32; 0 = greedy
                  top_p: jnp.ndarray | None = None,  # (B,) float32; 1 = off
                  ) -> jnp.ndarray:
    """Sample one token per row. Fully batched; per-row temperature.

    Pass top_p=None when every row uses top_p >= 1: nucleus filtering costs
    a full-vocabulary sort per step, which rivals the rest of the decode
    step at 152k vocab. Callers should make that choice statically.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    if temperature is None:  # statically greedy batch
        return greedy

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    if top_p is not None:
        scaled = _apply_top_p(scaled, top_p)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def _apply_top_p(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering: mask tokens outside the smallest top-p mass set."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative mass (exclusive) < top_p
    keep_sorted = (cum - probs) < top_p[:, None]
    # threshold logit = smallest kept logit per row
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)
