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


def spec_verify_sampled(logits: jnp.ndarray,   # (B, T, V) float, T = gamma+1
                        draft: jnp.ndarray,    # (B, gamma) i32 drafted tokens
                        temps: jnp.ndarray,    # (B,) float32; <=0 = greedy
                        key: jax.Array,
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rejection-sampling verification of a deterministic draft.

    Position i of `logits` scores the token following verify-pass input i
    (inputs = [last_token, draft...]). Returns (y (B, T) i32, n_new (B,) i32):
    row b emits y[b, :n_new[b]] — its accepted draft prefix plus exactly one
    freshly-sampled token. Entries past n_new[b] are unspecified.

    Exactness (Leviathan et al. speculative sampling, deterministic drafter
    q = delta(d)): accept d with probability p(d); on rejection emit a sample
    from norm((p - q)+) = p excluding d; on full acceptance emit a bonus
    sample from the last position. Rows with temp<=0 reduce to the greedy
    rule: accept iff d == argmax, emit argmax — exactly the sequence the
    plain greedy path would produce.
    """
    b, t, v = logits.shape
    gamma = t - 1
    f32 = logits.astype(jnp.float32)
    greedy = jnp.argmax(f32, axis=-1)                       # (B, T)
    scaled = f32 / jnp.maximum(temps, 1e-6)[:, None, None]  # (B, T, V)
    is_greedy = (temps <= 0.0)[:, None]                     # (B, 1)

    ku, kr = jax.random.split(key)
    # accept d_i with prob p_i(d_i):  log u < log p_i(d_i)
    logz = jax.nn.logsumexp(scaled[:, :gamma], axis=-1)     # (B, gamma)
    d_logit = jnp.take_along_axis(
        scaled[:, :gamma], draft[:, :, None], axis=-1)[..., 0]
    u = jax.random.uniform(ku, (b, gamma), minval=jnp.finfo(jnp.float32).tiny)
    accept = jnp.where(is_greedy, greedy[:, :gamma] == draft,
                       jnp.log(u) < d_logit - logz)
    ok = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    n_new = 1 + jnp.sum(ok, axis=1)                         # (B,) in 1..T

    # the one fresh token: at a rejected position i sample from p_i with d_i
    # removed (renormalized); at the bonus position gamma sample p unmasked
    d_mask = jax.nn.one_hot(draft, v, dtype=bool)           # (B, gamma, V)
    d_mask = jnp.concatenate(
        [d_mask, jnp.zeros((b, 1, v), bool)], axis=1)       # (B, T, V)
    emit_sampled = jax.random.categorical(
        kr, jnp.where(d_mask, -jnp.inf, scaled), axis=-1)
    emit = jnp.where(is_greedy, greedy, emit_sampled)       # (B, T)

    idx = jnp.arange(t)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((b, 1), draft.dtype)], axis=1)
    y = jnp.where(idx < (n_new - 1)[:, None], draft_pad, emit)
    return y.astype(jnp.int32), n_new


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
