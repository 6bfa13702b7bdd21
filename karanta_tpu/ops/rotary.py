"""Rotary position embeddings: 1D RoPE, Qwen-VL 2D vision RoPE, and M-RoPE.

Semantics match the HF Qwen2.5-VL implementation (rotate-half convention,
float32 rotation, mrope_section banding of temporal/height/width frequencies)
so converted checkpoints are numerically compatible. This replaces the
decoder-side RoPE the reference delegates to vLLM/torch
(karanta/pipeline.py:707-742 spawns the CUDA engine).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float = 1e6):
    """Standard RoPE tables. positions (...,) -> cos/sin (..., head_dim)."""
    half = head_dim // 2
    inv = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (..., half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_cos_sin(positions_thw: jnp.ndarray, head_dim: int,
                  mrope_section: Sequence[int], theta: float = 1e6):
    """M-RoPE tables for Qwen2/2.5-VL decoders.

    positions_thw: (3, seq) int32 — temporal/height/width position streams
    (equal for pure-text tokens; grid positions inside image spans).
    mrope_section: frequency-band split (e.g. [16, 24, 24], summing to
    head_dim//2): the first 16 frequency pairs rotate by the temporal
    position, the next 24 by height, the last 24 by width.

    Returns cos, sin of shape (seq, head_dim), float32.
    """
    half = head_dim // 2
    assert sum(mrope_section) == half, (mrope_section, head_dim)
    seq = positions_thw.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    freqs = positions_thw.astype(jnp.float32)[:, :, None] * inv[None, None, :]  # (3, seq, half)
    band = np.concatenate(
        [np.full((w,), i, dtype=np.int32) for i, w in enumerate(mrope_section)])
    band_idx = jnp.broadcast_to(jnp.asarray(band)[None, None, :], (1, seq, half))
    sel = jnp.take_along_axis(freqs, band_idx, axis=0)[0]  # (seq, half)
    emb = jnp.concatenate([sel, sel], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def vision_rope_cos_sin(positions_hw: jnp.ndarray, head_dim: int,
                        theta: float = 1e4):
    """Qwen-VL vision 2D RoPE: half the rotary dims encode the patch row,
    half the column.

    positions_hw: (seq, 2) int32 (h_pos, w_pos) per pre-merge patch token.
    Returns cos, sin of shape (seq, head_dim), float32.
    """
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) * 2.0 / (head_dim // 2)))
    freqs = positions_hw.astype(jnp.float32)[:, :, None] * inv[None, None, :]  # (seq, 2, q)
    freqs = freqs.reshape(freqs.shape[0], -1)  # (seq, head_dim//2): [h bands | w bands]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray,
               cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate q, k by precomputed tables, accumulating in float32.

    q, k: (..., seq, heads, head_dim); cos/sin: broadcastable to
    (..., seq, 1, head_dim).
    """
    orig_q, orig_k = q.dtype, k.dtype
    cos = cos.astype(jnp.float32)[..., :, None, :]
    sin = sin.astype(jnp.float32)[..., :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(orig_q), k_out.astype(orig_k)
