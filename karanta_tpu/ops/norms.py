"""Normalization ops.

RMSNorm matching Qwen2 semantics (float32 accumulation, scale applied after
normalization, cast back to input dtype). XLA fuses this into neighbouring ops;
a hand-written Pallas kernel buys nothing here because the op is
bandwidth-trivial next to the matmuls it borders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
