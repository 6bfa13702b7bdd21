"""Quintic Newton-Schulz orthogonalization — the core of the Muon optimizer.

Re-expression of the reference's torch `zeropower_via_newtonschulz5`
(karanta/training/muon_optimizer.py:7-37) as pure jax: five iterations of
three matmuls each — an ideal MXU workload. Matmuls run in bfloat16 with
float32 accumulation (the torch reference also runs in bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NS_COEFFS = (3.4445, -4.7750, 2.0315)


def orthogonalize(grad: jnp.ndarray, steps: int = 5, eps: float = 1e-7) -> jnp.ndarray:
    """Approximately orthogonalize a 2D (or batched 2D) gradient matrix."""
    assert grad.ndim >= 2, grad.shape
    a, b, c = NS_COEFFS
    transposed = grad.shape[-2] > grad.shape[-1]
    x = jnp.swapaxes(grad, -2, -1) if transposed else grad
    x = x.astype(jnp.bfloat16)
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=(-2, -1), keepdims=True)
    x = (x.astype(jnp.float32) / (norm + eps)).astype(jnp.bfloat16)

    def body(_, x):
        xxt = jnp.matmul(x, jnp.swapaxes(x, -2, -1),
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = b * xxt + c * jnp.matmul(xxt, xxt,
                                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return (a * x + jnp.matmul(y, x, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))

    x = jax.lax.fori_loop(0, steps, body, x)
    x = jnp.swapaxes(x, -2, -1) if transposed else x
    return x.astype(grad.dtype)


def muon_update(grad: jnp.ndarray, momentum: jnp.ndarray, beta: float = 0.95,
                nesterov: bool = True, ns_steps: int = 5):
    """One Muon direction update (reference muon_optimizer.py:40-47).

    Returns (update_direction, new_momentum). The caller applies the
    rms-matched scale factor and learning rate.
    """
    new_momentum = beta * momentum + (1.0 - beta) * grad
    update = (1.0 - beta) * grad + beta * new_momentum if nesterov else new_momentum
    update = orthogonalize(update, steps=ns_steps)
    # scale to match adam RMS (0.2 * sqrt(max_dim) heuristic from Muon)
    scale = jnp.sqrt(jnp.maximum(1.0, grad.shape[-2] / grad.shape[-1]))
    return update * scale, new_momentum
