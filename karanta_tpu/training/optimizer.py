"""Optimizers: AdamW with no-decay groups, and Muon with an Adam auxiliary.

Re-implements the reference's optimizer setup natively in optax:
  - AdamW with bias/norm params excluded from weight decay
    (reference karanta/training/ocr_training.py:417-446).
  - Muon for 2D hidden matrices with Adam for embeddings/head/scalars,
    embed lr x12 and head/scalar lr x0.8, betas (0.8, 0.95)
    (reference ocr_training.py:447-494, muon_optimizer.py:157-263). The
    Newton-Schulz orthogonalization runs as three MXU matmuls per iteration
    (ops/newton_schulz.py); parameter "ownership" sharding falls out of the
    fsdp axis of the mesh instead of rank-strided torch.distributed gathers
    (muon_optimizer.py:89-111).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from karanta_tpu.ops.newton_schulz import orthogonalize


def _is_matrix(p: jnp.ndarray) -> bool:
    return p.ndim >= 2 and min(p.shape[-2:]) > 1


def default_label_fn(path: tuple, param: jnp.ndarray) -> str:
    """Classify params: 'muon' (hidden matrices) / 'embed' / 'head' / 'scalar'."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if "embed" in joined:
        return "embed"
    if "lm_head" in joined or "head" in joined:
        return "head"
    if param.ndim < 2:
        return "scalar"
    return "muon"


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (2D+ matrices only)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


class MuonState(NamedTuple):
    momentum: Any


def scale_by_muon(beta: float = 0.95, ns_steps: int = 5,
                  nesterov: bool = True) -> optax.GradientTransformation:
    """Momentum + Newton-Schulz orthogonalization for stacked matrices.

    Works on params of shape (..., m, n); leading axes (e.g. the stacked
    `layers` axis) are treated as batch dims for the orthogonalization.
    """

    def init(params):
        return MuonState(jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        # two maps, no tuple-leaf packing: a param tree may contain empty
        # tuples as internal nodes, which an is_leaf=isinstance(.., tuple)
        # repack would misread as leaves and crash on
        new_momentum = jax.tree.map(
            lambda g, m: beta * m + (1.0 - beta) * g, grads, state.momentum)

        def one(g, new_m):
            u = (1.0 - beta) * g + beta * new_m if nesterov else new_m
            if g.ndim >= 2:
                u = orthogonalize(u, steps=ns_steps)
                u = u * jnp.sqrt(jnp.maximum(1.0, g.shape[-2] / g.shape[-1]))
            return u

        updates = jax.tree.map(one, grads, new_momentum)
        return updates, MuonState(new_momentum)

    return optax.GradientTransformation(init, update)


def make_adamw(learning_rate, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_muon_with_aux_adam(
    learning_rate,
    weight_decay: float = 0.0,
    muon_beta: float = 0.95,
    adam_b1: float = 0.8,
    adam_b2: float = 0.95,
    embed_lr_scale: float = 12.0,
    head_lr_scale: float = 0.8,
    label_fn: Callable = default_label_fn,
) -> optax.GradientTransformation:
    """Muon on hidden matrices, Adam on embed/head/scalars with scaled lrs."""

    def scaled_adam(scale):
        return optax.chain(
            optax.scale_by_adam(b1=adam_b1, b2=adam_b2),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_learning_rate(
                (lambda step: learning_rate(step) * scale)
                if callable(learning_rate) else learning_rate * scale),
        )

    transforms = {
        "muon": optax.chain(
            scale_by_muon(beta=muon_beta),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_learning_rate(learning_rate),
        ),
        "embed": scaled_adam(embed_lr_scale),
        "head": scaled_adam(head_lr_scale),
        "scalar": scaled_adam(head_lr_scale),
    }

    def labels(params):
        return jax.tree_util.tree_map_with_path(label_fn, params)

    return optax.multi_transform(transforms, labels)


def make_lr_schedule(kind: str, base_lr: float, warmup_steps: int,
                     total_steps: int) -> optax.Schedule:
    """cosine / linear / constant with linear warmup (reference
    ocr_training.py:510-516 get_scheduler semantics)."""
    warmup = optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1))
    decay_steps = max(total_steps - warmup_steps, 1)
    if kind == "cosine":
        decay = optax.cosine_decay_schedule(base_lr, decay_steps)
    elif kind == "linear":
        decay = optax.linear_schedule(base_lr, 0.0, decay_steps)
    elif kind == "constant":
        decay = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"Unknown schedule {kind!r}")
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_optimizer(name: str, learning_rate, weight_decay: float = 0.0,
                   max_grad_norm: Optional[float] = 1.0,
                   skip_nonfinite: bool = True,
                   **kwargs) -> optax.GradientTransformation:
    if name == "adamw":
        opt = make_adamw(learning_rate, weight_decay, **kwargs)
    elif name == "muon":
        opt = make_muon_with_aux_adam(learning_rate, weight_decay, **kwargs)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    if max_grad_norm:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    if skip_nonfinite:
        # skip updates on NaN/inf loss batches instead of poisoning params
        # (reference skips NaN-loss batches — ocr_training.py:89-93)
        opt = skip_nonfinite_updates(opt)
    return opt


class SkipNonfiniteState(NamedTuple):
    inner_state: Any
    notfinite_count: jnp.ndarray  # consecutive skipped steps


def skip_nonfinite_updates(
        opt: optax.GradientTransformation,
        max_consecutive_errors: int = 10) -> optax.GradientTransformation:
    """Memory-lean replacement for optax.apply_if_finite: zero the updates
    and keep the previous inner state when any gradient is nonfinite.

    apply_if_finite's lax.cond keeps BOTH branch outputs live, which costs a
    full optimizer-state-sized buffer at peak — the reason 2B full-FT OOMed
    the 16 GB chip with guards on (BENCH_NOTES round-3 Muon section). Here
    the inner update always runs and an elementwise `where` selects
    new-vs-old per leaf; XLA fuses the select into the producing op and
    donation aliases the buffers, so the state transient disappears. NaNs
    computed through the inner update on a bad batch are discarded by the
    select (never mixed into the kept state).

    Escape hatch (matching apply_if_finite's semantics): after
    `max_consecutive_errors` consecutive nonfinite steps the update is
    applied anyway, so a persistently-diverged run breaks visibly (NaN
    params/loss) instead of silently zero-stepping through its whole
    allocation. `state.notfinite_count` is exposed for metrics."""

    def init(params):
        return SkipNonfiniteState(opt.init(params),
                                  jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        leaves = jax.tree.leaves(updates)
        isfinite = jnp.array(True)
        for leaf in leaves:
            isfinite = jnp.logical_and(isfinite,
                                       jnp.all(jnp.isfinite(leaf)))
        give_up = state.notfinite_count >= max_consecutive_errors
        use = jnp.logical_or(isfinite, give_up)
        new_updates, new_inner = opt.update(updates, state.inner_state,
                                            params)
        out_updates = jax.tree.map(
            lambda u: jnp.where(use, u, jnp.zeros_like(u)), new_updates)
        out_inner = jax.tree.map(
            lambda n, o: jnp.where(use, n, o) if isinstance(
                n, jnp.ndarray) else o,
            new_inner, state.inner_state)
        count = jnp.where(isfinite, 0, state.notfinite_count + 1)
        return out_updates, SkipNonfiniteState(out_inner, count)

    return optax.GradientTransformation(init, update)
