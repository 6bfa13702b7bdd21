"""The sharded training step: loss, grads, optimizer update under one jit.

TPU-native equivalent of the reference's Accelerate/DeepSpeed step
(karanta/training/ocr_training.py:640-790): bf16 compute, fp32 optimizer
state, instruction-masked cross entropy (labels == -100 ignored, matching the
reference collator — training/data.py:213-283), gradient accumulation via
jax.lax.scan over microbatches, optional rematerialization. ZeRO-style
param/optimizer sharding is just the fsdp axis of the mesh: params and
optimizer state inherit the same NamedShardings, XLA inserts the
reduce-scatter/all-gathers DeepSpeed does by hand.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from karanta_tpu.models.qwen25_vl.config import VLMConfig
from karanta_tpu.models.qwen25_vl.model import forward_train

IGNORE_INDEX = -100


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def create_train_state(params: Any, optimizer: optax.GradientTransformation
                       ) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def cross_entropy_loss(logits: jnp.ndarray,   # (B, S, V)
                       labels: jnp.ndarray,   # (B, S) with IGNORE_INDEX masking
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE over non-ignored positions. Returns (loss, token_count)."""
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    count = jnp.maximum(mask.sum(), 1)
    loss = -(token_logp * mask).sum() / count
    return loss, mask.sum()


def chunked_cross_entropy(text_params, text_cfg,
                          hidden: jnp.ndarray,   # (B, S, H) post-final-norm
                          labels: jnp.ndarray,   # (B, S) aligned to hidden
                          chunk: int = 512,
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE over non-ignored positions without ever materializing the
    full (B, S, vocab) logits: a lax.scan over sequence chunks computes each
    chunk's logits + fp32 log-softmax, and jax.checkpoint recomputes them in
    the backward. At a 152k vocab the full fp32 logits are ~1.2 GB per 2048
    tokens — on a 16 GB chip next to 6 GB of base weights this is the
    difference between spilling and not."""
    from karanta_tpu.models.qwen25_vl.decoder import logits_from_hidden

    b, s, h = hidden.shape
    chunk = min(chunk, s)
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=IGNORE_INDEX)
    nc = (s + pad) // chunk
    hs = jnp.moveaxis(hidden.reshape(b, nc, chunk, h), 1, 0)
    ls = jnp.moveaxis(labels.reshape(b, nc, chunk), 1, 0)

    @jax.checkpoint
    def chunk_sums(h_c, l_c):
        logits = logits_from_hidden(text_params, text_cfg, h_c)
        mask = l_c != IGNORE_INDEX
        safe = jnp.where(mask, l_c, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return -(token_logp * mask).sum(), mask.sum()

    def body(carry, xs):
        loss_sum, count = carry
        cl, cc = chunk_sums(*xs)
        return (loss_sum + cl, count + cc), None

    (loss_sum, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hs, ls))
    return loss_sum / jnp.maximum(count, 1), count


def make_loss_fn(cfg: VLMConfig, remat: bool = False, n_windows: int = 0,
                 ce_chunk: int = 512, sp_mesh=None, pp_mesh=None,
                 pp_micro: int = 1):
    # remat threads into the model: the checkpoint must wrap the per-layer
    # scan body (and per-image vision encode), not the whole forward — a
    # whole-forward checkpoint replays the forward but still materializes
    # every per-layer residual at once during the replayed backward.
    #
    # sp_mesh: a Mesh whose "seq" axis is > 1 enables context parallelism —
    # text activations shard over the sequence, attention runs through the
    # shard_map kernel in parallel/context.py. The reference has no SP (it
    # caps context, SURVEY §5.7); this is TPU-native long-context headroom.
    # pp_mesh: a Mesh whose "pipe" axis is > 1 pipelines the decoder layer
    # stack over stages with pp_micro microbatches (parallel/pipeline.py).
    # Mutually exclusive with sp_mesh (the shard_map schedules don't nest).
    if pp_mesh is not None and sp_mesh is not None:
        raise ValueError("sp_mesh and pp_mesh are mutually exclusive")
    if pp_mesh is not None:
        from karanta_tpu.parallel.mesh import PIPE_AXIS

        if int(pp_mesh.shape.get(PIPE_AXIS, 1)) <= 1:
            pp_mesh = None
    attn_impl = None
    pin_batch = None
    if sp_mesh is not None:
        from karanta_tpu.parallel.context import (
            make_context_parallel_attention, sequence_sharded_constraint)
        from karanta_tpu.parallel.mesh import SEQ_AXIS

        if int(sp_mesh.shape.get(SEQ_AXIS, 1)) > 1:
            attn_impl = make_context_parallel_attention(sp_mesh)
            pin_batch = functools.partial(sequence_sharded_constraint, sp_mesh)

    def loss_fn(params, batch):
        if pin_batch is not None:
            batch = pin_batch(batch)
        hidden = forward_train(
            params, cfg,
            batch["token_ids"], batch["positions"],
            pixel_values=batch.get("pixel_values"),
            vis_perm=batch.get("vis_perm"),
            vis_valid=batch.get("vis_valid"),
            vis_pos_hw=batch.get("vis_pos_hw"),
            vis_extract=batch.get("vis_extract"),
            image_positions=batch.get("image_positions"),
            n_windows=n_windows,
            attn_mask=batch.get("attn_mask"),
            remat=remat,
            return_hidden=True,
            attn_impl=attn_impl,
            pp_mesh=pp_mesh,
            pp_micro=pp_micro,
        )
        # next-token prediction: hidden[t] predicts labels[t+1]; the last
        # row has no target (IGNORE), keeping S static for the chunk scan
        labels = batch["labels"]
        shifted = jnp.concatenate(
            [labels[:, 1:],
             jnp.full((labels.shape[0], 1), IGNORE_INDEX, labels.dtype)],
            axis=1)
        loss, tokens = chunked_cross_entropy(
            params["text"], cfg.text, hidden, shifted, chunk=ce_chunk)
        return loss, tokens

    return loss_fn


def split_microbatches(batch: dict, grad_accum: int) -> dict:
    """Reshape a (grad_accum * microbatch)-row batch to scan-ready
    per-microbatch leading dim. positions is (3, B, S) — batch axis 1."""
    mb = {}
    for key, value in batch.items():
        if key == "positions":
            v = value.reshape(3, grad_accum, -1, value.shape[-1])
            mb[key] = jnp.moveaxis(v, 1, 0)
        else:
            mb[key] = value.reshape((grad_accum, -1) + value.shape[1:])
    return mb


def accumulate_grads(grad_once, params, batch: dict, grad_accum: int):
    """Average grads over grad_accum microbatches under lax.scan.

    grad_once(microbatch) -> (loss, tokens, grads-like-params). Returns
    (grads, mean loss, summed tokens). Reference semantics: accelerate
    grad-accum (ocr_training.py:200-207,669-685).
    """
    if grad_accum == 1:
        loss, tokens, grads = grad_once(batch)
        return grads, loss, tokens

    def micro(carry, mb):
        acc_grads, acc_loss, acc_tokens = carry
        loss, tokens, grads = grad_once(mb)
        acc = jax.tree.map(jnp.add, acc_grads, grads)
        return (acc, acc_loss + loss, acc_tokens + tokens), None

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    mb = split_microbatches(batch, grad_accum)
    (grads, loss, tokens), _ = jax.lax.scan(
        micro, (zeros, 0.0, jnp.zeros((), jnp.int32)), mb)
    # accumulate in f32, then return to the param dtype: optax moments
    # follow the gradient dtype, and f32 moments here vs the
    # bf16-initialized state made apply_if_finite's lax.cond branches
    # disagree on dtypes (bf16 + grad-accum only)
    grads = jax.tree.map(lambda g, p: (g / grad_accum).astype(p.dtype),
                         grads, params)
    return grads, loss / grad_accum, tokens


def make_train_step(cfg: VLMConfig, optimizer: optax.GradientTransformation,
                    remat: bool = False, grad_accum: int = 1,
                    n_windows: int = 0, sp_mesh=None, pp_mesh=None,
                    pp_micro: int = 1):
    """Returns a jittable (state, batch) -> (state, metrics) function.

    With grad_accum > 1 the batch's leading dim must be grad_accum *
    microbatch; microbatches run under lax.scan, gradients averaged before
    one optimizer update (reference semantics: accelerate grad-accum,
    ocr_training.py:200-207,669-685).

    sp_mesh enables context parallelism over the mesh's "seq" axis; pp_mesh
    pipelines the decoder over the "pipe" axis with pp_micro microbatches
    (see make_loss_fn).
    """
    loss_fn = make_loss_fn(cfg, remat=remat, n_windows=n_windows,
                           sp_mesh=sp_mesh, pp_mesh=pp_mesh,
                           pp_micro=pp_micro)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single(state: TrainState, batch):
        (loss, tokens), grads = grad_fn(state.params, batch)
        return loss, tokens, grads

    def train_step(state: TrainState, batch):
        grads, loss, tokens = accumulate_grads(
            lambda mb: single(state, mb), state.params, batch, grad_accum)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {
            "loss": loss,
            "tokens": tokens,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def eval_step(cfg: VLMConfig, n_windows: int = 0, sp_mesh=None):
    loss_fn = make_loss_fn(cfg, n_windows=n_windows, sp_mesh=sp_mesh)

    def step(params, batch):
        loss, tokens = loss_fn(params, batch)
        return {"loss": loss, "tokens": tokens}

    return step
