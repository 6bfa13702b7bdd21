"""LoRA adapters for the stacked-layer decoder.

Reference behavior (karanta/training/ocr_training.py:373-397): low-rank
adapters on q/k/v/o and gate/up/down projections, base weights frozen.

Functional design: adapters are a parallel pytree of (a, b) factors stacked
over the layers axis, matching each target matrix (L, in, out) with
a (L, in, r) and b (L, r, out). Training merges adapters into the base
params inside the jitted step (two batched matmuls per target — MXU work,
no data-dependent control flow) and differentiates only the adapter leaves;
base params stay frozen constants. `merge_lora` produces plain full-weight
params for serving/export (reference save_with_accelerate's LoRA-aware save,
training/utils.py:310-354).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# target paths inside params["text"]["layers"]
ATTN_TARGETS = ("wq", "wk", "wv", "wo")
MLP_TARGETS = ("gate", "up", "down")


def init_lora_params(params: Any, rank: int, key: jax.Array,
                     alpha: float = 16.0, dtype=jnp.float32) -> Any:
    """Adapters for every decoder attn/mlp target present in `params`."""
    layers = params["text"]["layers"]
    keys = iter(jax.random.split(key, 16))

    def factors(w):
        L, d_in, d_out = w.shape
        a = (jax.random.normal(next(keys), (L, d_in, rank), jnp.float32)
             / jnp.sqrt(rank)).astype(dtype)
        b = jnp.zeros((L, rank, d_out), dtype)
        return {"a": a, "b": b}

    lora = {"attn": {}, "mlp": {}}
    for name in ATTN_TARGETS:
        lora["attn"][name] = factors(layers["attn"][name])
    for name in MLP_TARGETS:
        lora["mlp"][name] = factors(layers["mlp"][name])
    lora["alpha"] = jnp.asarray(alpha, jnp.float32)
    lora["rank"] = rank
    return lora


def quantize_base_nf4(params: Any) -> Any:
    """QLoRA base: every adapter target matrix quantized to 4-bit nf4
    (reference ocr_training.py:335-356 uses bitsandbytes nf4). Non-target
    leaves (embeddings, norms, vision tower) stay as-is; merge_lora
    dequantizes targets on the fly inside the jitted step."""
    from karanta_tpu.ops.quantization import nf4_quantize

    layers = params["text"]["layers"]
    new_attn = dict(layers["attn"])
    for name in ATTN_TARGETS:
        new_attn[name] = nf4_quantize(layers["attn"][name])
    new_mlp = dict(layers["mlp"])
    for name in MLP_TARGETS:
        new_mlp[name] = nf4_quantize(layers["mlp"][name])
    new_layers = dict(layers)
    new_layers["attn"] = new_attn
    new_layers["mlp"] = new_mlp
    new_text = dict(params["text"])
    new_text["layers"] = new_layers
    return {**params, "text": new_text}


def merge_lora(params: Any, lora: Any) -> Any:
    """params + scale * a@b on every target; returns a new params pytree.

    nf4-quantized targets (QLoRA) are dequantized to bf16 first, so the
    merged tree is always plain arrays the model forward can consume."""
    from karanta_tpu.ops.quantization import is_nf4, nf4_dequantize

    scale = (lora["alpha"] / lora["rank"]).astype(jnp.float32) \
        if hasattr(lora["alpha"], "astype") else lora["alpha"] / lora["rank"]

    def merged(w, f):
        if is_nf4(w):
            w = nf4_dequantize(w, jnp.bfloat16)
        delta = jnp.einsum("lir,lro->lio", f["a"].astype(jnp.float32),
                           f["b"].astype(jnp.float32)) * scale
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    layers = params["text"]["layers"]
    new_attn = dict(layers["attn"])
    for name in ATTN_TARGETS:
        new_attn[name] = merged(layers["attn"][name], lora["attn"][name])
    new_mlp = dict(layers["mlp"])
    for name in MLP_TARGETS:
        new_mlp[name] = merged(layers["mlp"][name], lora["mlp"][name])

    new_layers = dict(layers)
    new_layers["attn"] = new_attn
    new_layers["mlp"] = new_mlp
    new_text = dict(params["text"])
    new_text["layers"] = new_layers
    return {**params, "text": new_text}


def wrap_lora(params: Any, lora: Any) -> Any:
    """Wrap every target leaf as {lora_base, a, b, scale} so the model's
    matmul applies the factors inline (ops/quantization._lora_matmul) —
    numerically the merged forward, but without ever materializing the
    merged (L, in, out) matrices. This is what the jitted train step uses;
    merge_lora stays for export/serving.

    Each wrapped leaf keeps a leading layers axis on every member (scale
    broadcasts to (L,)) so the decoder's lax.scan can slice it as xs.
    """
    scale = (lora["alpha"] / lora["rank"]).astype(jnp.float32) \
        if hasattr(lora["alpha"], "astype") else \
        jnp.asarray(lora["alpha"] / lora["rank"], jnp.float32)

    def wrapped(w, f):
        num_layers = f["a"].shape[0]
        return {"lora_base": w, "a": f["a"], "b": f["b"],
                "scale": jnp.broadcast_to(scale, (num_layers,))}

    layers = params["text"]["layers"]
    new_attn = dict(layers["attn"])
    for name in ATTN_TARGETS:
        new_attn[name] = wrapped(layers["attn"][name], lora["attn"][name])
    new_mlp = dict(layers["mlp"])
    for name in MLP_TARGETS:
        new_mlp[name] = wrapped(layers["mlp"][name], lora["mlp"][name])

    new_layers = dict(layers)
    new_layers["attn"] = new_attn
    new_layers["mlp"] = new_mlp
    new_text = dict(params["text"])
    new_text["layers"] = new_layers
    return {**params, "text": new_text}


def trainable_lora(lora: Any) -> Any:
    """The differentiable subset (factors only, not alpha/rank)."""
    return {"attn": lora["attn"], "mlp": lora["mlp"]}


def with_factors(lora: Any, factors: Any) -> Any:
    return {**lora, "attn": factors["attn"], "mlp": factors["mlp"]}


def make_lora_train_step(cfg, optimizer, n_windows: int = 0,
                         materialize: bool = False, remat: bool = False,
                         grad_accum: int = 1, sp_mesh=None,
                         ce_chunk: int = 512):
    """(state, params, batch) -> (state, metrics); state holds adapter
    factors + opt state; base params are frozen inputs.

    By default the forward applies factors inline (wrap_lora) — merging
    a 3B model's weights inside the step costs ~12 GB of HBM on a 16 GB
    chip. materialize=True keeps the old merge-based forward for A/B.
    remat=True rematerializes the forward in the backward pass (needed to
    fit long sequences next to the frozen base on a 16 GB chip).
    grad_accum > 1 scans microbatches like make_train_step (the batch's
    leading dim must be grad_accum * microbatch)."""
    import optax

    from karanta_tpu.training.train_step import (
        TrainState, accumulate_grads, make_loss_fn,
    )

    loss_fn = make_loss_fn(cfg, n_windows=n_windows, remat=remat,
                           sp_mesh=sp_mesh, ce_chunk=ce_chunk)

    def train_step(state: TrainState, base_params, lora_template, batch):
        def grad_once(mb):
            def lora_loss(factors):
                lora = with_factors(lora_template, factors)
                merged = (merge_lora if materialize else wrap_lora)(
                    base_params, lora)
                return loss_fn(merged, mb)

            (loss, tokens), grads = jax.value_and_grad(
                lora_loss, has_aux=True)(state.params)
            return loss, tokens, grads

        grads, loss, tokens = accumulate_grads(
            grad_once, state.params, batch, grad_accum)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        factors = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=factors, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss, "tokens": tokens,
                           "grad_norm": optax.global_norm(grads)}

    return train_step
