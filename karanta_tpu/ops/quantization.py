"""Weight-only int8 quantization for serving.

The decode path reads every decoder weight once per step — it is HBM-bound,
so halving weight bytes (bf16 -> int8) buys up to ~2x decode throughput and
lets the 7B model fit comfortably on a 16GB chip. Scheme: symmetric
per-output-channel int8; activations stay bf16; XLA fuses the int8->bf16
convert into the matmul operand load so the dequantized copy never
materializes in HBM. (The reference gets the same effect from vLLM's FP8
checkpoints — its default model is olmOCR-2-7B *-FP8*, pipeline.py:1128.)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

QUANT_KEY = "int8_q"  # marker key distinguishing quantized leaves
LORA_KEY = "lora_base"  # marker key for inline-LoRA wrapped leaves


def is_lora_wrapped(w: Any) -> bool:
    return isinstance(w, dict) and LORA_KEY in w


def _lora_matmul(x, w: dict, base_mm) -> "jnp.ndarray":
    """x @ (base + scale * a@b) without materializing the merged matrix.

    The delta path is two thin matmuls ((B,S,in)@(in,r) then @(r,out)) —
    O(r/min(in,out)) of the base matmul's FLOPs — so a LoRA/QLoRA train
    step never holds a merged copy of the full weights in HBM (merging a
    3B model costs ~12 GB on a 16 GB chip; the reference's peft wrapper
    applies factors inline the same way, ocr_training.py:373-397)."""
    base = w[LORA_KEY]
    if is_nf4(base):
        base = nf4_dequantize(base, x.dtype)
    y = base_mm(x, base)
    a = w["a"].astype(x.dtype)
    b = w["b"].astype(x.dtype)
    delta = jnp.matmul(jnp.matmul(x, a), b,
                       preferred_element_type=jnp.float32)
    scale = w["scale"].astype(jnp.float32)
    return (y.astype(jnp.float32) + delta * scale).astype(x.dtype)


def _quantize_impl(w: jnp.ndarray) -> dict:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}


# jitted per-leaf: the f32 upcast fuses into the rounding computation instead
# of materializing a full-precision copy of every weight (eager quantization
# of a 3B model OOMed a 16GB chip)
_quantize_jit = None


def quantize_weight(w: jnp.ndarray) -> dict:
    """(…, in, out) bf16/f32 -> {int8_q, scale (…, 1, out) f32}."""
    global _quantize_jit
    if _quantize_jit is None:
        import jax

        _quantize_jit = jax.jit(_quantize_impl)
    return _quantize_jit(w)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and QUANT_KEY in w


def matmul(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w supporting plain arrays and quantized dicts.

    For quantized weights the int8 operand converts to x.dtype inside the
    dot fusion; the per-channel scale applies to the f32 accumulator.
    """
    if is_lora_wrapped(w):
        return _lora_matmul(x, w, matmul)
    if not is_quantized(w):
        return x @ w
    acc = jnp.matmul(x, w[QUANT_KEY].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    scale = w["scale"]
    if acc.ndim < scale.ndim:  # 1-D x: drop the broadcast row axis
        scale = jnp.squeeze(scale, axis=-2)
    out = acc * scale
    return out.astype(x.dtype)


def matmul_w8a8(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w with dynamic per-token int8 activations (prefill fast path).

    Prefill is compute-bound: the v5e MXU runs int8 x int8 -> int32 at 2x
    the bf16 rate, so quantizing activations on the fly (symmetric absmax
    per token) roughly halves the dominant matmul time. Scheme matches
    vLLM's FP8 W8A8 serving role (the reference's default engine model is
    olmOCR-2-7B-FP8, pipeline.py:1128-1131): per-token activation scales x
    per-output-channel weight scales applied to the int32 accumulator.

    Only worth it where arithmetic dominates — decode stays weight-only
    int8 (HBM-bound; the activation quantize would be pure overhead).
    """
    if is_lora_wrapped(w):
        return _lora_matmul(x, w, matmul_w8a8)
    if not is_quantized(w):
        return x @ w
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jnp.matmul(xq, w[QUANT_KEY], preferred_element_type=jnp.int32)
    scale = w["scale"]
    if acc.ndim < scale.ndim:  # 1-D x: drop the broadcast row axis
        scale = jnp.squeeze(scale, axis=-2)
        xs = jnp.squeeze(xs, axis=-1)
    out = acc.astype(jnp.float32) * xs * scale
    return out.astype(x.dtype)


def matmul_auto(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w, taking the W8A8 path iff the weight leaf is quantized.

    Lets compute-bound modules (vision encoder) write one matmul call whose
    precision is decided entirely by the params pytree — plain bf16 weights
    cost nothing extra, int8 weights run W8A8 on the MXU's 2x int8 path.
    """
    if is_quantized(w):
        return matmul_w8a8(x, w)
    return x @ w


def quantize_vision_params(visual: dict) -> dict:
    """Quantize the vision encoder's matmul weights (blocks + merger + patch
    embed) to per-channel int8. The encoder is compute-bound during prefill,
    so these run W8A8 via matmul_auto. Biases and norms stay as-is.

    More aggressive than the reference's FP8 serving (vLLM FP8 checkpoints
    typically keep the vision tower in bf16) — hence opt-in via
    EngineConfig.vision_quant rather than implied by weight quantization.
    """
    blocks = dict(visual["blocks"])
    attn = dict(blocks["attn"])
    for name in ("wq", "wk", "wv", "wo"):
        attn[name] = quantize_weight(blocks["attn"][name])
    blocks["attn"] = attn
    mlp = dict(blocks["mlp"])
    for name in ("gate", "up", "down", "fc1", "fc2"):
        if name in mlp:
            mlp[name] = quantize_weight(mlp[name])
    blocks["mlp"] = mlp
    out = dict(visual)
    out["blocks"] = blocks
    out["patch_embed"] = {"kernel": quantize_weight(
        visual["patch_embed"]["kernel"])}
    merger = dict(visual["merger"])
    merger["w1"] = quantize_weight(merger["w1"])
    merger["w2"] = quantize_weight(merger["w2"])
    out["merger"] = merger
    return out


# ---------------------------------------------------------------------------
# NF4 (4-bit NormalFloat) for QLoRA training.
#
# The reference trains QLoRA via bitsandbytes 4-bit nf4 base weights
# (karanta/training/ocr_training.py:335-356). TPU-native scheme: blockwise
# absmax over 64 consecutive *reduction-axis* elements per output channel
# (same scale count as bnb's flat blocking, but aligned to the matmul's
# contraction so quantization error stays per-dot-product), nibbles packed
# two-per-byte along the reduction axis. Dequantization happens inside the
# jitted train step, so the bf16 copy is a fusion temporary — base-weight
# HBM residency is 4.25 bits/param. Double quantization of the absmax table
# (bnb's optional extra) is omitted: it saves 0.37 bits/param and costs a
# second lookup.
# ---------------------------------------------------------------------------

NF4_BLOCK = 64

# the 16 NormalFloat4 code points (QLoRA paper, appendix E), ascending.
# numpy on purpose: a module-level jnp constant would initialize the XLA
# backend at import, breaking jax.distributed.initialize() ordering
NF4_CODE = np.asarray(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], np.float32)

NF4_KEY = "nf4_q"


def _nf4_quantize_impl(w: jnp.ndarray) -> dict:
    *lead, d_in, d_out = w.shape
    assert d_in % NF4_BLOCK == 0, f"reduction dim {d_in} not /{NF4_BLOCK}"
    wf = w.astype(jnp.float32).reshape(*lead, d_in // NF4_BLOCK, NF4_BLOCK,
                                       d_out)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8)
    # nearest code via boundary search (no 16x broadcast temporary)
    bounds = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0
    idx = jnp.searchsorted(bounds, wf / absmax).astype(jnp.uint8)
    idx = idx.reshape(*lead, d_in // 2, 2, d_out)
    packed = (idx[..., 0, :] << 4) | idx[..., 1, :]
    return {NF4_KEY: packed,                               # (..., in/2, out)
            "absmax": jnp.squeeze(absmax, -2)}             # (..., in/64, out)


_nf4_quantize_jit = None


def nf4_quantize(w: jnp.ndarray) -> dict:
    """(..., in, out) float -> {nf4_q uint8 (..., in/2, out), absmax f32}."""
    global _nf4_quantize_jit
    if _nf4_quantize_jit is None:
        import jax

        _nf4_quantize_jit = jax.jit(_nf4_quantize_impl)
    return _nf4_quantize_jit(w)


def is_nf4(w: Any) -> bool:
    return isinstance(w, dict) and NF4_KEY in w


def nf4_dequantize(q: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of nf4_quantize; shapes recovered from the packed arrays."""
    packed, absmax = q[NF4_KEY], q["absmax"]
    *lead, half, d_out = packed.shape
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    idx = jnp.stack([hi, lo], axis=-2).reshape(*lead, half * 2 // NF4_BLOCK,
                                               NF4_BLOCK, d_out)
    vals = jnp.take(NF4_CODE, idx) * absmax[..., None, :]
    return vals.reshape(*lead, half * 2, d_out).astype(dtype)


def quantize_decoder_params(text_params: dict) -> dict:
    """Quantize the decoder's large matrices (attn + mlp + logits head).

    The input embedding stays bf16 (it is gathered, not matmul'd); for tied
    embeddings a separate int8 "logits_head" table (embed transposed) serves
    the per-step logits matmul, which otherwise re-reads the full bf16
    embedding every decode step. Norms and biases stay as-is.
    """
    layers = text_params["layers"]
    new_attn = dict(layers["attn"])
    for name in ("wq", "wk", "wv", "wo"):
        new_attn[name] = quantize_weight(layers["attn"][name])
    new_mlp = {name: quantize_weight(layers["mlp"][name])
               for name in ("gate", "up", "down")}
    new_layers = dict(layers)
    new_layers["attn"] = new_attn
    new_layers["mlp"] = new_mlp
    out = dict(text_params)
    out["layers"] = new_layers
    if "lm_head" in text_params:
        out["lm_head"] = quantize_weight(text_params["lm_head"])
    else:
        out["logits_head"] = quantize_weight(
            jnp.swapaxes(text_params["embed"], 0, 1))
    return out
