"""Qwen2.5-VL vision encoder, TPU-native.

Numerics match HF Qwen2_5_VisionTransformerPretrainedModel (checkpoints
convert directly), but the execution plan is redesigned for XLA/TPU:

  - Window attention is a *batched dense attention* over
    (n_windows, window_tokens=64, heads, head_dim) — the window dimension is
    just a batch axis. Padded grids make every window full; validity masks
    (from the host layout planner, layout.py) hide pad tokens. No varlen
    cu_seqlens, no argsort/gather on device.
  - Full-attention layers ([7,15,23,31]) reshape the same buffer to
    (1, pad_tokens, ...) and run the same flash kernel with the same mask.
  - The patch-embed Conv3D is a single matmul (the conv is non-overlapping,
    stride == kernel), which is exactly an MXU-shaped (tokens × 1176 × hidden)
    GEMM.
  - Layers run under lax.scan with stacked params; the window/full choice per
    layer is a static python branch resolved at trace time (fullatt_block_indexes
    is static), so XLA compiles each layer body once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.models.qwen25_vl.config import VisionConfig
from karanta_tpu.models.qwen25_vl.layout import VisionLayout
from karanta_tpu.ops.attention import _use_pallas, attention, window_attention
from karanta_tpu.ops.norms import rms_norm
from karanta_tpu.ops.quantization import matmul_auto as amm
from karanta_tpu.ops.rotary import apply_rope, vision_rope_cos_sin

Params = Any


def init_vision_params(cfg: VisionConfig, key: jax.Array,
                       dtype=jnp.bfloat16) -> Params:
    """Random init (tests / from-scratch training)."""
    h, d, inter = cfg.hidden_size, cfg.depth, cfg.intermediate_size
    merged = h * cfg.merge_unit
    keys = iter(jax.random.split(key, 24))

    def dense(k, shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    if cfg.mlp_type == "gated":
        mlp = {
            "gate": dense(next(keys), (h, inter))[None].repeat(d, 0),
            "gate_b": jnp.zeros((d, inter), dtype),
            "up": dense(next(keys), (h, inter))[None].repeat(d, 0),
            "up_b": jnp.zeros((d, inter), dtype),
            "down": dense(next(keys), (inter, h))[None].repeat(d, 0),
            "down_b": jnp.zeros((d, h), dtype),
        }
    else:
        mlp = {
            "fc1": dense(next(keys), (h, inter))[None].repeat(d, 0),
            "fc1_b": jnp.zeros((d, inter), dtype),
            "fc2": dense(next(keys), (inter, h))[None].repeat(d, 0),
            "fc2_b": jnp.zeros((d, h), dtype),
        }

    params = {
        "patch_embed": {"kernel": dense(next(keys), (cfg.patch_input_dim, h))},
        "blocks": {
            "norm1": jnp.ones((d, h), dtype),
            "norm2": jnp.ones((d, h), dtype),
            "attn": {
                "wq": dense(next(keys), (h, h))[None].repeat(d, 0),
                "bq": jnp.zeros((d, h), dtype),
                "wk": dense(next(keys), (h, h))[None].repeat(d, 0),
                "bk": jnp.zeros((d, h), dtype),
                "wv": dense(next(keys), (h, h))[None].repeat(d, 0),
                "bv": jnp.zeros((d, h), dtype),
                "wo": dense(next(keys), (h, h))[None].repeat(d, 0),
                "bo": jnp.zeros((d, h), dtype),
            },
            "mlp": mlp,
        },
        "merger": {
            "ln_q": jnp.ones((h,), dtype),
            "w1": dense(next(keys), (merged, merged)),
            "b1": jnp.zeros((merged,), dtype),
            "w2": dense(next(keys), (merged, cfg.out_hidden_size)),
            "b2": jnp.zeros((cfg.out_hidden_size,), dtype),
        },
    }
    if cfg.norm_type == "layernorm":
        params["blocks"]["norm1_b"] = jnp.zeros((d, h), dtype)
        params["blocks"]["norm2_b"] = jnp.zeros((d, h), dtype)
        params["merger"]["ln_q_b"] = jnp.zeros((h,), dtype)
    return params


def vision_param_axes(cfg: VisionConfig) -> Params:
    """Logical sharding axes matching init_vision_params structure."""
    if cfg.mlp_type == "gated":
        mlp = {
            "gate": ("layers", "vit_embed", "vit_mlp"),
            "gate_b": ("layers", "vit_mlp"),
            "up": ("layers", "vit_embed", "vit_mlp"),
            "up_b": ("layers", "vit_mlp"),
            "down": ("layers", "vit_mlp", "vit_embed"),
            "down_b": ("layers", "vit_embed"),
        }
    else:
        mlp = {
            "fc1": ("layers", "vit_embed", "vit_mlp"),
            "fc1_b": ("layers", "vit_mlp"),
            "fc2": ("layers", "vit_mlp", "vit_embed"),
            "fc2_b": ("layers", "vit_embed"),
        }
    axes = {
        "patch_embed": {"kernel": ("patch", "vit_embed")},
        "blocks": {
            "norm1": ("layers", "vit_embed"),
            "norm2": ("layers", "vit_embed"),
            "attn": {
                "wq": ("layers", "vit_embed", "vit_heads"),
                "bq": ("layers", "vit_heads"),
                "wk": ("layers", "vit_embed", "vit_heads"),
                "bk": ("layers", "vit_heads"),
                "wv": ("layers", "vit_embed", "vit_heads"),
                "bv": ("layers", "vit_heads"),
                "wo": ("layers", "vit_heads", "vit_embed"),
                "bo": ("layers", "vit_embed"),
            },
            "mlp": mlp,
        },
        "merger": {
            "ln_q": ("vit_embed",),
            "w1": ("vit_embed", "vit_mlp"),
            "b1": ("vit_mlp",),
            "w2": ("vit_embed", "vit_mlp"),
            "b2": ("vit_mlp",),
        },
    }
    if cfg.norm_type == "layernorm":
        axes["blocks"]["norm1_b"] = ("layers", "vit_embed")
        axes["blocks"]["norm2_b"] = ("layers", "vit_embed")
        axes["merger"]["ln_q_b"] = ("vit_embed",)
    return axes


def _vnorm(cfg: VisionConfig, x, scale, bias=None):
    if cfg.norm_type == "layernorm":
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        out = out * scale.astype(jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)
    return rms_norm(x, scale, cfg.rms_norm_eps)


def _activation(cfg: VisionConfig, x):
    if cfg.hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.silu(x)


def _attn_block(x, p, cos, sin, valid, n_windows, cfg: VisionConfig,
                full: bool, trainable: bool = False, n_images: int = 1):
    """x: (pad_tokens, hidden) window-ordered. Returns attention output.

    With n_images > 1, x is the concatenation of n_images equally-sized
    images: window layers are image-agnostic (windows never straddle the
    per-image padding), and full-attention layers treat the image axis as
    the attention batch so pages cannot attend across each other."""
    tokens, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim

    q = amm(x, p["wq"]) + p["bq"]
    k = amm(x, p["wk"]) + p["bk"]
    v = amm(x, p["wv"]) + p["bv"]

    import os

    tw = cfg.window_patches ** 2
    # Default on (disable with KARANTA_WINDOW_KERNEL=0): vision encode 133 ms
    # -> 102 ms per bench page, end-to-end 1.97 -> 2.06 pages/s. Round-1's
    # compile stalls with this kernel were cold remote-compile pileups, gone
    # with the persistent XLA cache.
    use_window_kernel = os.environ.get("KARANTA_WINDOW_KERNEL", "1") == "1"
    if not full and _use_pallas() and use_window_kernel:
        # block-diagonal kernel: windows stay in-sequence, each 256-token
        # block computes only its own diagonal tile (4 windows per block)
        q = q.reshape(1, tokens, nh, hd)
        k = k.reshape(1, tokens, nh, hd)
        v = v.reshape(1, tokens, nh, hd)
        cs = cos.reshape(1, tokens, hd)
        sn = sin.reshape(1, tokens, hd)
        if trainable:
            # differentiable wrapper (pallas has no autodiff rule); the raw
            # kernel call below measures ~3% faster end-to-end in serving
            q, k = apply_rope(q, k, cs, sn)
            out = window_attention(q, k, v, window=tw,
                                   kv_mask=valid[None, :])
        else:
            from karanta_tpu.ops.attention import (
                _window_attention_kernel_call,
            )

            # rope fused into the kernel: the standalone rotation pass
            # materialized q/k each layer (~0.37 ms of the 2.23 ms/layer)
            out = _window_attention_kernel_call(q, k, v, tw,
                                                kv_mask=valid[None, :],
                                                cos=cs, sin=sn)
        out = out.reshape(tokens, nh * hd)
        return amm(out, p["wo"]) + p["bo"]

    if full:
        shape = (n_images, tokens // n_images, nh, hd)
        mask = valid.reshape(n_images, tokens // n_images)
    else:
        shape = (n_windows, tw, nh, hd)
        mask = valid.reshape(n_windows, tw)

    q = q.reshape(shape)
    k = k.reshape(shape)
    v = v.reshape(shape)
    cs = cos.reshape(shape[0], shape[1], hd)
    sn = sin.reshape(shape[0], shape[1], hd)
    q, k = apply_rope(q, k, cs, sn)
    out = attention(q, k, v, kv_mask=mask, causal=False)
    out = out.reshape(tokens, nh * hd)
    return amm(out, p["wo"]) + p["bo"]


def _mlp(cfg: VisionConfig, x, p):
    if cfg.mlp_type == "plain":
        return amm(_activation(cfg, amm(x, p["fc1"]) + p["fc1_b"]),
                   p["fc2"]) + p["fc2_b"]
    gate = _activation(cfg, amm(x, p["gate"]) + p["gate_b"])
    up = amm(x, p["up"]) + p["up_b"]
    return amm(gate * up, p["down"]) + p["down_b"]


def encode_image(params: Params, cfg: VisionConfig,
                 pixel_values: jnp.ndarray,  # (pad_tokens, patch_input_dim)
                 perm: jnp.ndarray,          # (pad_tokens,) int32
                 valid: jnp.ndarray,         # (pad_tokens,) float32
                 pos_hw: jnp.ndarray,        # (pad_tokens, 2) int32
                 n_windows: int,
                 trainable: bool = False,
                 n_images: int = 1,
                 remat: bool = False) -> jnp.ndarray:
    """Encode one (padded) image — or, with n_images > 1, the token-axis
    concatenation of that many same-shaped images in one pass (batched
    prefill: per-call overheads amortize across pages; full-attention
    layers use the image axis as the attention batch). Returns
    (pad_merged, out_hidden) in window-merged order; callers select real
    tokens via layout.extract (+ per-image pad_merged offsets when
    batched). remat=True checkpoints each block (training: the backward
    recomputes one block's internals at a time instead of keeping all
    cfg.depth blocks' residuals live)."""
    x = amm(pixel_values, params["patch_embed"]["kernel"])
    x = jnp.take(x, perm, axis=0)  # patchify order -> window order

    cos, sin = vision_rope_cos_sin(pos_hw, cfg.head_dim, cfg.rope_theta)
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)

    blocks = params["blocks"]
    if cfg.fullatt_block_indexes is None:
        full_flags = tuple(True for _ in range(cfg.depth))
    else:
        full_flags = tuple(i in cfg.fullatt_block_indexes
                           for i in range(cfg.depth))

    # Static per-layer branch: group consecutive layers sharing the same
    # window/full mode and scan each group (fullatt_block_indexes is static).
    def make_body(full: bool):
        def body(carry, layer_params):
            y = carry
            attn_out = _attn_block(
                _vnorm(cfg, y, layer_params["norm1"],
                       layer_params.get("norm1_b")),
                layer_params["attn"], cos, sin, valid, n_windows, cfg, full,
                trainable, n_images)
            y = y + attn_out
            y = y + _mlp(cfg, _vnorm(cfg, y, layer_params["norm2"],
                                     layer_params.get("norm2_b")),
                         layer_params["mlp"])
            return y, None
        return body

    idx = 0
    while idx < cfg.depth:
        mode = full_flags[idx]
        end = idx
        while end < cfg.depth and full_flags[end] == mode:
            end += 1
        group = jax.tree.map(lambda a: a[idx:end], blocks)
        body = make_body(mode)
        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, group)
        idx = end

    # merger: norm per token, merge 2x2 units, 2-layer GELU MLP
    m = params["merger"]
    x = _vnorm(cfg, x, m["ln_q"], m.get("ln_q_b"))
    x = x.reshape(-1, cfg.merge_unit * cfg.hidden_size)
    x = jax.nn.gelu(amm(x, m["w1"]) + m["b1"], approximate=False)
    return amm(x, m["w2"]) + m["b2"]


def extract_image_tokens(encoded: jnp.ndarray, layout: VisionLayout) -> jnp.ndarray:
    """(pad_merged, out) window order -> (num_merged, out) original order."""
    return jnp.take(encoded, jnp.asarray(layout.extract), axis=0)
