"""SegFormer (MiT) image classifier, TPU-native.

The reference's *production* document classifier is a SegFormer — the HF
pipeline in karanta/inference/image_classifier.py:8-12 loads
``taresco/newspaper_classifier_segformer`` (a fine-tuned nvidia/mit-b0), and
the trainer configs cover segformer first
(configs/training/classification/segformer_base_sft_newpaper_classifier.yaml).
This module implements the MiT encoder + classification head in JAX so that
checkpoint loads directly: hierarchical overlap patch embeddings, efficient
self-attention with sequence reduction, and Mix-FFN with a depthwise conv —
all as XLA convs/matmuls in NHWC layout (TPU-preferred).

A converter for HF SegformerForImageClassification state dicts is provided
with a logits-parity test (tests/test_classifier.py::TestSegFormerParity).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.ops.attention import attention

Params = Any


@dataclasses.dataclass(frozen=True)
class SegFormerConfig:
    # nvidia/mit-b0 geometry (the reference's base checkpoint)
    num_channels: int = 3
    hidden_sizes: tuple[int, ...] = (32, 64, 160, 256)
    depths: tuple[int, ...] = (2, 2, 2, 2)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: tuple[int, ...] = (7, 3, 3, 3)
    strides: tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratios: tuple[int, ...] = (4, 4, 4, 4)
    num_classes: int = 2
    layer_norm_eps: float = 1e-6
    image_size: int = 512                 # SegformerImageProcessor default
    labels: tuple[str, ...] = ("no_segment", "segment")

    @property
    def num_stages(self) -> int:
        return len(self.hidden_sizes)


def tiny_segformer(num_classes: int = 2) -> SegFormerConfig:
    return SegFormerConfig(
        hidden_sizes=(8, 16), depths=(1, 1), num_heads=(1, 2),
        sr_ratios=(4, 1), patch_sizes=(7, 3), strides=(4, 2),
        mlp_ratios=(2, 2), num_classes=num_classes, image_size=64)


def _conv(x, kernel, bias, stride: int, padding: int, groups: int = 1):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return out + bias.astype(x.dtype)


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(
        x.dtype)


def init_segformer_params(cfg: SegFormerConfig, key: jax.Array,
                          dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 * sum(cfg.depths) + 2 * cfg.num_stages
                                 + 2))

    def dense(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return (jax.random.normal(k, shape, jnp.float32)
                * fan_in ** -0.5).astype(dtype)

    stages = []
    in_ch = cfg.num_channels
    for si in range(cfg.num_stages):
        h = cfg.hidden_sizes[si]
        p, inter = cfg.patch_sizes[si], h * cfg.mlp_ratios[si]
        blocks = []
        for _ in range(cfg.depths[si]):
            blk = {
                "ln1_scale": jnp.ones((h,), dtype),
                "ln1_bias": jnp.zeros((h,), dtype),
                "wq": dense(next(keys), (h, h)), "bq": jnp.zeros((h,), dtype),
                "wk": dense(next(keys), (h, h)), "bk": jnp.zeros((h,), dtype),
                "wv": dense(next(keys), (h, h)), "bv": jnp.zeros((h,), dtype),
                "wo": dense(next(keys), (h, h)), "bo": jnp.zeros((h,), dtype),
                "ln2_scale": jnp.ones((h,), dtype),
                "ln2_bias": jnp.zeros((h,), dtype),
                "w1": dense(next(keys), (h, inter)),
                "b1": jnp.zeros((inter,), dtype),
                "dw_kernel": dense(next(keys), (3, 3, 1, inter)),
                "dw_bias": jnp.zeros((inter,), dtype),
                "w2": dense(next(keys), (inter, h)),
                "b2": jnp.zeros((h,), dtype),
            }
            if cfg.sr_ratios[si] > 1:
                sr = cfg.sr_ratios[si]
                blk["sr_kernel"] = dense(next(keys), (sr, sr, h, h))
                blk["sr_bias"] = jnp.zeros((h,), dtype)
                blk["sr_ln_scale"] = jnp.ones((h,), dtype)
                blk["sr_ln_bias"] = jnp.zeros((h,), dtype)
            blocks.append(blk)
        stages.append({
            "patch_kernel": dense(next(keys), (p, p, in_ch, h)),
            "patch_bias": jnp.zeros((h,), dtype),
            "patch_ln_scale": jnp.ones((h,), dtype),
            "patch_ln_bias": jnp.zeros((h,), dtype),
            "blocks": blocks,
            "ln_scale": jnp.ones((h,), dtype),
            "ln_bias": jnp.zeros((h,), dtype),
        })
        in_ch = h
    return {
        "stages": stages,
        "head": {"kernel": dense(next(keys),
                                 (cfg.hidden_sizes[-1], cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), dtype)},
    }


def _block(x, p, hgt: int, wid: int, heads: int, sr: int, eps: float):
    b, n, c = x.shape
    d = c // heads
    xn = _layer_norm(x, p["ln1_scale"], p["ln1_bias"], eps)
    q = (xn @ p["wq"] + p["bq"]).reshape(b, n, heads, d)
    kv_in = xn
    if sr > 1:
        xs = xn.reshape(b, hgt, wid, c)
        xs = _conv(xs, p["sr_kernel"], p["sr_bias"], sr, 0)
        kv_in = _layer_norm(xs.reshape(b, -1, c),
                            p["sr_ln_scale"], p["sr_ln_bias"], eps)
    k = (kv_in @ p["wk"] + p["bk"]).reshape(b, -1, heads, d)
    v = (kv_in @ p["wv"] + p["bv"]).reshape(b, -1, heads, d)
    a = attention(q, k, v, causal=False).reshape(b, n, c)
    x = x + (a @ p["wo"] + p["bo"])

    xn = _layer_norm(x, p["ln2_scale"], p["ln2_bias"], eps)
    y = xn @ p["w1"] + p["b1"]
    inter = y.shape[-1]
    y = _conv(y.reshape(b, hgt, wid, inter), p["dw_kernel"], p["dw_bias"],
              1, 1, groups=inter)
    y = jax.nn.gelu(y.reshape(b, n, inter), approximate=False)
    return x + (y @ p["w2"] + p["b2"])


def segformer_forward(params: Params, cfg: SegFormerConfig,
                      images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) normalized floats -> logits (B, num_classes)."""
    x = images
    eps = cfg.layer_norm_eps
    for si, stage in enumerate(params["stages"]):
        x = _conv(x, stage["patch_kernel"], stage["patch_bias"],
                  cfg.strides[si], cfg.patch_sizes[si] // 2)
        b, hgt, wid, c = x.shape
        x = _layer_norm(x.reshape(b, hgt * wid, c),
                        stage["patch_ln_scale"], stage["patch_ln_bias"], eps)
        for blk in stage["blocks"]:
            x = _block(x, blk, hgt, wid, cfg.num_heads[si],
                       cfg.sr_ratios[si], eps)
        x = _layer_norm(x, stage["ln_scale"], stage["ln_bias"], eps)
        x = x.reshape(b, hgt, wid, c)
    # global average pool over the final feature map, then classify
    # (SegformerForImageClassification semantics)
    pooled = x.reshape(x.shape[0], -1, x.shape[-1]).mean(1)
    return pooled @ params["head"]["kernel"] + params["head"]["bias"]


def convert_hf_segformer(state: dict, cfg: SegFormerConfig,
                         dtype=jnp.float32) -> Params:
    """Convert an HF SegformerForImageClassification state dict."""

    def t(key):
        v = state[key]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return np.asarray(v)

    def lin(key):  # torch Linear (out, in) -> (in, out)
        return jnp.asarray(t(key).T, dtype)

    def vec(key):
        return jnp.asarray(t(key), dtype)

    def conv(key):  # torch Conv2d (out, in/groups, kh, kw) -> HWIO
        return jnp.asarray(t(key).transpose(2, 3, 1, 0), dtype)

    enc = "segformer.encoder."
    stages = []
    for si in range(cfg.num_stages):
        blocks = []
        for bi in range(cfg.depths[si]):
            pre = f"{enc}block.{si}.{bi}."
            blk = {
                "ln1_scale": vec(pre + "layer_norm_1.weight"),
                "ln1_bias": vec(pre + "layer_norm_1.bias"),
                "wq": lin(pre + "attention.self.query.weight"),
                "bq": vec(pre + "attention.self.query.bias"),
                "wk": lin(pre + "attention.self.key.weight"),
                "bk": vec(pre + "attention.self.key.bias"),
                "wv": lin(pre + "attention.self.value.weight"),
                "bv": vec(pre + "attention.self.value.bias"),
                "wo": lin(pre + "attention.output.dense.weight"),
                "bo": vec(pre + "attention.output.dense.bias"),
                "ln2_scale": vec(pre + "layer_norm_2.weight"),
                "ln2_bias": vec(pre + "layer_norm_2.bias"),
                "w1": lin(pre + "mlp.dense1.weight"),
                "b1": vec(pre + "mlp.dense1.bias"),
                "dw_kernel": conv(pre + "mlp.dwconv.dwconv.weight"),
                "dw_bias": vec(pre + "mlp.dwconv.dwconv.bias"),
                "w2": lin(pre + "mlp.dense2.weight"),
                "b2": vec(pre + "mlp.dense2.bias"),
            }
            if cfg.sr_ratios[si] > 1:
                blk["sr_kernel"] = conv(pre + "attention.self.sr.weight")
                blk["sr_bias"] = vec(pre + "attention.self.sr.bias")
                blk["sr_ln_scale"] = vec(pre + "attention.self.layer_norm.weight")
                blk["sr_ln_bias"] = vec(pre + "attention.self.layer_norm.bias")
            blocks.append(blk)
        stages.append({
            "patch_kernel": conv(f"{enc}patch_embeddings.{si}.proj.weight"),
            "patch_bias": vec(f"{enc}patch_embeddings.{si}.proj.bias"),
            "patch_ln_scale": vec(f"{enc}patch_embeddings.{si}.layer_norm.weight"),
            "patch_ln_bias": vec(f"{enc}patch_embeddings.{si}.layer_norm.bias"),
            "blocks": blocks,
            "ln_scale": vec(f"{enc}layer_norm.{si}.weight"),
            "ln_bias": vec(f"{enc}layer_norm.{si}.bias"),
        })
    return {
        "stages": stages,
        "head": {"kernel": lin("classifier.weight"),
                 "bias": vec("classifier.bias")},
    }


def segformer_config_from_hf(hf_cfg: dict) -> SegFormerConfig:
    """Build a SegFormerConfig from an HF config.json dict."""
    id2label = hf_cfg.get("id2label", {"0": "no_segment", "1": "segment"})
    labels = tuple(id2label[str(i)] for i in range(len(id2label)))
    return SegFormerConfig(
        num_channels=hf_cfg.get("num_channels", 3),
        hidden_sizes=tuple(hf_cfg.get("hidden_sizes", (32, 64, 160, 256))),
        depths=tuple(hf_cfg.get("depths", (2, 2, 2, 2))),
        num_heads=tuple(hf_cfg.get("num_attention_heads", (1, 2, 5, 8))),
        sr_ratios=tuple(hf_cfg.get("sr_ratios", (8, 4, 2, 1))),
        patch_sizes=tuple(hf_cfg.get("patch_sizes", (7, 3, 3, 3))),
        strides=tuple(hf_cfg.get("strides", (4, 2, 2, 2))),
        mlp_ratios=tuple(hf_cfg.get("mlp_ratios", (4, 4, 4, 4))),
        layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-6),
        num_classes=len(labels), labels=labels)
