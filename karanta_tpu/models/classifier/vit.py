"""ViT image classifier, TPU-native.

Covers the reference's document-type / article-segmentation classifiers
(karanta/inference/image_classifier.py — HF pipeline over a SegFormer
checkpoint; karanta/training/run_image_classification.py trains
segformer/convnext/resnet/vit variants). We standardize on ViT: it is the
MXU-friendliest of those (pure matmuls, one conv expressible as a GEMM) and
an HF-weight converter is provided for ViTForImageClassification checkpoints.
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
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    num_classes: int = 2
    layer_norm_eps: float = 1e-12
    labels: tuple[str, ...] = ("no_segment", "segment")

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_vit(num_classes: int = 2) -> ViTConfig:
    return ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                     num_layers=2, num_heads=2, intermediate_size=64,
                     num_classes=num_classes)


def init_vit_params(cfg: ViTConfig, key: jax.Array,
                    dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 12))
    h, L, inter = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size ** 2

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (shape[-2] if len(shape) > 1 else shape[0]) ** -0.5).astype(dtype)

    def stack(k, shape):
        return dense(k, (L,) + shape)

    return {
        "patch_embed": {"kernel": dense(next(keys), (patch_dim, h)),
                        "bias": jnp.zeros((h,), dtype)},
        "cls_token": jnp.zeros((1, h), dtype),
        "pos_embed": (jax.random.normal(next(keys),
                                        (cfg.num_patches + 1, h), jnp.float32)
                      * 0.02).astype(dtype),
        "layers": {
            "ln1_scale": jnp.ones((L, h), dtype),
            "ln1_bias": jnp.zeros((L, h), dtype),
            "ln2_scale": jnp.ones((L, h), dtype),
            "ln2_bias": jnp.zeros((L, h), dtype),
            "wq": stack(next(keys), (h, h)), "bq": jnp.zeros((L, h), dtype),
            "wk": stack(next(keys), (h, h)), "bk": jnp.zeros((L, h), dtype),
            "wv": stack(next(keys), (h, h)), "bv": jnp.zeros((L, h), dtype),
            "wo": stack(next(keys), (h, h)), "bo": jnp.zeros((L, h), dtype),
            "w_up": stack(next(keys), (h, inter)),
            "b_up": jnp.zeros((L, inter), dtype),
            "w_down": stack(next(keys), (inter, h)),
            "b_down": jnp.zeros((L, h), dtype),
        },
        "final_ln_scale": jnp.ones((h,), dtype),
        "final_ln_bias": jnp.zeros((h,), dtype),
        "head": {"kernel": dense(next(keys), (h, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), dtype)},
    }


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(x.dtype)


def patchify_image(image: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) float -> (B, N, 3*patch*patch) in HF Conv2d order (C,ph,pw)."""
    b, hgt, wid, c = image.shape
    gh, gw = hgt // patch, wid // patch
    x = image.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, gh, gw, C, ph, pw)
    return x.reshape(b, gh * gw, c * patch * patch)


def vit_forward(params: Params, cfg: ViTConfig,
                images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) normalized floats -> logits (B, num_classes)."""
    b = images.shape[0]
    x = patchify_image(images, cfg.patch_size) @ params["patch_embed"]["kernel"]
    x = x + params["patch_embed"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"][None], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"][None].astype(x.dtype)

    eps = cfg.layer_norm_eps

    def body(carry, layer):
        y = carry
        xn = _layer_norm(y, layer["ln1_scale"], layer["ln1_bias"], eps)
        q = (xn @ layer["wq"] + layer["bq"]).reshape(
            b, -1, cfg.num_heads, cfg.head_dim)
        k = (xn @ layer["wk"] + layer["bk"]).reshape(
            b, -1, cfg.num_heads, cfg.head_dim)
        v = (xn @ layer["wv"] + layer["bv"]).reshape(
            b, -1, cfg.num_heads, cfg.head_dim)
        a = attention(q, k, v, causal=False).reshape(b, -1, cfg.hidden_size)
        y = y + (a @ layer["wo"] + layer["bo"])
        xn = _layer_norm(y, layer["ln2_scale"], layer["ln2_bias"], eps)
        y = y + (jax.nn.gelu(xn @ layer["w_up"] + layer["b_up"],
                             approximate=False) @ layer["w_down"]
                 + layer["b_down"])
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], eps)
    cls_out = x[:, 0]
    return cls_out @ params["head"]["kernel"] + params["head"]["bias"]


def convert_hf_vit(state: dict, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """Convert an HF ViTForImageClassification state dict."""

    def t(key):
        v = state[key]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return np.asarray(v)

    L = cfg.num_layers
    pre = "vit.encoder.layer.{}."

    def stack(fmt, transpose=False):
        arrs = [t(pre.format(i) + fmt) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    conv_w = t("vit.embeddings.patch_embeddings.projection.weight")
    # (h, C, p, p) -> (C*p*p, h)
    kernel = conv_w.reshape(conv_w.shape[0], -1).T
    return {
        "patch_embed": {
            "kernel": jnp.asarray(kernel, dtype),
            "bias": jnp.asarray(
                t("vit.embeddings.patch_embeddings.projection.bias"), dtype),
        },
        "cls_token": jnp.asarray(t("vit.embeddings.cls_token")[0], dtype),
        "pos_embed": jnp.asarray(t("vit.embeddings.position_embeddings")[0],
                                 dtype),
        "layers": {
            "ln1_scale": stack("layernorm_before.weight"),
            "ln1_bias": stack("layernorm_before.bias"),
            "ln2_scale": stack("layernorm_after.weight"),
            "ln2_bias": stack("layernorm_after.bias"),
            "wq": stack("attention.attention.query.weight", transpose=True),
            "bq": stack("attention.attention.query.bias"),
            "wk": stack("attention.attention.key.weight", transpose=True),
            "bk": stack("attention.attention.key.bias"),
            "wv": stack("attention.attention.value.weight", transpose=True),
            "bv": stack("attention.attention.value.bias"),
            "wo": stack("attention.output.dense.weight", transpose=True),
            "bo": stack("attention.output.dense.bias"),
            "w_up": stack("intermediate.dense.weight", transpose=True),
            "b_up": stack("intermediate.dense.bias"),
            "w_down": stack("output.dense.weight", transpose=True),
            "b_down": stack("output.dense.bias"),
        },
        "final_ln_scale": jnp.asarray(t("vit.layernorm.weight"), dtype),
        "final_ln_bias": jnp.asarray(t("vit.layernorm.bias"), dtype),
        "head": {
            "kernel": jnp.asarray(t("classifier.weight").T, dtype),
            "bias": jnp.asarray(t("classifier.bias"), dtype),
        },
    }
