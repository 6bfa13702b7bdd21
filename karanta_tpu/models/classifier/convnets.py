"""ConvNeXt V2 and ResNet image classifiers, TPU-native.

Completes the reference's 4-architecture classification set
(configs/training/classification/: segformer, convnext
facebook/convnextv2-tiny-1k-224, resnet microsoft/resnet-50, vit) so any of
its trained checkpoints loads here. Both are NHWC XLA convolutions +
matmuls; HF state-dict converters with logits-parity tests
(tests/test_classifier.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


def _conv(x, kernel, bias, stride: int, padding: int, groups: int = 1):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def _layer_norm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return (((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(
        x.dtype)


# ---------------------------------------------------------------------------
# ConvNeXt V2
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvNeXtV2Config:
    # facebook/convnextv2-tiny-1k-224 geometry
    num_channels: int = 3
    patch_size: int = 4
    hidden_sizes: tuple[int, ...] = (96, 192, 384, 768)
    depths: tuple[int, ...] = (3, 3, 9, 3)
    num_classes: int = 2
    layer_norm_eps: float = 1e-12   # HF config.layer_norm_eps (final LN)
    image_size: int = 224
    labels: tuple[str, ...] = ("no_segment", "segment")

    @property
    def num_stages(self) -> int:
        return len(self.hidden_sizes)


def tiny_convnextv2(num_classes: int = 2) -> ConvNeXtV2Config:
    return ConvNeXtV2Config(hidden_sizes=(8, 16), depths=(1, 1),
                            num_classes=num_classes, image_size=64)


def init_convnextv2_params(cfg: ConvNeXtV2Config, key: jax.Array,
                           dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 4 * sum(cfg.depths)
                                 + 2 * cfg.num_stages + 4))

    def dense(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return (jax.random.normal(k, shape, jnp.float32)
                * fan_in ** -0.5).astype(dtype)

    stages = []
    for si in range(cfg.num_stages):
        c = cfg.hidden_sizes[si]
        stage: dict = {"blocks": []}
        if si > 0:
            cin = cfg.hidden_sizes[si - 1]
            stage["down_ln_scale"] = jnp.ones((cin,), dtype)
            stage["down_ln_bias"] = jnp.zeros((cin,), dtype)
            stage["down_kernel"] = dense(next(keys), (2, 2, cin, c))
            stage["down_bias"] = jnp.zeros((c,), dtype)
        for _ in range(cfg.depths[si]):
            stage["blocks"].append({
                "dw_kernel": dense(next(keys), (7, 7, 1, c)),
                "dw_bias": jnp.zeros((c,), dtype),
                "ln_scale": jnp.ones((c,), dtype),
                "ln_bias": jnp.zeros((c,), dtype),
                "w1": dense(next(keys), (c, 4 * c)),
                "b1": jnp.zeros((4 * c,), dtype),
                "grn_scale": jnp.zeros((4 * c,), dtype),
                "grn_bias": jnp.zeros((4 * c,), dtype),
                "w2": dense(next(keys), (4 * c, c)),
                "b2": jnp.zeros((c,), dtype),
            })
        stages.append(stage)
    c0, cl = cfg.hidden_sizes[0], cfg.hidden_sizes[-1]
    return {
        "stem_kernel": dense(next(keys),
                             (cfg.patch_size, cfg.patch_size,
                              cfg.num_channels, c0)),
        "stem_bias": jnp.zeros((c0,), dtype),
        "stem_ln_scale": jnp.ones((c0,), dtype),
        "stem_ln_bias": jnp.zeros((c0,), dtype),
        "stages": stages,
        "final_ln_scale": jnp.ones((cl,), dtype),
        "final_ln_bias": jnp.zeros((cl,), dtype),
        "head": {"kernel": dense(next(keys), (cl, cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), dtype)},
    }


def _grn(x, scale, bias):
    """Global Response Normalization (ConvNeXt V2): L2 over spatial dims,
    normalized by the channel mean."""
    xf = x.astype(jnp.float32)
    g = jnp.sqrt(jnp.sum(xf * xf, axis=(1, 2), keepdims=True))  # (B,1,1,C)
    n = g / (g.mean(-1, keepdims=True) + 1e-6)
    return (scale * (xf * n) + bias + xf).astype(x.dtype)


def convnextv2_forward(params: Params, cfg: ConvNeXtV2Config,
                       images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) normalized floats -> logits (B, num_classes)."""
    x = _conv(images, params["stem_kernel"], params["stem_bias"],
              cfg.patch_size, 0)
    x = _layer_norm(x, params["stem_ln_scale"], params["stem_ln_bias"])
    for si, stage in enumerate(params["stages"]):
        if si > 0:
            x = _layer_norm(x, stage["down_ln_scale"], stage["down_ln_bias"])
            x = _conv(x, stage["down_kernel"], stage["down_bias"], 2, 0)
        c = cfg.hidden_sizes[si]
        for blk in stage["blocks"]:
            y = _conv(x, blk["dw_kernel"], blk["dw_bias"], 1, 3, groups=c)
            y = _layer_norm(y, blk["ln_scale"], blk["ln_bias"])
            y = jax.nn.gelu(y @ blk["w1"] + blk["b1"], approximate=False)
            y = _grn(y, blk["grn_scale"], blk["grn_bias"])
            x = x + (y @ blk["w2"] + blk["b2"])
    pooled = x.mean(axis=(1, 2))
    pooled = _layer_norm(pooled, params["final_ln_scale"],
                         params["final_ln_bias"], cfg.layer_norm_eps)
    return pooled @ params["head"]["kernel"] + params["head"]["bias"]


def convert_hf_convnextv2(state: dict, cfg: ConvNeXtV2Config,
                          dtype=jnp.float32) -> Params:
    """Convert an HF ConvNextV2ForImageClassification state dict."""

    def t(key):
        v = state[key]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return np.asarray(v)

    def conv(key):
        return jnp.asarray(t(key).transpose(2, 3, 1, 0), dtype)

    def lin(key):
        return jnp.asarray(t(key).T, dtype)

    def vec(key):
        return jnp.asarray(t(key).reshape(-1), dtype)

    enc = "convnextv2.encoder.stages"
    stages = []
    for si in range(cfg.num_stages):
        stage: dict = {"blocks": []}
        if si > 0:
            stage["down_ln_scale"] = vec(f"{enc}.{si}.downsampling_layer.0.weight")
            stage["down_ln_bias"] = vec(f"{enc}.{si}.downsampling_layer.0.bias")
            stage["down_kernel"] = conv(f"{enc}.{si}.downsampling_layer.1.weight")
            stage["down_bias"] = vec(f"{enc}.{si}.downsampling_layer.1.bias")
        for bi in range(cfg.depths[si]):
            pre = f"{enc}.{si}.layers.{bi}."
            stage["blocks"].append({
                "dw_kernel": conv(pre + "dwconv.weight"),
                "dw_bias": vec(pre + "dwconv.bias"),
                "ln_scale": vec(pre + "layernorm.weight"),
                "ln_bias": vec(pre + "layernorm.bias"),
                "w1": lin(pre + "pwconv1.weight"),
                "b1": vec(pre + "pwconv1.bias"),
                "grn_scale": vec(pre + "grn.weight"),
                "grn_bias": vec(pre + "grn.bias"),
                "w2": lin(pre + "pwconv2.weight"),
                "b2": vec(pre + "pwconv2.bias"),
            })
        stages.append(stage)
    return {
        "stem_kernel": conv("convnextv2.embeddings.patch_embeddings.weight"),
        "stem_bias": vec("convnextv2.embeddings.patch_embeddings.bias"),
        "stem_ln_scale": vec("convnextv2.embeddings.layernorm.weight"),
        "stem_ln_bias": vec("convnextv2.embeddings.layernorm.bias"),
        "stages": stages,
        "final_ln_scale": vec("convnextv2.layernorm.weight"),
        "final_ln_bias": vec("convnextv2.layernorm.bias"),
        "head": {"kernel": lin("classifier.weight"),
                 "bias": vec("classifier.bias")},
    }


def convnextv2_config_from_hf(hf_cfg: dict) -> ConvNeXtV2Config:
    id2label = hf_cfg.get("id2label", {"0": "no_segment", "1": "segment"})
    labels = tuple(id2label[str(i)] for i in range(len(id2label)))
    return ConvNeXtV2Config(
        num_channels=hf_cfg.get("num_channels", 3),
        patch_size=hf_cfg.get("patch_size", 4),
        hidden_sizes=tuple(hf_cfg.get("hidden_sizes", (96, 192, 384, 768))),
        depths=tuple(hf_cfg.get("depths", (3, 3, 9, 3))),
        layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-12),
        num_classes=len(labels), labels=labels)


# ---------------------------------------------------------------------------
# ResNet (bottleneck, v1.5-style: stride in the 3x3)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    # microsoft/resnet-50 geometry
    num_channels: int = 3
    embedding_size: int = 64
    hidden_sizes: tuple[int, ...] = (256, 512, 1024, 2048)
    depths: tuple[int, ...] = (3, 4, 6, 3)
    reduction: int = 4
    downsample_in_first_stage: bool = False
    num_classes: int = 2
    bn_eps: float = 1e-5
    image_size: int = 224
    labels: tuple[str, ...] = ("no_segment", "segment")

    @property
    def num_stages(self) -> int:
        return len(self.hidden_sizes)


def tiny_resnet(num_classes: int = 2) -> ResNetConfig:
    return ResNetConfig(embedding_size=8, hidden_sizes=(8, 16),
                        depths=(1, 1), num_classes=num_classes,
                        image_size=64)


def _bn_params(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _bn(x, p, eps):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (xf - p["mean"]) * inv * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def init_resnet_params(cfg: ResNetConfig, key: jax.Array,
                       dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 4 * sum(cfg.depths) + 8))

    def dense(k, shape):
        fan_in = int(np.prod(shape[:-1]))
        return (jax.random.normal(k, shape, jnp.float32)
                * fan_in ** -0.5).astype(dtype)

    stages = []
    cin = cfg.embedding_size
    for si in range(cfg.num_stages):
        cout = cfg.hidden_sizes[si]
        reduces = cout // cfg.reduction
        layers = []
        for li in range(cfg.depths[si]):
            lin_ch = cin if li == 0 else cout
            layer = {
                "conv1": dense(next(keys), (1, 1, lin_ch, reduces)),
                "bn1": _bn_params(reduces, dtype),
                "conv2": dense(next(keys), (3, 3, reduces, reduces)),
                "bn2": _bn_params(reduces, dtype),
                "conv3": dense(next(keys), (1, 1, reduces, cout)),
                "bn3": _bn_params(cout, dtype),
            }
            if li == 0 and (lin_ch != cout or si > 0
                            or cfg.downsample_in_first_stage):
                layer["short_conv"] = dense(next(keys), (1, 1, lin_ch, cout))
                layer["short_bn"] = _bn_params(cout, dtype)
            layers.append(layer)
        stages.append({"layers": layers})
        cin = cout
    return {
        "stem_kernel": dense(next(keys),
                             (7, 7, cfg.num_channels, cfg.embedding_size)),
        "stem_bn": _bn_params(cfg.embedding_size, dtype),
        "stages": stages,
        "head": {"kernel": dense(next(keys),
                                 (cfg.hidden_sizes[-1], cfg.num_classes)),
                 "bias": jnp.zeros((cfg.num_classes,), dtype)},
    }


def resnet_forward(params: Params, cfg: ResNetConfig,
                   images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) normalized floats -> logits (B, num_classes)."""
    eps = cfg.bn_eps
    x = _conv(images, params["stem_kernel"], None, 2, 3)
    x = jax.nn.relu(_bn(x, params["stem_bn"], eps))
    # maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    for si, stage in enumerate(params["stages"]):
        stride = 2 if (si > 0 or cfg.downsample_in_first_stage) else 1
        for li, layer in enumerate(stage["layers"]):
            s = stride if li == 0 else 1
            shortcut = x
            if "short_conv" in layer:
                shortcut = _bn(_conv(x, layer["short_conv"], None, s, 0),
                               layer["short_bn"], eps)
            y = jax.nn.relu(_bn(_conv(x, layer["conv1"], None, 1, 0),
                                layer["bn1"], eps))
            y = jax.nn.relu(_bn(_conv(y, layer["conv2"], None, s, 1),
                                layer["bn2"], eps))
            y = _bn(_conv(y, layer["conv3"], None, 1, 0), layer["bn3"], eps)
            x = jax.nn.relu(y + shortcut)
    pooled = x.mean(axis=(1, 2))
    return pooled @ params["head"]["kernel"] + params["head"]["bias"]


def convert_hf_resnet(state: dict, cfg: ResNetConfig,
                      dtype=jnp.float32) -> Params:
    """Convert an HF ResNetForImageClassification state dict."""

    def t(key):
        v = state[key]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return np.asarray(v)

    def conv(key):
        return jnp.asarray(t(key).transpose(2, 3, 1, 0), dtype)

    def vec(key):
        return jnp.asarray(t(key), dtype)

    def bn(prefix):
        return {"scale": vec(prefix + ".weight"),
                "bias": vec(prefix + ".bias"),
                "mean": vec(prefix + ".running_mean"),
                "var": vec(prefix + ".running_var")}

    enc = "resnet.encoder.stages"
    stages = []
    for si in range(cfg.num_stages):
        layers = []
        for li in range(cfg.depths[si]):
            pre = f"{enc}.{si}.layers.{li}."
            layer = {
                "conv1": conv(pre + "layer.0.convolution.weight"),
                "bn1": bn(pre + "layer.0.normalization"),
                "conv2": conv(pre + "layer.1.convolution.weight"),
                "bn2": bn(pre + "layer.1.normalization"),
                "conv3": conv(pre + "layer.2.convolution.weight"),
                "bn3": bn(pre + "layer.2.normalization"),
            }
            if f"{pre}shortcut.convolution.weight" in state:
                layer["short_conv"] = conv(pre + "shortcut.convolution.weight")
                layer["short_bn"] = bn(pre + "shortcut.normalization")
            layers.append(layer)
        stages.append({"layers": layers})
    return {
        "stem_kernel": conv("resnet.embedder.embedder.convolution.weight"),
        "stem_bn": bn("resnet.embedder.embedder.normalization"),
        "stages": stages,
        "head": {"kernel": jnp.asarray(t("classifier.1.weight").T, dtype),
                 "bias": vec("classifier.1.bias")},
    }


def resnet_config_from_hf(hf_cfg: dict) -> ResNetConfig:
    id2label = hf_cfg.get("id2label", {"0": "no_segment", "1": "segment"})
    labels = tuple(id2label[str(i)] for i in range(len(id2label)))
    return ResNetConfig(
        num_channels=hf_cfg.get("num_channels", 3),
        embedding_size=hf_cfg.get("embedding_size", 64),
        hidden_sizes=tuple(hf_cfg.get("hidden_sizes", (256, 512, 1024, 2048))),
        depths=tuple(hf_cfg.get("depths", (3, 4, 6, 3))),
        downsample_in_first_stage=hf_cfg.get("downsample_in_first_stage",
                                             False),
        num_classes=len(labels), labels=labels)
