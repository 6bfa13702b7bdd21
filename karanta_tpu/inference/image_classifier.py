"""Document-layout classifier inference.

Parity surface with reference karanta/inference/image_classifier.py:8-54:
`load_image` accepts a path/URL-string, PIL image, numpy array, or
torch-style tensor and normalizes to RGB; `predict_layout` returns the best
{"label", "score"} over the segment/no_segment classes. The backing model is
architecture-dispatched: SegFormer (the reference's production checkpoint
`taresco/newspaper_classifier_segformer` — models/classifier/segformer.py)
or ViT (models/classifier/vit.py); a lazily-created singleton mirrors the
reference's module-level pipeline.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

# HF ViT-style processors normalize with 0.5s; SegFormer's processor uses
# the ImageNet statistics
HALF_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
HALF_STD = np.array([0.5, 0.5, 0.5], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class LayoutClassifier:
    def __init__(self, params: Any, cfg: Any, arch: str = "vit"):
        import functools

        import jax

        if arch == "vit":
            from karanta_tpu.models.classifier.vit import vit_forward

            forward, self.mean, self.std = vit_forward, HALF_MEAN, HALF_STD
        elif arch == "segformer":
            from karanta_tpu.models.classifier.segformer import (
                segformer_forward,
            )

            forward = segformer_forward
            self.mean, self.std = IMAGENET_MEAN, IMAGENET_STD
        elif arch == "convnextv2":
            from karanta_tpu.models.classifier.convnets import (
                convnextv2_forward,
            )

            forward = convnextv2_forward
            self.mean, self.std = IMAGENET_MEAN, IMAGENET_STD
        elif arch == "resnet":
            from karanta_tpu.models.classifier.convnets import resnet_forward

            forward = resnet_forward
            self.mean, self.std = IMAGENET_MEAN, IMAGENET_STD
        else:
            raise ValueError(f"unknown classifier arch {arch!r}")
        self.arch = arch
        self.params = params
        self.cfg = cfg
        # normalize ON DEVICE: the host ships uint8 pixels (4x fewer bytes
        # over PCIe/tunnel than pre-normalized float32 — transfer dominated
        # the batch path) and /255-mean-std fuses into the first conv
        mean, std = self.mean, self.std

        def normalized_forward(params, images, cfg):
            import jax.numpy as jnp

            x = images.astype(jnp.float32) / 255.0
            x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
            return forward(params, images=x, cfg=cfg)

        self._forward = jax.jit(functools.partial(normalized_forward,
                                                  cfg=cfg))

    @classmethod
    def from_checkpoint(cls, path: str) -> "LayoutClassifier":
        """Load an HF image-classification directory (safetensors).

        Dispatches on config.json model_type: segformer (the reference's
        production classifier) or vit.
        """
        import glob as globmod
        import json

        from safetensors import safe_open

        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        state = {}
        for file in globmod.glob(os.path.join(path, "*.safetensors")):
            with safe_open(file, framework="np") as f:
                for key in f.keys():
                    state[key] = f.get_tensor(key)

        model_type = hf_cfg.get("model_type", "vit")
        if model_type == "segformer":
            from karanta_tpu.models.classifier.segformer import (
                convert_hf_segformer, segformer_config_from_hf,
            )

            cfg = segformer_config_from_hf(hf_cfg)
            return cls(convert_hf_segformer(state, cfg), cfg,
                       arch="segformer")
        if model_type in ("convnextv2", "convnext"):
            from karanta_tpu.models.classifier.convnets import (
                convert_hf_convnextv2, convnextv2_config_from_hf,
            )

            cfg = convnextv2_config_from_hf(hf_cfg)
            return cls(convert_hf_convnextv2(state, cfg), cfg,
                       arch="convnextv2")
        if model_type == "resnet":
            from karanta_tpu.models.classifier.convnets import (
                convert_hf_resnet, resnet_config_from_hf,
            )

            cfg = resnet_config_from_hf(hf_cfg)
            return cls(convert_hf_resnet(state, cfg), cfg, arch="resnet")

        from karanta_tpu.models.classifier.vit import ViTConfig, convert_hf_vit

        id2label = hf_cfg.get("id2label", {"0": "no_segment", "1": "segment"})
        labels = tuple(id2label[str(i)] for i in range(len(id2label)))
        cfg = ViTConfig(
            image_size=hf_cfg.get("image_size", 224),
            patch_size=hf_cfg.get("patch_size", 16),
            hidden_size=hf_cfg.get("hidden_size", 768),
            num_layers=hf_cfg.get("num_hidden_layers", 12),
            num_heads=hf_cfg.get("num_attention_heads", 12),
            intermediate_size=hf_cfg.get("intermediate_size", 3072),
            num_classes=len(labels), labels=labels)
        return cls(convert_hf_vit(state, cfg), cfg)

    @classmethod
    def random(cls, seed: int = 0, arch: str = "vit") -> "LayoutClassifier":
        import jax

        if arch == "segformer":
            from karanta_tpu.models.classifier.segformer import (
                SegFormerConfig, init_segformer_params,
            )

            cfg = SegFormerConfig()
            return cls(init_segformer_params(cfg, jax.random.PRNGKey(seed)),
                       cfg, arch="segformer")
        if arch == "convnextv2":
            from karanta_tpu.models.classifier.convnets import (
                ConvNeXtV2Config, init_convnextv2_params,
            )

            cfg = ConvNeXtV2Config()
            return cls(init_convnextv2_params(cfg, jax.random.PRNGKey(seed)),
                       cfg, arch="convnextv2")
        if arch == "resnet":
            from karanta_tpu.models.classifier.convnets import (
                ResNetConfig, init_resnet_params,
            )

            cfg = ResNetConfig()
            return cls(init_resnet_params(cfg, jax.random.PRNGKey(seed)),
                       cfg, arch="resnet")
        from karanta_tpu.models.classifier.vit import ViTConfig, init_vit_params

        cfg = ViTConfig()
        return cls(init_vit_params(cfg, jax.random.PRNGKey(seed)), cfg)

    def preprocess(self, image) -> np.ndarray:
        from PIL import Image

        pil = load_image(image)
        pil = pil.resize((self.cfg.image_size, self.cfg.image_size),
                         Image.Resampling.BILINEAR)
        return np.asarray(pil, np.uint8)  # normalization happens on device

    def predict(self, image) -> dict:
        import jax

        batch = self.preprocess(image)[None]
        logits = np.asarray(self._forward(self.params, images=batch))[0]
        probs = np.asarray(jax.nn.softmax(logits))
        best = int(np.argmax(probs))
        return {"label": self.cfg.labels[best], "score": float(probs[best])}

    def predict_batch(self, images: list) -> list[dict]:
        import jax

        batch = np.stack([self.preprocess(im) for im in images])
        logits = np.asarray(self._forward(self.params, images=batch))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        best = probs.argmax(-1)
        return [{"label": self.cfg.labels[int(b)], "score": float(p[int(b)])}
                for b, p in zip(best, probs)]


def load_image(image) -> "Any":
    """path / PIL / ndarray / torch-tensor -> RGB PIL image
    (reference image_classifier.py:15-39)."""
    from PIL import Image

    if isinstance(image, str):
        if image.startswith("http://") or image.startswith("https://"):
            raise ValueError("URL inputs need network access; download first")
        pil = Image.open(image)
    elif isinstance(image, Image.Image):
        pil = image
    elif isinstance(image, np.ndarray):
        arr = image
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = np.moveaxis(arr, 0, -1)  # CHW -> HWC
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
        pil = Image.fromarray(arr)
    elif hasattr(image, "detach"):  # torch tensor
        return load_image(image.detach().cpu().numpy())
    elif hasattr(image, "__array__"):  # jax array & friends
        return load_image(np.asarray(image))
    else:
        raise TypeError(f"Unsupported image type {type(image)}")
    return pil.convert("RGB")


_classifier: Optional[LayoutClassifier] = None


def _get_classifier() -> LayoutClassifier:
    global _classifier
    if _classifier is None:
        path = os.environ.get("KARANTA_CLASSIFIER_PATH")
        if path and os.path.isdir(path):
            _classifier = LayoutClassifier.from_checkpoint(path)
        else:
            _classifier = LayoutClassifier.random()
    return _classifier


def predict_layout(image) -> dict:
    """{"label": "segment"|"no_segment", "score": float}
    (reference image_classifier.py:42-54)."""
    return _get_classifier().predict(image)
