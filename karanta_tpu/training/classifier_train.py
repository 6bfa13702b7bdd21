"""Image-classification trainer (document type / article segmentation).

Native equivalent of the reference's HF-Trainer flow
(karanta/training/run_image_classification.py:50-327): imagefolder/mixed
dataset loading, train/val split, label maps, augmentation (random rotation +
affine jitter — :235-250), accuracy metric, checkpointing + resume. The model
is the JAX ViT (models/classifier/vit.py); the loop is one jitted train step.

Usage: python -m karanta_tpu.training.classifier_train <cfg.yaml> [--k v ...]
"""

from __future__ import annotations

import dataclasses
import logging
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger("karanta_tpu.classifier_train")


@dataclasses.dataclass
class ClassifierArguments:
    dataset_dir: str = ""                # imagefolder: <dir>/<label>/*.png
    dataset_mix: Optional[List[str]] = None  # "dir:fraction" entries
    output_dir: str = "runs/classifier"
    # architecture: vit | segformer (mit-b0, the reference's production
    # arch) | segformer-tiny (2-stage, for dummy/integration configs)
    arch: str = "vit"
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    intermediate_size: int = 1536
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    batch_size: int = 32
    num_epochs: int = 3
    max_steps: int = -1
    eval_fraction: float = 0.1
    warmup_steps: int = 20
    logging_steps: int = 10
    checkpointing_steps: int = 200
    seed: int = 42
    augment: bool = True
    resume_from_checkpoint: Optional[str] = None


IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def load_imagefolder(root: str) -> tuple[list[str], list[int], list[str]]:
    """(paths, label_ids, label_names) from <root>/<label>/*.ext."""
    root_path = Path(root)
    labels = sorted(d.name for d in root_path.iterdir() if d.is_dir())
    paths, ids = [], []
    for label_id, label in enumerate(labels):
        for p in sorted((root_path / label).iterdir()):
            if p.suffix.lower() in IMG_EXTS:
                paths.append(str(p))
                ids.append(label_id)
    return paths, ids, labels


def prepare_mixed_datasets(mix_specs: list[str]
                           ) -> tuple[list[str], list[int], list[str]]:
    """Combine imagefolders with per-source fractions/counts:
    "dir:0.5" (fraction) or "dir:100" (count) or "dir"
    (reference karanta/data/utils.py:28-111)."""
    all_paths: list[str] = []
    all_ids: list[int] = []
    label_names: list[str] = []
    label_map: dict[str, int] = {}
    rng = np.random.default_rng(0)
    for spec in mix_specs:
        if ":" in spec:
            directory, amount = spec.rsplit(":", 1)
            amount = float(amount)
        else:
            directory, amount = spec, 1.0
        paths, ids, labels = load_imagefolder(directory)
        for label in labels:
            if label not in label_map:
                label_map[label] = len(label_names)
                label_names.append(label)
        remap = {i: label_map[label] for i, label in enumerate(labels)}
        n = len(paths)
        take = int(n * amount) if amount <= 1.0 else min(int(amount), n)
        sel = rng.permutation(n)[:take]
        all_paths.extend(paths[i] for i in sel)
        all_ids.extend(remap[ids[i]] for i in sel)
    return all_paths, all_ids, label_names


def _augment(pil, rng: np.random.Generator):
    """Random rotation (±15°) + translate/scale jitter
    (reference run_image_classification.py:235-250)."""
    from PIL import Image

    angle = float(rng.uniform(-15, 15))
    pil = pil.rotate(angle, resample=Image.Resampling.BILINEAR,
                     fillcolor=(255, 255, 255))
    scale = float(rng.uniform(0.9, 1.1))
    w, h = pil.size
    pil = pil.resize((max(1, int(w * scale)), max(1, int(h * scale))),
                     Image.Resampling.BILINEAR)
    dx, dy = rng.integers(-int(0.1 * w), int(0.1 * w) + 1, 2)
    canvas = Image.new("RGB", (w, h), (255, 255, 255))
    canvas.paste(pil, (int(dx), int(dy)))
    return canvas


def _norm_stats(arch: str) -> tuple[np.ndarray, np.ndarray]:
    """Normalization must match what inference uses for the arch
    (image_classifier.LayoutClassifier): 0.5s for ViT-style processors,
    ImageNet statistics for SegFormer/ConvNeXt/ResNet processors."""
    from karanta_tpu.inference.image_classifier import (
        HALF_MEAN, HALF_STD, IMAGENET_MEAN, IMAGENET_STD,
    )

    if arch.startswith(("segformer", "convnextv2", "resnet")):
        return IMAGENET_MEAN, IMAGENET_STD
    return HALF_MEAN, HALF_STD


def _load_batch(paths: list[str], size: int, rng=None,
                arch: str = "vit") -> np.ndarray:
    from PIL import Image

    mean, std = _norm_stats(arch)
    out = np.zeros((len(paths), size, size, 3), np.float32)
    for i, path in enumerate(paths):
        pil = Image.open(path).convert("RGB")
        if rng is not None:
            pil = _augment(pil, rng)
        pil = pil.resize((size, size), Image.Resampling.BILINEAR)
        out[i] = (np.asarray(pil, np.float32) / 255.0 - mean) / std
    return out


def main(argv: Optional[list[str]] = None) -> dict:
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from karanta_tpu.config import ConfigParser
    from karanta_tpu.models.classifier.vit import ViTConfig, init_vit_params, vit_forward
    from karanta_tpu.training import checkpoint as ckpt
    from karanta_tpu.training.optimizer import make_lr_schedule

    logging.basicConfig(level=logging.INFO)
    args = ConfigParser(ClassifierArguments).parse(argv)

    if args.dataset_mix:
        paths, ids, labels = prepare_mixed_datasets(args.dataset_mix)
    else:
        paths, ids, labels = load_imagefolder(args.dataset_dir)
    if not paths:
        raise RuntimeError("no training images found")
    logger.info("%d images, labels=%s", len(paths), labels)

    if args.arch == "vit":
        cfg = ViTConfig(image_size=args.image_size, patch_size=args.patch_size,
                        hidden_size=args.hidden_size,
                        num_layers=args.num_layers, num_heads=args.num_heads,
                        intermediate_size=args.intermediate_size,
                        num_classes=len(labels), labels=tuple(labels))
        init_params_fn, forward_fn = init_vit_params, vit_forward
    elif args.arch in ("segformer", "segformer-tiny"):
        from karanta_tpu.models.classifier.segformer import (
            SegFormerConfig, init_segformer_params, segformer_forward,
            tiny_segformer,
        )

        base = (tiny_segformer(len(labels)) if args.arch == "segformer-tiny"
                else SegFormerConfig(num_classes=len(labels)))
        cfg = dataclasses.replace(base, image_size=args.image_size,
                                  labels=tuple(labels))
        init_params_fn, forward_fn = init_segformer_params, segformer_forward
    elif args.arch in ("convnextv2", "convnextv2-tiny"):
        from karanta_tpu.models.classifier.convnets import (
            ConvNeXtV2Config, convnextv2_forward, init_convnextv2_params,
            tiny_convnextv2,
        )

        base = (tiny_convnextv2(len(labels)) if args.arch.endswith("-tiny")
                else ConvNeXtV2Config(num_classes=len(labels)))
        cfg = dataclasses.replace(base, image_size=args.image_size,
                                  labels=tuple(labels))
        init_params_fn, forward_fn = init_convnextv2_params, convnextv2_forward
    elif args.arch in ("resnet", "resnet-tiny"):
        from karanta_tpu.models.classifier.convnets import (
            ResNetConfig, init_resnet_params, resnet_forward, tiny_resnet,
        )

        base = (tiny_resnet(len(labels)) if args.arch.endswith("-tiny")
                else ResNetConfig(num_classes=len(labels)))
        cfg = dataclasses.replace(base, image_size=args.image_size,
                                  labels=tuple(labels))
        init_params_fn, forward_fn = init_resnet_params, resnet_forward
    else:
        raise ValueError(f"unknown arch {args.arch!r}")

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(paths))
    n_eval = max(1, int(len(paths) * args.eval_fraction)) if len(paths) > 2 else 0
    eval_idx, train_idx = order[:n_eval], order[n_eval:]

    params = init_params_fn(cfg, jax.random.PRNGKey(args.seed))
    steps_per_epoch = max(1, len(train_idx) // args.batch_size)
    total_steps = (args.max_steps if args.max_steps > 0
                   else steps_per_epoch * args.num_epochs)
    schedule = make_lr_schedule("cosine", args.learning_rate,
                                args.warmup_steps, total_steps)
    optimizer = optax.adamw(schedule, weight_decay=args.weight_decay)
    opt_state = optimizer.init(params)

    forward = functools.partial(forward_fn, cfg=cfg)

    @jax.jit
    def train_step(params, opt_state, images, label_ids):
        def loss_fn(p):
            logits = forward(p, images=images)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, label_ids).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == label_ids).mean()
        return params, opt_state, loss, acc

    @jax.jit
    def eval_logits(params, images):
        return forward(params, images=images)

    start_step = 0
    resume = args.resume_from_checkpoint
    if resume == "auto":
        resume = ckpt.get_last_checkpoint(args.output_dir)
    if resume:
        (params, opt_state), meta = ckpt.restore_checkpoint(
            resume, (params, opt_state))
        start_step = int(meta.get("step", 0))

    metrics: dict = {}
    for step in range(start_step, total_steps):
        sel = [int(train_idx[(step * args.batch_size + k) % len(train_idx)])
               for k in range(args.batch_size)]
        images = _load_batch([paths[i] for i in sel], args.image_size,
                             rng if args.augment else None, arch=args.arch)
        label_ids = jnp.asarray([ids[i] for i in sel])
        params, opt_state, loss, acc = train_step(
            params, opt_state, jnp.asarray(images), label_ids)
        if (step + 1) % args.logging_steps == 0 or step + 1 == total_steps:
            metrics = {"step": step + 1, "loss": float(loss),
                       "accuracy": float(acc)}
            logger.info("%s", metrics)
        if args.checkpointing_steps and (step + 1) % args.checkpointing_steps == 0:
            ckpt.save_checkpoint(args.output_dir, step + 1,
                                 (params, opt_state))

    ckpt.save_checkpoint(args.output_dir, total_steps, (params, opt_state),
                         metadata={"labels": labels})

    if len(eval_idx):
        correct = total = 0
        for start in range(0, len(eval_idx), args.batch_size):
            sel = [int(i) for i in eval_idx[start:start + args.batch_size]]
            images = _load_batch([paths[i] for i in sel], args.image_size,
                                 arch=args.arch)
            logits = np.asarray(eval_logits(params, jnp.asarray(images)))
            correct += (logits.argmax(-1) == np.asarray(
                [ids[i] for i in sel])).sum()
            total += len(sel)
        metrics["eval_accuracy"] = correct / max(total, 1)
        logger.info("eval accuracy: %.4f", metrics["eval_accuracy"])
    return metrics


if __name__ == "__main__":
    main()
