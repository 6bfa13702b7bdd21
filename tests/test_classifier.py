"""Classifier tests: predict_layout input types (mirrors the reference's only
unit test, tests/test_classifier_unit.py), HF-ViT numerics parity, trainer."""

import numpy as np
import pytest

from karanta_tpu.inference.image_classifier import LayoutClassifier, load_image
from karanta_tpu.models.classifier.vit import (
    ViTConfig, convert_hf_vit, init_vit_params, tiny_vit, vit_forward,
)


@pytest.fixture(scope="module")
def classifier():
    clf = LayoutClassifier.random()
    return clf


def _sample_image(h=64, w=48):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


class TestPredictLayout:
    """Reference tests/test_classifier_unit.py:11-31: parametrized over input
    types; label in the label set, score in [0, 1]."""

    def _check(self, clf, image):
        out = clf.predict(image)
        assert out["label"] in clf.cfg.labels
        assert 0.0 <= out["score"] <= 1.0

    def test_path_input(self, classifier, tmp_path):
        from PIL import Image

        p = tmp_path / "s.jpg"
        Image.fromarray(_sample_image()).save(p)
        self._check(classifier, str(p))

    def test_pil_input(self, classifier):
        from PIL import Image

        self._check(classifier, Image.fromarray(_sample_image()))

    def test_ndarray_input(self, classifier):
        self._check(classifier, _sample_image())

    def test_tensor_input(self, classifier):
        torch = pytest.importorskip("torch")
        chw = torch.tensor(_sample_image()).permute(2, 0, 1)
        self._check(classifier, chw)

    def test_batch(self, classifier):
        outs = classifier.predict_batch([_sample_image(), _sample_image(32, 32)])
        assert len(outs) == 2

    def test_load_image_grayscale_array(self):
        img = load_image(np.zeros((10, 10), np.uint8))
        assert img.mode == "RGB"


class TestViTParity:
    def test_matches_hf_vit(self):
        torch = pytest.importorskip("torch")
        from transformers import ViTConfig as HFViTConfig
        from transformers import ViTForImageClassification

        cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=32,
                        num_layers=2, num_heads=2, intermediate_size=64,
                        num_classes=3, labels=("a", "b", "c"))
        torch.manual_seed(0)
        hf = ViTForImageClassification(HFViTConfig(
            image_size=32, patch_size=8, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
            num_labels=3)).eval()
        params = convert_hf_vit(hf.state_dict(), cfg)

        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            hf_logits = hf(torch.tensor(
                images.transpose(0, 3, 1, 2))).logits.numpy()
        import jax.numpy as jnp

        ours = np.asarray(vit_forward(params, cfg, jnp.asarray(images)))
        np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=1e-3)


class TestSegFormerParity:
    def _hf_tiny(self, num_labels=3):
        torch = pytest.importorskip("torch")
        from transformers import SegformerConfig as HFSegConfig
        from transformers import SegformerForImageClassification

        torch.manual_seed(0)
        return SegformerForImageClassification(HFSegConfig(
            num_encoder_blocks=2, hidden_sizes=[8, 16], depths=[1, 1],
            num_attention_heads=[1, 2], sr_ratios=[4, 1], patch_sizes=[7, 3],
            strides=[4, 2], mlp_ratios=[2, 2], num_labels=num_labels,
            id2label={0: "a", 1: "b", 2: "c"},
            label2id={"a": 0, "b": 1, "c": 2})).eval()

    def test_matches_hf_segformer(self):
        torch = pytest.importorskip("torch")
        from karanta_tpu.models.classifier.segformer import (
            convert_hf_segformer, segformer_forward, tiny_segformer,
        )

        cfg = tiny_segformer(num_classes=3)
        hf = self._hf_tiny()
        params = convert_hf_segformer(hf.state_dict(), cfg)

        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            hf_logits = hf(torch.tensor(
                images.transpose(0, 3, 1, 2))).logits.numpy()
        import jax.numpy as jnp

        ours = np.asarray(segformer_forward(params, cfg, jnp.asarray(images)))
        np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=1e-3)

    def test_from_checkpoint_dispatches_segformer(self, tmp_path):
        """The reference's production checkpoint layout
        (taresco/newspaper_classifier_segformer) loads through
        LayoutClassifier.from_checkpoint via config.json model_type."""
        pytest.importorskip("torch")
        hf = self._hf_tiny()
        hf.save_pretrained(tmp_path / "ckpt", safe_serialization=True)

        clf = LayoutClassifier.from_checkpoint(str(tmp_path / "ckpt"))
        assert clf.arch == "segformer"
        assert clf.cfg.labels == ("a", "b", "c")
        out = clf.predict(_sample_image())
        assert out["label"] in clf.cfg.labels
        assert 0.0 <= out["score"] <= 1.0

    def test_predict_layout_segformer_random(self):
        clf = LayoutClassifier.random(arch="segformer")
        out = clf.predict(_sample_image())
        assert out["label"] in ("no_segment", "segment")


class TestConvNetParity:
    def test_matches_hf_convnextv2(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import ConvNextV2Config as HFCNConfig
        from transformers import ConvNextV2ForImageClassification

        from karanta_tpu.models.classifier.convnets import (
            convert_hf_convnextv2, convnextv2_forward, tiny_convnextv2,
        )

        torch.manual_seed(0)
        hf = ConvNextV2ForImageClassification(HFCNConfig(
            num_stages=2, hidden_sizes=[8, 16], depths=[1, 1], num_labels=3,
            id2label={0: "a", 1: "b", 2: "c"},
            label2id={"a": 0, "b": 1, "c": 2})).eval()
        cfg = tiny_convnextv2(3)
        params = convert_hf_convnextv2(hf.state_dict(), cfg)
        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(images.transpose(0, 3, 1, 2))).logits.numpy()
        import jax.numpy as jnp

        ours = np.asarray(convnextv2_forward(params, cfg, jnp.asarray(images)))
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

        # checkpoint round trip dispatches on model_type
        hf.save_pretrained(tmp_path / "ckpt", safe_serialization=True)
        clf = LayoutClassifier.from_checkpoint(str(tmp_path / "ckpt"))
        assert clf.arch == "convnextv2"
        out = clf.predict(_sample_image())
        assert out["label"] in ("a", "b", "c")

    def test_matches_hf_resnet(self, tmp_path):
        torch = pytest.importorskip("torch")
        from transformers import ResNetConfig as HFRNConfig
        from transformers import ResNetForImageClassification

        from karanta_tpu.models.classifier.convnets import (
            convert_hf_resnet, resnet_forward, tiny_resnet,
        )

        torch.manual_seed(0)
        hf = ResNetForImageClassification(HFRNConfig(
            embedding_size=8, hidden_sizes=[8, 16], depths=[1, 1],
            layer_type="bottleneck", num_labels=3,
            id2label={0: "a", 1: "b", 2: "c"},
            label2id={"a": 0, "b": 1, "c": 2})).eval()
        cfg = tiny_resnet(3)
        params = convert_hf_resnet(hf.state_dict(), cfg)
        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(images.transpose(0, 3, 1, 2))).logits.numpy()
        import jax.numpy as jnp

        ours = np.asarray(resnet_forward(params, cfg, jnp.asarray(images)))
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

        hf.save_pretrained(tmp_path / "ckpt", safe_serialization=True)
        clf = LayoutClassifier.from_checkpoint(str(tmp_path / "ckpt"))
        assert clf.arch == "resnet"
        out = clf.predict(_sample_image())
        assert out["label"] in ("a", "b", "c")

    def test_trainer_runs_both_archs(self, tmp_path):
        from PIL import Image

        from karanta_tpu.training.classifier_train import main

        rng = np.random.default_rng(5)
        for label, base in (("no_segment", 30), ("segment", 220)):
            d = tmp_path / "data" / label
            d.mkdir(parents=True)
            for i in range(4):
                arr = np.full((64, 64, 3), base, np.uint8)
                arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

        for arch in ("convnextv2-tiny", "resnet-tiny"):
            metrics = main([
                "--dataset_dir", str(tmp_path / "data"),
                "--output_dir", str(tmp_path / f"run_{arch}"),
                "--arch", arch, "--image_size", "64",
                "--batch_size", "4", "--max_steps", "8",
                "--learning_rate", "0.002", "--checkpointing_steps", "0",
                "--logging_steps", "4", "--augment", "false",
            ])
            assert np.isfinite(metrics["loss"]), arch


class TestClassifierTrainer:
    def test_trains_on_imagefolder(self, tmp_path):
        from PIL import Image

        from karanta_tpu.training.classifier_train import main

        rng = np.random.default_rng(2)
        for label, base in (("no_segment", 30), ("segment", 220)):
            d = tmp_path / "data" / label
            d.mkdir(parents=True)
            for i in range(6):
                arr = np.full((32, 32, 3), base, np.uint8)
                arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

        metrics = main([
            "--dataset_dir", str(tmp_path / "data"),
            "--output_dir", str(tmp_path / "run"),
            "--image_size", "32", "--patch_size", "8",
            "--hidden_size", "32", "--num_layers", "2", "--num_heads", "2",
            "--intermediate_size", "64",
            "--batch_size", "4", "--max_steps", "12",
            "--learning_rate", "0.002", "--checkpointing_steps", "0",
            "--logging_steps", "4", "--augment", "false",
        ])
        assert np.isfinite(metrics["loss"])
        # trivially separable colors: should fit quickly
        assert metrics["accuracy"] >= 0.75

    def test_trains_segformer_arch(self, tmp_path):
        from PIL import Image

        from karanta_tpu.training.classifier_train import main

        rng = np.random.default_rng(3)
        for label, base in (("no_segment", 30), ("segment", 220)):
            d = tmp_path / "data" / label
            d.mkdir(parents=True)
            for i in range(4):
                arr = np.full((64, 64, 3), base, np.uint8)
                arr += rng.integers(0, 20, arr.shape, dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

        metrics = main([
            "--dataset_dir", str(tmp_path / "data"),
            "--output_dir", str(tmp_path / "run"),
            "--arch", "segformer-tiny", "--image_size", "64",
            "--batch_size", "4", "--max_steps", "10",
            "--learning_rate", "0.002", "--checkpointing_steps", "0",
            "--logging_steps", "5", "--augment", "false",
        ])
        assert np.isfinite(metrics["loss"])
        assert metrics["accuracy"] >= 0.75
