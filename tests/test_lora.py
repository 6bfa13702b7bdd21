"""LoRA tests: zero-init identity, merge math, gradient flow, train CLI."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.training.lora import (
    init_lora_params, merge_lora, trainable_lora, with_factors, wrap_lora,
)

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)


class TestLoraMath:
    def test_zero_init_is_identity(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1))
        merged = merge_lora(params, lora)
        np.testing.assert_array_equal(
            np.asarray(merged["text"]["layers"]["attn"]["wq"]),
            np.asarray(params["text"]["layers"]["attn"]["wq"]))

    def test_merge_applies_delta(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1),
                                alpha=8.0)
        factors = trainable_lora(lora)
        factors["attn"]["wq"]["b"] = jnp.ones_like(factors["attn"]["wq"]["b"])
        merged = merge_lora(params, with_factors(lora, factors))
        base = np.asarray(params["text"]["layers"]["attn"]["wq"])
        new = np.asarray(merged["text"]["layers"]["attn"]["wq"])
        expected_delta = np.einsum(
            "lir,lro->lio", np.asarray(factors["attn"]["wq"]["a"]),
            np.ones_like(np.asarray(factors["attn"]["wq"]["b"]))) * (8.0 / 4)
        np.testing.assert_allclose(new - base, expected_delta, atol=1e-5)
        # untouched matrices stay identical
        np.testing.assert_array_equal(
            np.asarray(merged["text"]["layers"]["mlp"]["gate"]),
            np.asarray(params["text"]["layers"]["mlp"]["gate"]))


class TestInlineLora:
    """wrap_lora (non-materializing forward) must match merge_lora."""

    def _setup(self, nf4=False):
        # nf4 compares in bf16: merge_lora dequantizes the base to bf16, so
        # the inline path must see bf16 activations to follow the same path
        dtype = jnp.bfloat16 if nf4 else jnp.float32
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=dtype)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1),
                                alpha=8.0)
        factors = trainable_lora(lora)
        # non-trivial factors on every target
        factors = jax.tree.map(
            lambda f: f + 0.02 * jax.random.normal(
                jax.random.PRNGKey(3), f.shape, f.dtype), factors)
        lora = with_factors(lora, factors)
        if nf4:
            from karanta_tpu.training.lora import quantize_base_nf4
            params = quantize_base_nf4(params)
        return params, lora

    def _batch(self):
        rng = np.random.default_rng(0)
        token_ids = jnp.asarray(rng.integers(0, CFG.text.vocab_size, (2, 16)))
        positions = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 2, 16))
        return token_ids, positions

    def test_forward_matches_merged(self):
        from karanta_tpu.models.qwen25_vl.model import forward_train

        params, lora = self._setup()
        token_ids, positions = self._batch()
        merged_logits = forward_train(merge_lora(params, lora), CFG,
                                      token_ids, positions)
        inline_logits = forward_train(wrap_lora(params, lora), CFG,
                                      token_ids, positions)
        np.testing.assert_allclose(np.asarray(merged_logits),
                                   np.asarray(inline_logits),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_matches_merged_nf4(self):
        from karanta_tpu.models.qwen25_vl.model import forward_train

        params, lora = self._setup(nf4=True)
        token_ids, positions = self._batch()
        merged_logits = forward_train(merge_lora(params, lora), CFG,
                                      token_ids, positions)
        inline_logits = forward_train(wrap_lora(params, lora), CFG,
                                      token_ids, positions)
        np.testing.assert_allclose(np.asarray(merged_logits, np.float32),
                                   np.asarray(inline_logits, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_grads_match_merged_step(self):
        """Inline and merge-based train steps produce the same factor grads
        (same loss surface), so swapping the default changes no numerics."""
        import optax

        from karanta_tpu.training.lora import make_lora_train_step
        from karanta_tpu.training.train_step import create_train_state

        params, lora = self._setup()
        token_ids, positions = self._batch()
        labels = jnp.where(jnp.arange(16)[None, :] < 4, -100,
                           token_ids)
        batch = {"token_ids": token_ids, "positions": positions,
                 "labels": labels}
        opt = optax.sgd(0.1)
        factors = trainable_lora(lora)

        outs = {}
        for name, materialize in (("inline", False), ("merged", True)):
            step = make_lora_train_step(CFG, opt, materialize=materialize)
            state = create_train_state(jax.tree.map(jnp.copy, factors), opt)
            new_state, metrics = jax.jit(step)(state, params, lora, batch)
            outs[name] = (new_state, metrics)
        np.testing.assert_allclose(
            float(outs["inline"][1]["loss"]), float(outs["merged"][1]["loss"]),
            rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
            outs["inline"][0].params, outs["merged"][0].params)


class TestLoraGradAccum:
    def test_accum_matches_full_batch_loss(self):
        """grad_accum=2 over a 4-row batch and grad_accum=1 over the same
        rows produce the same mean loss and (for SGD) the same update —
        mirrors make_train_step's microbatch semantics (every row carries
        the same token count, so mean-of-means == global mean)."""
        import optax

        from karanta_tpu.training.lora import make_lora_train_step
        from karanta_tpu.training.train_step import create_train_state

        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1))
        rng = np.random.default_rng(2)
        token_ids = jnp.asarray(rng.integers(0, CFG.text.vocab_size, (4, 16)),
                                jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 4, 16))
        batch = {"token_ids": token_ids, "positions": positions,
                 "labels": token_ids}
        opt = optax.sgd(0.1)
        factors = trainable_lora(lora)

        outs = {}
        for accum in (1, 2):
            step = jax.jit(make_lora_train_step(CFG, opt, grad_accum=accum))
            state = create_train_state(jax.tree.map(jnp.copy, factors), opt)
            new_state, metrics = step(state, params, lora, batch)
            outs[accum] = (new_state, metrics)
        np.testing.assert_allclose(float(outs[1][1]["loss"]),
                                   float(outs[2][1]["loss"]), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            outs[1][0].params, outs[2][0].params)

    def test_remat_matches_no_remat(self):
        """Body-level remat changes memory, not numerics."""
        import optax

        from karanta_tpu.training.lora import make_lora_train_step
        from karanta_tpu.training.train_step import create_train_state

        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1))
        rng = np.random.default_rng(3)
        token_ids = jnp.asarray(rng.integers(0, CFG.text.vocab_size, (2, 16)),
                                jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 2, 16))
        batch = {"token_ids": token_ids, "positions": positions,
                 "labels": token_ids}
        opt = optax.sgd(0.1)
        factors = trainable_lora(lora)

        outs = {}
        for remat in (False, True):
            step = jax.jit(make_lora_train_step(CFG, opt, remat=remat))
            state = create_train_state(jax.tree.map(jnp.copy, factors), opt)
            _, metrics = step(state, params, lora, batch)
            outs[remat] = (float(metrics["loss"]),
                           float(metrics["grad_norm"]))
        np.testing.assert_allclose(outs[False], outs[True], rtol=1e-5)


class TestLoraTraining:
    def test_train_cli_with_lora(self, tmp_path):
        from PIL import Image

        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes
        from karanta_tpu.training.train import main

        pdf_dir = tmp_path / "pdfs"
        json_dir = tmp_path / "json"
        pdf_dir.mkdir()
        json_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(2):
            img = Image.fromarray(rng.integers(150, 255, (80, 64, 3),
                                               dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            (pdf_dir / f"d{i}.pdf").write_bytes(
                convert_image_to_pdf_bytes(buf.getvalue()))
            page = {"primary_language": "en", "is_rotation_valid": True,
                    "rotation_correction": 0, "is_table": False,
                    "is_diagram": False, "natural_text": f"text {i}"}
            (json_dir / f"d{i}.json").write_text(
                json.dumps({"result": {"text": json.dumps([page])}}))

        metrics = main([
            "--dataset_root", str(tmp_path),
            "--output_dir", str(tmp_path / "run"),
            "--model_name_or_path", "tiny", "--mesh_data", "1",
            "--max_steps", "2", "--gradient_accumulation_steps", "1",
            "--per_device_train_batch_size", "2", "--logging_steps", "1",
            "--checkpointing_steps", "0", "--eval_steps", "0",
            "--learning_rate", "0.01", "--dtype", "float32",
            "--use_lora", "true", "--lora_rank", "4",
        ])
        assert np.isfinite(metrics["loss"])
        assert metrics["step"] == 2
