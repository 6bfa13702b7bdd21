"""QLoRA: nf4 quantization numerics + adapter training on an nf4 base.

Reference behavior: karanta/training/ocr_training.py:335-356 (bitsandbytes
4-bit nf4 base + LoRA adapters). Here the base is blockwise-nf4 on device and
dequantization fuses into the jitted train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.ops.quantization import (
    NF4_CODE, is_nf4, nf4_dequantize, nf4_quantize,
)


class TestNF4Numerics:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(3, 128, 96)), jnp.float32)
        q = nf4_quantize(w)
        assert q["nf4_q"].dtype == jnp.uint8
        assert q["nf4_q"].shape == (3, 64, 96)
        assert q["absmax"].shape == (3, 2, 96)
        back = nf4_dequantize(q, jnp.float32)
        assert back.shape == w.shape
        # nf4's widest cell spans [-1.0, -0.6962] => worst error 0.152*absmax
        err = np.abs(np.asarray(back - w))
        amax = np.abs(np.asarray(w)).reshape(3, 2, 64, 96).max(axis=2)
        bound = 0.152 * np.repeat(amax, 64, axis=1).reshape(3, 128, 96)
        assert (err <= bound + 1e-6).all()

    def test_code_values_exact(self):
        """Inputs sitting exactly on code points reproduce exactly
        (scaled by the block absmax of 1.0 injected via a +/-1 element)."""
        codes = np.asarray(NF4_CODE)
        col = np.concatenate([codes, codes[::-1]])       # 32 values, max 1.0
        w = jnp.asarray(np.tile(col[:, None], (2, 4))[None], jnp.float32)
        back = nf4_dequantize(nf4_quantize(w), jnp.float32)
        np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-6)

    def test_is_nf4(self):
        w = jnp.zeros((1, 64, 8))
        assert is_nf4(nf4_quantize(w))
        assert not is_nf4(w)
        assert not is_nf4({"scale": 1})


class TestQLoRATraining:
    @pytest.fixture(scope="class")
    def setup(self):
        import optax

        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.model import init_params
        from karanta_tpu.training.lora import (
            init_lora_params, make_lora_train_step, merge_lora,
            quantize_base_nf4, trainable_lora, with_factors,
        )
        from karanta_tpu.training.train_step import create_train_state

        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        lora = init_lora_params(params, rank=4, key=jax.random.PRNGKey(1))
        qbase = quantize_base_nf4(params)
        opt = optax.adam(1e-3)
        state = create_train_state(trainable_lora(lora), opt)
        step = jax.jit(make_lora_train_step(cfg, opt))
        ns = dict(cfg=cfg, params=params, qbase=qbase, lora=lora, opt=opt,
                  state=state, step=step, merge_lora=merge_lora,
                  with_factors=with_factors)
        return ns

    def _batch(self, cfg):
        rng = np.random.default_rng(3)
        ids = rng.integers(3, 400, size=(2, 16))
        from karanta_tpu.models.qwen25_vl.layout import mrope_positions

        pos = np.stack([mrope_positions(r, [], cfg.image_token_id)
                        for r in ids], axis=1)
        return {
            "token_ids": jnp.asarray(ids),
            "positions": jnp.asarray(pos),
            "labels": jnp.asarray(ids),
        }

    def test_loss_decreases_and_base_frozen(self, setup):
        cfg, state = setup["cfg"], setup["state"]
        batch = self._batch(cfg)
        losses = []
        for _ in range(8):
            state, metrics = setup["step"](state, setup["qbase"],
                                           setup["lora"], batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        # the nf4 base never changed: its packed bytes are identical
        np.testing.assert_array_equal(
            np.asarray(setup["qbase"]["text"]["layers"]["attn"]["wq"]["nf4_q"]),
            np.asarray(nf4_quantize(
                setup["params"]["text"]["layers"]["attn"]["wq"])["nf4_q"]))
        setup["trained_state"] = state

    def test_merged_export_is_plain_arrays(self, setup):
        merged = setup["merge_lora"](
            setup["qbase"],
            setup["with_factors"](setup["lora"],
                                  setup["state"].params))
        leaves = jax.tree.leaves(merged)
        assert all(hasattr(x, "shape") for x in leaves)
        wq = merged["text"]["layers"]["attn"]["wq"]
        assert wq.shape == setup["params"]["text"]["layers"]["attn"]["wq"].shape
        # zero-init b factors => merged == dequantized base exactly
        from karanta_tpu.ops.quantization import nf4_dequantize

        np.testing.assert_allclose(
            np.asarray(wq, np.float32),
            np.asarray(nf4_dequantize(
                setup["qbase"]["text"]["layers"]["attn"]["wq"],
                wq.dtype), np.float32))


class TestQLoRACli:
    def test_train_cli_with_qlora(self, tmp_path):
        import io
        import json

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
            "--use_qlora", "true", "--lora_rank", "4",
        ])
        assert np.isfinite(metrics["loss"])
        assert metrics["step"] == 2
