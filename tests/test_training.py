"""Training stack tests: pipeline steps, collator, full train loop + resume."""

import io
import json
import os

import numpy as np
import pytest

from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.training.data import (
    DataCollator, LocalDataset, SingleDatapoint, Tokenizer, build_pipeline,
    pair_pdf_json, str2PipelineStep,
)

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)


def _make_dataset(tmp_path, n=3):
    """Scanned-pdf + ground-truth-json pairs on disk."""
    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

    pdf_dir = tmp_path / "pdfs"
    json_dir = tmp_path / "json"
    pdf_dir.mkdir()
    json_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = Image.fromarray(rng.integers(150, 255, (80, 64, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdf_dir / f"doc{i}.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))
        page = {
            "primary_language": "en", "is_rotation_valid": True,
            "rotation_correction": 0, "is_table": False, "is_diagram": False,
            "natural_text": f"ground truth text {i}",
        }
        (json_dir / f"doc{i}.json").write_text(
            json.dumps({"result": {"text": json.dumps([page])}}))
    return tmp_path


PIPELINE = [
    {"name": "PDF2ImageStep", "target_longest_image_dim": 128},
    {"name": "FetchPageData"},
    {"name": "StaticLengthDocumentAnchoring", "target_anchor_text_len": 1000},
    {"name": "FinetuningPrompt"},
    {"name": "JSONOutputFormat"},
    {"name": "InstructUserMessages"},
    {"name": "Tokenizer"},
]


class TestPipelineSteps:
    def test_registry_complete(self):
        assert set(str2PipelineStep) == {
            "PDF2ImageStep", "JSONOutputFormat", "PlainTextFormat",
            "FetchPageData", "FetchMultipageData",
            "StaticLengthDocumentAnchoring", "FinetuningPrompt",
            "InstructUserMessages", "Tokenizer"}

    def test_dataset_build(self, tmp_path):
        root = _make_dataset(tmp_path)
        ds = LocalDataset(str(root), pipeline_steps=PIPELINE,
                          tokenizer=TOK, vision_cfg=CFG.vision, max_length=2048)
        assert len(ds.pairs) == 3
        samples = ds.build()
        assert len(samples) == 3
        s = samples[0]
        assert s["input_ids"].dtype == np.int32
        # response tokens unmasked, prompt masked
        assert (s["labels"] == -100).sum() > 0
        assert (s["labels"] != -100).sum() > 5
        assert s["labels"][-1] == TOK.eos_token_id
        assert s["plan"] is not None
        # image pads expanded to merged token count
        n_img = (s["input_ids"] == TOK.image_pad_id).sum()
        assert n_img == s["plan"].num_merged_tokens

    def test_dataset_cache_roundtrip(self, tmp_path):
        root = _make_dataset(tmp_path)
        cache = str(tmp_path / "cache")
        ds1 = LocalDataset(str(root), pipeline_steps=PIPELINE, cache_dir=cache,
                           tokenizer=TOK, vision_cfg=CFG.vision)
        s1 = ds1.build()
        ds2 = LocalDataset(str(root), pipeline_steps=PIPELINE, cache_dir=cache,
                           tokenizer=TOK, vision_cfg=CFG.vision)
        s2 = ds2.build()
        np.testing.assert_array_equal(s1[0]["input_ids"], s2[0]["input_ids"])
        assert s2[0]["plan"] == s1[0]["plan"]

    def test_multipage_fetch(self, tmp_path):
        (tmp_path / "m.json").write_text(json.dumps(
            {"generation": {"pages": [{"natural_text": "a"},
                                      {"natural_text": "b"}]}}))
        sample = SingleDatapoint(json_path=str(tmp_path / "m.json"))
        step = str2PipelineStep["FetchMultipageData"]()
        assert len(step(sample).page_data) == 2


class TestCollator:
    def test_batch_shapes(self, tmp_path):
        root = _make_dataset(tmp_path)
        samples = LocalDataset(str(root), pipeline_steps=PIPELINE,
                               tokenizer=TOK, vision_cfg=CFG.vision).build()
        collator = DataCollator(CFG.vision)
        batch = collator(samples)
        bsz, seq = batch["token_ids"].shape
        assert bsz == 3 and seq in (512, 1024, 2048)
        assert batch["positions"].shape == (3, bsz, seq)
        assert batch["pixel_values"].shape[0] == bsz
        assert batch["image_positions"].shape[0] == bsz
        assert batch["n_windows"] >= 1
        # padded image slots point beyond seq (dropped at scatter)
        n_img = samples[0]["plan"].num_merged_tokens
        assert (batch["image_positions"][0, n_img:] == seq).all()

    def test_seq_bucket_ladder_granularity(self):
        """The ladder is 512-step to 4096 (1024-step above): a run pins ONE
        bucket, so rung spacing IS the padding waste — a 2540-token vision
        sample must land in 2560, not a power-of-two 4096 (a measured 1.9x
        step-time cost; BENCH_NOTES round-2 close)."""
        from karanta_tpu.training.data import SEQ_BUCKETS

        samples = [{"input_ids": np.zeros(2540, np.int32), "plan": None}]
        _, seq = DataCollator.fit_buckets(samples)
        assert seq == 2560
        # 128-step rungs below 512 serve tiny-model / small-sample training
        # (closed-loop demo); 512-step to 4096 and 1024-step above for
        # production vision batches. Every rung is kernel-legal (flash pads
        # S to its tile sizes internally).
        assert all(b % 128 == 0 for b in SEQ_BUCKETS)
        big = [b for b in SEQ_BUCKETS if b >= 512]
        gaps = [b - a for a, b in zip(big, big[1:])]
        assert max(gaps[:7]) <= 512 and max(gaps) <= 1024


class TestTrainLoop:
    def test_train_and_resume(self, tmp_path):
        from karanta_tpu.training.train import main

        root = _make_dataset(tmp_path)
        out = tmp_path / "run"
        argv = [
            "--dataset_root", str(root),
            "--output_dir", str(out),
            "--model_name_or_path", "tiny",
            "--mesh_data", "1",
            "--max_steps", "3",
            "--gradient_accumulation_steps", "1",
            "--per_device_train_batch_size", "2",
            "--logging_steps", "1",
            "--checkpointing_steps", "2",
            "--eval_steps", "0",
            "--learning_rate", "0.001",
            "--dtype", "float32",
        ]
        metrics = main(argv)
        assert np.isfinite(metrics["loss"])
        assert os.path.exists(out / "step_3" / "COMPLETED")

        # resume continues from the saved step
        argv2 = list(argv)
        argv2[argv2.index("--max_steps") + 1] = "4"
        metrics2 = main(argv2 + ["--resume_from_checkpoint", "auto"])
        assert metrics2["step"] == 4

    def test_targetless_restore_ignores_saved_shardings(self, tmp_path):
        """restore_params must rebuild its target from the checkpoint's own
        shape/dtype metadata and place arrays on THIS process's default
        device. orbax's bare target-less restore replays the sharding
        metadata written at save time, whose device names belong to the
        saving host — a CPU-trained checkpoint served on a TPU host died
        with "Device TFRT_CPU_0 was not found in jax.local_devices()"."""
        import jax
        import jax.numpy as jnp
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from karanta_tpu.parallel import MeshConfig, create_mesh
        from karanta_tpu.training.checkpoint import (restore_params,
                                                     save_checkpoint)
        from karanta_tpu.training.train_step import create_train_state

        mesh = create_mesh(MeshConfig(data=len(jax.devices())))
        sharding = NamedSharding(mesh, P("data"))
        params = {"w": jax.device_put(
            jnp.arange(16, dtype=jnp.float32).reshape(8, 2), sharding)}
        state = create_train_state(params, optax.adamw(1e-4))
        save_checkpoint(str(tmp_path), 5, state)

        restored, meta = restore_params(str(tmp_path / "step_5"))
        assert meta["step"] == 5
        leaf = jax.tree.leaves(restored)[0]
        # saved 8-way sharded; restored on the single default device
        assert leaf.sharding == jax.sharding.SingleDeviceSharding(
            jax.devices()[0])
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(params["w"]))

    def test_gradient_checkpointing_matches(self, tmp_path):
        """remat (per-layer decoder body + per-block vision encode) changes
        memory, not numerics: same data + seed, same final loss."""
        from karanta_tpu.training.train import main

        root = _make_dataset(tmp_path)
        losses = {}
        for remat in ("false", "true"):
            out = tmp_path / f"run_remat_{remat}"
            metrics = main([
                "--dataset_root", str(root),
                "--output_dir", str(out),
                "--model_name_or_path", "tiny",
                "--mesh_data", "1",
                "--max_steps", "2",
                "--gradient_accumulation_steps", "1",
                "--per_device_train_batch_size", "2",
                "--logging_steps", "1",
                "--checkpointing_steps", "0",
                "--eval_steps", "0",
                "--learning_rate", "0.001",
                "--dtype", "float32",
                "--gradient_checkpointing", remat,
            ])
            losses[remat] = metrics["loss"]
        np.testing.assert_allclose(losses["true"], losses["false"],
                                   rtol=1e-5)


class TestEpochSampler:
    def test_reshuffles_per_epoch_and_resume_stable(self):
        from karanta_tpu.training.train import EpochSampler

        n = 13
        s = EpochSampler(seed=7, n=n)
        epoch0 = [s.index(p) for p in range(n)]
        epoch1 = [s.index(p) for p in range(n, 2 * n)]
        # each epoch is a permutation, and epochs differ
        assert sorted(epoch0) == list(range(n))
        assert sorted(epoch1) == list(range(n))
        assert epoch0 != epoch1
        # resume-stable: a fresh sampler reproduces any position exactly,
        # including out-of-order access across epoch boundaries
        fresh = EpochSampler(seed=7, n=n)
        for pos in (17, 3, 22, 0, n - 1, n):
            assert fresh.index(pos) == (epoch0 + epoch1)[pos]
        # different seed -> different order
        assert [EpochSampler(seed=8, n=n).index(p) for p in range(n)] != epoch0


class TestChunkedCrossEntropy:
    def test_matches_materialized_logits(self):
        """The chunked-CE loss (scan over sequence chunks, logits never
        fully materialized) reproduces the logits[:, :-1] vs labels[:, 1:]
        loss and gradients up to fp32 reduction-order noise."""
        import jax
        import jax.numpy as jnp
        import optax

        from karanta_tpu.models.qwen25_vl.model import forward_train, init_params
        from karanta_tpu.training.train_step import (
            chunked_cross_entropy, cross_entropy_loss, make_loss_fn,
        )

        params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, CFG.text.vocab_size, (2, 16)),
                          jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 2, 16))
        labels = jnp.where(jnp.arange(16)[None, :] < 4, -100, ids)
        batch = {"token_ids": ids, "positions": pos, "labels": labels}

        logits = forward_train(params, CFG, ids, pos)
        ref_loss, ref_n = cross_entropy_loss(logits[:, :-1], labels[:, 1:])
        new_loss, new_n = jax.jit(make_loss_fn(CFG))(params, batch)
        np.testing.assert_allclose(float(new_loss), float(ref_loss),
                                   rtol=1e-5)
        assert int(new_n) == int(ref_n)

        # multi-chunk path (chunk < S, with padding to a chunk multiple)
        hidden = forward_train(params, CFG, ids, pos, return_hidden=True)
        shifted = jnp.concatenate(
            [labels[:, 1:], jnp.full((2, 1), -100, labels.dtype)], axis=1)
        for chunk in (4, 5):
            l_c, n_c = jax.jit(
                lambda h, s, c=chunk: chunked_cross_entropy(
                    params["text"], CFG.text, h, s, chunk=c))(hidden, shifted)
            np.testing.assert_allclose(float(l_c), float(ref_loss), rtol=1e-5)
            assert int(n_c) == int(ref_n)

        # gradient parity vs the materialized-logits loss
        def manual_loss(p):
            lg = forward_train(p, CFG, ids, pos)
            return cross_entropy_loss(lg[:, :-1], labels[:, 1:])

        (_, _), g_ref = jax.value_and_grad(manual_loss, has_aux=True)(params)
        (_, _), g_new = jax.value_and_grad(
            make_loss_fn(CFG), has_aux=True)(params, batch)
        np.testing.assert_allclose(float(optax.global_norm(g_new)),
                                   float(optax.global_norm(g_ref)),
                                   rtol=1e-3)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=1e-4),
            g_new, g_ref)


class TestGradAccumBf16:
    def test_accum_with_bf16_params(self):
        """bf16 params + grad_accum>1: f32-accumulated grads must return to
        the param dtype before the optimizer (mismatched moment dtypes made
        apply_if_finite's cond branches disagree)."""
        import jax
        import jax.numpy as jnp
        import optax

        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.layout import mrope_positions
        from karanta_tpu.models.qwen25_vl.model import init_params
        from karanta_tpu.training.optimizer import make_optimizer
        from karanta_tpu.training.train_step import (
            create_train_state, make_train_step,
        )

        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        opt = make_optimizer("adamw", 1e-3)
        state = create_train_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt, grad_accum=2))
        rng = np.random.default_rng(1)
        ids = rng.integers(3, 400, size=(4, 8))   # 2 microbatches of 2
        pos = np.stack([mrope_positions(r, [], cfg.image_token_id)
                        for r in ids], axis=1)
        batch = {"token_ids": jnp.asarray(ids),
                 "positions": jnp.asarray(pos),
                 "labels": jnp.asarray(ids)}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        del optax

    def test_muon_full_param_step_on_model_tree(self):
        """make_optimizer('muon') must run a full-parameter train step on
        the REAL model param tree — which contains empty-tuple pytree nodes
        that a tuple-leaf repack in scale_by_muon misread as leaves — and
        the loss must decrease on a repeated batch (the optimizer
        optimizes, not just runs)."""
        import jax
        import jax.numpy as jnp

        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.layout import mrope_positions
        from karanta_tpu.models.qwen25_vl.model import init_params
        from karanta_tpu.training.optimizer import make_optimizer
        from karanta_tpu.training.train_step import (
            create_train_state, make_train_step,
        )

        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        opt = make_optimizer("muon", 1e-3)
        state = create_train_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt))
        rng = np.random.default_rng(2)
        ids = rng.integers(3, 400, size=(2, 16))
        pos = np.stack([mrope_positions(r, [], cfg.image_token_id)
                        for r in ids], axis=1)
        batch = {"token_ids": jnp.asarray(ids),
                 "positions": jnp.asarray(pos),
                 "labels": jnp.asarray(ids)}
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
