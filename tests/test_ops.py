"""Ops tests: flash attention vs reference, image patchify vs HF processor,
Newton-Schulz orthogonality, rotary tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.ops.attention import flash_attention, mha_reference
from karanta_tpu.ops.image_prep import (
    ImagePlan, patchify, plan_image, preprocess_host, smart_resize,
)
from karanta_tpu.ops.newton_schulz import muon_update, orthogonalize
from karanta_tpu.ops.norms import rms_norm
from karanta_tpu.ops.rotary import (
    apply_rope, mrope_cos_sin, rope_cos_sin, vision_rope_cos_sin,
)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("sq,sk,h,kvh", [(128, 128, 4, 4), (200, 333, 4, 2), (1, 256, 8, 1)])
    def test_matches_reference(self, causal, sq, sk, h, kvh):
        if causal and sq != sk:
            pytest.skip("causal requires aligned positions in this test")
        rng = np.random.default_rng(0)
        d = 64
        q = jnp.asarray(rng.normal(size=(2, sq, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, sk, kvh, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, sk, kvh, d)), jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, size=(2, sk)), jnp.float32)
        mask = mask.at[:, :8].set(1.0)  # keep some kv valid
        ref = mha_reference(q, k, v, kv_mask=mask, causal=causal)
        out = flash_attention(q, k, v, kv_mask=mask, causal=causal,
                              block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
        ref = mha_reference(q, k, v, causal=True)
        out = flash_attention(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2)


class TestImagePrep:
    def test_smart_resize_matches_hf(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            smart_resize as hf_smart_resize,
        )
        for h, w in [(1288, 994), (640, 480), (2048, 1536), (100, 3000)]:
            assert smart_resize(h, w) == hf_smart_resize(h, w)

    def test_patchify_matches_hf_processor(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, size=(112, 140, 3), dtype=np.uint8)
        proc = Qwen2VLImageProcessor(do_resize=False)
        hf_out = proc(images=[img], return_tensors="np")
        hf_pixels = hf_out["pixel_values"]
        grid = tuple(int(x) for x in hf_out["image_grid_thw"][0])

        plan = ImagePlan(112, 140, 8, 10, 8, 16)
        ours = patchify(jnp.asarray(img), grid_h=plan.grid_h, grid_w=plan.grid_w,
                        pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                        out_dtype=jnp.float32)
        assert grid == (1, 8, 10)
        # Our layout pads the grid: extract valid tokens for comparison.
        ours_np = np.asarray(ours).reshape(
            plan.pad_grid_h // 2, plan.pad_grid_w // 2, 4, -1)
        valid = ours_np[: plan.grid_h // 2, : plan.grid_w // 2].reshape(
            plan.num_tokens, -1)
        np.testing.assert_allclose(valid, hf_pixels, atol=2e-3)

    def test_preprocess_host_roundtrip(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, size=(130, 260, 3), dtype=np.uint8)
        arr, plan = preprocess_host(img)
        assert arr.shape == (plan.resized_h, plan.resized_w, 3)
        assert plan.resized_h % 28 == 0 and plan.resized_w % 28 == 0
        assert plan.pad_grid_h >= plan.grid_h
        assert plan_image(130, 260).grid_thw[0] == 1

    @pytest.mark.parametrize("h,w", [(56, 84), (333, 517), (1288, 994)])
    def test_resize_patchify_matches_pil_path(self, h, w):
        """Device-side bicubic resize (resampling matmuls, PIL pass order +
        intermediate uint8 rounding) matches preprocess_host(PIL bicubic) +
        patchify to within one uint8 quantization step per pixel."""
        from karanta_tpu.ops.image_prep import resize_patchify, src_px_bucket

        rng = np.random.default_rng(h * 1000 + w)
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        arr, plan = preprocess_host(img)
        ref = np.asarray(patchify(
            jnp.asarray(arr), grid_h=plan.grid_h, grid_w=plan.grid_w,
            pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
            out_dtype=jnp.float32))
        sbh, sbw = src_px_bucket(h), src_px_bucket(w)
        src = np.zeros((sbh, sbw, 3), np.uint8)
        src[:h, :w] = img
        got = np.asarray(resize_patchify(
            jnp.asarray(src), h, w, grid_h=plan.grid_h, grid_w=plan.grid_w,
            pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
            out_dtype=jnp.float32))
        # one u8 step in CLIP-normalized units is 1/255/std ~ 0.0145
        assert np.abs(got - ref).max() <= 0.016
        if (h, w) == (56, 84):  # scale 1.0: identity to f32 rounding
            np.testing.assert_allclose(got, ref, atol=1e-6)


class TestNewtonSchulz:
    def test_orthogonalizes(self):
        rng = np.random.default_rng(4)
        g = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
        x = orthogonalize(g)
        gram = np.asarray(jnp.matmul(x, x.T, preferred_element_type=jnp.float32))
        # bf16 NS5 gives a loose orthogonalization; singular values near 1
        sv = np.linalg.svd(np.asarray(x, np.float32), compute_uv=False)
        assert np.all(sv < 1.4) and np.all(sv > 0.4), sv
        assert gram.shape == (128, 128)

    def test_muon_update_shapes(self):
        g = jnp.ones((64, 32))
        m = jnp.zeros((64, 32))
        upd, new_m = muon_update(g, m)
        assert upd.shape == g.shape and new_m.shape == m.shape
        assert np.isfinite(np.asarray(upd)).all()


class TestRotary:
    def test_rope_zero_position_identity(self):
        q = jnp.ones((1, 4, 2, 32))
        k = jnp.ones((1, 4, 2, 32))
        cos, sin = rope_cos_sin(jnp.zeros((1, 4), jnp.int32), 32)
        q2, k2 = apply_rope(q, k, cos, sin)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)

    def test_mrope_equal_streams_match_rope(self):
        pos = jnp.arange(6, dtype=jnp.int32)
        cos1, sin1 = rope_cos_sin(pos, 64, theta=1e6)
        pos3 = jnp.stack([pos, pos, pos])
        cos3, sin3 = mrope_cos_sin(pos3, 64, [8, 12, 12], theta=1e6)
        np.testing.assert_allclose(np.asarray(cos1), np.asarray(cos3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin1), np.asarray(sin3), atol=1e-6)

    def test_vision_rope_matches_hf_semantics(self):
        # HF: freqs for h and w positions each of dim head_dim//4, concatenated.
        import torch

        head_dim = 80
        quarter = head_dim // 4
        inv = 1.0 / (1e4 ** (torch.arange(0, quarter).float() / quarter))
        pos = np.array([[2, 3], [0, 5]], dtype=np.int32)
        hf_freqs = torch.cat([
            torch.tensor(pos[:, 0:1]).float() * inv[None, :],
            torch.tensor(pos[:, 1:2]).float() * inv[None, :],
        ], dim=-1)
        hf_emb = torch.cat([hf_freqs, hf_freqs], dim=-1)
        cos, sin = vision_rope_cos_sin(jnp.asarray(pos), head_dim)
        np.testing.assert_allclose(np.asarray(cos), hf_emb.cos().numpy(), atol=1e-5)

    def test_rms_norm(self):
        x = jnp.asarray(np.random.default_rng(5).normal(size=(4, 16)), jnp.float32)
        w = jnp.ones((16,))
        out = rms_norm(x, w)
        norm = np.asarray(jnp.mean(out**2, axis=-1))
        np.testing.assert_allclose(norm, 1.0, atol=1e-3)
