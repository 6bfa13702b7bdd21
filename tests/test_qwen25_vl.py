"""Numerics parity: our TPU-native Qwen2.5-VL vs the HF torch implementation,
on a tiny random-init model (no network), plus prefill/decode consistency."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl import vision as vis
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.layout import build_vision_layout, mrope_positions
from karanta_tpu.models.qwen25_vl.loading import convert_state_dict
from karanta_tpu.models.qwen25_vl.model import forward_train, merge_image_embeddings
from karanta_tpu.ops.image_prep import ImagePlan, patchify

CFG = tiny_config()


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    del Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig  # HF init wants dicts
    torch.manual_seed(0)
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=CFG.text.vocab_size,
            hidden_size=CFG.text.hidden_size,
            num_hidden_layers=CFG.text.num_layers,
            num_attention_heads=CFG.text.num_heads,
            num_key_value_heads=CFG.text.num_kv_heads,
            intermediate_size=CFG.text.intermediate_size,
            rope_theta=CFG.text.rope_theta,
            rms_norm_eps=CFG.text.rms_norm_eps,
            tie_word_embeddings=True,
            rope_scaling={"type": "mrope",
                          "mrope_section": list(CFG.text.mrope_section)},
            max_position_embeddings=32768,
        ),
        vision_config=dict(
            depth=CFG.vision.depth,
            hidden_size=CFG.vision.hidden_size,
            num_heads=CFG.vision.num_heads,
            intermediate_size=CFG.vision.intermediate_size,
            out_hidden_size=CFG.vision.out_hidden_size,
            fullatt_block_indexes=list(CFG.vision.fullatt_block_indexes),
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            window_size=112,
        ),
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        attn_implementation="eager",
    )
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def our_params(hf_model):
    return convert_state_dict(hf_model.state_dict(), CFG, dtype=jnp.float32)


def _image_inputs():
    """A 56x84 image -> grid 4x6 patches -> 6 merged LLM tokens."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
    plan = ImagePlan(56, 84, 4, 6, 8, 8)  # pad to one 8x8-patch window
    return img, plan


class TestVisionParity:
    def test_encoder_matches_hf(self, hf_model, our_params):
        torch = pytest.importorskip("torch")
        img, plan = _image_inputs()

        pix = patchify(jnp.asarray(img), grid_h=plan.grid_h, grid_w=plan.grid_w,
                       pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                       out_dtype=jnp.float32)
        layout = build_vision_layout(plan, CFG.vision)

        encoded = vis.encode_image(
            our_params["visual"], CFG.vision, pix,
            jnp.asarray(layout.perm), jnp.asarray(layout.valid),
            jnp.asarray(layout.pos_hw), layout.n_windows)
        ours = np.asarray(vis.extract_image_tokens(encoded, layout))

        # HF path on the identical (unpadded) pixel values
        valid_pix = np.asarray(pix).reshape(plan.pad_grid_h // 2,
                                            plan.pad_grid_w // 2, 4, -1)
        valid_pix = valid_pix[: plan.grid_h // 2, : plan.grid_w // 2].reshape(
            plan.num_tokens, -1)
        with torch.no_grad():
            hf_out = hf_model.model.visual(
                torch.tensor(valid_pix),
                grid_thw=torch.tensor([[1, plan.grid_h, plan.grid_w]]))
        np.testing.assert_allclose(ours, hf_out.numpy(), atol=2e-4, rtol=1e-3)


class TestDecoderParity:
    def test_text_only_logits(self, hf_model, our_params):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(8)
        ids = rng.integers(0, 500, size=(1, 24))
        with torch.no_grad():
            hf_logits = hf_model(input_ids=torch.tensor(ids)).logits.numpy()

        pos = mrope_positions(ids[0], [], CFG.image_token_id)
        logits = forward_train(our_params, CFG, jnp.asarray(ids),
                               jnp.asarray(pos)[:, None, :])
        np.testing.assert_allclose(np.asarray(logits), hf_logits,
                                   atol=5e-4, rtol=1e-3)

    def test_multimodal_logits(self, hf_model, our_params):
        torch = pytest.importorskip("torch")
        img, plan = _image_inputs()
        layout = build_vision_layout(plan, CFG.vision)

        n_img = plan.num_merged_tokens  # 6
        prefix = [11, CFG.vision_start_token_id]
        suffix = [CFG.vision_end_token_id, 17, 23, 42]
        ids = np.array(prefix + [CFG.image_token_id] * n_img + suffix)[None]

        pix = patchify(jnp.asarray(img), grid_h=plan.grid_h, grid_w=plan.grid_w,
                       pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                       out_dtype=jnp.float32)
        valid_pix = np.asarray(pix).reshape(plan.pad_grid_h // 2,
                                            plan.pad_grid_w // 2, 4, -1)
        valid_pix = valid_pix[: plan.grid_h // 2, : plan.grid_w // 2].reshape(
            plan.num_tokens, -1)
        with torch.no_grad():
            hf_logits = hf_model(
                input_ids=torch.tensor(ids),
                pixel_values=torch.tensor(valid_pix),
                image_grid_thw=torch.tensor([[1, plan.grid_h, plan.grid_w]]),
            ).logits.numpy()

        # ours
        encoded = vis.encode_image(
            our_params["visual"], CFG.vision, pix,
            jnp.asarray(layout.perm), jnp.asarray(layout.valid),
            jnp.asarray(layout.pos_hw), layout.n_windows)
        img_tokens = vis.extract_image_tokens(encoded, layout)

        emb = dec.embed_tokens(our_params["text"], jnp.asarray(ids[0]))
        img_positions = jnp.arange(len(prefix), len(prefix) + n_img)
        emb = merge_image_embeddings(emb, img_tokens, img_positions)

        pos = mrope_positions(ids[0], [(1, plan.grid_h, plan.grid_w)],
                              CFG.image_token_id)
        hidden, _ = dec.prefill_forward(
            our_params["text"], CFG.text, emb[None], jnp.asarray(pos)[:, None, :])
        logits = dec.logits_from_hidden(our_params["text"], CFG.text, hidden)
        np.testing.assert_allclose(np.asarray(logits), hf_logits,
                                   atol=1e-3, rtol=1e-3)


class TestAttendHorizon:
    def test_bounded_reads_match_full(self, our_params):
        """decode_step with a static attend_len must equal the full-M read
        when every cache_len fits under the horizon."""
        rng = np.random.default_rng(11)
        ids = rng.integers(0, 500, size=(2, 6))
        pos = np.stack([mrope_positions(row, [], CFG.image_token_id)
                        for row in ids], axis=1)
        emb = jax.vmap(lambda r: dec.embed_tokens(our_params["text"], r))(
            jnp.asarray(ids))
        _, pre = dec.prefill_forward(our_params["text"], CFG.text, emb,
                                     jnp.asarray(pos))
        cache = dec.KVCache.zeros(CFG.text, 2, 32, dtype=jnp.float32)
        cache = dec.KVCache(cache.k.at[:, :, :, :6].set(pre.k),
                            cache.v.at[:, :, :, :6].set(pre.v))
        cache_len = jnp.full((2,), 6, jnp.int32)
        step_emb = emb[:, -1:]
        step_pos = jnp.asarray(pos)[:, :, -1] + 1

        h_full, _ = dec.decode_step(our_params["text"], CFG.text, step_emb,
                                    step_pos, cache, cache_len)
        h_bound, _ = dec.decode_step(our_params["text"], CFG.text, step_emb,
                                     step_pos, cache, cache_len,
                                     attend_len=16)
        np.testing.assert_allclose(np.asarray(h_bound), np.asarray(h_full),
                                   atol=1e-5)


class TestDecodeConsistency:
    def test_incremental_matches_prefill(self, our_params):
        """Greedy decode via decode_step must reproduce prefill logits."""
        rng = np.random.default_rng(9)
        ids = rng.integers(0, 500, size=(2, 12))
        pos = np.stack([mrope_positions(row, [], CFG.image_token_id)
                        for row in ids], axis=1)  # (3, B, S)

        emb = jax.vmap(lambda r: dec.embed_tokens(our_params["text"], r))(
            jnp.asarray(ids))
        hidden, _ = dec.prefill_forward(our_params["text"], CFG.text, emb,
                                        jnp.asarray(pos))
        full_logits = dec.logits_from_hidden(our_params["text"], CFG.text, hidden)

        cache = dec.KVCache.zeros(CFG.text, batch=2, max_len=16, dtype=jnp.float32)
        cache_len = jnp.zeros((2,), jnp.int32)
        step_logits = []
        for s in range(ids.shape[1]):
            e = emb[:, s:s + 1]
            p = jnp.asarray(pos)[:, :, s]
            h, cache = dec.decode_step(our_params["text"], CFG.text, e, p,
                                       cache, cache_len)
            cache_len = cache_len + 1
            step_logits.append(dec.logits_from_hidden(
                our_params["text"], CFG.text, h)[:, 0])
        stepped = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(np.asarray(stepped), np.asarray(full_logits),
                                   atol=2e-4, rtol=1e-3)
