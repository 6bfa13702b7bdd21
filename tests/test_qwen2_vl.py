"""Qwen2-VL (v2) family parity: LayerNorm/plain-GELU vision encoder and the
full multimodal forward vs the HF torch implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl import vision as vis
from karanta_tpu.models.qwen25_vl.config import (
    TextConfig, VisionConfig, VLMConfig, get_config,
)
from karanta_tpu.models.qwen25_vl.layout import build_vision_layout, mrope_positions
from karanta_tpu.models.qwen25_vl.loading import convert_state_dict
from karanta_tpu.models.qwen25_vl.model import merge_image_embeddings
from karanta_tpu.ops.image_prep import ImagePlan, patchify

CFG = VLMConfig(
    name="qwen2-vl-tiny",
    vision=VisionConfig(
        hidden_size=64, depth=2, num_heads=4, intermediate_size=256,
        out_hidden_size=64, fullatt_block_indexes=None,
        norm_type="layernorm", mlp_type="plain", hidden_act="quick_gelu",
    ),
    text=TextConfig(
        vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        mrope_section=(2, 3, 3), tie_word_embeddings=True,
    ),
    image_token_id=9, video_token_id=10, vision_start_token_id=8,
    vision_end_token_id=11, eos_token_id=2, pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    hf_cfg = Qwen2VLConfig(
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
            embed_dim=CFG.vision.hidden_size,
            num_heads=CFG.vision.num_heads,
            mlp_ratio=CFG.vision.intermediate_size // CFG.vision.hidden_size,
            hidden_size=CFG.vision.out_hidden_size,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        ),
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        attn_implementation="eager",
    )
    return Qwen2VLForConditionalGeneration(hf_cfg).eval().float()


def test_qwen2vl_export_roundtrip():
    from karanta_tpu.models.qwen25_vl.exporting import to_hf_state_dict
    from karanta_tpu.models.qwen25_vl.model import init_params

    params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    state = to_hf_state_dict(params, CFG)
    back = convert_state_dict(state, CFG, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["visual"]["blocks"]["mlp"]["fc1"]),
        np.asarray(params["visual"]["blocks"]["mlp"]["fc1"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["visual"]["merger"]["ln_q_b"]),
        np.asarray(params["visual"]["merger"]["ln_q_b"]), atol=1e-6)


def test_get_config_families():
    assert get_config("allenai/olmOCR-7B-0725").vision.norm_type == "layernorm"
    assert get_config("allenai/olmOCR-2-7B-1025").vision.norm_type == "rmsnorm"
    assert get_config("qwen2-vl-2b").text.hidden_size == 1536


def test_multimodal_logits_match_hf(hf_model):
    torch = pytest.importorskip("torch")

    # Qwen2-VL checkpoints use the legacy naming (visual.*, model.*);
    # exercise that path through the key normalizer
    state = {}
    for key, value in hf_model.state_dict().items():
        legacy = key.replace("model.visual.", "visual.").replace(
            "model.language_model.", "model.")
        state[legacy] = value
    params = convert_state_dict(state, CFG, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(56, 84, 3), dtype=np.uint8)
    plan = ImagePlan(56, 84, 4, 6, 8, 8)
    layout = build_vision_layout(plan, CFG.vision)

    pix = patchify(jnp.asarray(img), grid_h=plan.grid_h, grid_w=plan.grid_w,
                   pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                   out_dtype=jnp.float32)
    valid_pix = np.asarray(pix).reshape(plan.pad_grid_h // 2,
                                        plan.pad_grid_w // 2, 4, -1)
    valid_pix = valid_pix[: plan.grid_h // 2, : plan.grid_w // 2].reshape(
        plan.num_tokens, -1)

    n_img = plan.num_merged_tokens
    prefix = [11, CFG.vision_start_token_id]
    ids = np.array(prefix + [CFG.image_token_id] * n_img + [17, 23])[None]

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(valid_pix),
            image_grid_thw=torch.tensor([[1, plan.grid_h, plan.grid_w]]),
        ).logits.numpy()

    encoded = vis.encode_image(
        params["visual"], CFG.vision, pix,
        jnp.asarray(layout.perm), jnp.asarray(layout.valid),
        jnp.asarray(layout.pos_hw), layout.n_windows)
    img_tokens = vis.extract_image_tokens(encoded, layout)
    emb = dec.embed_tokens(params["text"], jnp.asarray(ids[0]))
    emb = merge_image_embeddings(
        emb, img_tokens, jnp.arange(len(prefix), len(prefix) + n_img))
    pos = mrope_positions(ids[0], [(1, plan.grid_h, plan.grid_w)],
                          CFG.image_token_id)
    hidden, _ = dec.prefill_forward(
        params["text"], CFG.text, emb[None], jnp.asarray(pos)[:, None, :])
    logits = dec.logits_from_hidden(params["text"], CFG.text, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=1e-3, rtol=1e-3)
