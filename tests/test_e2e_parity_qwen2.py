"""End-to-end greedy decode parity vs HF for the Qwen2-VL (v2) family.

test_e2e_parity.py chains tokenizer -> chat template -> prefill -> greedy
decode -> detokenize against HF generate for the Qwen2.5-VL geometry;
this does the same for the second OCR family the reference serves
(allenai/olmOCR-7B-0725 is a Qwen2-VL-7B fine-tune — reference Model enum,
karanta/constants.py:17-24): LayerNorm + plain-GELU vision tower with full
attention in every block, exercised through the serving engine itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import (
    TextConfig, VisionConfig, VLMConfig,
)
from karanta_tpu.models.qwen25_vl.loading import convert_state_dict
from tests.test_e2e_parity import _png_data_url, _valid_pixels

TOK = ByteTokenizer()
CFG = VLMConfig(
    name="qwen2-vl-tiny",
    vision=VisionConfig(
        hidden_size=64, depth=2, num_heads=4, intermediate_size=256,
        out_hidden_size=64, fullatt_block_indexes=None,
        norm_type="layernorm", mlp_type="plain", hidden_act="quick_gelu",
    ),
    text=TextConfig(
        vocab_size=TOK.vocab_size, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        mrope_section=(2, 3, 3), tie_word_embeddings=True,
    ),
    image_token_id=9, video_token_id=10, vision_start_token_id=8,
    vision_end_token_id=11, eos_token_id=2, pad_token_id=0,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLConfig,
    )
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


@pytest.fixture(scope="module")
def engine(hf_model):
    # Qwen2-VL checkpoints use the legacy key naming (visual.*, model.*)
    state = {}
    for key, value in hf_model.state_dict().items():
        legacy = key.replace("model.visual.", "visual.").replace(
            "model.language_model.", "model.")
        state[legacy] = value
    params = convert_state_dict(state, CFG, dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=4,
                        prefill_buckets=(64, 128, 256),
                        image_token_buckets=(16, 64), dtype=jnp.float32)
    return Engine(params, CFG, TOK, ecfg)


class TestQwen2VLGreedyParity:
    def _run_case(self, engine, hf_model, messages, n_tokens=24):
        torch = pytest.importorskip("torch")

        request = GenRequest(messages=messages, max_tokens=n_tokens,
                             temperature=0.0)
        prepared = engine.prepare(request)
        prompt_ids = np.asarray(prepared.ids)

        kwargs = {}
        if prepared.image_feeds:
            valid_pix, plan = _valid_pixels(prepared.image_feeds[0])
            kwargs = dict(
                pixel_values=torch.tensor(valid_pix),
                image_grid_thw=torch.tensor([[1, plan.grid_h, plan.grid_w]]))
        with torch.no_grad():
            hf_out = hf_model.generate(
                input_ids=torch.tensor(prompt_ids[None], dtype=torch.long),
                attention_mask=torch.ones((1, len(prompt_ids)),
                                          dtype=torch.long),
                do_sample=False, max_new_tokens=n_tokens,
                eos_token_id=TOK.eos_token_id, pad_token_id=TOK.pad_token_id,
                **kwargs)
        hf_new = [int(t) for t in hf_out[0, len(prompt_ids):]]

        (res,) = engine.generate([request])
        ours = list(res.token_ids)

        def strip_eos(toks):
            return toks[:-1] if toks and toks[-1] == TOK.eos_token_id else toks

        hf_clean, our_clean = strip_eos(hf_new), strip_eos(ours)
        n = min(len(hf_clean), len(our_clean))
        assert n >= 4, (hf_clean, our_clean)
        assert our_clean[:n] == hf_clean[:n], (our_clean, hf_clean)

    def test_text_only_greedy_matches_hf_generate(self, engine, hf_model):
        messages = [{"role": "user",
                     "content": [{"type": "text",
                                  "text": "Transcribe the page."}]}]
        self._run_case(engine, hf_model, messages)

    def test_multimodal_greedy_matches_hf_generate(self, engine, hf_model):
        messages = [{"role": "user", "content": [
            {"type": "text", "text": "Read this page."},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}]
        self._run_case(engine, hf_model, messages)
