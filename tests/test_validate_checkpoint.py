"""CI proof of the one-command checkpoint validation harness
(scripts/validate_checkpoint.py): the exact command that will validate real
weights runs end to end on a tiny random-init HF checkpoint — convert ->
native engine OCR -> HF `generate` on identical inputs -> CER report."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import tiny_config

    cfg = tiny_config(vocab_size=ByteTokenizer().vocab_size)
    torch.manual_seed(0)
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            num_key_value_heads=cfg.text.num_kv_heads,
            intermediate_size=cfg.text.intermediate_size,
            rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps,
            tie_word_embeddings=True,
            rope_scaling={"type": "mrope",
                          "mrope_section": list(cfg.text.mrope_section)},
            max_position_embeddings=32768,
        ),
        vision_config=dict(
            depth=cfg.vision.depth,
            hidden_size=cfg.vision.hidden_size,
            num_heads=cfg.vision.num_heads,
            intermediate_size=cfg.vision.intermediate_size,
            out_hidden_size=cfg.vision.out_hidden_size,
            fullatt_block_indexes=list(cfg.vision.fullatt_block_indexes),
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            window_size=112,
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        architectures=["Qwen2_5_VLForConditionalGeneration"],
    )
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval().float()
    out = tmp_path_factory.mktemp("tiny_ckpt")
    model.save_pretrained(str(out), safe_serialization=True)
    return str(out)


def test_validate_checkpoint_command(tiny_hf_checkpoint, tmp_path):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.pathsep.join(
               [REPO] + os.environ.get("PYTHONPATH", "").split(os.pathsep))}
    report = tmp_path / "report.md"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/validate_checkpoint.py"),
         tiny_hf_checkpoint, "--preset", "tiny",
         "--pages", "2", "--page-dim", "224", "--decode-tokens", "12",
         "--max-seq-len", "512", "--image-token-buckets", "16,64",
         # int4 KV genuinely perturbs a tiny RANDOM model's tokens, so the
         # matrix rows run report-only in CI; the tight default bound is
         # for real weights
         "--max-mode-delta", "1.0",
         "--out", str(report)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["passed"] is True
    names = {p["name"] for p in summary["pairings"]}
    assert {"native-bf16 vs HF-generate",
            "quantized vs native-bf16",
            "quantized vs HF-generate",
            "mode int4kv vs native-bf16",
            "mode spec vs native-bf16"} <= names
    by_name = {p["name"]: p for p in summary["pairings"]}
    for name in ("native-bf16 vs HF-generate", "quantized vs native-bf16",
                 "quantized vs HF-generate"):
        p = by_name[name]
        # tiny random weights, identical inputs: token-exact across all
        # three pairings (quantization is a no-op off-TPU)
        assert p["exact"] == p["total"] == 2, p
        assert p["mean_cer"] == 0.0, p
    # greedy n-gram speculation is exact by construction
    spec = by_name["mode spec vs native-bf16"]
    assert spec["exact"] == spec["total"] == 2, spec
    # the combined capacity+speculation point is a real scored row since the
    # multi-token int4 kernel landed (ops/decode_attention.py
    # paged_decode_append_multi_q4)
    assert "mode spec-int4kv vs native-bf16" in names, summary
    assert report.exists()
