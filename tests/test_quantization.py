"""int8 weight-only quantization tests: matmul accuracy, decoder parity,
engine integration."""

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.layout import mrope_positions
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.ops.quantization import (
    matmul, matmul_w8a8, quantize_decoder_params, quantize_weight,
)

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)


class TestQuantizedMatmul:
    def test_accuracy(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        qw = quantize_weight(w)
        assert qw["int8_q"].dtype == jnp.int8
        exact = np.asarray(x @ w)
        approx = np.asarray(matmul(x, qw))
        rel = np.abs(exact - approx).max() / np.abs(exact).max()
        assert rel < 0.02, rel

    def test_w8a8_accuracy(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        qw = quantize_weight(w)
        exact = np.asarray(x @ w)
        approx = np.asarray(matmul_w8a8(x, qw))
        rel = np.abs(exact - approx).max() / np.abs(exact).max()
        assert rel < 0.04, rel  # two int8 roundings; looser than weight-only

    def test_w8a8_passthrough_and_1d(self):
        rng = np.random.default_rng(4)
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        x1 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
        # plain weights pass through unchanged
        np.testing.assert_allclose(np.asarray(matmul_w8a8(x1, w)),
                                   np.asarray(x1 @ w), rtol=1e-6)
        qw = quantize_weight(w)
        out = np.asarray(matmul_w8a8(x1, qw))
        assert out.shape == (32,)
        exact = np.asarray(x1 @ w)
        assert np.abs(exact - out).max() / np.abs(exact).max() < 0.04

    def test_stacked_layers(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(3, 16, 8)), jnp.float32)
        qw = quantize_weight(w)
        assert qw["scale"].shape == (3, 1, 8)
        x = jnp.asarray(rng.normal(size=(3, 5, 16)), jnp.float32)
        exact = np.asarray(jnp.einsum("lbi,lio->lbo", x, w))
        approx = np.asarray(jnp.stack(
            [matmul(x[i], {"int8_q": qw["int8_q"][i], "scale": qw["scale"][i]})
             for i in range(3)]))
        assert np.abs(exact - approx).max() / np.abs(exact).max() < 0.02


class TestQuantizedDecoder:
    def test_prefill_close_to_full_precision(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        qtext = quantize_decoder_params(params["text"])

        ids = np.random.default_rng(2).integers(16, 200, size=(1, 24))
        pos = mrope_positions(ids[0], [], CFG.image_token_id)
        emb = dec.embed_tokens(params["text"], jnp.asarray(ids[0]))[None]

        h_full, _ = dec.prefill_forward(params["text"], CFG.text, emb,
                                        jnp.asarray(pos)[:, None, :])
        h_q, _ = dec.prefill_forward(qtext, CFG.text, emb,
                                     jnp.asarray(pos)[:, None, :])
        logits_full = np.asarray(dec.logits_from_hidden(
            params["text"], CFG.text, h_full))
        logits_q = np.asarray(dec.logits_from_hidden(qtext, CFG.text, h_q))
        # int8 weight-only should track full precision closely
        top_full = logits_full.argmax(-1)
        top_q = logits_q.argmax(-1)
        agreement = (top_full == top_q).mean()
        assert agreement > 0.85, agreement

    def test_prefill_w8a8_close_to_full_precision(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        qtext = quantize_decoder_params(params["text"])

        ids = np.random.default_rng(5).integers(16, 200, size=(1, 24))
        pos = mrope_positions(ids[0], [], CFG.image_token_id)
        emb = dec.embed_tokens(params["text"], jnp.asarray(ids[0]))[None]

        h_full, _ = dec.prefill_forward(params["text"], CFG.text, emb,
                                        jnp.asarray(pos)[:, None, :])
        h_q, cache = dec.prefill_forward(qtext, CFG.text, emb,
                                         jnp.asarray(pos)[:, None, :],
                                         act_quant=True)
        logits_full = np.asarray(dec.logits_from_hidden(
            params["text"], CFG.text, h_full))
        logits_q = np.asarray(dec.logits_from_hidden(qtext, CFG.text, h_q))
        agreement = (logits_full.argmax(-1) == logits_q.argmax(-1)).mean()
        assert agreement > 0.75, agreement
        # the KV cache written under W8A8 must stay sane too
        assert np.isfinite(np.asarray(cache.k)).all()

    def test_engine_with_w8a8(self):
        """Greedy generation via the engine's W8A8 prefill path runs end to
        end and matches weight-only int8 closely (same weights, the only
        delta is activation rounding)."""
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        base = EngineConfig(max_batch_size=1, max_seq_len=128, decode_chunk=4,
                            prefill_buckets=(64, 128),
                            image_token_buckets=(16,), dtype=jnp.float32,
                            quantize="int8")
        req = GenRequest(messages=[{"role": "user", "content": "hello"}],
                         max_tokens=8, temperature=0.0)
        eng = Engine(params, CFG, TOK,
                     dataclasses_replace(base, act_quant="int8"))
        (res,) = eng.generate([req])
        assert res.completion_tokens <= 8
        assert all(isinstance(t, int) for t in res.token_ids)

    def test_vision_quant_engine(self):
        """Multimodal generation with the vision tower quantized (W8A8 via
        matmul_auto) runs end to end and stays near the bf16 tower's greedy
        output."""
        import base64
        import io

        from PIL import Image

        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        buf = io.BytesIO()
        Image.fromarray(np.random.default_rng(0).integers(
            0, 255, (64, 64, 3)).astype("uint8")).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        msgs = [{"role": "user", "content": [
            {"type": "text", "text": "Read this"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}}]}]
        base = EngineConfig(max_batch_size=1, max_seq_len=256, decode_chunk=4,
                            prefill_buckets=(128, 256),
                            image_token_buckets=(64,), dtype=jnp.float32,
                            quantize="int8")
        req = GenRequest(messages=msgs, max_tokens=8, temperature=0.0)
        (plain,) = Engine(params, CFG, TOK, base).generate([req])
        (vq,) = Engine(params, CFG, TOK, dataclasses_replace(
            base, vision_quant="int8")).generate([req])
        assert len(vq.token_ids) == len(plain.token_ids)
        agree = np.mean([a == b for a, b in
                         zip(plain.token_ids, vq.token_ids)])
        assert agree >= 0.5, (plain.token_ids, vq.token_ids)

    def test_act_quant_requires_quantized_weights(self):
        import pytest

        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        with pytest.raises(ValueError, match="act_quant"):
            Engine(params, CFG, TOK,
                   EngineConfig(max_batch_size=1, max_seq_len=128,
                                prefill_buckets=(64, 128),
                                image_token_buckets=(16,),
                                dtype=jnp.float32, act_quant="int8"))

    def test_engine_with_int8(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        ecfg = EngineConfig(max_batch_size=1, max_seq_len=128, decode_chunk=4,
                            prefill_buckets=(64, 128),
                            image_token_buckets=(16,), dtype=jnp.float32,
                            quantize="int8")
        engine = Engine(params, CFG, TOK, ecfg)
        (res,) = engine.generate([GenRequest(
            messages=[{"role": "user", "content": "hello world"}],
            max_tokens=8, temperature=0.0)])
        assert res.completion_tokens <= 8
        assert engine.params["text"]["layers"]["mlp"]["gate"][
            "int8_q"].dtype == jnp.int8

    def test_quantize_on_load_matches_engine_quantize(self):
        """convert_state_dict(quantize='int8') — the memory-lean load path
        for 7B checkpoints — must produce the same serving outputs as the
        load-bf16-then-quantize-in-engine path."""
        from karanta_tpu.models.qwen25_vl.exporting import to_hf_state_dict
        from karanta_tpu.models.qwen25_vl.loading import convert_state_dict

        params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
        state = to_hf_state_dict(params, CFG)
        ecfg = EngineConfig(max_batch_size=1, max_seq_len=128, decode_chunk=4,
                            prefill_buckets=(64, 128),
                            image_token_buckets=(16,), dtype=jnp.float32)

        plain = convert_state_dict(state, CFG, dtype=jnp.float32)
        eng_a = Engine(plain, CFG, TOK,
                       dataclasses_replace(ecfg, quantize="int8"))

        preq = convert_state_dict(state, CFG, dtype=jnp.float32,
                                  quantize="int8")
        assert preq["text"]["layers"]["mlp"]["gate"]["int8_q"].dtype == jnp.int8
        assert "logits_head" in preq["text"] or "lm_head" in preq["text"]
        eng_b = Engine(preq, CFG, TOK, ecfg)

        req = GenRequest(messages=[{"role": "user", "content": "hello"}],
                         max_tokens=8, temperature=0.0)
        (ra,) = eng_a.generate([req])
        (rb,) = eng_b.generate([req])
        assert ra.token_ids == rb.token_ids


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)
