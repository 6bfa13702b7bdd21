"""Prefix KV caching: continuation prefill must reproduce the full-prefill
results exactly, and repeated prompts must hit the cache."""

import base64
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.layout import mrope_positions
from karanta_tpu.models.qwen25_vl.model import init_params

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)


def _png_b64():
    from PIL import Image

    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (56, 56, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _request(page_text: str):
    return GenRequest(messages=[{
        "role": "user",
        "content": [
            {"type": "text",
             "text": "Read the page as plain text, keep every diacritic. "},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{_png_b64()}"}},
            {"type": "text", "text": page_text},
        ],
    }], max_tokens=10, temperature=0.0)


class TestPrefixContinuation:
    def test_decoder_matches_full_prefill(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        text = params["text"]
        rng = np.random.default_rng(1)
        ids = rng.integers(16, 200, size=(1, 24))
        pos = mrope_positions(ids[0], [], CFG.image_token_id)[:, None, :]
        emb = dec.embed_tokens(text, jnp.asarray(ids[0]))[None]

        full_hidden, full_cache = dec.prefill_forward(
            text, CFG.text, emb, jnp.asarray(pos))

        p = 10
        _, prefix_cache = dec.prefill_forward(
            text, CFG.text, emb[:, :p], jnp.asarray(pos[:, :, :p]))
        suffix_hidden, joined = dec.prefill_with_prefix(
            text, CFG.text, emb[:, p:], jnp.asarray(pos[:, :, p:]),
            prefix_cache, jnp.ones((1, p), jnp.float32))

        np.testing.assert_allclose(
            np.asarray(suffix_hidden), np.asarray(full_hidden[:, p:]),
            atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(joined.k), np.asarray(full_cache.k), atol=2e-5)


class TestEnginePrefixCache:
    def test_same_output_and_cache_hits(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        base = EngineConfig(max_batch_size=1, max_seq_len=256, decode_chunk=4,
                            prefill_buckets=(32, 64, 128, 256),
                            image_token_buckets=(16,), dtype=jnp.float32)
        plain = Engine(params, CFG, TOK, base)
        cached = Engine(params, CFG, TOK,
                        EngineConfig(**{**base.__dict__, "prefix_cache": True,
                                        "prefix_min_tokens": 16}))

        reqs = [_request("alpha"), _request("beta"), _request("gamma")]
        expected = [r.token_ids for r in plain.generate(list(reqs))]
        got = [r.token_ids for r in cached.generate(list(reqs))]
        assert got == expected
        # the first request seeds the shared-head detector (full prefill);
        # later pages LCP-match it and share one instruction-prefix entry.
        # (prepare runs in a thread pool, so the second request may race the
        # seed — with three requests at pool width 2 a hit is guaranteed.)
        assert len(cached._prefix_kv) >= 1

    def test_short_prefix_not_cached(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        engine = Engine(params, CFG, TOK, EngineConfig(
            max_batch_size=1, max_seq_len=256, decode_chunk=4,
            prefill_buckets=(64, 256), image_token_buckets=(16,),
            dtype=jnp.float32, prefix_cache=True, prefix_min_tokens=500))
        engine.generate([_request("gamma")])
        assert len(engine._prefix_kv) == 0
