"""Speculative (n-gram drafted, multi-token verified) decoding: greedy
exactness vs the plain decode path, plus multi-token decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params


class NoStop(ByteTokenizer):
    def __init__(self):
        super().__init__()
        self.eos_token_id = -1


@pytest.fixture(scope="module")
def engines():
    tok = NoStop()
    cfg = tiny_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    base = EngineConfig(max_batch_size=2, max_seq_len=128, decode_chunk=6,
                        prefill_buckets=(128,), dtype=jnp.float32)
    plain = Engine(params, cfg, tok, base)
    spec = Engine(params, cfg, tok,
                  EngineConfig(**{**base.__dict__, "speculative_ngram": 3}))
    return plain, spec


def _reqs():
    return [
        GenRequest(messages=[{"role": "user",
                              "content": "abcabcabcabcabcabc"}],
                   max_tokens=24, temperature=0.0, request_id="rep"),
        GenRequest(messages=[{"role": "user",
                              "content": "The quick brown fox."}],
                   max_tokens=24, temperature=0.0, request_id="uniq"),
    ]


class TestSpeculativeExactness:
    def test_matches_plain_greedy(self, engines):
        plain, spec = engines
        out_p = plain.generate(_reqs())
        out_s = spec.generate(_reqs())
        for a, b in zip(out_p, out_s):
            assert a.token_ids == b.token_ids, (a.request_id,
                                                a.token_ids, b.token_ids)
            assert a.text == b.text

    def test_sampling_request_falls_back(self, engines):
        _, spec = engines
        req = GenRequest(messages=[{"role": "user", "content": "hi"}],
                         max_tokens=8, temperature=0.7, request_id="s")
        out = spec.generate([req])[0]
        assert len(out.token_ids) == 8  # ran through the normal path

    def test_spec_chunk_emits_valid_counts(self, engines):
        _, spec = engines
        # directly exercise the chunk after inserting one request
        req = _reqs()[0]
        prepared = spec.prepare(req)
        cache, first, true_len, next_pos, dfa = spec.prefill(prepared)
        spec.insert(0, prepared, cache, first, true_len, next_pos, dfa)
        toks, counts = spec.decode_chunk_spec(steps=3)
        assert toks.shape == (3, 2, 4)
        assert counts.shape == (3, 2)
        assert ((counts >= 1) & (counts <= 4)).all()
        spec.free_slot(0)
