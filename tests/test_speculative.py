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


class TestSpecVerifySampled:
    """Distribution exactness of the rejection-sampling verifier: the
    emitted-token marginals must equal plain autoregressive sampling."""

    def _setup(self):
        rng = np.random.default_rng(7)
        v, gamma = 8, 3
        logits = jnp.asarray(rng.normal(size=(1, gamma + 1, v)), jnp.float32)
        draft = jnp.asarray(rng.integers(0, v, size=(1, gamma)), jnp.int32)
        return logits, draft, v, gamma

    def test_marginals_match_target(self):
        from karanta_tpu.inference.sampling import spec_verify_sampled

        logits, draft, v, gamma = self._setup()
        temps = jnp.ones((1,), jnp.float32)
        n = 20_000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        y, n_new = jax.jit(jax.vmap(
            lambda k: spec_verify_sampled(logits, draft, temps, k)))(keys)
        y = np.asarray(y)[:, 0]          # (N, T)
        n_new = np.asarray(n_new)[:, 0]  # (N,)
        probs = np.asarray(jax.nn.softmax(logits[0], axis=-1))  # (T, V)

        # position-0 marginal: always emitted, must be p_0 exactly
        emp0 = np.bincount(y[:, 0], minlength=v) / n
        np.testing.assert_allclose(emp0, probs[0], atol=0.02)

        # position-1 marginal conditional on position-0 acceptance: p_1
        cond = n_new > 1
        emp1 = np.bincount(y[cond, 1], minlength=v) / cond.sum()
        np.testing.assert_allclose(emp1, probs[1], atol=0.03)

        # acceptance-length distribution: P(n_new=k) from the accept rule
        p_acc = np.array([probs[i, int(draft[0, i])] for i in range(gamma)])
        expect = []
        for k in range(1, gamma + 2):
            e = np.prod(p_acc[:k - 1])
            if k <= gamma:
                e *= 1.0 - p_acc[k - 1]
            expect.append(e)
        emp_len = np.bincount(n_new, minlength=gamma + 2)[1:] / n
        np.testing.assert_allclose(emp_len, expect, atol=0.02)

    def test_greedy_rows_are_argmax_exact(self):
        from karanta_tpu.inference.sampling import spec_verify_sampled

        logits, draft, v, gamma = self._setup()
        # row 0 greedy, row 1 sampled: greedy row must be key-independent
        logits2 = jnp.tile(logits, (2, 1, 1))
        draft2 = jnp.tile(draft, (2, 1))
        temps = jnp.asarray([0.0, 1.0], jnp.float32)
        outs = []
        for seed in range(4):
            y, n_new = spec_verify_sampled(logits2, draft2, temps,
                                           jax.random.PRNGKey(seed))
            outs.append((np.asarray(y)[0], int(np.asarray(n_new)[0])))
        ref_y, ref_n = outs[0]
        greedy = np.asarray(jnp.argmax(logits[0], axis=-1))
        acc = 0
        while acc < gamma and greedy[acc] == int(draft[0, acc]):
            acc += 1
        assert ref_n == acc + 1
        np.testing.assert_array_equal(ref_y[:acc], np.asarray(draft[0])[:acc])
        assert ref_y[acc] == greedy[acc]
        for y2, n2 in outs[1:]:
            assert n2 == ref_n
            np.testing.assert_array_equal(y2[:ref_n], ref_y[:ref_n])


class TestSpeculativeExactness:
    def test_matches_plain_greedy(self, engines):
        plain, spec = engines
        out_p = plain.generate(_reqs())
        out_s = spec.generate(_reqs())
        for a, b in zip(out_p, out_s):
            assert a.token_ids == b.token_ids, (a.request_id,
                                                a.token_ids, b.token_ids)
            assert a.text == b.text

    def test_sampled_request_runs_speculatively(self, engines):
        _, spec = engines
        calls = {"n": 0}
        orig = spec.decode_chunk_spec

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        spec.decode_chunk_spec = counted
        try:
            req = GenRequest(messages=[{"role": "user", "content": "hi"}],
                             max_tokens=8, temperature=0.7, request_id="s")
            out = spec.generate([req])[0]
        finally:
            spec.decode_chunk_spec = orig
        assert len(out.token_ids) == 8
        assert calls["n"] > 0  # temp>0 now verifies by rejection sampling

    def test_tiny_temperature_matches_greedy(self, engines):
        """temp=1e-6 exercises the sampled verify executable; at that scale
        acceptance and resampling both collapse to argmax, so the output
        must equal the plain greedy sequence token-for-token."""
        plain, spec = engines
        reqs = [GenRequest(messages=[{"role": "user",
                                      "content": "abcabcabcabc"}],
                           max_tokens=24, temperature=0.0, request_id="g")]
        tiny = [GenRequest(messages=[{"role": "user",
                                      "content": "abcabcabcabc"}],
                           max_tokens=24, temperature=1e-6, request_id="g")]
        out_p = plain.generate(reqs)[0]
        out_s = spec.generate(tiny)[0]
        assert out_p.token_ids == out_s.token_ids

    def test_guided_free_tail_speculates(self, engines):
        """A guided slot whose DFA has entered the closed free tail
        ([\\s\\S]+) may speculate; the constrained prefix must still match."""
        import re

        _, spec = engines
        pattern = r"id: [0-9]{3}\n[\s\S]+"
        calls = {"n": 0}
        orig = spec.decode_chunk_spec

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        spec.decode_chunk_spec = counted
        try:
            req = GenRequest(messages=[{"role": "user", "content": "doc"}],
                             max_tokens=32, temperature=0.0,
                             guided_regex=pattern, request_id="gd")
            out = spec.generate([req])[0]
        finally:
            spec.decode_chunk_spec = orig
        assert re.match(r"id: [0-9]{3}\n", out.text), out.text
        assert calls["n"] > 0  # speculation engaged once inside the tail

    def test_int8_kv_fused_kernel_matches_plain(self, monkeypatch):
        """Speculative decode over the int8 KV cache routed through the
        fused multi-token append kernel (interpret mode) must equal the
        plain greedy int8 path token-for-token."""
        import karanta_tpu.models.qwen25_vl.decoder as dec

        monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
        tok = NoStop()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        base = dict(max_batch_size=2, max_seq_len=128, decode_chunk=6,
                    prefill_buckets=(128,), dtype=jnp.float32,
                    kv_quantize="int8")
        plain = Engine(params, cfg, tok, EngineConfig(**base))
        spec = Engine(params, cfg, tok,
                      EngineConfig(**base, speculative_ngram=3))
        out_p = plain.generate(_reqs())
        out_s = spec.generate(_reqs())
        for a, b in zip(out_p, out_s):
            assert a.token_ids == b.token_ids, (a.request_id,
                                                a.token_ids, b.token_ids)

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


class TestPerRequestOptOut:
    """Per-request speculation votes (pipeline auto-enable heuristic):
    opted-out majorities take the per-step path, opted-in majorities (and
    the None default) speculate. Exactness is unaffected either way."""

    def _count_spec_calls(self, engine, reqs):
        calls = {"n": 0}
        orig = engine.decode_chunk_spec

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        engine.decode_chunk_spec = counted
        try:
            outs = engine.generate(reqs)
        finally:
            engine.decode_chunk_spec = orig
        return calls["n"], outs

    def test_opted_out_majority_decodes_per_step(self, engines):
        _, spec = engines
        reqs = _reqs()
        for r in reqs:
            r.speculative = False
        n, outs = self._count_spec_calls(spec, reqs)
        assert n == 0
        assert all(len(o.token_ids) == 24 for o in outs)

    def test_split_vote_is_not_a_majority(self, engines):
        _, spec = engines
        reqs = _reqs()
        reqs[0].speculative = True
        reqs[1].speculative = False
        n, _ = self._count_spec_calls(spec, reqs)
        assert n == 0  # 1 of 2 is not a majority

    def test_default_none_speculates(self, engines):
        _, spec = engines
        n, _ = self._count_spec_calls(spec, _reqs())
        assert n > 0
