"""Teacher-forcing hook (EngineConfig.teacher_force): bench-only forced
output streams. The full decode/verify compute still runs; the token the
model "emitted" is overridden device-side by the request's forced_output.
This is the honest operating point for measuring page throughput and
speculative acceptance with realistic output-text statistics on a machine
without checkpoints (the engine bench's random weights otherwise emit
statistically meaningless text)."""

import jax
import jax.numpy as jnp
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params

FORCED = ("the quick brown fox jumps over the lazy dog while the quick "
          "brown fox jumps over the lazy dog again")


@pytest.fixture(scope="module")
def setup():
    tok = ByteTokenizer()
    cfg = tiny_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return tok, cfg, params


def make_engine(setup, **over):
    tok, cfg, params = setup
    base = dict(max_batch_size=2, max_seq_len=256, decode_chunk=6,
                prefill_buckets=(128,), dtype=jnp.float32,
                teacher_force=True)
    base.update(over)
    return Engine(params, cfg, tok, EngineConfig(**base))


def _req(content: str, forced=None, rid="r"):
    return GenRequest(messages=[{"role": "user", "content": content}],
                      max_tokens=160, temperature=0.0, request_id=rid,
                      forced_output=forced)


class TestTeacherForce:
    def test_forced_output_exact(self, setup):
        """The completion is byte-for-byte the forced stream, EOS-finished."""
        eng = make_engine(setup)
        [res] = eng.generate([_req("hello page", forced=FORCED)])
        assert res.text == FORCED
        assert res.finish_reason == "stop"
        assert res.completion_tokens == len(FORCED.encode()) + 1  # + EOS

    def test_unforced_request_unaffected(self, setup):
        """A request without forced_output on a teacher-forcing engine
        matches the plain engine's greedy output exactly (the cleared -1
        row makes the where() an identity)."""
        forced_eng = make_engine(setup)
        plain_eng = make_engine(setup, teacher_force=False)
        [a] = forced_eng.generate([_req("some page text")])
        [b] = plain_eng.generate([_req("some page text")])
        assert a.token_ids == b.token_ids

    def test_budget_truncation(self, setup):
        """A forced stream longer than max_tokens is cut to the budget."""
        eng = make_engine(setup)
        req = _req("p", forced=FORCED)
        req.max_tokens = 10
        [res] = eng.generate([req])
        assert res.text == FORCED[:9]  # 9 forced bytes + EOS = 10
        assert res.completion_tokens == 10

    def test_slot_reuse_clears_forcing(self, setup):
        """An unforced request reusing a previously forced slot must not
        inherit the stale forced row."""
        eng = make_engine(setup, max_batch_size=1)
        [first] = eng.generate([_req("some page text", forced=FORCED)])
        assert first.text == FORCED
        plain_eng = make_engine(setup, teacher_force=False,
                                max_batch_size=1)
        [a] = eng.generate([_req("some page text")])
        [b] = plain_eng.generate([_req("some page text")])
        assert a.token_ids == b.token_ids

    def test_spec_forced_exact_and_accepts(self, setup):
        """Speculation + forcing: the emission is still exactly the forced
        text, and n-gram acceptance beats 1 token/pass because the forced
        transcript repeats the prompt's anchor text (the pipeline's
        anchored-page operating point)."""
        eng = make_engine(setup, speculative_ngram=3, max_seq_len=512,
                          prefill_buckets=(256,))
        anchored_prompt = "RAW TEXT START\n" + FORCED + "\nRAW TEXT END"
        [res] = eng.generate([_req(anchored_prompt, forced=FORCED,
                                   rid="spec")])
        assert res.text == FORCED
        assert res.finish_reason == "stop"
        assert eng.spec_passes > 0
        assert eng.spec_tokens / eng.spec_passes > 1.3

    def test_guided_plus_forced_rejected(self, setup):
        """Forced tokens bypass the automaton; the combination is refused
        loudly at prepare() instead of poisoning the DFA state."""
        eng = make_engine(setup)
        req = _req("x", forced=FORCED)
        req.guided_regex = r"[a-z ]+"
        with pytest.raises(ValueError, match="guided"):
            eng.prepare(req)

    def test_prepare_ignores_forced_when_off(self, setup):
        """Production engines (teacher_force off) never honor the field."""
        eng = make_engine(setup, teacher_force=False)
        prep = eng.prepare(_req("x", forced=FORCED))
        assert prep.forced_tokens is None
