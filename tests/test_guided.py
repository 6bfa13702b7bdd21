"""Guided decoding tests: regex compiler, token automaton, engine integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.guided import (
    build_token_automaton, compile_regex, match_full,
    token_bytes_from_tokenizer, TokenAutomaton,
)
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.pipeline.runner import GUIDED_REGEX


class TestRegexCompiler:
    @pytest.mark.parametrize("pattern,accept,reject", [
        (r"ab+c?", ["ab", "abbb", "abc"], ["a", "ac", "abcc"]),
        (r"[a-c]{2}", ["ab", "cc"], ["a", "abc", "dd"]),
        (r"(?:foo|bar)x*", ["foo", "barxx"], ["baz", "xfoo"]),
        (r"a\nb", ["a\nb"], ["anb", "a b"]),
        (r"[^0-9]+", ["abc"], ["a1"]),
        (r"x{2,3}", ["xx", "xxx"], ["x", "xxxx"]),
        (r"a.c", ["abc", "azc"], ["a\nc", "ac"]),
    ])
    def test_patterns(self, pattern, accept, reject):
        dfa = compile_regex(pattern)
        for s in accept:
            assert match_full(dfa, s.encode()), (pattern, s)
        for s in reject:
            assert not match_full(dfa, s.encode()), (pattern, s)

    def test_pipeline_guided_regex(self):
        dfa = compile_regex(GUIDED_REGEX)
        good = (b"---\nprimary_language: en\nis_rotation_valid: True\n"
                b"rotation_correction: 90\nis_table: false\n"
                b"is_diagram: False\n---\nbody text\nmore")
        assert match_full(dfa, good)
        assert not match_full(dfa, good.replace(b": en", b": english"))
        assert not match_full(dfa, b"primary_language: en")


class TestTokenAutomaton:
    def test_masks_and_transitions(self):
        tok = ByteTokenizer()
        token_bytes = token_bytes_from_tokenizer(tok, tok.vocab_size)
        auto = build_token_automaton(r"ab+", token_bytes, tok.eos_token_id)
        a_id = ord("a") + tok.OFFSET
        b_id = ord("b") + tok.OFFSET
        c_id = ord("c") + tok.OFFSET
        state = auto.start
        assert auto.allowed[state, a_id]
        assert not auto.allowed[state, b_id]
        assert not auto.allowed[state, tok.eos_token_id]
        state = auto.next_state[state, a_id]
        assert auto.allowed[state, b_id]
        assert not auto.allowed[state, c_id]
        state = auto.next_state[state, b_id]
        # after "ab": accepting -> eos allowed, more b allowed
        assert auto.allowed[state, tok.eos_token_id]
        assert auto.allowed[state, b_id]
        # FREE row allows everything
        assert auto.allowed[TokenAutomaton.FREE].all()


class TestClosedFreeStates:
    """The speculation-safety fixed point: states where masking is forever
    a no-op."""

    def _auto(self, pattern):
        from karanta_tpu.inference.guided import closed_free_states

        tok = ByteTokenizer()
        token_bytes = token_bytes_from_tokenizer(tok, tok.vocab_size)
        auto = build_token_automaton(pattern, token_bytes, tok.eos_token_id)
        # byte-less tokens are exempt (self-loop, no text) — except EOS
        ignore = np.array([len(t) == 0 for t in token_bytes], bool)
        ignore[tok.eos_token_id] = False
        free = closed_free_states(auto.allowed, auto.next_state, ignore)
        return tok, auto, free

    def test_pipeline_style_tail_is_free(self):
        tok, auto, free = self._auto(r"id: [0-9]{3}\n[\s\S]+")
        assert free[0]                  # FREE row
        assert not free[auto.start]     # constrained prefix
        # walk "id: 123\nX": lands in the [\s\S]+ tail -> free forever
        state = auto.start
        for ch in b"id: 123\nX":
            state = auto.next_state[state, ch + tok.OFFSET]
        assert free[state]
        # and the tail is closed: any token keeps it free
        assert free[auto.next_state[state]].all()

    def test_persistent_constraint_never_free(self):
        _, auto, free = self._auto(r"[0-9]+")
        # digits-only forever: no state (beyond FREE) may speculate
        assert free[0]
        assert not free[1:].any()

    def test_accepting_without_all_tokens_not_free(self):
        tok, auto, free = self._auto(r"ab*")
        # after "a" the state accepts EOS and b, but not (say) c -> not free
        state = auto.next_state[auto.start, ord("a") + tok.OFFSET]
        assert auto.allowed[state, tok.eos_token_id]
        assert not free[state]


class TestEngineGuided:
    def test_generation_matches_regex(self):
        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=128, decode_chunk=4,
                            prefill_buckets=(64, 128),
                            image_token_buckets=(16,), dtype=jnp.float32)
        engine = Engine(params, cfg, tok, ecfg)

        pattern = r"(?:yes|no): [0-9]{1,3}"
        req = GenRequest(
            messages=[{"role": "user", "content": "classify"}],
            max_tokens=24, temperature=1.0, guided_regex=pattern)
        (res,) = engine.generate([req])
        dfa = compile_regex(pattern)
        assert match_full(dfa, res.text.encode()), res.text

        # unguided request on the same engine still works
        (free,) = engine.generate([GenRequest(
            messages=[{"role": "user", "content": "hello"}],
            max_tokens=6, temperature=0.0)])
        assert free.completion_tokens <= 6

    def test_two_regexes_in_flight_both_guided_concurrently(self):
        """Requests with DIFFERENT regexes decode in the same wave: both
        automatons are resident in the flattened state arena, both slots
        are live at once, and BOTH outputs match their own constraints
        (round 1 silently unguided the second; round 2 deferred it)."""
        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=128, decode_chunk=4,
                            prefill_buckets=(64, 128),
                            image_token_buckets=(16,), dtype=jnp.float32)
        engine = Engine(params, cfg, tok, ecfg)

        p1 = r"(?:yes|no): [0-9]{1,3}"
        p2 = r"[a-f]{2}-[0-9]{2}"
        reqs = [
            GenRequest(messages=[{"role": "user", "content": "classify"}],
                       max_tokens=24, temperature=1.0, guided_regex=p1),
            GenRequest(messages=[{"role": "user", "content": "code"}],
                       max_tokens=24, temperature=1.0, guided_regex=p2),
        ]
        live_sets = []
        orig = engine.decode_chunk_async

        def spy(*a, **k):
            live_sets.append({r for r, free in zip(engine._slot_regex,
                                                   engine.slot_free)
                              if r is not None and not free})
            return orig(*a, **k)

        engine.decode_chunk_async = spy
        try:
            r1, r2 = engine.generate(reqs)
        finally:
            engine.decode_chunk_async = orig
        assert match_full(compile_regex(p1), r1.text.encode()), r1.text
        assert match_full(compile_regex(p2), r2.text.encode()), r2.text
        # concurrency proof: some decode wave carried BOTH regexes live
        assert {p1, p2} in live_sets, live_sets
        assert set(engine._arena) == {p1, p2}


class TestAutomatonBucketing:
    def test_same_bucket_same_shapes(self):
        """Different regexes in one state bucket must produce identically
        shaped device tables (so the decode executable is reused)."""
        import jax.numpy as jnp

        from karanta_tpu.inference.engine import Engine, EngineConfig
        from karanta_tpu.inference.tokenizer import ByteTokenizer
        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.model import init_params
        import jax

        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        eng = Engine(params, cfg, tok,
                     EngineConfig(max_batch_size=2, max_seq_len=64,
                                  decode_chunk=4, dtype=jnp.float32))
        start1 = eng._ensure_automaton(r"[0-9]{4}")
        shape1 = eng._allowed.shape
        assert shape1[0] in (64, 256, 1024, 4096)
        start2 = eng._ensure_automaton(r"[a-f]{2}-[0-9]{2}")
        assert eng._allowed.shape == shape1  # same bucket -> same executable
        assert start1 >= 1 and start2 >= 1
        # both resident side by side in the arena, at distinct offsets
        e1, e2 = eng._arena.values()
        assert e1["offset"] + e1["n"] <= e2["offset"]
        # re-requesting a resident regex is a no-op returning the same start
        assert eng._ensure_automaton(r"[0-9]{4}") == start1


class TestArenaCapacity:
    """State-arena management: full-with-live defers (never drops), full
    after drain resets, resident automatons survive alongside each other."""

    def _engine(self):
        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        return Engine(params, cfg, tok, EngineConfig(
            max_batch_size=2, max_seq_len=64, decode_chunk=4,
            prefill_buckets=(64,), image_token_buckets=(16,),
            dtype=jnp.float32))

    def test_full_arena_with_live_slots_defers(self):
        from karanta_tpu.inference.engine import GuidedRegexBusy

        eng = self._engine()
        p1 = r"[0-9]{6}"
        eng.ARENA_MAX_ROWS = 1 + (
            eng._compile_automaton_locked(p1).allowed.shape[0] - 1)
        start = eng._ensure_automaton(p1)
        assert start >= 1
        # simulate a live guided slot on p1
        eng.slot_free[0] = False
        eng._slot_guided[0] = True
        eng._slot_regex[0] = p1
        p2 = r"[a-f]{2}"
        assert not eng.guided_available(p2)
        import pytest as _pytest

        with _pytest.raises(GuidedRegexBusy):
            eng._ensure_automaton(p2)
        # the drained arena resets and admits the new regex
        eng.free_slot(0)
        assert eng.guided_available(p2)
        start2 = eng._ensure_automaton(p2)
        assert start2 >= 1
        assert set(eng._arena) == {p2}

    def test_oversized_regex_rejected_permanently(self):
        eng = self._engine()
        eng.ARENA_MAX_ROWS = 4
        import pytest as _pytest

        with _pytest.raises(ValueError):
            eng._ensure_automaton(r"[0-9]{64}")
