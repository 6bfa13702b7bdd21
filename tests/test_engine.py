"""Engine tests on the tiny model + hermetic byte tokenizer."""

import base64
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.chat import parse_openai_messages
from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params

CFG = tiny_config(vocab_size=ByteTokenizer().vocab_size)


def _png_b64(h=56, w=56):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _messages(text="Read this page.", with_image=True):
    content = [{"type": "text", "text": text}]
    if with_image:
        content.append({"type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{_png_b64()}"}})
    return [{"role": "user", "content": content}]


@pytest.fixture(scope="module")
def engine():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=8,
                        prefill_buckets=(64, 128, 256),
                        image_token_buckets=(16, 64), dtype=jnp.float32)
    return Engine(params, CFG, ByteTokenizer(), ecfg)


class TestChat:
    def test_parse_messages(self):
        parsed = parse_openai_messages(_messages())
        assert "<|image_pad|>" in parsed.text
        assert parsed.text.endswith("<|im_start|>assistant\n")
        assert len(parsed.images) == 1

    def test_text_only(self):
        parsed = parse_openai_messages(_messages(with_image=False))
        assert parsed.images == []


class TestEngine:
    def test_overlong_prompt_rejected_cleanly(self, engine):
        from karanta_tpu.inference.engine import ContextLengthError

        with pytest.raises(ContextLengthError):
            engine.prepare(GenRequest(
                messages=_messages("x" * 1024, with_image=False)))

    def test_prefill_buckets_clamped_to_context(self):
        """Buckets above max_seq_len would produce uninsertable prefills
        (found by driving --serve-inproc with --max-model-len 256)."""
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        ecfg = EngineConfig(max_batch_size=1, max_seq_len=192,
                            prefill_buckets=(256, 512, 1024),
                            image_token_buckets=(256,), dtype=jnp.float32)
        eng = Engine(params, CFG, ByteTokenizer(), ecfg)
        assert max(eng.ecfg.prefill_buckets) == 192
        assert max(eng.ecfg.image_token_buckets) == 192

    def test_text_generation(self, engine):
        req = GenRequest(messages=_messages(with_image=False),
                         max_tokens=12, temperature=0.0, request_id="r1")
        (res,) = engine.generate([req])
        assert res.request_id == "r1"
        assert res.finish_reason in ("stop", "length")
        assert 1 <= res.completion_tokens <= 12
        assert res.prompt_tokens > 0

    def test_greedy_deterministic(self, engine):
        req = GenRequest(messages=_messages(with_image=False),
                         max_tokens=16, temperature=0.0)
        (a,) = engine.generate([req])
        (b,) = engine.generate([req])
        assert a.token_ids == b.token_ids

    def test_multimodal_generation(self, engine):
        req = GenRequest(messages=_messages(), max_tokens=8, temperature=0.0)
        (res,) = engine.generate([req])
        assert res.completion_tokens <= 8
        # 56x56 image -> 2x2 merged tokens expand the prompt
        assert res.prompt_tokens > 20

    def test_batch_of_mixed_requests(self, engine):
        reqs = [
            GenRequest(messages=_messages(with_image=False), max_tokens=6,
                       temperature=0.0, request_id="a"),
            GenRequest(messages=_messages(), max_tokens=9, temperature=0.7,
                       top_p=0.9, request_id="b"),
            GenRequest(messages=_messages(with_image=False), max_tokens=4,
                       temperature=0.0, request_id="c"),
        ]
        results = engine.generate(reqs)
        assert [r.request_id for r in results] == ["a", "b", "c"]
        for r, req in zip(results, reqs):
            assert r.completion_tokens <= req.max_tokens

    def test_batched_matches_single(self, engine):
        """Continuous-batching must not change greedy results."""
        req1 = GenRequest(messages=_messages(with_image=False, text="alpha"),
                          max_tokens=10, temperature=0.0)
        req2 = GenRequest(messages=_messages(with_image=False, text="beta"),
                          max_tokens=10, temperature=0.0)
        solo1 = engine.generate([req1])[0]
        solo2 = engine.generate([req2])[0]
        both = engine.generate([req1, req2])
        assert both[0].token_ids == solo1.token_ids
        assert both[1].token_ids == solo2.token_ids


def test_batched_prefill_matches_single():
    """prefill_batch=K admission must emit identical greedy tokens to the
    per-page path (vision runs as a K-image concatenation, decoder prefill
    with batch K)."""
    from PIL import Image

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg, tok = CFG, ByteTokenizer()

    def img_b64(seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 255, size=(112, 112, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def msgs(seed):
        return [{"role": "user", "content": [
            {"type": "text", "text": "read this"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{img_b64(seed)}"}},
        ]}]

    reqs = [GenRequest(messages=msgs(i), max_tokens=8, temperature=0.0,
                       request_id=f"r{i}") for i in range(3)]
    outs = {}
    for pb in (1, 4):
        ecfg = EngineConfig(max_batch_size=4, max_seq_len=512, decode_chunk=4,
                            prefill_buckets=(256,), image_token_buckets=(64,),
                            dtype=jnp.float32, prefill_batch=pb)
        eng = Engine(params, cfg, tok, ecfg, rng_seed=7)
        outs[pb] = [r.token_ids for r in eng.generate(list(reqs))]
    assert outs[1] == outs[4]


def test_wave_admission_instant_finish():
    """Pages that finish on their first token (max_tokens=1) must free their
    slots inside the admission wave and still return results in order."""
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=4,
                        prefill_buckets=(128,), image_token_buckets=(64,),
                        dtype=jnp.float32)
    eng = Engine(params, CFG, ByteTokenizer(), ecfg)
    reqs = [GenRequest(messages=_messages(with_image=False), max_tokens=1,
                       temperature=0.0, request_id=f"one-{i}")
            for i in range(5)]
    results = eng.generate(reqs)
    assert [r.request_id for r in results] == [f"one-{i}" for i in range(5)]
    for r in results:
        assert r.completion_tokens == 1
        assert r.finish_reason in ("stop", "length")
    assert all(eng.slot_free)


class TestImageCache:
    def test_repeat_bytes_hit_cache(self, engine):
        raw = base64.b64decode(_png_b64())
        a = engine._decode_image(raw)
        b = engine._decode_image(raw)
        assert a is b  # second decode served from the LRU
        assert not a.flags.writeable

    def test_cache_disabled(self, monkeypatch, engine):
        monkeypatch.setattr(engine, "_img_cache_cap", 0)
        raw = base64.b64decode(_png_b64())
        a = engine._decode_image(raw)
        b = engine._decode_image(raw)
        assert a is not b
        np.testing.assert_array_equal(a, b)

    def test_lru_eviction_bounds_bytes(self, engine):
        engine._img_cache.clear()
        engine._img_cache_bytes = 0
        old_cap = engine._img_cache_cap
        try:
            one = base64.b64decode(_png_b64())
            sz = engine._decode_image(one).nbytes
            engine._img_cache.clear()
            engine._img_cache_bytes = 0
            engine._img_cache_cap = sz * 2  # room for two decoded images
            import io as _io

            from PIL import Image

            for seed in range(4):
                rng = np.random.default_rng(seed)
                img = Image.fromarray(
                    rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))
                buf = _io.BytesIO()
                img.save(buf, format="PNG")
                engine._decode_image(buf.getvalue())
            assert engine._img_cache_bytes <= sz * 2
            assert len(engine._img_cache) == 2  # oldest evicted
        finally:
            engine._img_cache_cap = old_cap

    def test_racing_duplicate_insert_keeps_accounting_exact(self, engine):
        """Two prep threads can miss the same key concurrently and both
        insert; the overwrite must not double-count the byte budget."""
        from collections import OrderedDict

        class RaceOnce(OrderedDict):
            """get() misses once — the second thread's view before the
            first thread's insert became visible."""

            miss_once = True

            def get(self, key, default=None):
                if self.miss_once:
                    self.miss_once = False
                    return None
                return super().get(key, default)

        engine._img_cache.clear()
        engine._img_cache_bytes = 0
        raw = base64.b64decode(_png_b64())
        sz = engine._decode_image(raw).nbytes
        assert engine._img_cache_bytes == sz
        engine._img_cache = RaceOnce(engine._img_cache)
        engine._decode_image(raw)  # racing miss -> duplicate insert
        assert engine._img_cache_bytes == sz  # no drift
        assert len(engine._img_cache) == 1


def test_staged_buffers_released_after_generate():
    """prefill_insert drops the staged device operands once dispatched —
    a 64-slot wave otherwise pins ~1 GB of HBM it no longer needs."""
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=256, decode_chunk=8,
                        prefill_buckets=(64, 128, 256),
                        image_token_buckets=(16, 64), dtype=jnp.float32)
    eng = Engine(params, CFG, ByteTokenizer(), ecfg)
    prepared = eng.prepare(GenRequest(messages=_messages(), max_tokens=4,
                                      temperature=0.0, request_id="rel"))
    slot = eng.slot_free.index(True)
    eng.prefill_insert(slot, prepared)
    assert prepared.staged is None
    assert all(f["pix_dev"] is None and f["image_u8"] is None
               for f in prepared.image_feeds)
