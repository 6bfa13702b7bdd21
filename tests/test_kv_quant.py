"""int8 KV cache: decode exactness vs manual dequantization, bounded error
vs the bf16 cache, engine end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.layout import mrope_positions
from karanta_tpu.models.qwen25_vl.model import init_params

CFG = tiny_config()


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), jnp.float32)["text"]


def _prompt(params, batch=2, s=6):
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 500, size=(batch, s))
    pos = np.stack([mrope_positions(r, [], CFG.image_token_id)
                    for r in ids], axis=1)
    emb = jax.vmap(lambda r: dec.embed_tokens(params, r))(jnp.asarray(ids))
    return ids, jnp.asarray(pos), emb


class TestQuantRows:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 2, 64)) * 5, jnp.float32)
        q, s = dec.quantize_kv_rows(x)
        back = q.astype(jnp.float32) * jnp.asarray(s, jnp.float32)[..., None]
        err = np.abs(np.asarray(back - x))
        amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
        # half-LSB rounding (amax/254) + bf16 scale rounding (~2^-8 relative)
        assert (err <= amax * 0.01 + 1e-6).all()


class TestQuantDecode:
    def test_decode_step_matches_manual_dequant(self, params):
        """decode_step on a QuantKVCache must equal decode_step on a bf16
        cache holding the DEQUANTIZED rows (same information)."""
        ids, pos, emb = self._setup_args = _prompt(params)
        _, pre = dec.prefill_forward(params, CFG.text, emb, pos)
        M = 16
        qc = dec.QuantKVCache.zeros(CFG.text, 2, M, jnp.float32)
        kq, ks = dec.quantize_kv_rows(pre.k)
        vq, vs = dec.quantize_kv_rows(pre.v)
        qc = dec.QuantKVCache(qc.k.at[:, :, :, :6].set(kq),
                              qc.v.at[:, :, :, :6].set(vq),
                              qc.ks.at[:, :, :, :6].set(ks),
                              qc.vs.at[:, :, :, :6].set(vs))
        # bf16 cache with dequantized rows
        deq_k = kq.astype(jnp.float32) * jnp.asarray(ks, jnp.float32)[..., None]
        deq_v = vq.astype(jnp.float32) * jnp.asarray(vs, jnp.float32)[..., None]
        fc = dec.KVCache.zeros(CFG.text, 2, M, jnp.float32)
        fc = dec.KVCache(fc.k.at[:, :, :, :6].set(deq_k),
                         fc.v.at[:, :, :, :6].set(deq_v))
        cache_len = jnp.full((2,), 6, jnp.int32)
        step_emb = emb[:, -1:]
        step_pos = pos[:, :, -1] + 1
        h_q, qc2 = dec.decode_step(params, CFG.text, step_emb, step_pos,
                                   qc, cache_len)
        h_f, _ = dec.decode_step(params, CFG.text, step_emb, step_pos,
                                 fc, cache_len)
        # the only difference: the NEW row is quantized in one path. small.
        np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_f),
                                   atol=2e-2, rtol=1e-2)
        assert isinstance(qc2, dec.QuantKVCache)
        assert qc2.k.dtype == jnp.int8

    def test_quant_decode_close_to_fullprec(self, params):
        """Greedy decode over the int8 cache must track the bf16 cache
        closely (hidden-state error bounded)."""
        ids, pos, emb = _prompt(params)
        _, pre = dec.prefill_forward(params, CFG.text, emb, pos)
        M = 16
        fc = dec.KVCache.zeros(CFG.text, 2, M, jnp.float32)
        fc = dec.KVCache(fc.k.at[:, :, :, :6].set(pre.k),
                         fc.v.at[:, :, :, :6].set(pre.v))
        qc = dec.QuantKVCache.zeros(CFG.text, 2, M, jnp.float32)
        kq, ks = dec.quantize_kv_rows(pre.k)
        vq, vs = dec.quantize_kv_rows(pre.v)
        qc = dec.QuantKVCache(qc.k.at[:, :, :, :6].set(kq),
                              qc.v.at[:, :, :, :6].set(vq),
                              qc.ks.at[:, :, :, :6].set(ks),
                              qc.vs.at[:, :, :, :6].set(vs))
        cache_len = jnp.full((2,), 6, jnp.int32)
        step_emb = emb[:, -1:]
        step_pos = pos[:, :, -1] + 1
        h_q, _ = dec.decode_step(params, CFG.text, step_emb, step_pos, qc,
                                 cache_len)
        h_f, _ = dec.decode_step(params, CFG.text, step_emb, step_pos, fc,
                                 cache_len)
        rel = (np.linalg.norm(np.asarray(h_q - h_f))
               / np.linalg.norm(np.asarray(h_f)))
        assert rel < 0.05, rel


class TestQuantEngine:
    def test_generate_end_to_end(self):
        from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        class NoStop(ByteTokenizer):
            def __init__(self):
                super().__init__()
                self.eos_token_id = -1

        tok = NoStop()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        eng = Engine(params, cfg, tok,
                     EngineConfig(max_batch_size=2, max_seq_len=128,
                                  decode_chunk=4, prefill_buckets=(128,),
                                  dtype=jnp.float32, kv_quantize="int8"))
        reqs = [GenRequest(messages=[{"role": "user", "content": f"page {i}"}],
                           max_tokens=10, temperature=0.0,
                           request_id=str(i)) for i in range(2)]
        out = eng.generate(reqs)
        assert all(len(r.token_ids) == 10 for r in out)
        assert isinstance(eng.cache, dec.QuantKVCache)

    def test_speculative_with_kv_quant(self):
        from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        class NoStop(ByteTokenizer):
            def __init__(self):
                super().__init__()
                self.eos_token_id = -1

        tok = NoStop()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        base = dict(max_batch_size=2, max_seq_len=128, decode_chunk=4,
                    prefill_buckets=(128,), dtype=jnp.float32,
                    kv_quantize="int8")
        plain = Engine(params, cfg, tok, EngineConfig(**base))
        spec = Engine(params, cfg, tok,
                      EngineConfig(**base, speculative_ngram=2))
        req = [GenRequest(messages=[{"role": "user",
                                     "content": "xyxyxyxyxyxy"}],
                          max_tokens=16, temperature=0.0, request_id="r")]
        a = plain.generate(req)[0]
        b = spec.generate(req)[0]
        assert a.token_ids == b.token_ids


class TestQ4Rows:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(3, 2, 64)) * 5, jnp.float32)
        q, s = dec.quantize_kv_rows_q4(x)
        assert int(np.abs(np.asarray(q)).max()) <= 7
        back = q.astype(jnp.float32) * jnp.asarray(s, jnp.float32)[..., None]
        err = np.abs(np.asarray(back - x))
        amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
        # half-LSB rounding at 4 bits (amax/14) + bf16 scale rounding
        assert (err <= amax * 0.08 + 1e-6).all()

    def test_q4_pack_prefill_pads_to_window(self):
        rng = np.random.default_rng(3)
        k = jnp.asarray(rng.normal(size=(2, 2, 70, 32)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, 2, 70, 32)), jnp.float32)
        k4, v4, ks, vs = dec.q4_pack_prefill(k, v)
        assert k4.shape == (2, 2, 64, 32)   # ceil64(70)=128 tokens -> 64 rows
        assert ks.shape == (2, 4, 64)
        kq, kscale = dec.quantize_kv_rows_q4(k)
        tok = dec.unpack_q4_rows(k4)[:, :, :70]
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(kq))
        sc = dec.unpack_q4_scales(ks)[:, :, :70]
        np.testing.assert_allclose(np.asarray(sc, np.float32),
                                   np.asarray(kscale, np.float32))


class TestQ4Decode:
    def test_decode_step_matches_manual_dequant(self, params):
        """decode_step on a Q4KVCache must equal decode_step on a bf16 cache
        holding the DEQUANTIZED nibbles (same information)."""
        ids, pos, emb = _prompt(params)
        _, pre = dec.prefill_forward(params, CFG.text, emb, pos)
        M = 64
        qc = dec.Q4KVCache.zeros(CFG.text, 2, M, jnp.float32)
        k4, v4, ks4, vs4 = dec.q4_pack_prefill(pre.k, pre.v)
        ps = k4.shape[-2]
        qc = dec.Q4KVCache(qc.k.at[:, :, :, :ps].set(k4),
                           qc.v.at[:, :, :, :ps].set(v4),
                           qc.ks.at[:, :, :, :ps].set(ks4),
                           qc.vs.at[:, :, :, :ps].set(vs4))
        kq, ks = dec.quantize_kv_rows_q4(pre.k)
        vq, vs = dec.quantize_kv_rows_q4(pre.v)
        deq_k = kq.astype(jnp.float32) * jnp.asarray(ks, jnp.float32)[..., None]
        deq_v = vq.astype(jnp.float32) * jnp.asarray(vs, jnp.float32)[..., None]
        fc = dec.KVCache.zeros(CFG.text, 2, M, jnp.float32)
        fc = dec.KVCache(fc.k.at[:, :, :, :6].set(deq_k),
                         fc.v.at[:, :, :, :6].set(deq_v))
        cache_len = jnp.full((2,), 6, jnp.int32)
        step_emb = emb[:, -1:]
        step_pos = pos[:, :, -1] + 1
        h_q, qc2 = dec.decode_step(params, CFG.text, step_emb, step_pos,
                                   qc, cache_len)
        h_f, _ = dec.decode_step(params, CFG.text, step_emb, step_pos,
                                 fc, cache_len)
        # the only difference: the NEW row is int4-quantized in one path
        np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_f),
                                   atol=2e-1, rtol=5e-2)
        assert isinstance(qc2, dec.Q4KVCache)
        assert qc2.k.shape[-2] == M // 2


class TestQ4Engine:
    def test_generate_end_to_end(self):
        from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        class NoStop(ByteTokenizer):
            def __init__(self):
                super().__init__()
                self.eos_token_id = -1

        tok = NoStop()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        eng = Engine(params, cfg, tok,
                     EngineConfig(max_batch_size=2, max_seq_len=128,
                                  decode_chunk=4, prefill_buckets=(128,),
                                  dtype=jnp.float32, kv_quantize="int4"))
        reqs = [GenRequest(messages=[{"role": "user", "content": f"page {i}"}],
                           max_tokens=10, temperature=0.0,
                           request_id=str(i)) for i in range(2)]
        out = eng.generate(reqs)
        assert all(len(r.token_ids) == 10 for r in out)
        assert isinstance(eng.cache, dec.Q4KVCache)
        assert eng.cache.k.shape[-2] == 64   # nibble-packed rows

    def test_speculative_with_q4(self):
        """Speculation over the int4 KV cache (greedy, exact): same tokens
        as the non-speculative int4 engine."""
        from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        class NoStop(ByteTokenizer):
            def __init__(self):
                super().__init__()
                self.eos_token_id = -1

        tok = NoStop()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        base = dict(max_batch_size=2, max_seq_len=128, decode_chunk=4,
                    prefill_buckets=(128,), dtype=jnp.float32,
                    kv_quantize="int4")
        plain = Engine(params, cfg, tok, EngineConfig(**base))
        spec = Engine(params, cfg, tok,
                      EngineConfig(**base, speculative_ngram=2))
        req = [GenRequest(messages=[{"role": "user",
                                     "content": "xyxyxyxyxyxy"}],
                          max_tokens=16, temperature=0.0, request_id="r")]
        a = plain.generate(req)[0]
        b = spec.generate(req)[0]
        assert a.token_ids == b.token_ids

    def test_speculative_q4_small_bucket_rejected(self):
        from karanta_tpu.inference.engine import Engine, EngineConfig
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        with pytest.raises(ValueError, match="128"):
            Engine(params, cfg, tok,
                   EngineConfig(max_batch_size=2, max_seq_len=64,
                                dtype=jnp.float32, kv_quantize="int4",
                                speculative_ngram=2))

    def test_unaligned_bucket_rejected(self):
        """int4 buckets >= 256 must be 256-aligned (the append kernel's
        scale slab is a full 128-lane tile of packed rows)."""
        from karanta_tpu.inference.engine import Engine, EngineConfig
        from karanta_tpu.inference.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
        params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        with pytest.raises(ValueError, match="256"):
            Engine(params, cfg, tok,
                   EngineConfig(max_batch_size=2, max_seq_len=320,
                                dtype=jnp.float32, kv_quantize="int4"))
