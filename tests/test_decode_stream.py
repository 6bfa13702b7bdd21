"""Tests for the decode weight-stream megakernel (dense phases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.ops.decode_stream import (
    KT, MT, dense_stream, dense_stream_reference, pack_stream_params,
)
from karanta_tpu.ops.quantization import quantize_weight

L, B, H, QD, KVD, FF = 3, 8, 512, 512, 128, 512


def _tiny_layers(key):
    ks = iter(jax.random.split(key, 12))

    def dense(shape, scale=0.05):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(jnp.bfloat16)

    return {
        "ln1": 1.0 + 0.1 * dense((L, H), 1.0).astype(jnp.bfloat16),
        "ln2": 1.0 + 0.1 * dense((L, H), 1.0).astype(jnp.bfloat16),
        "attn": {
            "wq": quantize_weight(dense((L, H, QD))),
            "wk": quantize_weight(dense((L, H, KVD))),
            "wv": quantize_weight(dense((L, H, KVD))),
            "wo": quantize_weight(dense((L, QD, H))),
            "bq": dense((L, QD), 0.01),
            "bk": dense((L, KVD), 0.01),
            "bv": dense((L, KVD), 0.01),
        },
        "mlp": {
            "gate": quantize_weight(dense((L, H, FF))),
            "up": quantize_weight(dense((L, H, FF))),
            "down": quantize_weight(dense((L, FF, H))),
        },
    }


class TestDenseStream:
    def test_matches_reference(self):
        assert H % KT == 0 and FF % MT == 0
        layers = _tiny_layers(jax.random.PRNGKey(0))
        sp = pack_stream_params(layers)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, H),
                              jnp.bfloat16) * 0.5
        attn_out = jax.random.normal(jax.random.PRNGKey(2), (L, B, H),
                                     jnp.bfloat16) * 0.5
        ref_x, ref_qkv = dense_stream_reference(x, attn_out, sp)
        got_x, got_qkv = dense_stream(x, attn_out, sp, interpret=True)
        np.testing.assert_allclose(np.asarray(got_qkv, np.float32),
                                   np.asarray(ref_qkv, np.float32),
                                   rtol=0.05, atol=0.03)
        np.testing.assert_allclose(np.asarray(got_x, np.float32),
                                   np.asarray(ref_x, np.float32),
                                   rtol=0.05, atol=0.05)

    def test_pack_shapes(self):
        layers = _tiny_layers(jax.random.PRNGKey(0))
        sp = pack_stream_params(layers)
        qkvd = QD + 2 * KVD
        assert sp["wqkv"].shape == (L, H, qkvd)
        assert sp["wqkv"].dtype == jnp.int8
        assert sp["qs"].shape == (L, 1, qkvd)
        assert sp["bias"].shape == (L, 1, qkvd)
        assert sp["ln1"].shape == (L, 1, H)
        assert sp["wg_t"].shape == (L, FF, H)
        assert sp["gs"].shape == (L, 1, FF)
        assert sp["wd"].shape == (L, FF, H)
        assert sp["ds"].shape == (L, 1, H)


class TestMegakernel:
    """Full decode megakernel vs the existing decode_step (XLA dense path,
    int8 KV cache) on a tiny config."""

    def _setup(self, key=0):
        from karanta_tpu.models.qwen25_vl.config import TextConfig
        from karanta_tpu.models.qwen25_vl.decoder import (
            QuantKVCache, init_decoder_params,
        )
        from karanta_tpu.ops.quantization import quantize_decoder_params

        cfg = TextConfig(vocab_size=256, hidden_size=256, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=64,
                         intermediate_size=512, tie_word_embeddings=True,
                         mrope_section=(8, 12, 12))
        params = init_decoder_params(cfg, jax.random.PRNGKey(key),
                                     dtype=jnp.bfloat16)
        qparams = quantize_decoder_params({"layers": params["layers"],
                                           "embed": params["embed"],
                                           "final_norm": params["final_norm"]})
        batch, m = 4, 128
        cache = QuantKVCache.zeros(cfg, batch, m)
        return cfg, params, qparams, cache, batch, m

    def _fill_cache(self, cfg, qparams, cache, lens, batch):
        """Run real decode steps at increasing positions to fill the cache
        to `lens` rows per slot (masked by per-slot length)."""
        from karanta_tpu.models.qwen25_vl import decoder as dec

        maxlen = int(max(lens))
        rng = np.random.default_rng(7)
        for step in range(maxlen):
            embeds = jnp.asarray(
                rng.normal(size=(batch, 1, cfg.hidden_size)) * 0.3,
                jnp.bfloat16)
            pos = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (3, batch))
            clen = jnp.minimum(jnp.asarray(lens, jnp.int32), step)
            _, cache = dec.decode_step(qparams, cfg, embeds, pos, cache,
                                       clen)
        return cache

    def test_matches_decode_step(self):
        from karanta_tpu.models.qwen25_vl import decoder as dec
        from karanta_tpu.ops.decode_stream import decode_megakernel
        from karanta_tpu.ops.rotary import mrope_cos_sin

        cfg, params, qparams, cache, batch, m = self._setup()
        lens = [0, 5, 33, 100]
        # fill the cache with real rows below each slot's length
        cache = self._fill_cache(cfg, qparams, cache, lens, batch)
        cache_len = jnp.asarray(lens, jnp.int32)

        rng = np.random.default_rng(3)
        embeds = jnp.asarray(
            rng.normal(size=(batch, 1, cfg.hidden_size)) * 0.5, jnp.bfloat16)
        positions = jnp.broadcast_to(cache_len[None, :], (3, batch))

        ref_x, ref_cache = dec.decode_step(qparams, cfg, embeds, positions,
                                           cache, cache_len)

        sp = pack_stream_params(qparams["layers"])
        cos, sin = jax.vmap(
            lambda p: mrope_cos_sin(p[:, None], cfg.head_dim,
                                    cfg.mrope_section, cfg.rope_theta),
            in_axes=1, out_axes=0)(positions)
        cos = cos[:, 0, :]
        sin = sin[:, 0, :]
        x, k2, v2, ks2, vs2 = decode_megakernel(
            embeds[:, 0, :], cos, sin, sp, cache.k, cache.v, cache.ks,
            cache.vs, cache_len, qd=cfg.num_heads * cfg.head_dim,
            kvd=cfg.num_kv_heads * cfg.head_dim,
            eps=cfg.rms_norm_eps, interpret=True)
        from karanta_tpu.ops.norms import rms_norm
        x = rms_norm(x, qparams["final_norm"], cfg.rms_norm_eps)

        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(ref_x[:, 0], np.float32),
            rtol=0.06, atol=0.06)
        # pre-existing cache rows are untouched (bit-identical); the newly
        # appended row's DEQUANTIZED value must match the reference path
        # (raw int8/scale pairs differ by rounding: the kernel's K-tiled f32
        # qkv accumulation rounds differently from one fused XLA matmul)
        for qrow, srow, qref, sref in ((k2, ks2, ref_cache.k, ref_cache.ks),
                                       (v2, vs2, ref_cache.v, ref_cache.vs)):
            for b, ln in enumerate(lens):
                np.testing.assert_array_equal(
                    np.asarray(qrow[:, b, :, :ln]),
                    np.asarray(qref[:, b, :, :ln]))
                np.testing.assert_array_equal(
                    np.asarray(srow[:, b, :, :ln]),
                    np.asarray(sref[:, b, :, :ln]))
                got = (np.asarray(qrow[:, b, :, ln], np.float32)
                       * np.asarray(srow[:, b, :, ln], np.float32)[..., None])
                want = (np.asarray(qref[:, b, :, ln], np.float32)
                        * np.asarray(sref[:, b, :, ln],
                                     np.float32)[..., None])
                np.testing.assert_allclose(got, want, atol=0.05)
