"""Paged decode-attention kernel: parity with the masked dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.ops.attention import decode_attention
from karanta_tpu.ops.decode_attention import paged_decode_attention


@pytest.mark.parametrize("lens", [[5, 200, 511, 0], [63, 64, 65, 255]])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_masked_dense(lens, dtype):
    rng = np.random.default_rng(0)
    B, M, H, KVH, D = 4, 512, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), dtype)
    k = jnp.asarray(rng.normal(size=(B, KVH, M, D)), dtype)
    v = jnp.asarray(rng.normal(size=(B, KVH, M, D)), dtype)
    cache_len = jnp.asarray(lens, jnp.int32)
    kv_mask = (jnp.arange(M)[None, :] <= cache_len[:, None]).astype(jnp.float32)

    ref = decode_attention(q, k, v, kv_mask)
    out = paged_decode_attention(q, k, v, cache_len, block=128, interpret=True)
    atol = 3e-6 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=atol)


@pytest.mark.parametrize("layer", [0, 2])
def test_stacked_matches_sliced(layer):
    from karanta_tpu.ops.decode_attention import paged_decode_attention_stacked

    rng = np.random.default_rng(1)
    L, B, M, H, KVH, D = 3, 4, 256, 8, 2, 64
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
    lens = jnp.asarray([5, 100, 255, 64], jnp.int32)
    out, k2, v2 = paged_decode_attention_stacked(q, k, v, jnp.asarray(layer),
                                                 lens, block=128,
                                                 interpret=True)
    ref = paged_decode_attention(q, k[layer], v[layer], lens, block=128,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k))  # untouched
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_stacked_inside_layer_scan():
    """The kernel must compile inside a lax.scan over layers (this pattern
    previously tripped an MLIR lowering-cache bug)."""
    from karanta_tpu.ops.decode_attention import paged_decode_attention_stacked

    rng = np.random.default_rng(2)
    L, B, M, H, KVH, D = 3, 2, 128, 4, 2, 32
    q0 = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
    lens = jnp.asarray([5, 100], jnp.int32)

    @jax.jit
    def run(q0, k, v):
        def body(carry, l):
            q, kk, vv = carry
            o, kk, vv = paged_decode_attention_stacked(q, kk, vv, l, lens,
                                                       block=128,
                                                       interpret=True)
            return (o, kk, vv), ()
        (q, _, _), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
        return q

    out = run(q0, k, v)
    # reference: sequential python loop
    ref = q0
    for l in range(L):
        ref, k, v = paged_decode_attention_stacked(ref, k, v, jnp.asarray(l),
                                                   lens, block=128,
                                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


class TestAppendKernel:
    def _setup(self, lens, L=2, B=4, M=256, H=8, KVH=2, D=64, seed=5):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
        nk = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32)
        nv = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32)
        return q, nk, nv, k, v, jnp.asarray(lens, jnp.int32)

    @pytest.mark.parametrize("lens", [[0, 5, 200, 255], [64, 64, 63, 1]])
    @pytest.mark.parametrize("layer", [0, 1])
    @pytest.mark.parametrize("spp", [1, 2, 4])
    def test_matches_scatter_plus_dense(self, lens, layer, spp):
        from karanta_tpu.ops.decode_attention import paged_decode_append

        q, nk, nv, k, v, lens = self._setup(lens)
        B, M = q.shape[0], k.shape[3]
        attn, k2, v2 = paged_decode_append(q, nk, nv, k, v,
                                           jnp.asarray(layer), lens,
                                           block=128, spp=spp,
                                           interpret=True)
        # reference: scatter then masked dense attention on that layer
        bidx = jnp.arange(B)
        k_ref = k.at[layer, bidx, :, lens].set(nk)
        v_ref = v.at[layer, bidx, :, lens].set(nv)
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        want = decode_attention(q, k_ref[layer], v_ref[layer], mask)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=3e-6)
        # cache rows written, other layers untouched
        np.testing.assert_allclose(np.asarray(k2), np.asarray(k_ref), atol=0)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref), atol=0)

    def test_inside_layer_scan_matches_loop(self):
        from karanta_tpu.ops.decode_attention import paged_decode_append

        q, nk, nv, k, v, lens = self._setup([3, 7, 100, 250])
        L = k.shape[0]

        @jax.jit
        def scan_run(q, k, v):
            def body(carry, l):
                qq, kk, vv = carry
                a, kk, vv = paged_decode_append(qq, nk, nv, kk, vv, l, lens,
                                                block=128, interpret=True)
                return (a, kk, vv), ()
            (a, kk, vv), _ = jax.lax.scan(body, (q, k, v), jnp.arange(L))
            return a, kk, vv

        a_s, k_s, v_s = scan_run(q, k, v)
        a_l, k_l, v_l = q, k, v
        for l in range(L):
            a_l, k_l, v_l = paged_decode_append(a_l, nk, nv, k_l, v_l,
                                                jnp.asarray(l), lens,
                                                block=128, interpret=True)
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_l), atol=1e-6)
        np.testing.assert_allclose(np.asarray(k_s), np.asarray(k_l), atol=0)


def test_decode_step_append_integration(monkeypatch):
    """decode_step wired to the fused append kernel (forced interpret mode)
    must match the default scatter+dense path bit-for-bit in f32."""
    import karanta_tpu.models.qwen25_vl.decoder as dec
    from karanta_tpu.models.qwen25_vl.config import get_config

    cfg = get_config("tiny").text
    params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0),
                                     dtype=jnp.float32)["layers"]
    params = {"layers": params, "embed": dec.init_decoder_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32)["embed"],
        "final_norm": jnp.ones((cfg.hidden_size,), jnp.float32)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dec.init_decoder_params(
            cfg, jax.random.PRNGKey(0), dtype=jnp.float32)["lm_head"]

    B, M = 2, 64
    rng = np.random.default_rng(0)
    cache0 = dec.KVCache(
        jnp.asarray(rng.normal(size=(cfg.num_layers, B, cfg.num_kv_heads, M,
                                     cfg.head_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(cfg.num_layers, B, cfg.num_kv_heads, M,
                                     cfg.head_dim)), jnp.float32))
    emb = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 40, size=(3, B)), jnp.int32)
    lens = jnp.asarray([7, 33], jnp.int32)

    h_ref, c_ref = dec.decode_step(params, cfg, emb, pos, cache0, lens)
    monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
    h_pag, c_pag = dec.decode_step(params, cfg, emb, pos, cache0, lens)

    np.testing.assert_allclose(np.asarray(h_pag), np.asarray(h_ref),
                               atol=2e-5, rtol=2e-5)
    # caches agree on all live rows + the newly written row (dead rows differ:
    # the dense path leaves them as-is, the kernel also leaves them — equal)
    np.testing.assert_allclose(np.asarray(c_pag.k), np.asarray(c_ref.k),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pag.v), np.asarray(c_ref.v),
                               atol=1e-6)


class TestAppendQuantKernel:
    def test_matches_quant_dense(self):
        from karanta_tpu.models.qwen25_vl.decoder import quantize_kv_rows
        from karanta_tpu.ops.decode_attention import paged_decode_append_quant

        rng = np.random.default_rng(7)
        L, B, M, H, KVH, D = 2, 4, 256, 8, 2, 64
        q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
        kq, ks = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32))
        vq, vs = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32))
        nkq, nks = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32))
        nvq, nvs = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32))
        lens = jnp.asarray([0, 5, 200, 255], jnp.int32)
        attn, k2, v2, ks2, vs2 = paged_decode_append_quant(
            q, nkq, nvq, nks, nvs, kq, vq, ks, vs, jnp.asarray(0), lens,
            block=128, interpret=True)
        bidx = jnp.arange(B)
        kq_ref = kq.at[0, bidx, :, lens].set(nkq)
        vq_ref = vq.at[0, bidx, :, lens].set(nvq)
        ks_ref = ks.at[0, bidx, :, lens].set(nks)
        vs_ref = vs.at[0, bidx, :, lens].set(nvs)
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        want = decode_attention(q, kq_ref[0], vq_ref[0], mask,
                                k_scale=ks_ref[0], v_scale=vs_ref[0])
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=5e-3)
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(kq_ref))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vq_ref))
        np.testing.assert_array_equal(np.asarray(ks2), np.asarray(ks_ref))
        np.testing.assert_array_equal(np.asarray(vs2), np.asarray(vs_ref))

    @pytest.mark.parametrize("tq,lens", [
        (3, [0, 5, 200, 248]),
        (5, [31, 32, 63, 127]),
    ])
    def test_multi_matches_scatter_plus_multi_dense(self, tq, lens):
        """The fused multi-token (speculative-verify) kernel vs scatter +
        decode_attention_multi: attention and all four cache buffers."""
        from karanta_tpu.models.qwen25_vl.decoder import quantize_kv_rows
        from karanta_tpu.ops.attention import decode_attention_multi
        from karanta_tpu.ops.decode_attention import (
            paged_decode_append_multi_quant,
        )

        rng = np.random.default_rng(11)
        L, B, M, H, KVH, D = 2, 4, 256, 8, 2, 64
        q = jnp.asarray(rng.normal(size=(B, tq, H, D)), jnp.float32)
        kq, ks = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32))
        vq, vs = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.float32))
        nkq, nks = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(B, tq, KVH, D)), jnp.float32))
        nvq, nvs = quantize_kv_rows(
            jnp.asarray(rng.normal(size=(B, tq, KVH, D)), jnp.float32))
        lens = jnp.asarray(lens, jnp.int32)
        attn, k2, v2, ks2, vs2 = paged_decode_append_multi_quant(
            q, nkq, nvq, nks, nvs, kq, vq, ks, vs, jnp.asarray(1), lens,
            block=128, interpret=True)
        bidx = jnp.arange(B)[:, None]
        wpos = lens[:, None] + jnp.arange(tq)[None]
        kq_ref = kq.at[1, bidx, :, wpos].set(nkq)
        vq_ref = vq.at[1, bidx, :, wpos].set(nvq)
        ks_ref = ks.at[1, bidx, :, wpos].set(nks)
        vs_ref = vs.at[1, bidx, :, wpos].set(nvs)
        want = decode_attention_multi(q, kq_ref[1], vq_ref[1], lens,
                                      k_scale=ks_ref[1], v_scale=vs_ref[1])
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=5e-3)
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(kq_ref))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(vq_ref))
        np.testing.assert_allclose(np.asarray(ks2), np.asarray(ks_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref),
                                   atol=1e-6)

    def test_decode_multi_quant_append_integration(self, monkeypatch):
        """decode_multi on a QuantKVCache with the fused multi kernel
        matches the default XLA scatter path."""
        import karanta_tpu.models.qwen25_vl.decoder as dec
        from karanta_tpu.models.qwen25_vl.config import get_config

        cfg = get_config("tiny").text
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32)
        B, M, T = 2, 64, 4
        rng = np.random.default_rng(3)
        cache0 = dec.QuantKVCache.zeros(cfg, B, M, jnp.float32)
        cache0 = dec.QuantKVCache(
            jnp.asarray(rng.integers(-127, 127, size=cache0.k.shape),
                        jnp.int8),
            jnp.asarray(rng.integers(-127, 127, size=cache0.v.shape),
                        jnp.int8),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.ks.shape),
                        jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.vs.shape),
                        jnp.float32))
        emb = jnp.asarray(rng.normal(size=(B, T, cfg.hidden_size)),
                          jnp.float32)
        pos = jnp.asarray(rng.integers(0, 40, size=(3, B, T)), jnp.int32)
        lens = jnp.asarray([7, 33], jnp.int32)

        monkeypatch.setattr(dec, "_PAGED_FORCE", ("", False))
        h_ref, c_ref = dec.decode_multi(params, cfg, emb, pos, cache0, lens)
        monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
        h_pag, c_pag = dec.decode_multi(params, cfg, emb, pos, cache0, lens)

        np.testing.assert_allclose(np.asarray(h_pag), np.asarray(h_ref),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_pag.k),
                                      np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_pag.v),
                                      np.asarray(c_ref.v))
        np.testing.assert_allclose(np.asarray(c_pag.ks),
                                   np.asarray(c_ref.ks), atol=1e-6)

    def test_decode_step_quant_append_integration(self, monkeypatch):
        """decode_step on a QuantKVCache with the fused quant kernel matches
        the default XLA quant path."""
        import karanta_tpu.models.qwen25_vl.decoder as dec
        from karanta_tpu.models.qwen25_vl.config import get_config

        cfg = get_config("tiny").text
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
        B, M = 2, 64
        rng = np.random.default_rng(0)
        cache0 = dec.QuantKVCache.zeros(cfg, B, M, jnp.float32)
        cache0 = dec.QuantKVCache(
            jnp.asarray(rng.integers(-127, 127, size=cache0.k.shape),
                        jnp.int8),
            jnp.asarray(rng.integers(-127, 127, size=cache0.v.shape),
                        jnp.int8),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.ks.shape),
                        jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.vs.shape),
                        jnp.float32))
        emb = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)),
                          jnp.float32)
        pos = jnp.asarray(rng.integers(0, 40, size=(3, B)), jnp.int32)
        lens = jnp.asarray([7, 33], jnp.int32)

        h_ref, c_ref = dec.decode_step(params, cfg, emb, pos, cache0, lens)
        monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
        h_pag, c_pag = dec.decode_step(params, cfg, emb, pos, cache0, lens)

        np.testing.assert_allclose(np.asarray(h_pag), np.asarray(h_ref),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_pag.k),
                                      np.asarray(c_ref.k))
        np.testing.assert_allclose(np.asarray(c_pag.ks),
                                   np.asarray(c_ref.ks), atol=1e-6)


def test_paged_mode_auto_selection(monkeypatch):
    """Auto gate: dense below 8192-row buckets, fused kernel at/above;
    env overrides win."""
    import karanta_tpu.models.qwen25_vl.decoder as dec

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("KARANTA_PAGED_DECODE", raising=False)
    assert dec._paged_decode_mode(4096) == ""
    assert dec._paged_decode_mode(8192) == "append"
    monkeypatch.setenv("KARANTA_PAGED_DECODE", "0")
    assert dec._paged_decode_mode(16384) == ""
    monkeypatch.setenv("KARANTA_PAGED_DECODE", "1")
    assert dec._paged_decode_mode(1024) == "append"
    monkeypatch.setenv("KARANTA_PAGED_DECODE", "stacked")
    assert dec._paged_decode_mode(1024) == "stacked"


class TestAppendQ4Kernel:
    def test_pack_roundtrip(self):
        from karanta_tpu.models.qwen25_vl import decoder as dec

        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.integers(-7, 8, size=(2, 3, 128, 32)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.01, 1.0, size=(2, 3, 128)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(dec.unpack_q4_rows(dec.pack_q4_rows(q))),
            np.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(dec.unpack_q4_scales(dec.pack_q4_scales(s))),
            np.asarray(s))

    def test_matches_q4_dense(self):
        from karanta_tpu.models.qwen25_vl import decoder as dec
        from karanta_tpu.ops.decode_attention import paged_decode_append_q4

        rng = np.random.default_rng(13)
        L, B, M, H, KVH, D = 2, 4, 256, 8, 2, 64
        q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.float32)
        # token-ordered nibble cache + scales, then packed storage
        k_tok = jnp.asarray(rng.integers(-7, 8, size=(L, B, KVH, M, D)),
                            jnp.int8)
        v_tok = jnp.asarray(rng.integers(-7, 8, size=(L, B, KVH, M, D)),
                            jnp.int8)
        ks_tok = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, B, KVH, M)),
                             jnp.float32)
        vs_tok = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, B, KVH, M)),
                             jnp.float32)
        nkq, nks = dec.quantize_kv_rows_q4(
            jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32))
        nvq, nvs = dec.quantize_kv_rows_q4(
            jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.float32))
        nks = nks.astype(jnp.float32)
        nvs = nvs.astype(jnp.float32)
        lens = jnp.asarray([0, 5, 200, 255], jnp.int32)

        attn, k2, v2, ks2, vs2 = paged_decode_append_q4(
            q, nkq, nvq, nks, nvs,
            dec.pack_q4_rows(k_tok), dec.pack_q4_rows(v_tok),
            dec.pack_q4_scales(ks_tok), dec.pack_q4_scales(vs_tok),
            jnp.asarray(0), lens, block=128, interpret=True)

        bidx = jnp.arange(B)
        k_ref = k_tok.at[0, bidx, :, lens].set(nkq)
        v_ref = v_tok.at[0, bidx, :, lens].set(nvq)
        ks_ref = ks_tok.at[0, bidx, :, lens].set(nks)
        vs_ref = vs_tok.at[0, bidx, :, lens].set(nvs)
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        want = decode_attention(q, k_ref[0], v_ref[0], mask,
                                k_scale=ks_ref[0], v_scale=vs_ref[0])
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=5e-3)
        np.testing.assert_array_equal(np.asarray(k2),
                                      np.asarray(dec.pack_q4_rows(k_ref)))
        np.testing.assert_array_equal(np.asarray(v2),
                                      np.asarray(dec.pack_q4_rows(v_ref)))
        np.testing.assert_allclose(np.asarray(ks2),
                                   np.asarray(dec.pack_q4_scales(ks_ref)),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs2),
                                   np.asarray(dec.pack_q4_scales(vs_ref)),
                                   atol=1e-6)

    def test_decode_step_q4_append_integration(self, monkeypatch):
        """decode_step on a Q4KVCache with the fused kernel matches the
        dense nibble-RMW fallback path."""
        import karanta_tpu.models.qwen25_vl.decoder as dec
        from karanta_tpu.models.qwen25_vl.config import get_config

        cfg = get_config("tiny").text
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(0),
                                         dtype=jnp.float32)
        B, M = 2, 128
        rng = np.random.default_rng(17)
        cache0 = dec.Q4KVCache(
            jnp.asarray(rng.integers(-128, 128,
                                     size=(cfg.num_layers, B,
                                           cfg.num_kv_heads, M // 2,
                                           cfg.head_dim)), jnp.int8),
            jnp.asarray(rng.integers(-128, 128,
                                     size=(cfg.num_layers, B,
                                           cfg.num_kv_heads, M // 2,
                                           cfg.head_dim)), jnp.int8),
            jnp.asarray(rng.uniform(0.01, 0.1,
                                    size=(cfg.num_layers, B,
                                          2 * cfg.num_kv_heads, M // 2)),
                        jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1,
                                    size=(cfg.num_layers, B,
                                          2 * cfg.num_kv_heads, M // 2)),
                        jnp.float32))
        emb = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)),
                          jnp.float32)
        pos = jnp.asarray(rng.integers(0, 40, size=(3, B)), jnp.int32)
        lens = jnp.asarray([7, 97], jnp.int32)

        h_ref, c_ref = dec.decode_step(params, cfg, emb, pos, cache0, lens)
        monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
        h_pag, c_pag = dec.decode_step(params, cfg, emb, pos, cache0, lens)

        np.testing.assert_allclose(np.asarray(h_pag), np.asarray(h_ref),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_pag.k),
                                      np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_pag.v),
                                      np.asarray(c_ref.v))
        np.testing.assert_allclose(np.asarray(c_pag.ks),
                                   np.asarray(c_ref.ks), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_pag.vs),
                                   np.asarray(c_ref.vs), atol=1e-6)


class TestAppendMultiQ4Kernel:
    @pytest.mark.parametrize("tq,lens", [
        (3, [0, 5, 200, 248]),
        (5, [31, 32, 63, 127]),
        (4, [60, 62, 95, 126]),   # spans crossing the 64-token window
    ])
    def test_multi_q4_matches_scatter_plus_multi_dense(self, tq, lens):
        """The fused multi-token int4 kernel vs token-ordered scatter +
        decode_attention_multi: attention and all four packed buffers."""
        from karanta_tpu.models.qwen25_vl import decoder as dec
        from karanta_tpu.ops.attention import decode_attention_multi
        from karanta_tpu.ops.decode_attention import (
            paged_decode_append_multi_q4,
        )

        rng = np.random.default_rng(17)
        L, B, M, H, KVH, D = 2, 4, 256, 8, 2, 64
        q = jnp.asarray(rng.normal(size=(B, tq, H, D)), jnp.float32)
        k_tok = jnp.asarray(rng.integers(-7, 8, size=(L, B, KVH, M, D)),
                            jnp.int8)
        v_tok = jnp.asarray(rng.integers(-7, 8, size=(L, B, KVH, M, D)),
                            jnp.int8)
        ks_tok = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, B, KVH, M)),
                             jnp.float32)
        vs_tok = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, B, KVH, M)),
                             jnp.float32)
        nkq, nks = dec.quantize_kv_rows_q4(
            jnp.asarray(rng.normal(size=(B, tq, KVH, D)), jnp.float32))
        nvq, nvs = dec.quantize_kv_rows_q4(
            jnp.asarray(rng.normal(size=(B, tq, KVH, D)), jnp.float32))
        nks = nks.astype(jnp.float32)
        nvs = nvs.astype(jnp.float32)
        lens = jnp.asarray(lens, jnp.int32)

        attn, k2, v2, ks2, vs2 = paged_decode_append_multi_q4(
            q, nkq, nvq, nks, nvs,
            dec.pack_q4_rows(k_tok), dec.pack_q4_rows(v_tok),
            dec.pack_q4_scales(ks_tok), dec.pack_q4_scales(vs_tok),
            jnp.asarray(1), lens, block=128, interpret=True)

        bidx = jnp.arange(B)[:, None]
        wpos = lens[:, None] + jnp.arange(tq)[None]
        k_ref = k_tok.at[1, bidx, :, wpos].set(nkq)
        v_ref = v_tok.at[1, bidx, :, wpos].set(nvq)
        ks_ref = ks_tok.at[1, bidx, :, wpos].set(nks)
        vs_ref = vs_tok.at[1, bidx, :, wpos].set(nvs)
        want = decode_attention_multi(q, k_ref[1], v_ref[1], lens,
                                      k_scale=ks_ref[1], v_scale=vs_ref[1])
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=5e-3)
        np.testing.assert_array_equal(
            np.asarray(k2), np.asarray(dec.pack_q4_rows(k_ref)))
        np.testing.assert_array_equal(
            np.asarray(v2), np.asarray(dec.pack_q4_rows(v_ref)))
        np.testing.assert_allclose(
            np.asarray(ks2), np.asarray(dec.pack_q4_scales(ks_ref)),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs2), np.asarray(dec.pack_q4_scales(vs_ref)),
            atol=1e-6)

    def test_decode_multi_q4_append_integration(self, monkeypatch):
        """decode_multi on a Q4KVCache with the fused multi kernel matches
        the XLA nibble-RMW fallback path."""
        import karanta_tpu.models.qwen25_vl.decoder as dec
        from karanta_tpu.models.qwen25_vl.config import get_config

        cfg = get_config("tiny").text
        params = dec.init_decoder_params(cfg, jax.random.PRNGKey(1),
                                         dtype=jnp.float32)
        B, M, T = 2, 128, 4
        rng = np.random.default_rng(5)
        cache0 = dec.Q4KVCache.zeros(cfg, B, M, jnp.float32)
        cache0 = dec.Q4KVCache(
            jnp.asarray(rng.integers(-127, 127, size=cache0.k.shape),
                        jnp.int8),
            jnp.asarray(rng.integers(-127, 127, size=cache0.v.shape),
                        jnp.int8),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.ks.shape),
                        jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1, size=cache0.vs.shape),
                        jnp.float32))
        emb = jnp.asarray(rng.normal(size=(B, T, cfg.hidden_size)),
                          jnp.float32)
        pos = jnp.asarray(rng.integers(0, 40, size=(3, B, T)), jnp.int32)
        lens = jnp.asarray([7, 62], jnp.int32)  # second spans a window edge

        monkeypatch.setattr(dec, "_PAGED_FORCE", ("", False))
        h_ref, c_ref = dec.decode_multi(params, cfg, emb, pos, cache0, lens)
        monkeypatch.setattr(dec, "_PAGED_FORCE", ("append", True))
        h_pag, c_pag = dec.decode_multi(params, cfg, emb, pos, cache0, lens)

        np.testing.assert_allclose(np.asarray(h_pag), np.asarray(h_ref),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_pag.k),
                                      np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_pag.v),
                                      np.asarray(c_ref.v))
        np.testing.assert_allclose(np.asarray(c_pag.ks),
                                   np.asarray(c_ref.ks), atol=1e-6)
        np.testing.assert_allclose(np.asarray(c_pag.vs),
                                   np.asarray(c_ref.vs), atol=1e-6)
