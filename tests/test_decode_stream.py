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
