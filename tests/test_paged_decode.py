"""Paged decode-attention kernel: parity with the masked dense path."""

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
