"""Attention custom-VJP parity: blockwise flash backward vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestAttentionGrad:
    """The custom VJP (blockwise flash backward) must match plain autodiff
    through the dense reference for every masking mode."""

    @pytest.mark.parametrize("causal,q_offset,with_mask,gqa", [
        (False, 0, False, False),
        (True, 0, False, False),
        (True, 0, True, True),
        (False, 0, True, True),
        (True, 5, True, False),
    ])
    def test_vjp_matches_reference_autodiff(self, causal, q_offset,
                                            with_mask, gqa):
        from karanta_tpu.ops.attention import attention, mha_reference

        rng = np.random.default_rng(17)
        B, SQ, SK, H, D = 2, 24, 29 + q_offset, 4, 16
        KVH = 2 if gqa else H
        q = jnp.asarray(rng.normal(size=(B, SQ, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, SK, KVH, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, SK, KVH, D)), jnp.float32)
        mask = None
        if with_mask:
            mask = (rng.random((B, SK)) > 0.2).astype(np.float32)
            mask[:, :4] = 1.0  # no fully-masked rows
            mask = jnp.asarray(mask)
        w = jnp.asarray(rng.normal(size=(B, SQ, H, D)), jnp.float32)

        def loss_custom(q, k, v):
            o = attention(q, k, v, kv_mask=mask, causal=causal,
                          q_offset=q_offset)
            return jnp.sum(o * w)

        def loss_ref(q, k, v):
            o = mha_reference(q, k, v, kv_mask=mask, causal=causal,
                              q_offset=q_offset)
            return jnp.sum(o * w)

        g_c = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_c, g_r, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4, err_msg=name)

    def test_vjp_under_jit_and_long_block_split(self):
        """Sk > backward block size: multi-block scan path."""
        from karanta_tpu.ops import attention as A

        rng = np.random.default_rng(3)
        B, S, H, D = 1, 700, 2, 8
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)

        f = jax.jit(jax.grad(
            lambda q: jnp.sum(A.attention(q, k, v, causal=True) ** 2)))
        g = jax.grad(
            lambda q: jnp.sum(A.mha_reference(q, k, v, causal=True) ** 2))(q)
        np.testing.assert_allclose(np.asarray(f(q)), np.asarray(g),
                                   atol=3e-5, rtol=1e-4)


class TestWindowAttentionGrad:
    def test_window_vjp_matches_dense_autodiff(self):
        """window_attention must be differentiable (the pallas kernel has no
        autodiff rule — training crashed through the vision tower without the
        custom VJP) and match dense block-diagonal autodiff."""
        from karanta_tpu.ops.attention import mha_reference, window_attention

        rng = np.random.default_rng(5)
        B, S, H, D, W = 1, 128, 2, 16, 32
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        mask = jnp.asarray((rng.random((B, S)) > 0.1).astype(np.float32))

        def loss_win(q, k, v):
            return jnp.sum(window_attention(q, k, v, window=W,
                                            kv_mask=mask) ** 2)

        def loss_dense(q, k, v):
            nw = S // W
            qb = q.reshape(nw, W, H, D)
            kb = k.reshape(nw, W, H, D)
            vb = v.reshape(nw, W, H, D)
            o = mha_reference(qb, kb, vb, kv_mask=mask.reshape(nw, W))
            return jnp.sum(o ** 2)

        g_w = jax.grad(loss_win, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_w, g_d, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4, err_msg=name)

    def test_grad_inside_nested_scans(self):
        """grad(vision-style layer scan) inside an outer micro-batch scan —
        the exact pattern of grad-accumulation training."""
        from karanta_tpu.ops.attention import window_attention

        rng = np.random.default_rng(6)
        x0 = jnp.asarray(rng.normal(size=(1, 64, 2, 8)), jnp.float32)
        ws = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)

        def loss(x, mb):
            def layer(h, w):
                o = window_attention(h, h, h, window=32)
                return (o @ w + mb.mean()).astype(h.dtype), None
            h, _ = jax.lax.scan(layer, x, ws)
            return jnp.sum(h ** 2)

        grad_fn = jax.value_and_grad(loss)

        @jax.jit
        def accum(x, mbs):
            def micro(acc, mb):
                l, g = grad_fn(x, mb)
                return jax.tree.map(jnp.add, acc, g), l
            acc, ls = jax.lax.scan(micro, jnp.zeros_like(x), mbs)
            return acc.sum() + ls.sum()

        out = accum(x0, jnp.asarray(rng.normal(size=(2, 3)), jnp.float32))
        assert np.isfinite(float(out))


def test_window_kernel_fused_rope_matches_reference():
    """Rope applied inside the window kernel == apply_rope + dense windows."""
    from karanta_tpu.ops.attention import (_window_attention_kernel_call,
                                           _window_reference)
    from karanta_tpu.ops.rotary import apply_rope, vision_rope_cos_sin

    rng = np.random.default_rng(0)
    B, S, H, D, W = 1, 512, 4, 80, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 40, size=(S, 2)), jnp.int32)
    cos, sin = vision_rope_cos_sin(pos, D)
    mask = jnp.asarray(rng.random(size=(B, S)) > 0.1, jnp.float32)
    qr, kr = apply_rope(q, k, cos[None].astype(q.dtype),
                        sin[None].astype(q.dtype))
    want = _window_reference(qr, kr, v, W, mask, None)
    got = _window_attention_kernel_call(q, k, v, W, kv_mask=mask,
                                        cos=cos[None], sin=sin[None],
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
