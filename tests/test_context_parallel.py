"""Context (sequence) parallelism: exactness vs the unsharded computation.

The reference has no SP (it caps context — SURVEY §5.7); these tests pin the
TPU-native seq-axis design: attention outputs, gradients, and full train-step
losses must match the unsharded path on the 8-device virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from karanta_tpu.ops.attention import attention
from karanta_tpu.parallel.context import make_context_parallel_attention
from karanta_tpu.parallel.mesh import MeshConfig, create_mesh


@pytest.fixture(scope="module")
def sp_mesh():
    assert len(jax.devices()) == 8
    return create_mesh(MeshConfig(data=2, fsdp=1, model=2, seq=2))


def _qkv(seed=0, b=2, s=64, h=4, kvh=2, d=16):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvh, d)), jnp.float32)
    return q, k, v


class TestContextParallelAttention:
    def test_forward_matches_unsharded(self, sp_mesh):
        q, k, v = _qkv()
        cp = make_context_parallel_attention(sp_mesh)
        got = jax.jit(lambda q, k, v: cp(q, k, v, causal=True))(q, k, v)
        want = attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_forward_with_mask(self, sp_mesh):
        q, k, v = _qkv(seed=1)
        mask = jnp.asarray(
            np.random.default_rng(2).integers(0, 2, size=(2, 64)), jnp.int32)
        # ensure at least one valid key per row (softmax over all -inf is
        # undefined either way; keep the comparison meaningful)
        mask = mask.at[:, 0].set(1)
        cp = make_context_parallel_attention(sp_mesh)
        got = jax.jit(lambda q, k, v, m: cp(q, k, v, kv_mask=m, causal=True))(
            q, k, v, mask)
        want = attention(q, k, v, kv_mask=mask, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_unsharded(self, sp_mesh):
        q, k, v = _qkv(seed=3)
        cp = make_context_parallel_attention(sp_mesh)

        def loss_cp(q, k, v):
            return (cp(q, k, v, causal=True) ** 2).sum()

        def loss_ref(q, k, v):
            return (attention(q, k, v, causal=True) ** 2).sum()

        g_cp = jax.jit(jax.grad(loss_cp, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_cp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-5, atol=5e-5)

    def test_indivisible_batch_falls_back_to_replicated(self, sp_mesh):
        # real training sees batches that don't divide the data axis (final
        # partial batch, B=1 vision rows); the specs must replicate batch
        # rather than reject the input (shard_map can't pad uneven axes)
        q, k, v = _qkv(seed=6, b=1)
        mask = jnp.ones((1, 64), jnp.int32)
        cp = make_context_parallel_attention(sp_mesh)
        got = jax.jit(lambda q, k, v, m: cp(q, k, v, kv_mask=m, causal=True))(
            q, k, v, mask)
        want = attention(q, k, v, kv_mask=mask, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_indivisible_sequence_raises(self, sp_mesh):
        q, k, v = _qkv(s=63)
        cp = make_context_parallel_attention(sp_mesh)
        with pytest.raises(ValueError, match="divide"):
            cp(q, k, v)

    def test_seq_axis_one_falls_through(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
        q, k, v = _qkv(seed=4)
        cp = make_context_parallel_attention(mesh)
        got = cp(q, k, v, causal=True)
        want = attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


class TestContextParallelTrainStep:
    def _batch(self, cfg, b=2, s=64):
        rng = np.random.default_rng(7)
        ids = rng.integers(12, cfg.text.vocab_size, size=(b, s)).astype(np.int32)
        labels = np.array(ids)
        labels[:, :8] = -100
        positions = np.tile(np.arange(s, dtype=np.int32), (3, b, 1))
        return {
            "token_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "positions": jnp.asarray(positions),
        }

    def test_loss_and_grads_match_unsharded(self, sp_mesh):
        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.model import init_params, param_axes
        from karanta_tpu.parallel.sharding import DEFAULT_RULES, shard_pytree
        from karanta_tpu.training.train_step import make_loss_fn

        cfg = tiny_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        batch = self._batch(cfg)

        loss_plain, _ = jax.jit(make_loss_fn(cfg))(params, batch)

        with sp_mesh:
            sharded = shard_pytree(params, param_axes(cfg), sp_mesh,
                                   DEFAULT_RULES)
            loss_fn_sp = make_loss_fn(cfg, sp_mesh=sp_mesh)
            loss_sp, _ = jax.jit(loss_fn_sp)(sharded, batch)
            grads_sp = jax.jit(jax.grad(lambda p, b: loss_fn_sp(p, b)[0]))(
                sharded, batch)
        grads_plain = jax.grad(lambda p, b: make_loss_fn(cfg)(p, b)[0])(
            params, batch)

        np.testing.assert_allclose(float(loss_sp), float(loss_plain),
                                   rtol=1e-5)
        flat_sp = jax.tree.leaves(grads_sp)
        flat_plain = jax.tree.leaves(grads_plain)
        assert len(flat_sp) == len(flat_plain)
        for a, b in zip(flat_sp, flat_plain):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_full_train_step_runs_sp(self, sp_mesh):
        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.model import init_params, param_axes
        from karanta_tpu.parallel.sharding import DEFAULT_RULES, shard_pytree
        from karanta_tpu.training.optimizer import make_optimizer
        from karanta_tpu.training.train_step import (create_train_state,
                                                     make_train_step)

        cfg = tiny_config()
        with sp_mesh:
            params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
            params = shard_pytree(params, param_axes(cfg), sp_mesh,
                                  DEFAULT_RULES)
            optimizer = make_optimizer("adamw", 1e-3)
            state = create_train_state(params, optimizer)
            step = jax.jit(make_train_step(cfg, optimizer, sp_mesh=sp_mesh))
            state, metrics = step(state, self._batch(cfg))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
