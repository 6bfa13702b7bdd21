"""Pipeline parallelism (GPipe over the "pipe" mesh axis): exactness vs the
plain layer scan, schedule correctness, and gradients.

The reference has no PP (SURVEY §2.9 — absent); these tests pin the
TPU-native design in parallel/pipeline.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from karanta_tpu.parallel.mesh import MeshConfig, create_mesh
from karanta_tpu.parallel.pipeline import pipeline_apply


@pytest.fixture(scope="module")
def pp_mesh():
    assert len(jax.devices()) == 8
    return create_mesh(MeshConfig(data=2, fsdp=1, model=1, pipe=4))


@pytest.fixture(scope="module")
def pp2_mesh():
    return create_mesh(MeshConfig(data=2, fsdp=1, model=2, pipe=2))


class TestPipelineSchedule:
    def _toy(self, n_layers=8, b=8, h=16, seed=0):
        rng = np.random.default_rng(seed)
        layers = {
            "w": jnp.asarray(rng.standard_normal((n_layers, h, h)) * 0.1,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal((n_layers, h)) * 0.1,
                             jnp.float32),
        }
        x = jnp.asarray(rng.standard_normal((b, 4, h)), jnp.float32)
        extras = {"scale": jnp.asarray(
            rng.standard_normal((b, 4, 1)) * 0.1 + 1.0, jnp.float32)}

        def layer_fn(a, lyr, ext):
            return jnp.tanh(a @ lyr["w"] + lyr["b"]) * ext["scale"]

        return layer_fn, layers, x, extras

    def _reference(self, layer_fn, layers, x, extras):
        def body(a, lyr):
            return layer_fn(a, lyr, extras), None
        out, _ = jax.lax.scan(body, x, layers)
        return out

    @pytest.mark.parametrize("n_micro", [1, 2, 4])
    def test_matches_plain_scan(self, pp_mesh, n_micro):
        layer_fn, layers, x, extras = self._toy()
        got = jax.jit(lambda l, x, e: pipeline_apply(
            pp_mesh, layer_fn, l, x, e, n_micro))(layers, x, extras)
        want = self._reference(layer_fn, layers, x, extras)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, pp_mesh):
        layer_fn, layers, x, extras = self._toy(seed=3)

        def loss_pp(layers, x):
            return (pipeline_apply(pp_mesh, layer_fn, layers, x, extras,
                                   n_micro=2) ** 2).sum()

        def loss_ref(layers, x):
            return (self._reference(layer_fn, layers, x, extras) ** 2).sum()

        g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(layers, x)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(layers, x)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_indivisible_batch_falls_back_to_replicated(self, pp_mesh):
        layer_fn, layers, _, _ = self._toy()
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((3, 4, 16)), jnp.float32)
        extras = {"scale": jnp.asarray(
            rng.standard_normal((3, 4, 1)) * 0.1 + 1.0, jnp.float32)}
        got = jax.jit(lambda l, x, e: pipeline_apply(
            pp_mesh, layer_fn, l, x, e, n_micro=3))(layers, x, extras)
        want = self._reference(layer_fn, layers, x, extras)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_layers_must_divide_stages(self, pp_mesh):
        layer_fn, layers, x, extras = self._toy(n_layers=6)
        with pytest.raises(ValueError, match="divide"):
            pipeline_apply(pp_mesh, layer_fn, layers, x, extras, 2)

    def test_pipe_one_falls_through(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
        layer_fn, layers, x, extras = self._toy(seed=5)
        got = pipeline_apply(mesh, layer_fn, layers, x, extras, 2)
        want = self._reference(layer_fn, layers, x, extras)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


class TestPipelineDecoder:
    def _inputs(self, cfg, b=4, s=32, seed=11):
        rng = np.random.default_rng(seed)
        embeds = jnp.asarray(
            rng.standard_normal((b, s, cfg.text.hidden_size)) * 0.05,
            jnp.float32)
        positions = jnp.asarray(
            np.tile(np.arange(s, dtype=np.int32), (3, b, 1)))
        return embeds, positions

    def test_decoder_matches_prefill_forward(self, pp2_mesh):
        from karanta_tpu.models.qwen25_vl import decoder as dec
        from karanta_tpu.models.qwen25_vl.config import tiny_config

        cfg = tiny_config()
        # tiny has 3 layers; pad to 4 stagesx1 by using a 4-layer variant
        import dataclasses
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, num_layers=4))
        params = dec.init_decoder_params(cfg.text, jax.random.PRNGKey(0),
                                         jnp.float32)
        embeds, positions = self._inputs(cfg)

        want, _ = dec.prefill_forward(params, cfg.text, embeds, positions)
        got = jax.jit(lambda p, e, pos: dec.pipeline_prefill_forward(
            p, cfg.text, e, pos, pp2_mesh, n_micro=2))(
                params, embeds, positions)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_decoder_grads_match(self, pp2_mesh):
        from karanta_tpu.models.qwen25_vl import decoder as dec
        from karanta_tpu.models.qwen25_vl.config import tiny_config
        import dataclasses

        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, num_layers=4))
        params = dec.init_decoder_params(cfg.text, jax.random.PRNGKey(1),
                                         jnp.float32)
        embeds, positions = self._inputs(cfg, seed=13)

        def loss_pp(p):
            out = dec.pipeline_prefill_forward(
                p, cfg.text, embeds, positions, pp2_mesh, n_micro=2)
            return (out ** 2).mean()

        def loss_ref(p):
            out, _ = dec.prefill_forward(p, cfg.text, embeds, positions)
            return (out ** 2).mean()

        g_pp = jax.jit(jax.grad(loss_pp))(params)
        g_ref = jax.grad(loss_ref)(params)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)


class TestPipelineTrainStep:
    def test_full_train_step_matches_unsharded(self, pp2_mesh):
        import dataclasses

        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.models.qwen25_vl.model import init_params, param_axes
        from karanta_tpu.parallel.sharding import DEFAULT_RULES, shard_pytree
        from karanta_tpu.training.optimizer import make_optimizer
        from karanta_tpu.training.train_step import (create_train_state,
                                                     make_loss_fn,
                                                     make_train_step)

        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, num_layers=4))
        params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
        rng = np.random.default_rng(17)
        b, s = 4, 32
        ids = rng.integers(12, cfg.text.vocab_size, size=(b, s)).astype(
            np.int32)
        labels = np.array(ids)
        labels[:, :4] = -100
        batch = {
            "token_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "positions": jnp.asarray(
                np.tile(np.arange(s, dtype=np.int32), (3, b, 1))),
        }

        loss_plain, _ = jax.jit(make_loss_fn(cfg))(params, batch)

        with pp2_mesh:
            # layers shard over "pipe" on top of the usual fsdp/model rules:
            # just place the params; the shard_map views layers via P("pipe")
            sharded = shard_pytree(params, param_axes(cfg), pp2_mesh,
                                   DEFAULT_RULES)
            optimizer = make_optimizer("adamw", 1e-3)
            state = create_train_state(sharded, optimizer)
            step = jax.jit(make_train_step(cfg, optimizer, pp_mesh=pp2_mesh,
                                           pp_micro=2))
            state, metrics = step(state, batch)
        np.testing.assert_allclose(float(metrics["loss"]), float(loss_plain),
                                   rtol=1e-4)
        assert int(state.step) == 1

    def test_sp_and_pp_mutually_exclusive(self, pp2_mesh):
        from karanta_tpu.models.qwen25_vl.config import tiny_config
        from karanta_tpu.training.train_step import make_loss_fn

        with pytest.raises(ValueError, match="mutually exclusive"):
            make_loss_fn(tiny_config(), sp_mesh=pp2_mesh, pp_mesh=pp2_mesh)
