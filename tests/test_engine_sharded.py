"""Tensor/data-parallel serving: engine on a multi-device mesh must produce
exactly the single-device greedy results."""

import jax
import jax.numpy as jnp
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from karanta_tpu.parallel.mesh import MeshConfig, create_mesh

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)
ECFG = EngineConfig(max_batch_size=2, max_seq_len=128, decode_chunk=8,
                    prefill_buckets=(64, 128), image_token_buckets=(16,),
                    dtype=jnp.float32)


def _reqs():
    return [
        GenRequest(messages=[{"role": "user", "content": "alpha beta"}],
                   max_tokens=10, temperature=0.0),
        GenRequest(messages=[{"role": "user", "content": "gamma"}],
                   max_tokens=8, temperature=0.0),
    ]


class TestShardedEngine:
    def test_tp_dp_matches_single_device(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)

        single = Engine(params, CFG, TOK, ECFG)
        expected = [r.token_ids for r in single.generate(_reqs())]

        mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
        sharded = Engine(params, CFG, TOK, ECFG, mesh=mesh)
        got = [r.token_ids for r in sharded.generate(_reqs())]

        assert got == expected

    def test_param_shardings_applied(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
        engine = Engine(params, CFG, TOK, ECFG, mesh=mesh)
        spec = engine.params["text"]["layers"]["mlp"]["gate"].sharding.spec
        assert "model" in str(spec)
        assert "model" in str(engine.cache.k.sharding.spec)
