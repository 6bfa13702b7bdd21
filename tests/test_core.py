"""Core runtime tests: mesh, sharding rules, config system, metrics."""

import dataclasses
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from karanta_tpu.config import ConfigParser, parse_cli_overrides
from karanta_tpu.parallel import MeshConfig, create_mesh
from karanta_tpu.parallel.sharding import (
    DEFAULT_RULES, spec_from_logical, shard_pytree,
)
from karanta_tpu.utils import MetricsKeeper, WorkerTracker


class TestMesh:
    def test_resolve_free_axis(self):
        # resolve() returns (data, pipe, fsdp, seq, model) layout order
        assert MeshConfig(data=-1, fsdp=1, model=2).resolve(8) == (
            4, 1, 1, 1, 2)

    def test_resolve_mismatch(self):
        with pytest.raises(ValueError):
            MeshConfig(data=3, fsdp=1, model=1).resolve(8)

    def test_create_mesh_axes(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
        assert mesh.axis_names == ("data", "pipe", "fsdp", "seq", "model")
        assert mesh.devices.shape == (2, 1, 2, 1, 2)

    def test_create_mesh_seq_axis(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=1, model=2, seq=2))
        assert mesh.shape["seq"] == 2
        assert mesh.devices.shape == (2, 1, 1, 2, 2)

    def test_create_mesh_pipe_axis(self):
        mesh = create_mesh(MeshConfig(data=2, fsdp=1, model=2, pipe=2))
        assert mesh.shape["pipe"] == 2
        assert mesh.devices.shape == (2, 2, 1, 1, 2)


class TestShardingRules:
    def test_spec_mapping(self):
        spec = spec_from_logical(("batch", "seq", "heads"))
        assert spec == P("data", None, "model")

    def test_duplicate_mesh_axis_dropped(self):
        # "heads" and "mlp" both map to model; second occurrence replicates.
        spec = spec_from_logical(("heads", "mlp"))
        assert spec == P("model", None)

    def test_shard_pytree(self, mesh8):
        tree = {"w": jnp.zeros((8, 16)), "b": jnp.zeros((16,))}
        axes = {"w": ("embed", "mlp"), "b": ("mlp",)}
        placed = shard_pytree(tree, axes, mesh8, DEFAULT_RULES)
        assert placed["w"].sharding.spec == P("fsdp", "model")
        # sharded matmul under jit executes across the mesh
        out = jax.jit(lambda t: t["w"] @ jnp.ones((16, 4)))(placed)
        np.testing.assert_allclose(out, np.zeros((8, 4)))


@dataclasses.dataclass
class _ExpArgs:
    learning_rate: float = 1e-4
    epochs: int = 1
    use_lora: bool = False
    datasets: Optional[List[str]] = None


@dataclasses.dataclass
class _ModelArgs:
    model_name: str = "tiny"
    lora_rank: int = 8


class TestConfig:
    def test_cli_overrides(self):
        ov = parse_cli_overrides(["--a", "1", "--b=x y"])
        assert ov == {"a": "1", "b": "x y"}

    def test_duplicate_detection(self):
        with pytest.raises(ValueError):
            parse_cli_overrides(["--a", "1", "--a", "2"])

    def test_yaml_plus_cli(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("learning_rate: 0.01\nmodel_name: qwen\nepochs: 3\n")
        exp, model = ConfigParser([_ExpArgs, _ModelArgs]).parse(
            [str(cfg), "--epochs", "5", "--use_lora", "true",
             "--datasets", "a,b", "--lora_rank=16"])
        assert exp.learning_rate == 0.01
        assert exp.epochs == 5
        assert exp.use_lora is True
        assert exp.datasets == ["a", "b"]
        assert model.model_name == "qwen"
        assert model.lora_rank == 16

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError):
            ConfigParser([_ExpArgs]).parse(["--nope", "1"])


class TestMetrics:
    def test_totals_and_rates(self):
        mk = MetricsKeeper(window=60)
        mk.add_metrics(completed_pages=2, server_output_tokens=100)
        mk.add_metrics(completed_pages=1)
        summary = mk.get_metrics_summary()
        assert summary["total_metrics"]["completed_pages"] == 3
        assert summary["total_metrics"]["server_output_tokens"] == 100
        assert summary["elapsed_time_seconds"] >= 0
        assert "completed_pages" in str(mk)

    def test_window_trim(self):
        mk = MetricsKeeper(window=0)
        mk.add_metrics(x=1)
        time.sleep(0.01)
        assert mk.window_rates() == {}

    def test_worker_tracker(self):
        import asyncio

        async def run():
            tr = WorkerTracker()
            await tr.track_work(0, "doc-1", "started")
            await tr.track_work(0, "doc-1", "finished")
            await tr.track_work(1, "doc-2", "started")
            return tr.get_status_table()

        table = asyncio.run(run())
        assert "doc-2" in table and "finished" in table
