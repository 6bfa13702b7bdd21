"""Utils tests: profiling traces, model download gating, timing, hub gating."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.data.hub import Languages
from karanta_tpu.utils.model_download import download_model
from karanta_tpu.utils.profiling import device_memory_stats, profile_step
from karanta_tpu.utils.timing import StageTimer


class TestProfiling:
    def test_profile_step_writes_trace(self, tmp_path):
        import jax

        @jax.jit
        def fn(x):
            return (x @ x.T).sum()

        x = jnp.ones((64, 64))
        result = profile_step(fn, (x,), step_num=1,
                              output_dir=str(tmp_path))
        assert np.isfinite(float(result))
        assert os.path.exists(tmp_path / "profile_step_1.txt")
        assert os.path.isdir(tmp_path / "profile_step_1")

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict) and stats


class TestStageTimer:
    def test_accumulates(self):
        timer = StageTimer()
        with timer.stage("render"):
            pass
        with timer.stage("render"):
            pass
        summary = timer.summary()
        assert summary["render"]["count"] == 2
        assert summary["render"]["total_s"] >= 0


class TestModelDownload:
    def test_local_dir_passthrough(self, tmp_path):
        assert download_model(str(tmp_path)) == str(tmp_path)

    def test_s3_gated(self, monkeypatch):
        # boto3 may or may not exist; either ImportError or a network error —
        # never a silent wrong answer
        with pytest.raises(Exception):
            download_model("s3://no-such-bucket/model", retries=1)


class TestLanguages:
    def test_registry(self):
        assert Languages.YORUBA.value == "yoruba"
        assert len(Languages) >= 11


class TestProfiling:
    def test_profile_step_dumps_trace_and_summary(self, tmp_path):
        import jax.numpy as jnp

        from karanta_tpu.utils.profiling import profile_step

        def step(x):
            return x * 2 + 1

        out = profile_step(step, (jnp.arange(8.0),), 3, str(tmp_path))
        assert float(out[0]) == 1.0
        summary = tmp_path / "profile_step_3.txt"
        assert summary.exists()
        assert "wall_time_s" in summary.read_text()
        assert (tmp_path / "profile_step_3").exists()
