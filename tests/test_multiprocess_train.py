"""Real 2-process distributed training on CPU (jax.distributed over
localhost, Gloo collectives) — the multi-host reality the reference trains
in routinely (scripts/train_karanta_ocr.sh, 4-process NCCL DDP).

Each process sees 2 virtual CPU devices (4 global), feeds only its own rows
of the global batch via jax.make_array_from_process_local_data, and writes
one shared checkpoint through the collective orbax save."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_training import _make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
metrics = None
from karanta_tpu.training.train import main
metrics = main(json.loads(sys.argv[1]))
with open(sys.argv[2], "w") as f:
    json.dump({k: v for k, v in metrics.items()}, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_processes(tmp_path, root, out_dir, metric_files):
    port = _free_port()
    procs = []
    for pid in range(2):
        argv = [
            "--dataset_root", str(root),
            "--output_dir", str(out_dir),
            "--model_name_or_path", "tiny",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2",
            "--process_id", str(pid),
            "--mesh_data", "-1",
            "--max_steps", "3",
            "--gradient_accumulation_steps", "1",
            "--per_device_train_batch_size", "1",
            "--logging_steps", "1",
            "--checkpointing_steps", "2",
            "--eval_steps", "0",
            "--learning_rate", "0.001",
            "--dtype", "float32",
        ]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, "-c", DRIVER,
             json.dumps(argv), str(metric_files[pid])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    outputs = []
    for p in procs:
        # generous: on a 1-core host a concurrent test run starves the two
        # subprocesses (observed flaking at 600 s under full-suite load)
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outputs.append(out.decode(errors="replace"))
    return procs, outputs


@pytest.mark.slow
def test_two_process_training_matches_and_checkpoints(tmp_path):
    root = _make_dataset(tmp_path, n=4)
    metric_files = [tmp_path / f"metrics_{pid}.json" for pid in range(2)]

    # one retry: under full-suite load on a 1-core host the coordinator
    # handshake can starve past its RPC deadline — a scheduling artifact,
    # not a code path we're asserting on
    for attempt in range(2):
        out_dir = tmp_path / f"run{attempt}"
        procs, outputs = _run_two_processes(
            tmp_path, root, out_dir, metric_files)
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), outputs[-1][-3000:]

    metrics = [json.load(open(m)) for m in metric_files]
    # identical final loss on both processes (the loss is a global psum)
    assert metrics[0]["step"] == metrics[1]["step"] == 3
    assert np.isfinite(metrics[0]["loss"])
    assert metrics[0]["loss"] == pytest.approx(metrics[1]["loss"], rel=1e-6)
    # one shared checkpoint, written collectively, marked COMPLETED
    assert os.path.exists(out_dir / "step_3" / "COMPLETED")
    assert os.path.exists(out_dir / "step_3" / "metadata.json")
