"""Closed-loop integration: native trainer -> checkpoint -> HTTP server ->
pipeline -> CER, on a synthetic corpus whose ground truth is exact.

This is the one test that proves the train and serve stacks agree token-for-
token: the tiny model is fine-tuned on 8 rendered digit pages and must read
them back through the REAL serving path (subprocess server on a native
checkpoint, scale-out pipeline with admission control, Dolma output, native
scorer). A train/serve ChatML mismatch, image-preprocessing divergence, or
checkpoint round-trip bug all fail it (the system-block mismatch this suite
caught is commit ebfca72).

Memorization-scale on purpose: ~2-3 min of the suite budget. The full
generalization demo (held-out digit strings) is scripts/closed_loop_demo.py;
its artifacts live in runs/closed_loop/.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_closed_loop_memorization(tmp_path):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.pathsep.join(
               [REPO] + os.environ.get("PYTHONPATH", "").split(os.pathsep))}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/closed_loop_demo.py"),
         "--root", str(tmp_path),
         "--train-pages", "8", "--chars", "1",
         "--eval-pages", "8", "--eval-from-train",
         "--steps", "500", "--lr", "0.001"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=560)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    summary = json.loads((tmp_path / "scores.json").read_text())
    assert summary["pages"] == 8
    # trained-to-convergence memorization must read back (CER 0 expected;
    # allow one slip so an unlucky optimization seed doesn't flake CI)
    assert summary["mean_cer"] <= 0.15, summary
    assert summary["exact_match"] >= 6, summary
    report = (tmp_path / "report.md").read_text()
    assert "exact match" in report
