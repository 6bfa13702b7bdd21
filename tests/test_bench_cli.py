"""Driver-contract guard: bench.py must print exactly one JSON line with the
required fields, end to end (tiny preset, CPU)."""

import json
import os
import subprocess
import sys


def test_bench_cli_json_contract():
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "bench.py", "--preset", "tiny", "--pages", "2",
         "--decode-tokens", "8", "--batch", "2"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), env=env, timeout=560)
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [line for line in proc.stdout.splitlines()
                  if line.startswith("{")]
    assert len(json_lines) == 1, proc.stdout
    payload = json.loads(json_lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0
    assert payload["detail"]["pages"] == 2
