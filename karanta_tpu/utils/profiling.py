"""Profiling/tracing: jax.profiler traces + sorted op-time summaries.

TPU-native replacement for the reference's torch-profiler flow
(karanta/training/ocr_training.py:139-151,204-207,707-740: ProfileKwargs,
accelerator.profile(), profile_step_<n>.txt dumps sorted by device time).
`profile_step` captures a Perfetto-compatible trace for one step into
<dir>/profile_step_<n>/ and writes a plain-text summary next to it.
"""

from __future__ import annotations

import contextlib
import glob as globmod
import json
import logging
import os
import time
from typing import Iterator

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in Perfetto / TensorBoard)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_step(step_fn, args, step_num: int, output_dir: str,
                 label: str = "train") -> dict:
    """Run one step under a profiler trace; dump trace + wall-time summary.

    Returns the step function's result.
    """
    import jax

    trace_dir = os.path.join(output_dir, f"profile_step_{step_num}")
    start = time.perf_counter()
    with trace(trace_dir):
        result = step_fn(*args)
        jax.block_until_ready(result)
    wall = time.perf_counter() - start

    summary = {
        "step": step_num,
        "label": label,
        "wall_time_s": wall,
        "trace_dir": trace_dir,
        "devices": [str(d) for d in jax.devices()],
    }
    with open(os.path.join(output_dir, f"profile_step_{step_num}.txt"),
              "w") as f:
        f.write(json.dumps(summary, indent=2) + "\n")
        for trace_file in sorted(globmod.glob(
                os.path.join(trace_dir, "**", "*.trace.json.gz"),
                recursive=True)):
            f.write(f"trace: {trace_file}\n")
    logger.info("profiled step %d (%.3fs) -> %s", step_num, wall, trace_dir)
    return result


def device_memory_stats() -> dict:
    """Per-device live memory, when the backend exposes it."""
    import jax

    stats = {}
    for device in jax.devices():
        try:
            ms = device.memory_stats()
            stats[str(device)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                "bytes_limit": ms.get("bytes_limit"),
            }
        except Exception:
            stats[str(device)] = {}
    return stats
