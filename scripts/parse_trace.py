"""Aggregate per-op device time from a jax.profiler trace directory.

Usage: python scripts/parse_trace.py /tmp/xprof_dec [top_n]
Prints total device-op time and the top ops grouped by a normalized name
(fusion numbers stripped) — the round-2 workflow for finding where a
jitted step's milliseconds go over the remote tunnel (wall-clock timing
loops there measure dispatch, not kernels).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_trace(trace_dir: str) -> dict:
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        return json.load(f)


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_dec"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    data = load_trace(trace_dir)

    # device-op events live on TPU "/device:TPU:0" pids; find pids whose
    # process name mentions TPU and aggregate complete events
    tpu_pids = set()
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "tpu" in name:
                tpu_pids.add(ev["pid"])

    per_op: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        name = ev.get("name", "?")
        # strip fusion/op numbering so repeats group together
        norm = re.sub(r"\.\d+", "", name)
        norm = re.sub(r"__\d+", "", norm)
        per_op[norm] += dur
        counts[norm] += 1
        total += dur

    print(f"total device event time: {total:.2f} ms "
          f"({sum(counts.values())} events)")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:9.3f} ms  x{counts[name]:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
