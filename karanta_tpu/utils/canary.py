"""Tunnel-health canary: quantify the host<->device band of a bench run.

The bench host reaches the TPU over a remote tunnel whose latency band
drifts ±10-50% within a session (BENCH_NOTES rounds 3-4: 0.46 vs 1.16
pages/s for the SAME configuration an hour apart). Every absolute
throughput number is therefore only interpretable alongside a measurement
of the band it was taken in. This module times a FIXED tiny executable's
dispatch+execute round trip and a fixed H2D transfer; benches record the
result (before and after the timed window) into their JSON `detail`, so
"degraded band" is a number, not an assertion (VERDICT r4 weak #1 / next
#3).

Band anchors on the round-4/5 host (v5e over axon): healthy sessions
measured ~9 ms/dispatch (rounds 3-4, xprof dispatch attribution); the
round-5 session opened at ~27 ms dispatch / ~43 ms per 1 MiB H2D — i.e.
visibly degraded, which is exactly what this canary exists to record.
Read a sample's numbers relative to the 9 ms anchor.
"""

from __future__ import annotations

import time
from typing import Optional


def tunnel_canary(n_dispatch: int = 20, n_h2d: int = 5) -> Optional[dict]:
    """Median/min dispatch+execute and H2D times for fixed tiny workloads.

    Returns None if no device is reachable (pure-host test environments).
    The matmul is 256x256 bf16 — microseconds of device time, so the
    measurement is ~pure tunnel/dispatch; the H2D probe is 1 MiB, sized to
    expose per-transfer latency rather than bandwidth.
    """
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        dev = jax.devices()[0]
    except Exception:
        return None

    x = jnp.ones((256, 256), jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())
    try:
        float(np.asarray(f(x)))  # compile outside the timed window
    except Exception:
        return None

    # IMPORTANT: over the axon tunnel block_until_ready() can return before
    # remote execution finishes — every timed sample must force a
    # device-to-host readback (same rule as scripts/prefill_prof*.py)
    disp = []
    for _ in range(max(3, n_dispatch)):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        disp.append(time.perf_counter() - t0)

    host = np.ones((1 << 20,), np.uint8)
    g = jax.jit(lambda a: a[:1].astype(jnp.int32).sum())
    float(np.asarray(g(jax.device_put(host, dev))))
    h2d = []
    for _ in range(max(2, n_h2d)):
        t0 = time.perf_counter()
        # H2D of 1 MiB + tiny reduce + scalar readback: the transfer
        # dominates, the readback guarantees completion
        float(np.asarray(g(jax.device_put(host, dev))))
        h2d.append(time.perf_counter() - t0)

    disp.sort()
    h2d.sort()
    return {
        "dispatch_ms": round(disp[len(disp) // 2] * 1e3, 3),
        "dispatch_min_ms": round(disp[0] * 1e3, 3),
        "h2d_1mib_ms": round(h2d[len(h2d) // 2] * 1e3, 3),
        "h2d_1mib_min_ms": round(h2d[0] * 1e3, 3),
        "backend": str(dev.platform),
    }
