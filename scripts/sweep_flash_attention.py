"""Flash-attention block-size sweep on the real chip (perf tuning aid).

Run: python scripts/sweep_flash_attention.py
Prints ms + TFLOP/s for (block_q, block_k) combinations at serving shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.ops.attention import flash_attention
from karanta_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    shapes = [
        ("prefill-1.5k", 1, 1536, 1536, 16, 2, 128, True),
        ("prefill-2k", 1, 2048, 2048, 16, 2, 128, True),
        ("prefill-4k", 1, 4096, 4096, 16, 2, 128, True),
        ("vision-win", 416, 64, 64, 16, 16, 80, False),
        ("vision-full", 1, 26624, 26624, 16, 16, 80, False),
    ]
    blocks = [(128, 128), (256, 256), (256, 512), (512, 512), (512, 1024),
              (1024, 512)]
    for name, b, sq, sk, h, kvh, d, causal in shapes:
        q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, sk, kvh, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, sk, kvh, d)), jnp.bfloat16)
        flops = 2 * 2 * b * h * sq * sk * d * (0.5 if causal else 1.0)
        for bq, bk in blocks:
            if bq > sq or bk > sk:
                continue
            try:
                # block_until_ready lies over the axon tunnel; force D2H
                sync = lambda x: float(np.asarray(
                    jnp.sum(x.astype(jnp.float32))))
                out = flash_attention(q, k, v, causal=causal,
                                      block_q=bq, block_k=bk)
                sync(out)
                reps = 10
                t0 = time.time()
                for _ in range(reps):
                    out = flash_attention(q, k, v, causal=causal,
                                          block_q=bq, block_k=bk)
                sync(out)
                dt = (time.time() - t0) / reps
                print(f"{name:12s} bq={bq:4d} bk={bk:4d}: {dt*1e3:7.2f} ms "
                      f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
            except Exception as exc:
                print(f"{name:12s} bq={bq:4d} bk={bk:4d}: FAILED {exc}",
                      flush=True)


if __name__ == "__main__":
    main()
