"""Classifier throughput on the real chip: SegFormer (mit-b0 geometry,
the production checkpoint's architecture) predict_batch images/s.

Env: CARCH (segformer|vit|convnextv2|resnet), CB (batch, 32), CRUNS (3).
Timing includes host preprocess + device forward + readback (np.asarray
inside predict_batch forces the device-to-host sync the tunnel needs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from karanta_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from karanta_tpu.inference.image_classifier import LayoutClassifier

    arch = os.environ.get("CARCH", "segformer")
    b = int(os.environ.get("CB", 32))
    runs = int(os.environ.get("CRUNS", 3))
    clf = LayoutClassifier.random(arch=arch)
    print("backend:", jax.default_backend(), "arch:", arch, "batch:", b,
          flush=True)

    from PIL import Image

    rng = np.random.default_rng(0)
    batches = [
        [Image.fromarray(rng.integers(0, 255, (800, 600, 3), dtype=np.uint8))
         for _ in range(b)]
        for _ in range(runs + 1)
    ]
    out = clf.predict_batch(batches[0])  # compile warmup
    print("warm:", out[0], flush=True)
    best = 0.0
    for i in range(runs):
        t0 = time.perf_counter()
        clf.predict_batch(batches[i + 1])
        dt = time.perf_counter() - t0
        ips = b / dt
        best = max(best, ips)
        print(f"run {i}: {dt*1e3:.1f} ms for {b} -> {ips:.1f} images/s",
              flush=True)
    print(f"BEST {arch}: {best:.1f} images/s", flush=True)


if __name__ == "__main__":
    main()
