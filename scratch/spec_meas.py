"""On-chip cost of the speculative verify pass vs the plain decode step.

Measures, at the 7B bench operating point (B80, M1920, int8 weights+KV,
filled cache), the per-step wall cost of:
  - the production decode chunk (1 token / weight read), and
  - the speculative chunk (gamma+1 tokens verified / weight read)
for gamma in SPEC_GAMMAS. Step cost is shape-static (acceptance changes
only how far cache_len advances, not the work per pass), so random token
history is fine here; ACCEPTANCE comes from scratch/spec_accept_sim.py
(offline drafter replay over real prose).

Projected throughput gain on a page class with tokens/step = T:
  speedup = T * t_plain / t_spec(gamma).

Env: PRESET (qwen2.5-vl-7b), MB (80), M (1920), FILL (1650),
     CHUNK (64), SPEC_GAMMAS (3,5,7), REPS (3),
     SPEC_TEMP (0 = greedy argmax verify; >0 = rejection-sampling verify,
     the production path for the pipeline's temperature ladder).
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    from karanta_tpu.inference.engine import Engine, EngineConfig
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import get_config
    from bench import init_params_bench

    preset = os.environ.get("PRESET", "qwen2.5-vl-7b")
    b = int(os.environ.get("MB", 80))
    m = int(os.environ.get("M", 1920))
    fill = int(os.environ.get("FILL", 1650))
    chunk = int(os.environ.get("CHUNK", 64))
    gammas = [int(g) for g in
              os.environ.get("SPEC_GAMMAS", "3,5,7").split(",")]
    reps = int(os.environ.get("REPS", 3))

    cfg = get_config(preset)

    class NoStop(ByteTokenizer):
        def __init__(self):
            super().__init__()
            self.eos_token_id = -1

    params, engine_q = init_params_bench(cfg, jnp.bfloat16, "int8")

    spec_temp = float(os.environ.get("SPEC_TEMP", "0"))
    results = {}
    rng = np.random.default_rng(0)

    def filled(engine):
        engine.cache_len = jnp.full((b,), fill, jnp.int32)
        engine.next_pos = jnp.full((b,), fill, jnp.int32)
        engine.slot_free = [False] * b
        engine._slot_len = [fill] * b
        if spec_temp > 0:
            engine.temps = jnp.full((b,), spec_temp, jnp.float32)
            engine._slot_temp = [spec_temp] * b

    def best_of(fn, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def measure(gamma):
        # everything engine-sized lives (and dies) inside this frame: the
        # next config's cache alloc needs this one's HBM back
        ecfg = EngineConfig(max_batch_size=b, max_seq_len=m,
                            decode_chunk=chunk,
                            prefill_buckets=(1536,),
                            image_token_buckets=(2048,),
                            dtype=jnp.bfloat16, quantize=engine_q,
                            kv_quantize="int8",
                            act_quant=os.environ.get("ACT_QUANT") or None,
                            speculative_ngram=gamma)
        engine = Engine(params, cfg, NoStop(), ecfg)
        filled(engine)
        if gamma == 0:
            def run():
                jax.block_until_ready(engine.cache.k)
                engine.decode_chunk()
                jax.block_until_ready(engine.cache.k)
            run()  # warm/compile
            filled(engine)
            t = best_of(run, reps)
            per_step = t / chunk
            results["plain"] = per_step
            print(f"plain    chunk({chunk})={t * 1e3:8.1f} ms  "
                  f"per-step={per_step * 1e3:6.2f} ms", flush=True)
            return
        engine.token_hist = jnp.asarray(
            rng.integers(16, 200, size=(b, m), dtype=np.int64),
            jnp.int32)
        steps = max(1, chunk // (gamma + 1))

        def run():
            jax.block_until_ready(engine.cache.k)
            # re-pin fill each call: spec advances cache_len by
            # accepted counts; clamp inside the impl keeps it in
            # range but the read cost should stay at bench fill
            engine.cache_len = jnp.full((b,), fill, jnp.int32)
            engine.next_pos = jnp.full((b,), fill, jnp.int32)
            engine.decode_chunk_spec(steps=steps)
            jax.block_until_ready(engine.cache.k)
        run()  # warm/compile
        t = best_of(run, reps)
        per_step = t / steps
        results[gamma] = per_step
        print(f"gamma={gamma}  spec_chunk({steps})={t * 1e3:8.1f} ms  "
              f"per-verify-pass={per_step * 1e3:6.2f} ms  "
              f"vs plain x{per_step / results['plain']:.2f}", flush=True)

    for gamma in [0] + gammas:
        measure(gamma)
        gc.collect()

    print()
    print("projected speedup (tokens/step from spec_accept_sim, word level):")
    accept = {3: 2.336, 5: 2.762, 7: 3.095}      # anchored pages
    accept_scan = {3: 1.118, 5: 1.127, 7: 1.129}  # scanned pages
    for gamma in gammas:
        if gamma not in results:
            continue
        r = results["plain"] / results[gamma]
        print(f"  gamma={gamma}: anchored x{accept[gamma] * r:.2f}   "
              f"scanned x{accept_scan[gamma] * r:.2f}   "
              f"(pass-cost ratio {1 / r:.2f})", flush=True)


if __name__ == "__main__":
    main()
