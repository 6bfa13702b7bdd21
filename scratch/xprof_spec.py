"""XLA op-level profile of one speculative decode chunk at bench shapes.

Env: XPRESET (qwen2.5-vl-7b), XB (80), XM (1920), XFILL (1650),
XCHUNK (64), GAMMA (3), XPROF_DIR (/tmp/xprof_spec).
Parse the resulting trace with scripts/parse_trace.py.
"""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def main():
    enable_compilation_cache()
    from karanta_tpu.inference.engine import Engine, EngineConfig
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import get_config
    from bench import init_params_bench

    cfg = get_config(os.environ.get("XPRESET", "qwen2.5-vl-7b"))

    class NoStop(ByteTokenizer):
        def __init__(self):
            super().__init__()
            self.eos_token_id = -1

    params, engine_q = init_params_bench(cfg, jnp.bfloat16, "int8")
    b = int(os.environ.get("XB", 80))
    m = int(os.environ.get("XM", 1920))
    gamma = int(os.environ.get("GAMMA", 3))
    chunk = int(os.environ.get("XCHUNK", 64))
    ecfg = EngineConfig(max_batch_size=b, max_seq_len=m,
                        decode_chunk=chunk,
                        prefill_buckets=(1536,), image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize=engine_q,
                        kv_quantize="int8", speculative_ngram=gamma)
    engine = Engine(params, cfg, NoStop(), ecfg)
    del params
    fill = int(os.environ.get("XFILL", 1650))
    rng = np.random.default_rng(0)

    def pin():
        engine.cache_len = jnp.full((b,), fill, jnp.int32)
        engine.next_pos = jnp.full((b,), fill, jnp.int32)
        engine.slot_free = [False] * b
        engine._slot_len = [fill] * b

    pin()
    engine.token_hist = jnp.asarray(
        rng.integers(16, 200, size=(b, m), dtype=np.int64), jnp.int32)
    steps = max(1, chunk // (gamma + 1))
    engine.decode_chunk_spec(steps=steps)   # warm/compile
    jax.block_until_ready(engine.cache.k)
    print("warm done", flush=True)
    pin()
    out_dir = os.environ.get("XPROF_DIR", "/tmp/xprof_spec")
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        engine.decode_chunk_spec(steps=steps)
        jax.block_until_ready(engine.cache.k)
    print("traced", steps, "verify passes", flush=True)
    for f in glob.glob(out_dir + "/**/*.gz", recursive=True):
        print(f, flush=True)

if __name__ == "__main__":
    main()
