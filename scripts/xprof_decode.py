"""XLA op-level profile of one decode chunk at bench shapes.

Env knobs: XPRESET (model preset, default qwen2.5-vl-7b), XB (batch, 48),
XM (KV bucket, 1920), KVQ (int8|empty), XFILL (per-slot live rows, 0),
XCHUNK (decode steps per chunk, 64), XPROF_DIR.

XFILL matters: an empty-cache chunk understates real step time by the
live-row cache reads (~5 ms/step at bench fills).
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

    # quantized leaves generated directly (bf16-then-quantize OOMs at 7B)
    params, engine_q = init_params_bench(cfg, jnp.bfloat16, "int8")
    ecfg = EngineConfig(max_batch_size=int(os.environ.get("XB", 48)),
                        max_seq_len=int(os.environ.get("XM", 1920)),
                        decode_chunk=int(os.environ.get("XCHUNK", 64)),
                        prefill_buckets=(1536,), image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize=engine_q,
                        kv_quantize=os.environ.get("KVQ") or None)
    engine = Engine(params, cfg, NoStop(), ecfg)
    del params
    fill = int(os.environ.get("XFILL", 0))
    if fill:
        b = ecfg.max_batch_size
        engine.cache_len = jnp.full((b,), fill, jnp.int32)
        engine.next_pos = jnp.full((b,), fill, jnp.int32)
        engine.slot_free = [False] * b
        engine._slot_len = [fill] * b
    toks = engine.decode_chunk()
    print("warm chunk:", np.asarray(toks).shape, flush=True)
    out_dir = os.environ.get("XPROF_DIR", "/tmp/xprof_dec")
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        toks = engine.decode_chunk()
        print("traced:", int(np.asarray(toks)[0, 0]), flush=True)
    for f in glob.glob(out_dir + "/**/*.gz", recursive=True):
        print(f, flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
