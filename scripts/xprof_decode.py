"""XLA op-level profile of one decode chunk at bench shapes (B32, int8)."""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def main():
    enable_compilation_cache()
    from karanta_tpu.inference.engine import Engine, EngineConfig
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import qwen25_vl_3b
    from karanta_tpu.models.qwen25_vl.model import init_params

    cfg = qwen25_vl_3b()

    class NoStop(ByteTokenizer):
        def __init__(self):
            super().__init__()
            self.eos_token_id = -1

    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ecfg = EngineConfig(max_batch_size=int(os.environ.get("XB", 32)),
                    max_seq_len=int(os.environ.get("XM", 2560)),
                    decode_chunk=64,
                        prefill_buckets=(2048, 4096), image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize="int8",
                        kv_quantize=__import__("os").environ.get("KVQ") or None)
    engine = Engine(params, cfg, NoStop(), ecfg)
    del params
    toks = engine.decode_chunk()
    print("warm chunk:", np.asarray(toks).shape, flush=True)
    os.makedirs(__import__("os").environ.get("XPROF_DIR", "/tmp/xprof_dec"), exist_ok=True)
    with jax.profiler.trace(__import__("os").environ.get("XPROF_DIR", "/tmp/xprof_dec")):
        toks = engine.decode_chunk()
        print("traced:", int(np.asarray(toks)[0, 0]), flush=True)
    for f in glob.glob("/tmp/xprof_dec/**/*.gz", recursive=True):
        print(f, flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
