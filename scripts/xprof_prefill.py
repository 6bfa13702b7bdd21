"""Attempt an XLA op-level profile of the fused prefill over the axon device."""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def main():
    enable_compilation_cache()
    from bench import make_page_png
    from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import qwen25_vl_3b
    from karanta_tpu.models.qwen25_vl.model import init_params

    cfg = qwen25_vl_3b()
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ecfg = EngineConfig(max_batch_size=8, max_seq_len=4096, decode_chunk=64,
                        prefill_buckets=(2048, 4096), image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize="int8")
    engine = Engine(params, cfg, ByteTokenizer(), ecfg)
    del params
    page = make_page_png()
    messages = [{"role": "user", "content": [
        {"type": "text", "text": "Transcribe.\n"},
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{page}"}},
    ]}]
    prep = engine.prepare(GenRequest(messages=messages, max_tokens=8,
                                     temperature=0.0, request_id="p"))
    out = engine.prefill(prep)
    print("warm:", int(np.asarray(out[1])), flush=True)

    os.makedirs("/tmp/xprof", exist_ok=True)
    with jax.profiler.trace("/tmp/xprof"):
        prep2 = engine.prepare(GenRequest(messages=messages, max_tokens=8,
                                          temperature=0.0, request_id="p2"))
        out = engine.prefill(prep2)
        print("traced:", int(np.asarray(out[1])), flush=True)
    files = glob.glob("/tmp/xprof/**/*", recursive=True)
    for f in files:
        print(f, os.path.getsize(f) if os.path.isfile(f) else "dir", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
