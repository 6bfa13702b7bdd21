"""Prefill timing with strict per-call blocking."""
import os, sys, time
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
        {"type": "text", "text": "Return the plain text representation of this"
                                 " document as if you were reading it naturally.\n"},
        {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{page}"}},
    ]}]
    req = GenRequest(messages=messages, max_tokens=8, temperature=0.0,
                     request_id="p")
    prep = engine.prepare(req)
    out = engine.prefill(prep); jax.block_until_ready(out[0].k)  # compile
    for trial in range(3):
        t0 = time.time()
        out = engine.prefill(prep)
        jax.block_until_ready(out[0].k)
        first = int(np.asarray(out[1]))
        print(f"prefill blocked: {(time.time()-t0)*1e3:.1f} ms "
              f"(first={first})", flush=True)

    # raw fused-jit timing, bypassing python around it: reuse captured args
    # via a second blocked call path inside engine.prefill isn't separable;
    # instead time insert:
    cache, first, s, next_pos, dfa = out
    t0 = time.time()
    engine.insert(0, prep, cache, first, s, next_pos, dfa)
    print(f"insert blocked: {(time.time()-t0)*1e3:.1f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
