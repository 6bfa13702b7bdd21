"""XLA op-level profile of the fused vision+prefill executable.

Env knobs: XPRESET (default qwen2.5-vl-7b), XM (KV bucket, 1920),
XPREFILL (prefill bucket, 1536), XPROF_DIR (/tmp/xprof).
"""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def main():
    enable_compilation_cache()
    from bench import init_params_bench, make_page_png
    from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
    from karanta_tpu.inference.tokenizer import ByteTokenizer
    from karanta_tpu.models.qwen25_vl.config import get_config

    cfg = get_config(os.environ.get("XPRESET", "qwen2.5-vl-7b"))
    params, engine_q = init_params_bench(cfg, jnp.bfloat16, "int8")
    ecfg = EngineConfig(max_batch_size=2,
                        max_seq_len=int(os.environ.get("XM", 1920)),
                        decode_chunk=64,
                        prefill_buckets=(int(os.environ.get("XPREFILL", 1536)),),
                        image_token_buckets=(2048,),
                        dtype=jnp.bfloat16, quantize=engine_q,
                        act_quant=os.environ.get("AQ") or None)
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

    out_dir = os.environ.get("XPROF_DIR", "/tmp/xprof")
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        prep2 = engine.prepare(GenRequest(messages=messages, max_tokens=8,
                                          temperature=0.0, request_id="p2"))
        out = engine.prefill(prep2)
        print("traced:", int(np.asarray(out[1])), flush=True)
    for f in glob.glob(out_dir + "/**/*.gz", recursive=True):
        print(f, flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
