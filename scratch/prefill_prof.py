"""Split prefill cost: host prepare vs fused vision+prefill device time."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
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

    t0 = time.time(); prep = engine.prepare(req)
    print(f"prepare(host, cold): {time.time()-t0:.3f}s; prompt={len(prep.ids)} "
          f"img_feeds={len(prep.image_feeds)}", flush=True)
    t0 = time.time(); out = engine.prefill(prep); jax.block_until_ready(out[0].k)
    print(f"prefill cold (compile): {time.time()-t0:.1f}s", flush=True)

    n = 8
    t0 = time.time()
    for _ in range(n):
        prep = engine.prepare(req)
    t_prep = (time.time()-t0)/n
    t0 = time.time()
    for _ in range(n):
        out = engine.prefill(prep)
    jax.block_until_ready(out[0].k)
    t_pref = (time.time()-t0)/n
    print(f"steady: prepare {t_prep*1e3:.1f} ms | prefill {t_pref*1e3:.1f} ms",
          flush=True)
    print("PREFILL_PROF_OK", flush=True)

if __name__ == "__main__":
    main()
