"""Isolate the batch-16 stall: compile+run decode chunk and insert at B=16
separately (end-to-end bench at B=16 stalled >25 min in round 1)."""

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
    from karanta_tpu.models.qwen25_vl.config import qwen25_vl_3b
    from karanta_tpu.models.qwen25_vl.model import init_params

    cfg = qwen25_vl_3b()

    class NoStop(ByteTokenizer):
        def __init__(self):
            super().__init__()
            self.eos_token_id = -1

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"init 3B params (int8 engine, B={batch})", flush=True)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    ecfg = EngineConfig(max_batch_size=batch, max_seq_len=4096,
                        decode_chunk=64, prefill_buckets=(2048, 4096),
                        image_token_buckets=(2048,), dtype=jnp.bfloat16,
                        quantize="int8")
    engine = Engine(params, cfg, NoStop(), ecfg)
    del params

    t0 = time.time()
    toks = engine.decode_chunk()
    print(f"decode chunk B={batch} compile+run: {time.time()-t0:.1f}s "
          f"shape={toks.shape}", flush=True)
    t0 = time.time()
    n = 4
    for _ in range(n):
        toks = engine.decode_chunk()
    dt = (time.time() - t0) / (n * ecfg.decode_chunk)
    print(f"steady: {dt*1e3:.2f} ms/step -> {batch/dt:.0f} tok/s", flush=True)

    # insert path at B=batch
    from karanta_tpu.inference.engine import GenRequest

    import base64
    import io

    from PIL import Image

    img = Image.fromarray(np.random.default_rng(0).integers(
        150, 255, (640, 480, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    req = GenRequest(messages=[{
        "role": "user",
        "content": [
            {"type": "text", "text": "read this"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]}], max_tokens=8, temperature=0.0)
    prepared = engine.prepare(req)
    t0 = time.time()
    cache, first, true_len, next_pos, dfa = engine.prefill(prepared)
    print(f"prefill compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    engine.insert(0, prepared, cache, first, true_len, next_pos, dfa)
    jax.block_until_ready(engine.cache.k)
    print(f"insert compile+run: {time.time()-t0:.1f}s", flush=True)
    print("B16_ISOLATION_OK", flush=True)


if __name__ == "__main__":
    main()
