"""Paged decode kernel vs dense full-bucket read at bench shapes, new layout."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, n=20):
    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))
    sync(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.time() - t0) / n * 1e3

def main():
    enable_compilation_cache()
    from karanta_tpu.ops.attention import decode_attention
    from karanta_tpu.ops.decode_attention import paged_decode_attention
    rng = np.random.default_rng(0)
    B, KVH, M, H, D = 32, 2, 4096, 16, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, KVH, M, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, KVH, M, D)), jnp.bfloat16)
    for fill in (1900, 4095):
        lens = jnp.full((B,), fill, jnp.int32)
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        d_ms = t(lambda: decode_attention(q, k, v, mask))
        print(f"len={fill}: dense full-read {d_ms:.2f} ms", flush=True)
        for blk in (512, 1024, 2048):
            p_ms = t(lambda: paged_decode_attention(q, k, v, lens, block=blk))
            print(f"len={fill}: paged blk={blk} {p_ms:.2f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
