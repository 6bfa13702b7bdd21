"""Honest A/B: 36-layer decode-attention scan, dense-slice vs stacked kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, *args, n=10):
    def sync(x):
        return float(np.asarray(jnp.sum(x.astype(jnp.float32))))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n * 1e3

def main():
    enable_compilation_cache()
    from karanta_tpu.ops.attention import decode_attention
    from karanta_tpu.ops.decode_attention import paged_decode_attention_stacked
    rng = np.random.default_rng(0)
    L, B, KVH, M, H, D = 36, 32, 2, 4096, 16, 128
    q0 = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.bfloat16)
    print(f"cache bytes: {(k.nbytes + v.nbytes)/1e9:.2f} GB", flush=True)

    @jax.jit
    def dense_scan(q0, lens, k, v):
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        def body(q, l):
            kl = jax.lax.dynamic_index_in_dim(k, l, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v, l, 0, keepdims=False)
            return decode_attention(q, kl, vl, mask).astype(q.dtype), ()
        q, _ = jax.lax.scan(body, q0, jnp.arange(L))
        return q

    @jax.jit
    def paged_scan(q0, lens, k, v):
        def body(carry, l):
            q, kk, vv = carry
            o, kk, vv = paged_decode_attention_stacked(q, kk, vv, l, lens,
                                                       block=1024)
            return (o.astype(q.dtype), kk, vv), ()
        (q, _, _), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
        return q

    for fill in (1900, 4095):
        lens = jnp.full((B,), fill, jnp.int32)
        print(f"len={fill}: dense-slice scan {t(dense_scan, q0, lens, k, v):.2f} ms",
              flush=True)
        print(f"len={fill}: paged-stacked scan {t(paged_scan, q0, lens, k, v):.2f} ms",
              flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
