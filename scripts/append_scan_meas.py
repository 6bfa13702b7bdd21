"""Full decode-layer-body A/B: scatter+slice+dense vs fused append kernel."""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from karanta_tpu.utils.compile_cache import enable_compilation_cache

def t(fn, q0, lens, k, v, n=10):
    """Thread donated cache state through repeated calls (engine-style)."""
    def sync(x):
        return float(np.asarray(jnp.sum(x[0, 0].astype(jnp.float32))))
    q, k, v = fn(q0, lens, k, v)
    sync(q)
    t0 = time.time()
    for _ in range(n):
        q, k, v = fn(q, lens, k, v)
    sync(q)
    dt = (time.time() - t0) / n * 1e3
    return dt, k, v

def main():
    enable_compilation_cache()
    from karanta_tpu.ops.attention import decode_attention
    from karanta_tpu.ops.decode_attention import paged_decode_attention_stacked
    rng = np.random.default_rng(0)
    L, B, KVH, M, H, D = 36, 32, 2, 4096, 16, 128
    q0 = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, KVH, M, D)), jnp.bfloat16)
    bidx = jnp.arange(B)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def dense_scan(q0, lens, k, v):
        mask = (jnp.arange(M)[None, :] <= lens[:, None]).astype(jnp.float32)
        def body(carry, l):
            q, kk, vv = carry
            kk = kk.at[l, bidx, :, lens].set(nk)
            vv = vv.at[l, bidx, :, lens].set(nv)
            kl = jax.lax.dynamic_index_in_dim(kk, l, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(vv, l, 0, keepdims=False)
            return (decode_attention(q, kl, vl, mask).astype(q.dtype),
                    kk, vv), ()
        (q, kk, vv), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
        return q, kk, vv

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def append_scan(q0, lens, k, v):
        def body(carry, l):
            q, kk, vv = carry
            kk = kk.at[l, bidx, :, lens].set(nk)
            vv = vv.at[l, bidx, :, lens].set(nv)
            a, kk, vv = paged_decode_attention_stacked(q, kk, vv, l, lens,
                                                       block=1024)
            return (a.astype(q.dtype), kk, vv), ()
        (q, kk, vv), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
        return q, kk, vv

    for fill in (1400, 1900, 4000):
        lens = jnp.full((B,), fill, jnp.int32)
        dt, k, v = t(dense_scan, q0, lens, k, v)
        print(f"len={fill}: dense scatter+slice scan {dt:.2f} ms", flush=True)
        dt, k, v = t(append_scan, q0, lens, k, v)
        print(f"len={fill}: fused append kernel scan {dt:.2f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
