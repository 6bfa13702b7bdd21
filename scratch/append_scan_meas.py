"""Full decode-layer-body A/B: scatter+slice+dense vs fused append kernel.

Three variants at serving shape (36 layers, B32, M4096, bf16):
  dense   — scatter rows, dynamic-slice the layer, masked dense attention
            (the default engine path)
  stacked — scatter rows, length-bounded pallas read of the stacked cache
            (known-bad in-scan: XLA copies the cache per pallas call)
  fused   — paged_decode_append: the kernel owns both the row write and the
            bounded read; cache operands alias input->output
"""
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
    from karanta_tpu.ops.decode_attention import (
        paged_decode_append, paged_decode_attention_stacked)
    rng = np.random.default_rng(0)
    L, B, KVH, M, H, D = 36, 32, 2, 4096, 16, 128
    # generate ON DEVICE: numpy normals at this size are ~20 GB of host
    # churn plus 4.8 GB through the ~100 MB/s tunnel (minutes of dead time)
    def dev_normal(seed, shape):
        return jax.jit(lambda key: jax.random.normal(key, shape,
                                                     jnp.bfloat16))(
            jax.random.PRNGKey(seed))
    q0 = dev_normal(0, (B, 1, H, D))
    nk = dev_normal(1, (B, KVH, D))
    nv = dev_normal(2, (B, KVH, D))
    k = dev_normal(3, (L, B, KVH, M, D))
    v = dev_normal(4, (L, B, KVH, M, D))
    bidx = jnp.arange(B)

    # correctness first: one fused call vs scatter+dense on layer 0.
    # ONE jitted function: eager ops over the axon tunnel are each a remote
    # mini-compile (minutes) — never run the check op-by-op.
    @jax.jit
    def check(q0, nk, nv, k, v, lens0):
        a_f, k_f, v_f = paged_decode_append(q0, nk, nv, k, v, jnp.asarray(0),
                                            lens0, block=1024)
        k_ref = k.at[0, bidx, :, lens0].set(nk)[0]   # layer 0 only
        v_ref = v.at[0, bidx, :, lens0].set(nv)[0]
        mask = (jnp.arange(M)[None, :] <= lens0[:, None]).astype(jnp.float32)
        a_ref = decode_attention(q0, k_ref, v_ref, mask)
        err = jnp.max(jnp.abs(a_f.astype(jnp.float32)
                              - a_ref.astype(jnp.float32)))
        kerr = jnp.max(jnp.abs(k_f[0].astype(jnp.float32)
                               - k_ref.astype(jnp.float32)))
        return err, kerr

    if "--check" in sys.argv:
        lens0 = jnp.asarray(rng.integers(0, 2000, size=(B,)), jnp.int32)
        err, kerr = check(q0, nk, nv, k, v, lens0)
        print(f"fused vs dense: attn max err {float(err):.4f}, "
              f"cache write err {float(kerr)}", flush=True)

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

    def make_fused_scan(block, nbuf, spp):
        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def fused_scan(q0, lens, k, v):
            def body(carry, l):
                q, kk, vv = carry
                a, kk, vv = paged_decode_append(q, nk, nv, kk, vv, l, lens,
                                                block=block, nbuf=nbuf,
                                                spp=spp)
                return (a.astype(q.dtype), kk, vv), ()
            (q, kk, vv), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
            return q, kk, vv
        return fused_scan

    # (block, nbuf, spp); VMEM = spp*nbuf*2*KVH*block*D*2B <= ~12MB
    variants = [(512, 2, 4)]
    if "--sweep" in sys.argv:
        variants = [(512, 2, 4), (256, 2, 8), (1024, 2, 2), (256, 4, 4),
                    (128, 2, 16), (1024, 2, 1)]
    run_dense = "--dense" in sys.argv

    for fill in (256, 1400, 1900, 4000):
        lens = jnp.full((B,), fill, jnp.int32)
        if run_dense:
            dt, k, v = t(dense_scan, q0, lens, k, v)
            print(f"len={fill}: dense scatter+slice scan {dt:.2f} ms",
                  flush=True)
        for block, nbuf, spp in variants:
            dt, k, v = t(make_fused_scan(block, nbuf, spp), q0, lens, k, v)
            print(f"len={fill}: fused blk={block} nbuf={nbuf} spp={spp} "
                  f"{dt:.2f} ms", flush=True)
    print("OK", flush=True)

if __name__ == "__main__":
    main()
