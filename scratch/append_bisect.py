"""Bisect the fused append kernel's TPU row-write mismatch over (L, M, block).

Each case: one jitted diff computing max row error of layer-0 writes vs the
scatter reference and layer-1 passthrough (when L > 1). Everything jitted —
eager ops over the axon tunnel are minutes each.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from karanta_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from karanta_tpu.ops.decode_attention import paged_decode_append

H, KVH, D, B = 16, 2, 128, 4
rng = np.random.default_rng(5)

def run_case(L, M, block, lens):
    q = jnp.asarray(rng.normal(size=(B,1,H,D)), jnp.bfloat16)
    nk = jnp.asarray(rng.normal(size=(B,KVH,D)), jnp.bfloat16)
    nv = jnp.asarray(rng.normal(size=(B,KVH,D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(L,B,KVH,M,D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L,B,KVH,M,D)), jnp.bfloat16)
    lens_a = jnp.asarray(lens, jnp.int32)
    bidx = jnp.arange(B)

    @jax.jit
    def diff(q, nk, nv, k, v, lens_a):
        a_f, k_f, v_f = paged_decode_append(q, nk, nv, k, v, jnp.asarray(0),
                                            lens_a, block=block)
        k_ref = k.at[0, bidx, :, lens_a].set(nk)[0]
        d0 = jnp.max(jnp.abs(k_f[0].astype(jnp.float32)
                             - k_ref.astype(jnp.float32)), axis=-1)
        if L > 1:
            d1 = jnp.max(jnp.abs(k_f[1].astype(jnp.float32)
                                 - k[1].astype(jnp.float32)), axis=-1)
        else:
            d1 = jnp.zeros_like(d0)
        return d0, d1

    d0, d1 = map(np.asarray, diff(q, nk, nv, k, v, lens_a))
    b0 = np.argwhere(d0 > 0.01)
    b1 = np.argwhere(d1 > 0.01)
    print(f"L={L} M={M} block={block} lens={lens}: "
          f"layer0 bad={len(b0)} passthru bad={len(b1)}", flush=True)
    for b, h, m in b0[:8]:
        print(f"   L0 slot {b} head {h} row {m} (len={lens[b]}) "
              f"diff {d0[b,h,m]:.3f}", flush=True)
    for b, h, m in b1[:8]:
        print(f"   L1 slot {b} head {h} row {m} (len={lens[b]}) "
              f"diff {d1[b,h,m]:.3f}", flush=True)

cases = [
    (2, 128, 64, [0, 5, 33, 127]),     # L trigger?
    (1, 512, 256, [0, 5, 200, 511]),   # M/block trigger?
    (1, 512, 64, [0, 5, 200, 511]),    # block trigger?
    (2, 512, 256, [0, 5, 200, 511]),   # original failure
]
for case in cases:
    run_case(*case)
print("DONE", flush=True)
