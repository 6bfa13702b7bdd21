"""Decompose the fused append kernel's fixed per-program cost.

Variants at the serving shape (L36 B32 M4096, spp=4 blk=512 nbuf=2), each a
36-call scan like the engine's layer loop:
  full    — the real kernel
  normw   — slab RMW skipped (read-only attention, like the stacked kernel)
  nodma   — block-loop DMAs skipped entirely (only RMW + fold + output)
  empty   — kernel writes output zeros and does nothing else
The gaps between them attribute the floor: grid/operand-pipeline overhead
(empty), slab RMW (nodma - empty), DMA chain latency (normw vs full vs the
byte roofline).
"""
import functools
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from karanta_tpu.utils.compile_cache import enable_compilation_cache
import karanta_tpu.ops.decode_attention as da


def t(fn, q0, lens, k, v, n=10):
    def sync(x):
        return float(np.asarray(jnp.sum(x[0, 0].astype(jnp.float32))))
    q, k, v = fn(q0, lens, k, v)
    sync(q)
    t0 = time.time()
    for _ in range(n):
        q, k, v = fn(q, lens, k, v)
    sync(q)
    return (time.time() - t0) / n * 1e3, k, v


def make_variant(mode, block=512, nbuf=2, spp=4):
    """Clone paged_decode_append with parts of the kernel disabled."""
    real_kernel = da._decode_append_kernel

    def kernel(len_ref, layer_ref, q_ref, newk_ref, newv_ref, k_in, v_in,
               o_ref, k_out, v_out, k_buf, v_buf, kslab, vslab,
               acc_ref, m_ref, l_ref, sems, wsems, **kw):
        if mode == "empty":
            for sp in range(kw["spp"]):
                o_ref[sp] = jnp.zeros_like(o_ref[sp])
            return
        if mode == "normw":
            # fake the RMW away: jump straight to the block loop by calling
            # the real kernel with a zero-length... simplest: inline a copy
            pass
        real_kernel(len_ref, layer_ref, q_ref, newk_ref, newv_ref, k_in,
                    v_in, o_ref, k_out, v_out, k_buf, v_buf, kslab, vslab,
                    acc_ref, m_ref, l_ref, sems, wsems, **kw)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def scan_fn(q0, lens, k, v):
        L = k.shape[0]
        b, _, h, d = q0.shape
        kvh = k.shape[2]
        m = k.shape[3]
        group = h // kvh
        slab = 32
        nk = jnp.zeros((b, kvh, d), k.dtype)
        nv = jnp.zeros((b, kvh, d), k.dtype)

        def call(q, kk, vv, lay):
            qg = q.reshape(b, kvh * group, d)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b // spp,),
                in_specs=[
                    pl.BlockSpec((spp, kvh * group, d),
                                 lambda bb, lens, lay: (bb, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((spp, kvh, d),
                                 lambda bb, lens, lay: (bb, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((spp, kvh, d),
                                 lambda bb, lens, lay: (bb, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((spp, kvh * group, d),
                                 lambda bb, lens, lay: (bb, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                scratch_shapes=[
                    pltpu.VMEM((spp, nbuf, kvh, block, d), kk.dtype),
                    pltpu.VMEM((spp, nbuf, kvh, block, d), vv.dtype),
                    pltpu.VMEM((spp, kvh, slab, d), kk.dtype),
                    pltpu.VMEM((spp, kvh, slab, d), vv.dtype),
                    pltpu.VMEM((spp, kvh * group, d), jnp.float32),
                    pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
                    pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, spp, nbuf)),
                    pltpu.SemaphoreType.DMA((2, spp)),
                ],
            )
            out, k2, v2 = pl.pallas_call(
                functools.partial(kernel, block=block, kvh=kvh, group=group,
                                  scale=float(d ** -0.5), slab=slab,
                                  nbuf=nbuf, spp=spp),
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
                    jax.ShapeDtypeStruct(kk.shape, kk.dtype),
                    jax.ShapeDtypeStruct(vv.shape, vv.dtype),
                ],
                input_output_aliases={5: 1, 6: 2},
            )(lens.astype(jnp.int32),
              jnp.reshape(lay, (1,)).astype(jnp.int32), qg, nk, nv, kk, vv)
            return out.reshape(b, 1, h, d), k2, v2

        def body(carry, lay):
            q, kk, vv = carry
            a, kk, vv = call(q, kk, vv, lay)
            return (a.astype(q.dtype), kk, vv), ()
        (qq, kk, vv), _ = jax.lax.scan(body, (q0, k, v), jnp.arange(L))
        return qq, kk, vv

    return scan_fn


def main():
    enable_compilation_cache()
    L, B, KVH, M, H, D = 36, 32, 2, 4096, 16, 128

    def dev_normal(seed, shape):
        return jax.jit(lambda key: jax.random.normal(
            key, shape, jnp.bfloat16))(jax.random.PRNGKey(seed))

    q0 = dev_normal(0, (B, 1, H, D))
    k = dev_normal(3, (L, B, KVH, M, D))
    v = dev_normal(4, (L, B, KVH, M, D))

    for fill in (256, 1900):
        lens = jnp.full((B,), fill, jnp.int32)
        for mode in ("empty", "full"):
            dt, k, v = t(make_variant(mode), q0, lens, k, v)
            print(f"len={fill}: {mode} {dt:.2f} ms", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
