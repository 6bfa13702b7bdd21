"""Pallas decode attention: per-slot length-bounded KV cache reads.

The XLA decode path must read each slot's full cache bucket every step (a
bounded slice materializes a copy — measured slower). This kernel keeps the
cache in HBM and DMAs only blocks below each slot's live length, with an
online-softmax accumulator across blocks: HBM traffic tracks actual context
lengths instead of the bucket, which is the big remaining decode stream at
large batch.

Layout notes (TPU tiling): the grid is (B,) and KV heads are a static
python loop inside the kernel — a KVH-sized block dimension (2 on the 3B)
violates the (sublane, lane) tiling rules, so per-head DMA slices of
(block, head_dim) are used instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(len_ref,                 # SMEM (B,) int32 (scalar prefetch)
                   q_ref,                   # VMEM (1, KVH*G, D)
                   k_hbm, v_hbm,            # ANY (1, M, KVH, D)
                   o_ref,                   # VMEM (1, KVH*G, D)
                   k_buf, v_buf,            # VMEM scratch (2, KVH, BLK, D)
                   acc_ref, m_ref, l_ref,   # VMEM scratch
                   sems,                    # DMA semaphores (2, 2, KVH)
                   *, block: int, kvh: int, group: int, scale: float):
    slot = pl.program_id(0)
    seq_len = len_ref[slot] + 1          # +1: the new token was just written
    # lax.div instead of //-based cdiv: jnp's sign-correct floor-div carries
    # a nested `where` jaxpr that trips an MLIR lowering-cache bug inside
    # pallas kernels on this jax version
    num_blocks = jax.lax.div(seq_len + (block - 1), block)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dmas(i, buf_slot):
        # (B, KVH, M, D) cache layout: per-head (block, D) slices are
        # contiguous and tile-legal
        copies = []
        for h in range(kvh):
            copies.append(pltpu.make_async_copy(
                k_hbm.at[slot, h, pl.ds(i * block, block)],
                k_buf.at[buf_slot, h], sems.at[0, buf_slot, h]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[slot, h, pl.ds(i * block, block)],
                v_buf.at[buf_slot, h], sems.at[1, buf_slot, h]))
        return copies

    for dma in dmas(0, 0):
        dma.start()

    q = q_ref[0]                         # (KVH*G, D)

    def body(i, _):
        cur = jax.lax.bitwise_and(i, 1)
        nxt = jax.lax.bitwise_and(i + 1, 1)

        @pl.when(i + 1 < num_blocks)
        def _():
            for dma in dmas(i + 1, nxt):
                dma.start()

        for dma in dmas(i, cur):
            dma.wait()

        cols = i * block + jax.lax.broadcasted_iota(
            jnp.int32, (group, block), 1)
        valid = cols < seq_len

        for h in range(kvh):
            qh = q[h * group:(h + 1) * group]          # (G, D)
            k = k_buf[cur, h]                          # (BLK, D)
            s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(valid, s * scale, NEG_INF)

            rows = slice(h * group, (h + 1) * group)
            m_prev = m_ref[rows, 0:1]
            l_prev = l_ref[rows, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[rows, 0:1] = alpha * l_prev + jnp.sum(p, axis=-1,
                                                        keepdims=True)
            m_ref[rows, 0:1] = m_new
            pv = jax.lax.dot_general(p.astype(v_buf.dtype), v_buf[cur, h],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv
        return ()

    jax.lax.fori_loop(0, num_blocks, body, ())

    l = jnp.where(l_ref[:, 0:1] == 0.0, 1.0, l_ref[:, 0:1])
    o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "scale", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,        # (B, 1, H, D)
    k_cache: jnp.ndarray,  # (B, KVH, M, D)
    v_cache: jnp.ndarray,  # (B, KVH, M, D)
    cache_len: jnp.ndarray,  # (B,) int32: the new token sits AT this index
    scale: Optional[float] = None,
    block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Length-bounded decode attention over per-slot caches."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[1]
    m = k_cache.shape[2]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    block = min(block, m)

    # group queries by kv head: rows [h*G:(h+1)*G] share kv head h
    qg = q.reshape(b, kvh * group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh * group, d), lambda bb, lens: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, kvh * group, d),
                               lambda bb, lens: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((2, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((kvh * group, d), jnp.float32),
            pltpu.VMEM((kvh * group, 128), jnp.float32),
            pltpu.VMEM((kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, kvh)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, block=block, kvh=kvh, group=group,
                          scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
        interpret=interpret,
    )(cache_len.astype(jnp.int32), qg, k_cache, v_cache)

    return out.reshape(b, 1, h, d)