"""Pallas decode attention: per-slot length-bounded KV cache reads.

The XLA decode path must read each slot's full cache bucket every step (a
bounded slice materializes a copy — measured slower). This kernel keeps the
cache in HBM and DMAs only blocks below each slot's live length, with an
online-softmax accumulator across blocks: HBM traffic tracks actual context
lengths instead of the bucket, which is the big remaining decode stream at
large batch.

Layout: grid (B, KVH); each program handles one (slot, kv-head) pair,
double-buffering k/v block DMAs and computing GQA scores for that head's
query group.
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
                   q_ref,                   # VMEM (1, 1, G, D)
                   k_hbm, v_hbm,            # ANY (1, M, 1, D) block slices
                   o_ref,                   # VMEM (1, 1, G, D)
                   k_buf, v_buf,            # VMEM scratch (2, BLK, D)
                   acc_ref, m_ref, l_ref,   # VMEM scratch
                   sems,                    # DMA semaphores (2, 2)
                   *, block: int, max_len: int, scale: float):
    slot = pl.program_id(0)
    seq_len = len_ref[slot] + 1          # +1: the new token was just written
    # lax.div instead of //-based cdiv: jnp's sign-correct floor-div carries a
    # nested `where` jaxpr that trips an MLIR lowering-cache bug inside
    # pallas kernels on this jax version
    num_blocks = jax.lax.div(seq_len + (block - 1), block)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def k_dma(i, slot_idx):
        return pltpu.make_async_copy(
            k_hbm.at[0, pl.ds(i * block, block), 0],
            k_buf.at[slot_idx], sems.at[0, slot_idx])

    def v_dma(i, slot_idx):
        return pltpu.make_async_copy(
            v_hbm.at[0, pl.ds(i * block, block), 0],
            v_buf.at[slot_idx], sems.at[1, slot_idx])

    # warm up: first block
    k_dma(0, 0).start()
    v_dma(0, 0).start()

    q = q_ref[0, 0]                      # (G, D)

    def body(i, _):
        cur = jax.lax.bitwise_and(i, 1)
        nxt = jax.lax.bitwise_and(i + 1, 1)

        @pl.when(i + 1 < num_blocks)
        def _():
            k_dma(i + 1, nxt).start()
            v_dma(i + 1, nxt).start()

        k_dma(i, cur).wait()
        v_dma(i, cur).wait()

        k = k_buf[cur]                   # (BLK, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        cols = i * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(cols < seq_len, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, 0:1] = m_new
        pv = jax.lax.dot_general(p.astype(v_buf.dtype), v_buf[cur],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        return ()

    jax.lax.fori_loop(0, num_blocks, body, ())

    l = jnp.where(l_ref[:, 0:1] == 0.0, 1.0, l_ref[:, 0:1])
    o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "scale", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,        # (B, 1, H, D)
    k_cache: jnp.ndarray,  # (B, M, KVH, D)
    v_cache: jnp.ndarray,  # (B, M, KVH, D)
    cache_len: jnp.ndarray,  # (B,) int32: the new token sits AT this index
    scale: Optional[float] = None,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Length-bounded decode attention over per-slot caches."""
    b, _, h, d = q.shape
    m = k_cache.shape[1]
    kvh = k_cache.shape[2]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    block = min(block, m)

    qg = q.reshape(b, kvh, group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kvh),
        in_specs=[
            pl.BlockSpec((1, 1, group, d), lambda bb, hh, lens: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1, d), lambda bb, hh, lens: (bb, 0, hh, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((1, m, 1, d), lambda bb, hh, lens: (bb, 0, hh, 0),
                         memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, group, d),
                               lambda bb, hh, lens: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k_cache.dtype),
            pltpu.VMEM((2, block, d), v_cache.dtype),
            pltpu.VMEM((group, d), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, block=block, max_len=m, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, group, d), q.dtype),
        interpret=interpret,
    )(cache_len.astype(jnp.int32), qg, k_cache, v_cache)

    return out.reshape(b, 1, h, d)