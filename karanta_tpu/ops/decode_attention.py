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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Ring tuning knobs, read once at import (per-process): override the append
# kernels' block / slots-per-program / DMA ring depth / VMEM scratch budget
# for on-chip A/Bs without touching call sites. 0 = keep the call-site value.
_RING_BLOCK = int(os.environ.get("KARANTA_RING_BLOCK", 0))
_RING_SPP = int(os.environ.get("KARANTA_RING_SPP", 0))
_RING_NBUF = int(os.environ.get("KARANTA_RING_NBUF", 0))
_RING_BUDGET = int(os.environ.get("KARANTA_RING_BUDGET_MB", 0)) << 20


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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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

def _decode_kernel_stacked(len_ref,              # SMEM (B,) int32
                           layer_ref,            # SMEM (1,) int32
                           q_ref,                # VMEM (1, KVH*G, D)
                           k_hbm, v_hbm,         # ANY (L, B, KVH, M, D)
                           o_ref,                # VMEM (1, KVH*G, D)
                           k_buf, v_buf,         # VMEM scratch (2, KVH, BLK, D)
                           acc_ref, m_ref, l_ref,
                           sems,                 # DMA semaphores (2, 2, KVH)
                           *, block: int, kvh: int, group: int, scale: float):
    """Layer-stacked variant: the kernel indexes the layer dimension itself
    (scalar-prefetched), so the caller never materializes a per-layer slice
    of the cache. This is what makes bounded reads pay off inside the decode
    layer scan: the XLA path must dynamic-slice a full (B, KVH, M, D) copy
    out of the stacked cache every layer (measured ~48% of decode time at
    B32/M4096) before attention even starts."""
    slot = pl.program_id(0)
    lidx = layer_ref[0]
    seq_len = len_ref[slot] + 1
    num_blocks = jax.lax.div(seq_len + (block - 1), block)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dmas(i, buf_slot):
        copies = []
        for h in range(kvh):
            copies.append(pltpu.make_async_copy(
                k_hbm.at[lidx, slot, h, pl.ds(i * block, block)],
                k_buf.at[buf_slot, h], sems.at[0, buf_slot, h]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[lidx, slot, h, pl.ds(i * block, block)],
                v_buf.at[buf_slot, h], sems.at[1, buf_slot, h]))
        return copies

    for dma in dmas(0, 0):
        dma.start()

    q = q_ref[0]

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
            qh = q[h * group:(h + 1) * group]
            k = k_buf[cur, h]
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


def _decode_kernel_stacked_alias(len_ref, layer_ref, q_ref, k_in, v_in,
                                 o_ref, k_out, v_out,
                                 k_buf, v_buf, acc_ref, m_ref, l_ref, sems,
                                 *, block, kvh, group, scale):
    """Alias-through wrapper: the cache operands are bound input->output so
    the buffers stay in place across the layer scan (a non-aliased ANY
    operand made XLA materialize a full cache copy per pallas call when the
    same carry was also scatter-updated — measured 35x slower end-to-end).
    The kernel never touches k_out/v_out; they ARE k_in/v_in."""
    del k_out, v_out
    _decode_kernel_stacked(len_ref, layer_ref, q_ref, k_in, v_in, o_ref,
                           k_buf, v_buf, acc_ref, m_ref, l_ref, sems,
                           block=block, kvh=kvh, group=group, scale=scale)


@functools.partial(jax.jit, static_argnames=("block", "scale", "interpret"))
def paged_decode_attention_stacked(
    q: jnp.ndarray,          # (B, 1, H, D)
    k_cache: jnp.ndarray,    # (L, B, KVH, M, D) — the engine's full cache
    v_cache: jnp.ndarray,    # (L, B, KVH, M, D)
    layer: jnp.ndarray,      # () or (1,) int32 layer index
    cache_len: jnp.ndarray,  # (B,) int32
    scale: Optional[float] = None,
    block: int = 512,
    interpret: bool = False,
):
    """Length-bounded decode attention reading one layer of the stacked cache
    in place. Returns (attn, k_cache, v_cache); the caches pass through via
    input_output_aliases so scan carries never copy."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[2]
    m = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    block = min(block, m)

    qg = q.reshape(b, kvh * group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kvh * group, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, kvh * group, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((2, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((kvh * group, d), jnp.float32),
            pltpu.VMEM((kvh * group, 128), jnp.float32),
            pltpu.VMEM((kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, kvh)),
        ],
    )

    out, k_new, v_new = pl.pallas_call(
        functools.partial(_decode_kernel_stacked_alias, block=block, kvh=kvh,
                          group=group, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # operands: 0 lens, 1 layer, 2 q, 3 k_cache, 4 v_cache
        input_output_aliases={3: 1, 4: 2},
        interpret=interpret,
    )(cache_len.astype(jnp.int32), jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, k_cache, v_cache)

    return out.reshape(b, 1, h, d), k_new, v_new


def _decode_append_kernel(len_ref,               # SMEM (B,) int32
                          layer_ref,             # SMEM (1,) int32
                          q_ref,                 # VMEM (SPP, KVH*G, D)
                          newk_ref, newv_ref,    # VMEM (SPP, KVH, D)
                          k_in, v_in,            # ANY (L, B, KVH, M, D)
                          o_ref,                 # VMEM (SPP, KVH*G, D)
                          k_out, v_out,          # ANY aliased to k_in/v_in
                          k_buf, v_buf,   # VMEM scratch (SPP, NBUF, KVH, BLK, D)
                          kslab, vslab,          # VMEM scratch (SPP, KVH, SLAB, D)
                          acc_ref, m_ref, l_ref,  # (SPP, KVH*G, ...)
                          sems,                  # DMA sems (2, SPP, NBUF)
                          wsems,                 # slab r/w sems (2, SPP)
                          *, block: int, kvh: int, group: int, scale: float,
                          slab: int, nbuf: int, spp: int):
    """Fused cache-append + length-bounded decode attention.

    The kernel owns BOTH sides of the cache update: it writes this step's
    (KVH, D) row at cache_len and reads only the live prefix, with the new
    token's score column computed from VMEM. The cache operands are aliased
    input->output, so inside the decode layer scan the buffers stay in place
    — XLA neither scatters (one fusion) nor dynamic-slices a per-layer copy
    (48% of decode time), nor copies for the pallas operand (what made the
    read-only kernel a 35x regression in-scan).

    The row write is a read-modify-write of the tile-aligned `slab`-row
    window containing cache_len (a single-row DMA source slice of the
    (1, KVH, D) VMEM operand violates Mosaic's (sublane, lane) tiling —
    that blocker is what kept this kernel off in round 1): read the slab,
    blend the new row in registers, write the slab back. Live rows are
    rewritten byte-identical and rows past cache_len are dead (masked by
    every bounded read), so the write can overlap the block loop safely.

    Each program serves `spp` slots with round-robin interleaved DMA rings:
    the one-slot-per-program version measured a ~6.5 us/program floor (DMA
    latency serialization around tiny per-slot copies — 36 layers x 32
    slots = 1152 programs per decode step), so slots are batched to keep
    spp x (nbuf-1) copies in flight and amortize the floor."""
    prog = pl.program_id(0)
    lidx = layer_ref[0]
    seqs = [len_ref[prog * spp + sp] for sp in range(spp)]
    nblocks = [jax.lax.div(sl + (block - 1), block) for sl in seqs]
    max_nb = nblocks[0]
    for nb in nblocks[1:]:
        max_nb = jnp.maximum(max_nb, nb)

    # --- slab read-modify-write of each slot's cache row ---
    slab_starts = [jax.lax.mul(jax.lax.div(sl, slab), slab) for sl in seqs]
    rcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        # one strided (KVH, slab, D) copy per cache — per-head copies double
        # the DMA/wait count, and the per-slot fixed cost IS the bottleneck
        rc = pltpu.make_async_copy(
            k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(slab_starts[sp], slab)],
            kslab.at[sp], wsems.at[0, sp])
        rc.start()
        rcopies.append(rc)
        rc = pltpu.make_async_copy(
            v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(slab_starts[sp], slab)],
            vslab.at[sp], wsems.at[1, sp])
        rc.start()
        rcopies.append(rc)
    for rc in rcopies:
        rc.wait()
    wcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        row_sel = (jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
                   == seqs[sp] - slab_starts[sp])
        newk = newk_ref[sp]                      # (KVH, D)
        newv = newv_ref[sp]
        for h in range(kvh):
            kslab[sp, h] = jnp.where(row_sel, newk[h][None, :], kslab[sp, h])
            vslab[sp, h] = jnp.where(row_sel, newv[h][None, :], vslab[sp, h])
        wc = pltpu.make_async_copy(
            kslab.at[sp],
            k_out.at[lidx, slot, pl.ds(0, kvh), pl.ds(slab_starts[sp], slab)],
            wsems.at[0, sp])
        wc.start()
        wcopies.append(wc)
        wc = pltpu.make_async_copy(
            vslab.at[sp],
            v_out.at[lidx, slot, pl.ds(0, kvh), pl.ds(slab_starts[sp], slab)],
            wsems.at[1, sp])
        wc.start()
        wcopies.append(wc)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def dmas(sp, i, buf_slot):
        slot = prog * spp + sp
        return [
            pltpu.make_async_copy(
                k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
            pltpu.make_async_copy(
                v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
        ]

    # prologue: fill every slot's ring nbuf-1 deep
    for sp in range(spp):
        for j in range(nbuf - 1):
            @pl.when(j < nblocks[sp])
            def _(sp=sp, j=j):
                for dma in dmas(sp, j, j):
                    dma.start()

    def body(i, _):
        cur = jax.lax.rem(i, nbuf)

        # top up every ring first, then consume: while slot sp computes,
        # the other slots' block-i copies (and all top-ups) are streaming
        for sp in range(spp):
            @pl.when(i + nbuf - 1 < nblocks[sp])
            def _(sp=sp):
                pre = i + nbuf - 1
                for dma in dmas(sp, pre, jax.lax.rem(pre, nbuf)):
                    dma.start()

        for sp in range(spp):
            @pl.when(i < nblocks[sp])
            def _(sp=sp):
                for dma in dmas(sp, i, cur):
                    dma.wait()

                cols = i * block + jax.lax.broadcasted_iota(
                    jnp.int32, (group, block), 1)
                valid = cols < seqs[sp]
                q = q_ref[sp]

                for h in range(kvh):
                    qh = q[h * group:(h + 1) * group]
                    k = k_buf[sp, cur, h]
                    s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    s = jnp.where(valid, s * scale, NEG_INF)

                    rows = slice(h * group, (h + 1) * group)
                    m_prev = m_ref[sp, rows, 0:1]
                    l_prev = l_ref[sp, rows, 0:1]
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    l_ref[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                        p, axis=-1, keepdims=True)
                    m_ref[sp, rows, 0:1] = m_new
                    pv = jax.lax.dot_general(p.astype(v_buf.dtype),
                                             v_buf[sp, cur, h],
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                    acc_ref[sp, rows, :] = acc_ref[sp, rows, :] * alpha + pv
        return ()

    jax.lax.fori_loop(0, max_nb, body, ())

    # fold in each slot's new token from VMEM (never read back from HBM)
    for sp in range(spp):
        newk = newk_ref[sp]
        newv = newv_ref[sp]
        q = q_ref[sp]
        for h in range(kvh):
            rows = slice(h * group, (h + 1) * group)
            qh = q[rows]
            nk = newk[h].astype(jnp.float32)               # (D,)
            s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                          keepdims=True) * scale           # (G, 1)
            m_prev = m_ref[sp, rows, 0:1]
            l_prev = l_ref[sp, rows, 0:1]
            m_new = jnp.maximum(m_prev, s_x)
            p_x = jnp.exp(s_x - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[sp, rows, 0:1] = alpha * l_prev + p_x
            nv = newv[h].astype(jnp.float32)
            acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                    + p_x * nv[None, :])

    for wc in wcopies:
        wc.wait()

    for sp in range(spp):
        l = l_ref[sp, :, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[sp] = (acc_ref[sp] / l).astype(o_ref.dtype)


def _fit_ring(m: int, block: int, spp: int, b: int, kvh: int, d: int,
              esize: int, nbuf: int, budget: int = 12 << 20) -> tuple[int, int]:
    """Pick a legal (block, spp) for the ring-DMA append kernels.

    Constraints, in order: spp divides the batch; block divides the bucket
    (the ring slices pl.ds(i*block, block) — a non-divisor runs the last
    slice past the bucket) and is LANE-ALIGNED: a multiple of 128 rows when
    the bucket is (Mosaic rejects cache-axis slices that aren't aligned to
    the 128 tiling — a 3B bf16 cache at block 960 failed to compile), else
    a multiple of 32 (tile-legal minimum; covers the tiny interpret-mode
    buckets in tests); the K+V ring scratch (spp*nbuf*kvh*block*d*esize*2)
    fits a VMEM budget — preferring to shrink block before slots-per-program.

    Defaults from the on-chip ladder at the 7B bench point (B80, M1920,
    int8 KV, fill 1650; kernel ms per 64-step chunk): spp4/blk640 693.6,
    nbuf3 730.5, spp8/blk640 653.5 (best), spp16/blk640 VMEM-OOM (the
    scoped limit is 16 MB), spp16/blk320 1469 (small DMA slices). Hence
    spp default 8 and a 12 MB budget; blocks below ~512 rows lose to DMA
    inefficiency, so prefer keeping block large over keeping spp large."""
    while b % spp:
        spp //= 2
    spp = max(spp, 1)
    align = 128 if (m >= 128 and m % 128 == 0) else 32
    if m % align:
        # m < 32 passes the callers' slab=min(32, m) check but has no
        # tile-legal block at all — fail with the real constraint instead
        # of walking block to zero below
        raise ValueError(f"max_seq_len {m} must be a multiple of {align}")
    block = max(align, min(block, m))
    block -= block % align
    while m % block:
        block -= align

    def scratch() -> int:
        return spp * nbuf * kvh * block * d * esize * 2

    while scratch() > budget and block > align:
        block -= align
        while m % block:
            block -= align
    while scratch() > budget and spp > 1:
        spp //= 2
    return block, spp


def _ring_env(block: int, spp: int, nbuf: int) -> tuple[int, int, int]:
    """Apply the per-process KARANTA_RING_* overrides (0 = call-site value).

    nbuf is clamped to >= 2: the ring always needs a consume buffer."""
    return (_RING_BLOCK or block, _RING_SPP or spp,
            max(2, _RING_NBUF or nbuf))


@functools.partial(jax.jit,
                   static_argnames=("block", "scale", "interpret", "nbuf",
                                    "spp"))
def paged_decode_append(
    q: jnp.ndarray,          # (B, 1, H, D)
    new_k: jnp.ndarray,      # (B, KVH, D) this step's key rows
    new_v: jnp.ndarray,      # (B, KVH, D)
    k_cache: jnp.ndarray,    # (L, B, KVH, M, D) donated/aliased
    v_cache: jnp.ndarray,    # (L, B, KVH, M, D)
    layer: jnp.ndarray,      # () int32
    cache_len: jnp.ndarray,  # (B,) int32 rows already present
    scale: Optional[float] = None,
    block: int = 512,
    interpret: bool = False,
    nbuf: int = 2,           # DMA ring depth per slot
    spp: int = 8,            # slots per program (VMEM: spp*nbuf*2*blk*D*2B)
):
    """Append new_k/new_v at cache_len and attend over the live prefix + the
    new row. Returns (attn (B,1,H,D), k_cache, v_cache) with the caches
    updated in place (input_output_aliases)."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[2]
    m = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    if nbuf < 2:
        raise ValueError("nbuf must be >= 2 (ring needs a consume buffer)")
    block, spp, nbuf = _ring_env(block, spp, nbuf)
    block, spp = _fit_ring(m, block, spp, b, kvh, d,
                           jnp.dtype(k_cache.dtype).itemsize, nbuf,
                           budget=_RING_BUDGET or 12 << 20)
    # slab for the row RMW: 32 rows is tile-aligned for every cache dtype
    # (f32 8, bf16 16, int8 32 sublanes) and must divide the bucket length
    slab = min(32, m)
    if m % slab:
        raise ValueError(f"max_seq_len {m} must be a multiple of {slab}")

    qg = q.reshape(b, kvh * group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // spp,),
        in_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((spp, nbuf, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((spp, kvh, slab, d), k_cache.dtype),
            pltpu.VMEM((spp, kvh, slab, d), v_cache.dtype),
            pltpu.VMEM((spp, kvh * group, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, spp, nbuf)),
            pltpu.SemaphoreType.DMA((2, spp)),
        ],
    )

    attn, k_new, v_new = pl.pallas_call(
        functools.partial(_decode_append_kernel, block=block, kvh=kvh,
                          group=group, scale=scale, slab=slab, nbuf=nbuf,
                          spp=spp),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # operand indices include the two scalar-prefetch args:
        # 0 lens, 1 layer, 2 q, 3 new_k, 4 new_v, 5 k_cache, 6 v_cache
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(cache_len.astype(jnp.int32), jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, new_k.astype(k_cache.dtype), new_v.astype(v_cache.dtype),
      k_cache, v_cache)

    return attn.reshape(b, 1, h, d), k_new, v_new


def _decode_append_quant_kernel(
        len_ref,               # SMEM (B,) int32
        layer_ref,             # SMEM (1,) int32
        q_ref,                 # VMEM (SPP, KVH*G, D)
        newk_ref, newv_ref,    # VMEM (SPP, KVH, D) int8
        newks_ref, newvs_ref,  # VMEM (SPP, KVH, 1) row scales
        k_in, v_in,            # ANY int8 (L, B, KVH, M, D)
        ks_in, vs_in,          # ANY (L, B, KVH, M)
        o_ref,                 # VMEM (SPP, KVH*G, D)
        k_out, v_out, ks_out, vs_out,   # ANY aliased to the four caches
        k_buf, v_buf,          # VMEM scratch (SPP, NBUF, KVH, BLK, D) int8
        ksc_buf, vsc_buf,      # VMEM scratch (SPP, NBUF, KVH, BLK)
        kslab, vslab,          # VMEM scratch (SPP, KVH, SLAB, D) int8
        ksslab, vsslab,        # VMEM scratch (SPP, KVH, SSLAB)
        acc_ref, m_ref, l_ref,
        sems,                  # DMA sems (4, SPP, NBUF)
        wsems,                 # slab r/w sems (4, SPP)
        *, block: int, kvh: int, group: int, scale: float,
        slab: int, sslab: int, nbuf: int, spp: int, compute_dtype):
    """int8-cache variant of _decode_append_kernel: rows are int8 with
    per-row scales ((L, B, KVH, M) arrays, aliased through like the row
    caches). Scales fold into the f32 score/probability tensors — the
    dequantized cache never exists (same math as
    ops.attention.decode_attention's int8 path). All four cache buffers stay
    in place across the layer scan; same spp-slot DMA-ring structure as the
    bf16 kernel."""
    prog = pl.program_id(0)
    lidx = layer_ref[0]
    seqs = [len_ref[prog * spp + sp] for sp in range(spp)]
    nblocks = [jax.lax.div(sl + (block - 1), block) for sl in seqs]
    max_nb = nblocks[0]
    for nb in nblocks[1:]:
        max_nb = jnp.maximum(max_nb, nb)

    # --- slab RMW of each slot's int8 row + its scale ---
    slab_starts = [jax.lax.mul(jax.lax.div(sl, slab), slab) for sl in seqs]
    sslab_starts = [jax.lax.mul(jax.lax.div(sl, sslab), sslab) for sl in seqs]
    rcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        for j, (src, dst) in enumerate((
                (k_in, kslab), (v_in, vslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(slab_starts[sp], slab)],
                dst.at[sp], wsems.at[j, sp])
            rc.start()
            rcopies.append(rc)
        for j, (src, dst) in enumerate(((ks_in, ksslab), (vs_in, vsslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(sslab_starts[sp], sslab)],
                dst.at[sp], wsems.at[2 + j, sp])
            rc.start()
            rcopies.append(rc)
    for rc in rcopies:
        rc.wait()
    wcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        row_sel = (jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
                   == seqs[sp] - slab_starts[sp])
        newk = newk_ref[sp]
        newv = newv_ref[sp]
        for h in range(kvh):
            kslab[sp, h] = jnp.where(row_sel, newk[h][None, :], kslab[sp, h])
            vslab[sp, h] = jnp.where(row_sel, newv[h][None, :], vslab[sp, h])
        col_sel = (jax.lax.broadcasted_iota(jnp.int32, (kvh, sslab), 1)
                   == seqs[sp] - sslab_starts[sp])
        ksslab[sp] = jnp.where(col_sel,
                               newks_ref[sp].astype(ksslab.dtype),
                               ksslab[sp])
        vsslab[sp] = jnp.where(col_sel,
                               newvs_ref[sp].astype(vsslab.dtype),
                               vsslab[sp])
        wc = pltpu.make_async_copy(
            kslab.at[sp], k_out.at[lidx, slot, pl.ds(0, kvh),
                                   pl.ds(slab_starts[sp], slab)],
            wsems.at[0, sp])
        wc.start()
        wcopies.append(wc)
        wc = pltpu.make_async_copy(
            vslab.at[sp], v_out.at[lidx, slot, pl.ds(0, kvh),
                                   pl.ds(slab_starts[sp], slab)],
            wsems.at[1, sp])
        wc.start()
        wcopies.append(wc)
        wc = pltpu.make_async_copy(
            ksslab.at[sp], ks_out.at[lidx, slot, pl.ds(0, kvh),
                                     pl.ds(sslab_starts[sp], sslab)],
            wsems.at[2, sp])
        wc.start()
        wcopies.append(wc)
        wc = pltpu.make_async_copy(
            vsslab.at[sp], vs_out.at[lidx, slot, pl.ds(0, kvh),
                                     pl.ds(sslab_starts[sp], sslab)],
            wsems.at[3, sp])
        wc.start()
        wcopies.append(wc)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def dmas(sp, i, buf_slot):
        slot = prog * spp + sp
        return [
            pltpu.make_async_copy(
                k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
            pltpu.make_async_copy(
                v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
            pltpu.make_async_copy(
                ks_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                ksc_buf.at[sp, buf_slot], sems.at[2, sp, buf_slot]),
            pltpu.make_async_copy(
                vs_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                vsc_buf.at[sp, buf_slot], sems.at[3, sp, buf_slot]),
        ]

    for sp in range(spp):
        for j in range(nbuf - 1):
            @pl.when(j < nblocks[sp])
            def _(sp=sp, j=j):
                for dma in dmas(sp, j, j):
                    dma.start()

    def body(i, _):
        cur = jax.lax.rem(i, nbuf)

        for sp in range(spp):
            @pl.when(i + nbuf - 1 < nblocks[sp])
            def _(sp=sp):
                pre = i + nbuf - 1
                for dma in dmas(sp, pre, jax.lax.rem(pre, nbuf)):
                    dma.start()

        for sp in range(spp):
            @pl.when(i < nblocks[sp])
            def _(sp=sp):
                for dma in dmas(sp, i, cur):
                    dma.wait()

                cols = i * block + jax.lax.broadcasted_iota(
                    jnp.int32, (group, block), 1)
                valid = cols < seqs[sp]
                q = q_ref[sp]
                ksc = ksc_buf[sp, cur].astype(jnp.float32)   # (KVH, BLK)
                vsc = vsc_buf[sp, cur].astype(jnp.float32)

                for h in range(kvh):
                    qh = q[h * group:(h + 1) * group]
                    k = k_buf[sp, cur, h].astype(compute_dtype)
                    s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    s = s * ksc[h][None, :]
                    s = jnp.where(valid, s * scale, NEG_INF)

                    rows = slice(h * group, (h + 1) * group)
                    m_prev = m_ref[sp, rows, 0:1]
                    l_prev = l_ref[sp, rows, 0:1]
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    l_ref[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                        p, axis=-1, keepdims=True)
                    m_ref[sp, rows, 0:1] = m_new
                    pv = jax.lax.dot_general(
                        (p * vsc[h][None, :]).astype(compute_dtype),
                        v_buf[sp, cur, h].astype(compute_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[sp, rows, :] = acc_ref[sp, rows, :] * alpha + pv
        return ()

    jax.lax.fori_loop(0, max_nb, body, ())

    # fold in each slot's new token (dequantized from VMEM)
    for sp in range(spp):
        newk = newk_ref[sp]
        newv = newv_ref[sp]
        newks = newks_ref[sp][:, 0].astype(jnp.float32)
        newvs = newvs_ref[sp][:, 0].astype(jnp.float32)
        q = q_ref[sp]
        for h in range(kvh):
            rows = slice(h * group, (h + 1) * group)
            qh = q[rows]
            nk = newk[h].astype(jnp.float32) * newks[h]
            s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                          keepdims=True) * scale
            m_prev = m_ref[sp, rows, 0:1]
            l_prev = l_ref[sp, rows, 0:1]
            m_new = jnp.maximum(m_prev, s_x)
            p_x = jnp.exp(s_x - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[sp, rows, 0:1] = alpha * l_prev + p_x
            nv = newv[h].astype(jnp.float32) * newvs[h]
            acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                    + p_x * nv[None, :])

    for wc in wcopies:
        wc.wait()

    for sp in range(spp):
        l = l_ref[sp, :, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[sp] = (acc_ref[sp] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block", "scale", "interpret", "nbuf",
                                    "spp"))
def paged_decode_append_quant(
    q: jnp.ndarray,          # (B, 1, H, D)
    new_k: jnp.ndarray,      # (B, KVH, D) int8 quantized rows
    new_v: jnp.ndarray,      # (B, KVH, D) int8
    new_ks: jnp.ndarray,     # (B, KVH) row scales
    new_vs: jnp.ndarray,     # (B, KVH)
    k_cache: jnp.ndarray,    # (L, B, KVH, M, D) int8, aliased
    v_cache: jnp.ndarray,    # (L, B, KVH, M, D) int8
    ks_cache: jnp.ndarray,   # (L, B, KVH, M) scales, aliased
    vs_cache: jnp.ndarray,   # (L, B, KVH, M)
    layer: jnp.ndarray,      # () int32
    cache_len: jnp.ndarray,  # (B,) int32 rows already present
    scale: Optional[float] = None,
    block: int = 512,
    interpret: bool = False,
    nbuf: int = 2,
    spp: int = 8,
):
    """Fused append + length-bounded attention over the int8 KV cache.
    Returns (attn, k_cache, v_cache, ks_cache, vs_cache) with all four
    buffers updated in place via input_output_aliases — inside the decode
    layer scan nothing is scattered, sliced, or dequantized outside the
    kernel (the XLA int8 path materializes a bf16 copy of the layer's
    cache per step — BENCH_NOTES: int8 KV was perf-neutral because of it)."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[2]
    m = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    if nbuf < 2:
        raise ValueError("nbuf must be >= 2 (ring needs a consume buffer)")
    block, spp, nbuf = _ring_env(block, spp, nbuf)
    block, spp = _fit_ring(m, block, spp, b, kvh, d, 1, nbuf,
                           budget=_RING_BUDGET or 12 << 20)
    slab = min(32, m)
    sslab = min(128, m)   # scale slab: full 128-lane tiles of the (KVH, M) dims
    if m % slab or m % sslab:
        raise ValueError(
            f"max_seq_len {m} must be a multiple of {slab} and {sslab}")
    compute_dtype = q.dtype
    sdtype = ks_cache.dtype   # scales stay in their storage dtype: a cast
                              # would break input_output aliasing (fresh
                              # buffer per layer — the copy this kernel kills)

    qg = q.reshape(b, kvh * group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // spp,),
        in_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            # trailing unit dim: a (spp, kvh) block violates Mosaic's
            # last-two-dims rule (kvh=2 not divisible by 8); (kvh, 1) blocks
            # equal the array's own last two dims, which is allowed
            pl.BlockSpec((spp, kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((spp, nbuf, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block), sdtype),
            pltpu.VMEM((spp, nbuf, kvh, block), sdtype),
            pltpu.VMEM((spp, kvh, slab, d), k_cache.dtype),
            pltpu.VMEM((spp, kvh, slab, d), v_cache.dtype),
            pltpu.VMEM((spp, kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh * group, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, spp, nbuf)),
            pltpu.SemaphoreType.DMA((4, spp)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_append_quant_kernel, block=block, kvh=kvh,
                          group=group, scale=scale, slab=slab, sslab=sslab,
                          nbuf=nbuf, spp=spp, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, sdtype),
            jax.ShapeDtypeStruct(vs_cache.shape, sdtype),
        ],
        # operands: 0 lens, 1 layer, 2 q, 3 new_k, 4 new_v, 5 new_ks,
        # 6 new_vs, 7 k_cache, 8 v_cache, 9 ks_cache, 10 vs_cache
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(cache_len.astype(jnp.int32),
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, new_k, new_v,
      new_ks.astype(sdtype)[..., None], new_vs.astype(sdtype)[..., None],
      k_cache, v_cache, ks_cache, vs_cache)

    attn, k_new, v_new, ks_new, vs_new = out
    return attn.reshape(b, 1, h, d), k_new, v_new, ks_new, vs_new


def _decode_append_multi_quant_kernel(
        len_ref,               # SMEM (B,) int32
        layer_ref,             # SMEM (1,) int32
        q_ref,                 # VMEM (SPP, KVH*G*T, D) — rows h-major, then
                               #      g, then t (query t of head (h, g) at
                               #      row h*G*T + g*T + t)
        newk_ref, newv_ref,    # VMEM (SPP, T*KVH, D) int8 — row t*KVH + h
        newks_ref, newvs_ref,  # VMEM (SPP, T*KVH, 1) row scales
        k_in, v_in,            # ANY int8 (L, B, KVH, M, D)
        ks_in, vs_in,          # ANY (L, B, KVH, M)
        o_ref,                 # VMEM (SPP, KVH*G*T, D)
        k_out, v_out, ks_out, vs_out,   # ANY aliased to the four caches
        k_buf, v_buf,          # VMEM scratch (SPP, NBUF, KVH, BLK, D) int8
        ksc_buf, vsc_buf,      # VMEM scratch (SPP, NBUF, KVH, BLK)
        kslab, vslab,          # VMEM scratch (SPP, KVH, SLAB, D) int8
        ksslab, vsslab,        # VMEM scratch (SPP, KVH, SSLAB)
        acc_ref, m_ref, l_ref,
        sems, wsems,
        *, block: int, kvh: int, group: int, tq: int, scale: float,
        slab: int, sslab: int, nbuf: int, spp: int, compute_dtype):
    """Multi-token (speculative-verify) variant of _decode_append_quant_kernel:
    appends tq int8 rows per slot at cache_len + [0, tq) and attends tq
    queries per head against ONE ring read of the cache — query t sees cache
    rows [0, cache_len + t] (causal over the fresh rows, matching
    ops.attention.decode_attention_multi). The XLA decode_multi path
    materializes full K+V cache copies in the scan carry (2x cache HBM
    traffic per verify pass, OOM at 7B B80 — BENCH_NOTES round-2 session 4);
    this kernel keeps all four cache buffers aliased in place.

    Slab geometry: the tq new rows start anywhere in [0, 32) of a 32-row
    window, so the RMW slab is 64 rows anchored at (len//32)*32 (clamped to
    m - slab) — offset + tq <= 31 + tq <= slab for tq <= 33."""
    prog = pl.program_id(0)
    lidx = layer_ref[0]
    gt = group * tq
    seqs = [len_ref[prog * spp + sp] for sp in range(spp)]
    nblocks = [jax.lax.div(sl + (block - 1), block) for sl in seqs]
    max_nb = nblocks[0]
    for nb in nblocks[1:]:
        max_nb = jnp.maximum(max_nb, nb)

    # --- slab RMW of each slot's tq int8 rows + their scales ---
    # Anchors must be PROVABLY tile-aligned for Mosaic's DMA checker, so the
    # clamp happens BEFORE the div/mul (min(seq, m-size) then round down to
    # the alignment): row slabs align to 32 (sublane tiling 8), scale slabs
    # to 128 (lane tiling). offset + tq stays inside the slab because seq is
    # <= m - tq - 1 and the slab extends one full alignment past the window.
    m_total = k_in.shape[3]

    def anchor(sl, size, align):
        return jax.lax.mul(
            jax.lax.div(jnp.minimum(sl, m_total - size), align), align)

    slab_starts = [anchor(sl, slab, 32) for sl in seqs]
    sslab_starts = [anchor(sl, sslab, 128 if sslab >= 128 else sslab)
                    for sl in seqs]
    rcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        for j, (src, dst) in enumerate(((k_in, kslab), (v_in, vslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(slab_starts[sp], slab)],
                dst.at[sp], wsems.at[j, sp])
            rc.start()
            rcopies.append(rc)
        for j, (src, dst) in enumerate(((ks_in, ksslab), (vs_in, vsslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(sslab_starts[sp], sslab)],
                dst.at[sp], wsems.at[2 + j, sp])
            rc.start()
            rcopies.append(rc)
    for rc in rcopies:
        rc.wait()
    wcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (kvh, sslab), 1)
        off = seqs[sp] - slab_starts[sp]
        off_s = seqs[sp] - sslab_starts[sp]
        for t in range(tq):
            row_sel = row_iota == off + t
            for h in range(kvh):
                kslab[sp, h] = jnp.where(row_sel,
                                         newk_ref[sp, t * kvh + h][None, :],
                                         kslab[sp, h])
                vslab[sp, h] = jnp.where(row_sel,
                                         newv_ref[sp, t * kvh + h][None, :],
                                         vslab[sp, h])
            col_sel = col_iota == off_s + t
            ksslab[sp] = jnp.where(
                col_sel,
                newks_ref[sp, t * kvh:(t + 1) * kvh].astype(ksslab.dtype),
                ksslab[sp])
            vsslab[sp] = jnp.where(
                col_sel,
                newvs_ref[sp, t * kvh:(t + 1) * kvh].astype(vsslab.dtype),
                vsslab[sp])
        for j, (src, dst, starts, size) in enumerate((
                (kslab, k_out, slab_starts, slab),
                (vslab, v_out, slab_starts, slab),
                (ksslab, ks_out, sslab_starts, sslab),
                (vsslab, vs_out, sslab_starts, sslab))):
            wc = pltpu.make_async_copy(
                src.at[sp], dst.at[lidx, slot, pl.ds(0, kvh),
                                   pl.ds(starts[sp], size)],
                wsems.at[j, sp])
            wc.start()
            wcopies.append(wc)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def dmas(sp, i, buf_slot):
        slot = prog * spp + sp
        return [
            pltpu.make_async_copy(
                k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
            pltpu.make_async_copy(
                v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
            pltpu.make_async_copy(
                ks_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                ksc_buf.at[sp, buf_slot], sems.at[2, sp, buf_slot]),
            pltpu.make_async_copy(
                vs_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                vsc_buf.at[sp, buf_slot], sems.at[3, sp, buf_slot]),
        ]

    for sp in range(spp):
        for j in range(nbuf - 1):
            @pl.when(j < nblocks[sp])
            def _(sp=sp, j=j):
                for dma in dmas(sp, j, j):
                    dma.start()

    def body(i, _):
        cur = jax.lax.rem(i, nbuf)

        for sp in range(spp):
            @pl.when(i + nbuf - 1 < nblocks[sp])
            def _(sp=sp):
                pre = i + nbuf - 1
                for dma in dmas(sp, pre, jax.lax.rem(pre, nbuf)):
                    dma.start()

        for sp in range(spp):
            @pl.when(i < nblocks[sp])
            def _(sp=sp):
                for dma in dmas(sp, i, cur):
                    dma.wait()

                # ring rows < cache_len: visible to every one of the tq
                # queries, so this is the single-token loop with the score
                # tile widened from (G, BLK) to (G*T, BLK)
                cols = i * block + jax.lax.broadcasted_iota(
                    jnp.int32, (gt, block), 1)
                valid = cols < seqs[sp]
                q = q_ref[sp]
                ksc = ksc_buf[sp, cur].astype(jnp.float32)
                vsc = vsc_buf[sp, cur].astype(jnp.float32)

                for h in range(kvh):
                    qh = q[h * gt:(h + 1) * gt]
                    k = k_buf[sp, cur, h].astype(compute_dtype)
                    s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    s = s * ksc[h][None, :]
                    s = jnp.where(valid, s * scale, NEG_INF)

                    rows = slice(h * gt, (h + 1) * gt)
                    m_prev = m_ref[sp, rows, 0:1]
                    l_prev = l_ref[sp, rows, 0:1]
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    l_ref[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                        p, axis=-1, keepdims=True)
                    m_ref[sp, rows, 0:1] = m_new
                    pv = jax.lax.dot_general(
                        (p * vsc[h][None, :]).astype(compute_dtype),
                        v_buf[sp, cur, h].astype(compute_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[sp, rows, :] = acc_ref[sp, rows, :] * alpha + pv
        return ()

    jax.lax.fori_loop(0, max_nb, body, ())

    # fold in the tq fresh rows (dequantized from VMEM), causally: the
    # query at row h*G*T + g*T + t_q sees new key t_k iff t_k <= t_q
    t_of_row = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (gt, 1), 0), tq)
    for sp in range(spp):
        q = q_ref[sp]
        # cast the scale columns to f32 BEFORE any scalar extract — Mosaic
        # only supports 32-bit scalar vector.extracts
        nks_f = newks_ref[sp][:, 0].astype(jnp.float32)   # (T*KVH,)
        nvs_f = newvs_ref[sp][:, 0].astype(jnp.float32)
        for h in range(kvh):
            rows = slice(h * gt, (h + 1) * gt)
            qh = q[rows]
            for t in range(tq):
                nk = (newk_ref[sp, t * kvh + h].astype(jnp.float32)
                      * nks_f[t * kvh + h])
                s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                              keepdims=True) * scale
                s_x = jnp.where(t_of_row >= t, s_x, NEG_INF)
                m_prev = m_ref[sp, rows, 0:1]
                l_prev = l_ref[sp, rows, 0:1]
                m_new = jnp.maximum(m_prev, s_x)
                p_x = jnp.exp(s_x - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[sp, rows, 0:1] = alpha * l_prev + p_x
                m_ref[sp, rows, 0:1] = m_new
                nv = (newv_ref[sp, t * kvh + h].astype(jnp.float32)
                      * nvs_f[t * kvh + h])
                acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                        + p_x * nv[None, :])

    for wc in wcopies:
        wc.wait()

    for sp in range(spp):
        l = l_ref[sp, :, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[sp] = (acc_ref[sp] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block", "scale", "interpret", "nbuf",
                                    "spp"))
def paged_decode_append_multi_quant(
    q: jnp.ndarray,          # (B, T, H, D)
    new_k: jnp.ndarray,      # (B, T, KVH, D) int8 quantized rows
    new_v: jnp.ndarray,      # (B, T, KVH, D) int8
    new_ks: jnp.ndarray,     # (B, T, KVH) row scales
    new_vs: jnp.ndarray,     # (B, T, KVH)
    k_cache: jnp.ndarray,    # (L, B, KVH, M, D) int8, aliased
    v_cache: jnp.ndarray,    # (L, B, KVH, M, D) int8
    ks_cache: jnp.ndarray,   # (L, B, KVH, M) scales, aliased
    vs_cache: jnp.ndarray,   # (L, B, KVH, M)
    layer: jnp.ndarray,      # () int32
    cache_len: jnp.ndarray,  # (B,) rows present BEFORE the T new ones
    scale: Optional[float] = None,
    block: int = 512,
    interpret: bool = False,
    nbuf: int = 2,
    spp: int = 4,
):
    """Fused multi-token append + verify attention over the int8 KV cache:
    one ring read of the cache serves all T speculative queries, and the
    four cache buffers update in place (input_output_aliases) — the
    structural fix for the measured 2.5-4x verify-pass cost of the XLA
    decode_multi path (scan-carry cache copies; BENCH_NOTES round-2
    session 4). Semantics match ops.attention.decode_attention_multi.

    Callers must keep every cache_len <= M - T - 1 (the engine's spec loop
    clamps exactly that) so the slab RMW stays in bounds."""
    b, tq, h, d = q.shape
    kvh = k_cache.shape[2]
    m = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    if nbuf < 2:
        raise ValueError("nbuf must be >= 2 (ring needs a consume buffer)")
    if tq > 32:
        raise ValueError(f"tq {tq} exceeds the 64-row slab headroom")
    block, spp, nbuf = _ring_env(block, spp, nbuf)
    # smaller budget than the single-token kernel: the q/acc/m/l tiles grow
    # by T and must fit the same scoped-VMEM ceiling
    block, spp = _fit_ring(m, block, spp, b, kvh, d, 1, nbuf,
                           budget=_RING_BUDGET or 8 << 20)
    slab = min(64, m)
    # scale slab: 128-lane anchored, one extra 128-window so offsets up to
    # 127 + tq never spill past it
    sslab = min(256, m)
    if m % 32 or (m >= 128 and m % 128):
        raise ValueError(f"max_seq_len {m} must be a multiple of 32 "
                         "(and 128 when >= 128)")
    compute_dtype = q.dtype
    sdtype = ks_cache.dtype

    # rows h-major then g then t (see kernel docstring)
    qg = q.transpose(0, 2, 1, 3).reshape(b, h * tq, d)
    nk = new_k.reshape(b, tq * kvh, d)
    nv = new_v.reshape(b, tq * kvh, d)
    nks = new_ks.reshape(b, tq * kvh, 1).astype(sdtype)
    nvs = new_vs.reshape(b, tq * kvh, 1).astype(sdtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // spp,),
        in_specs=[
            pl.BlockSpec((spp, kvh * group * tq, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((spp, kvh * group * tq, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((spp, nbuf, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block), sdtype),
            pltpu.VMEM((spp, nbuf, kvh, block), sdtype),
            pltpu.VMEM((spp, kvh, slab, d), k_cache.dtype),
            pltpu.VMEM((spp, kvh, slab, d), v_cache.dtype),
            pltpu.VMEM((spp, kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh * group * tq, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group * tq, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group * tq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, spp, nbuf)),
            pltpu.SemaphoreType.DMA((4, spp)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_append_multi_quant_kernel, block=block,
                          kvh=kvh, group=group, tq=tq, scale=scale,
                          slab=slab, sslab=sslab, nbuf=nbuf, spp=spp,
                          compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group * tq, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, sdtype),
            jax.ShapeDtypeStruct(vs_cache.shape, sdtype),
        ],
        # operands: 0 lens, 1 layer, 2 q, 3 new_k, 4 new_v, 5 new_ks,
        # 6 new_vs, 7 k_cache, 8 v_cache, 9 ks_cache, 10 vs_cache
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(cache_len.astype(jnp.int32),
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, nk, nv, nks, nvs,
      k_cache, v_cache, ks_cache, vs_cache)

    attn, k_new, v_new, ks_new, vs_new = out
    attn = attn.reshape(b, kvh * group, tq, d).transpose(0, 2, 1, 3)
    return attn.reshape(b, tq, h, d), k_new, v_new, ks_new, vs_new


# ---------------------------------------------------------------------------
# int4 (nibble-packed) cache variant — see Q4KVCache in
# models/qwen25_vl/decoder.py for the packing scheme. Packed row r of a
# 64-token window w (r = 32*w + j, j in [0, 32)) holds token 64*w + j in the
# LOW nibble and token 64*w + 32 + j in the HIGH nibble; scales stay
# per-token in nibble-plane order (2*KVH rows: 2h + nib). The ring DMAs move
# half the bytes of the int8 kernel per live token; each block contributes
# TWO online-softmax updates (one per nibble plane) whose score columns are
# already in packed-row order on both the K tiles and the scale tiles.
# ---------------------------------------------------------------------------


def _q4_unpack_i32(b32, shift_lo: bool):
    """Sign-extended nibble values from int32-upcast packed bytes."""
    return (b32 << 28) >> 28 if shift_lo else b32 >> 4


def _decode_append_q4_kernel(
        len_ref,               # SMEM (B,) int32
        layer_ref,             # SMEM (1,) int32
        q_ref,                 # VMEM (SPP, KVH*G, D)
        newk_ref, newv_ref,    # VMEM (SPP, KVH, D) int8 nibbles in [-7, 7]
        newks_ref, newvs_ref,  # VMEM (SPP, 2*KVH, 1) nibble-plane row scales
        k_in, v_in,            # ANY int8 packed (L, B, KVH, PM, D)
        ks_in, vs_in,          # ANY (L, B, 2*KVH, PM) nibble-plane scales
        o_ref,                 # VMEM (SPP, KVH*G, D)
        k_out, v_out, ks_out, vs_out,   # ANY aliased to the four caches
        k_buf, v_buf,          # VMEM scratch (SPP, NBUF, KVH, PBLK, D) int8
        ksc_buf, vsc_buf,      # VMEM scratch (SPP, NBUF, 2*KVH, PBLK)
        kslab, vslab,          # VMEM scratch (SPP, KVH, 32, D) int8
        ksslab, vsslab,        # VMEM scratch (SPP, 2*KVH, SSLAB)
        acc_ref, m_ref, l_ref,
        sems,                  # DMA sems (4, SPP, NBUF)
        wsems,                 # slab r/w sems (4, SPP)
        *, block: int, kvh: int, group: int, scale: float,
        sslab: int, nbuf: int, spp: int, compute_dtype):
    """int4-cache variant of _decode_append_quant_kernel. `block` counts
    PACKED rows (= 2x that many tokens); the row slab is one 32-row sublane
    tile (exactly one packing window), so the new token's byte is a
    nibble-merge RMW of a single tile."""
    prog = pl.program_id(0)
    lidx = layer_ref[0]
    seqs = [len_ref[prog * spp + sp] for sp in range(spp)]
    # live packed rows for seq tokens: full windows + the partial window's
    # low-nibble rows (high nibbles of the last window live in the same rows)
    live = [jax.lax.div(sl, 64) * 32
            + jnp.minimum(jax.lax.rem(sl, 64), 32) for sl in seqs]
    nblocks = [jax.lax.div(lr + (block - 1), block) for lr in live]
    max_nb = nblocks[0]
    for nb in nblocks[1:]:
        max_nb = jnp.maximum(max_nb, nb)

    # new-token target: packed row r, nibble plane nib
    rs = [jax.lax.div(sl, 64) * 32 + jax.lax.rem(sl, 32) for sl in seqs]
    nibs = [jax.lax.div(jax.lax.rem(sl, 64), 32) for sl in seqs]
    slab_starts = [jax.lax.div(sl, 64) * 32 for sl in seqs]  # = (r//32)*32
    sslab_starts = [jax.lax.mul(jax.lax.div(r, sslab), sslab) for r in rs]

    # --- slab RMW: nibble-merge the new token's byte + scale ---
    rcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        for j, (src, dst) in enumerate(((k_in, kslab), (v_in, vslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(slab_starts[sp], 32)],
                dst.at[sp], wsems.at[j, sp])
            rc.start()
            rcopies.append(rc)
        for j, (src, dst) in enumerate(((ks_in, ksslab), (vs_in, vsslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, 2 * kvh),
                       pl.ds(sslab_starts[sp], sslab)],
                dst.at[sp], wsems.at[2 + j, sp])
            rc.start()
            rcopies.append(rc)
    for rc in rcopies:
        rc.wait()
    wcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        row_sel = (jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
                   == rs[sp] - slab_starts[sp])
        newk = newk_ref[sp]
        newv = newv_ref[sp]
        for h in range(kvh):
            for slab_ref, new in ((kslab, newk), (vslab, newv)):
                old = slab_ref[sp, h].astype(jnp.int32)
                n4 = new[h].astype(jnp.int32) & 0xF           # (D,)
                lo = (old & 0xF0) | n4[None, :]
                hi = (old & 0x0F) | (n4[None, :] << 4)
                merged = jnp.where(nibs[sp] == 0, lo, hi)
                merged = (((merged & 0xFF) ^ 0x80) - 0x80).astype(jnp.int8)
                slab_ref[sp, h] = jnp.where(row_sel, merged, slab_ref[sp, h])
        # scale slab: row 2h + nib, column r (within the slab window)
        col_sel = (jax.lax.broadcasted_iota(jnp.int32, (2 * kvh, sslab), 1)
                   == rs[sp] - sslab_starts[sp])
        plane_sel = (jax.lax.broadcasted_iota(jnp.int32, (2 * kvh, sslab), 0)
                     % 2 == nibs[sp])
        sel = col_sel & plane_sel
        # newks_ref already carries rows 2h and 2h+1 = scale of head h (the
        # caller duplicates — Mosaic can't lower the sublane interleave)
        ksslab[sp] = jnp.where(sel, newks_ref[sp].astype(ksslab.dtype),
                               ksslab[sp])
        vsslab[sp] = jnp.where(sel, newvs_ref[sp].astype(vsslab.dtype),
                               vsslab[sp])
        for j, (src, dst, n) in enumerate((
                (kslab, k_out, kvh), (vslab, v_out, kvh))):
            wc = pltpu.make_async_copy(
                src.at[sp], dst.at[lidx, slot, pl.ds(0, n),
                                   pl.ds(slab_starts[sp], 32)],
                wsems.at[j, sp])
            wc.start()
            wcopies.append(wc)
        for j, (src, dst) in enumerate(((ksslab, ks_out), (vsslab, vs_out))):
            wc = pltpu.make_async_copy(
                src.at[sp], dst.at[lidx, slot, pl.ds(0, 2 * kvh),
                                   pl.ds(sslab_starts[sp], sslab)],
                wsems.at[2 + j, sp])
            wc.start()
            wcopies.append(wc)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def dmas(sp, i, buf_slot):
        slot = prog * spp + sp
        return [
            pltpu.make_async_copy(
                k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
            pltpu.make_async_copy(
                v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
            pltpu.make_async_copy(
                ks_in.at[lidx, slot, pl.ds(0, 2 * kvh),
                         pl.ds(i * block, block)],
                ksc_buf.at[sp, buf_slot], sems.at[2, sp, buf_slot]),
            pltpu.make_async_copy(
                vs_in.at[lidx, slot, pl.ds(0, 2 * kvh),
                         pl.ds(i * block, block)],
                vsc_buf.at[sp, buf_slot], sems.at[3, sp, buf_slot]),
        ]

    for sp in range(spp):
        for j in range(nbuf - 1):
            @pl.when(j < nblocks[sp])
            def _(sp=sp, j=j):
                for dma in dmas(sp, j, j):
                    dma.start()

    def body(i, _):
        cur = jax.lax.rem(i, nbuf)

        for sp in range(spp):
            @pl.when(i + nbuf - 1 < nblocks[sp])
            def _(sp=sp):
                pre = i + nbuf - 1
                for dma in dmas(sp, pre, jax.lax.rem(pre, nbuf)):
                    dma.start()

        for sp in range(spp):
            @pl.when(i < nblocks[sp])
            def _(sp=sp):
                for dma in dmas(sp, i, cur):
                    dma.wait()

                # packed-row columns -> token ids per nibble plane
                g = i * block + jax.lax.broadcasted_iota(
                    jnp.int32, (group, block), 1)
                tok_lo = ((g >> 5) << 6) + (g & 31)
                q = q_ref[sp]
                ksc = ksc_buf[sp, cur].astype(jnp.float32)  # (2*KVH, PBLK)
                vsc = vsc_buf[sp, cur].astype(jnp.float32)

                for h in range(kvh):
                    qh = q[h * group:(h + 1) * group]
                    kb = k_buf[sp, cur, h].astype(jnp.int32)
                    vb = v_buf[sp, cur, h].astype(jnp.int32)
                    rows = slice(h * group, (h + 1) * group)
                    for nib in (0, 1):
                        k = _q4_unpack_i32(kb, nib == 0).astype(compute_dtype)
                        valid = tok_lo + 32 * nib < seqs[sp]
                        s = jax.lax.dot_general(
                            qh, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * ksc[2 * h + nib][None, :]
                        s = jnp.where(valid, s * scale, NEG_INF)

                        m_prev = m_ref[sp, rows, 0:1]
                        l_prev = l_ref[sp, rows, 0:1]
                        m_new = jnp.maximum(
                            m_prev, jnp.max(s, axis=-1, keepdims=True))
                        p = jnp.exp(s - m_new)
                        alpha = jnp.exp(m_prev - m_new)
                        l_ref[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                            p, axis=-1, keepdims=True)
                        m_ref[sp, rows, 0:1] = m_new
                        v = _q4_unpack_i32(vb, nib == 0).astype(compute_dtype)
                        pv = jax.lax.dot_general(
                            (p * vsc[2 * h + nib][None, :]).astype(
                                compute_dtype),
                            v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc_ref[sp, rows, :] = acc_ref[sp, rows, :] * alpha + pv
        return ()

    jax.lax.fori_loop(0, max_nb, body, ())

    # fold in each slot's new token (nibble values + scales from VMEM)
    for sp in range(spp):
        newk = newk_ref[sp]
        newv = newv_ref[sp]
        newks = newks_ref[sp][:, 0].astype(jnp.float32)
        newvs = newvs_ref[sp][:, 0].astype(jnp.float32)
        q = q_ref[sp]
        for h in range(kvh):
            rows = slice(h * group, (h + 1) * group)
            qh = q[rows]
            # rows 2h and 2h+1 of the duplicated scale vector both = head h
            nk = newk[h].astype(jnp.float32) * newks[2 * h]
            s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                          keepdims=True) * scale
            m_prev = m_ref[sp, rows, 0:1]
            l_prev = l_ref[sp, rows, 0:1]
            m_new = jnp.maximum(m_prev, s_x)
            p_x = jnp.exp(s_x - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[sp, rows, 0:1] = alpha * l_prev + p_x
            nv = newv[h].astype(jnp.float32) * newvs[2 * h]
            acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                    + p_x * nv[None, :])

    for wc in wcopies:
        wc.wait()

    for sp in range(spp):
        l = l_ref[sp, :, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[sp] = (acc_ref[sp] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block", "scale", "interpret", "nbuf",
                                    "spp"))
def paged_decode_append_q4(
    q: jnp.ndarray,          # (B, 1, H, D)
    new_k: jnp.ndarray,      # (B, KVH, D) int8 nibble values in [-7, 7]
    new_v: jnp.ndarray,      # (B, KVH, D)
    new_ks: jnp.ndarray,     # (B, KVH) row scales
    new_vs: jnp.ndarray,     # (B, KVH)
    k_cache: jnp.ndarray,    # (L, B, KVH, M/2, D) int8 packed, aliased
    v_cache: jnp.ndarray,    # (L, B, KVH, M/2, D)
    ks_cache: jnp.ndarray,   # (L, B, 2*KVH, M/2) nibble-plane scales, aliased
    vs_cache: jnp.ndarray,   # (L, B, 2*KVH, M/2)
    layer: jnp.ndarray,      # () int32
    cache_len: jnp.ndarray,  # (B,) int32 TOKENS already present
    scale: Optional[float] = None,
    block: int = 1024,       # ring block in TOKENS (halved to packed rows)
    interpret: bool = False,
    nbuf: int = 2,
    spp: int = 8,
):
    """Fused append + length-bounded attention over the nibble-packed int4
    KV cache (see models/qwen25_vl/decoder.py Q4KVCache). Returns
    (attn, k, v, ks, vs) with all four buffers updated in place. Reads half
    the cache bytes per live token of the int8 kernel — the capacity
    operating point's decode path."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[2]
    pm = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    if nbuf < 2:
        raise ValueError("nbuf must be >= 2 (ring needs a consume buffer)")
    if pm % 32:
        raise ValueError(
            f"packed bucket {pm} must be a multiple of 32 (64 tokens)")
    block, spp, nbuf = _ring_env(block, spp, nbuf)
    block, spp = _fit_ring(pm, max(32, block // 2), spp, b, kvh, d, 1, nbuf,
                           budget=_RING_BUDGET or 12 << 20)
    sslab = min(128, pm)   # scale slab: full 128-lane tiles
    if pm % sslab:
        raise ValueError(
            f"packed bucket {pm} must be a multiple of {sslab} "
            f"(max_seq_len {2 * pm} -> use a multiple of {2 * sslab})")
    compute_dtype = q.dtype
    sdtype = ks_cache.dtype

    qg = q.reshape(b, kvh * group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // spp,),
        in_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, 2 * kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, 2 * kvh, 1), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((spp, kvh * group, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((spp, nbuf, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((spp, nbuf, 2 * kvh, block), sdtype),
            pltpu.VMEM((spp, nbuf, 2 * kvh, block), sdtype),
            pltpu.VMEM((spp, kvh, 32, d), k_cache.dtype),
            pltpu.VMEM((spp, kvh, 32, d), v_cache.dtype),
            pltpu.VMEM((spp, 2 * kvh, sslab), sdtype),
            pltpu.VMEM((spp, 2 * kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh * group, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, spp, nbuf)),
            pltpu.SemaphoreType.DMA((4, spp)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_append_q4_kernel, block=block, kvh=kvh,
                          group=group, scale=scale, sslab=sslab,
                          nbuf=nbuf, spp=spp, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, sdtype),
            jax.ShapeDtypeStruct(vs_cache.shape, sdtype),
        ],
        # operands: 0 lens, 1 layer, 2 q, 3 new_k, 4 new_v, 5 new_ks,
        # 6 new_vs, 7 k_cache, 8 v_cache, 9 ks_cache, 10 vs_cache
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(cache_len.astype(jnp.int32),
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, new_k, new_v,
      # scale rows pre-duplicated to nibble-plane layout (rows 2h, 2h+1 =
      # head h) — Mosaic can't lower that sublane interleave in-kernel
      jnp.repeat(new_ks.astype(sdtype), 2, axis=1)[..., None],
      jnp.repeat(new_vs.astype(sdtype), 2, axis=1)[..., None],
      k_cache, v_cache, ks_cache, vs_cache)

    attn, k_new, v_new, ks_new, vs_new = out
    return attn.reshape(b, 1, h, d), k_new, v_new, ks_new, vs_new


def _decode_append_multi_q4_kernel(
        len_ref,               # SMEM (B,) int32
        layer_ref,             # SMEM (1,) int32
        q_ref,                 # VMEM (SPP, KVH*G*T, D) — rows h-major, then
                               #      g, then t (query t of head (h, g) at
                               #      row h*G*T + g*T + t)
        newk_ref, newv_ref,    # VMEM (SPP, T*KVH, D) int8 nibbles in [-7, 7]
        newks_ref, newvs_ref,  # VMEM (SPP, T*2*KVH, 1) plane-duplicated
        k_in, v_in,            # ANY int8 packed (L, B, KVH, PM, D)
        ks_in, vs_in,          # ANY (L, B, 2*KVH, PM) nibble-plane scales
        o_ref,                 # VMEM (SPP, KVH*G*T, D)
        k_out, v_out, ks_out, vs_out,   # ANY aliased to the four caches
        k_buf, v_buf,          # VMEM scratch (SPP, NBUF, KVH, PBLK, D) int8
        ksc_buf, vsc_buf,      # VMEM scratch (SPP, NBUF, 2*KVH, PBLK)
        kslab, vslab,          # VMEM scratch (SPP, KVH, 64, D) int8
        ksslab, vsslab,        # VMEM scratch (SPP, 2*KVH, SSLAB)
        acc_ref, m_ref, l_ref,
        sems, wsems,
        *, block: int, kvh: int, group: int, tq: int, scale: float,
        sslab: int, nbuf: int, spp: int, compute_dtype):
    """Multi-token (speculative-verify) variant of _decode_append_q4_kernel:
    appends tq nibble rows per slot at token positions cache_len + [0, tq)
    and attends tq queries per head against ONE ring read of the PACKED
    cache — query t sees cache tokens [0, cache_len + t] (causal over the
    fresh rows). Combines _decode_append_multi_quant_kernel's widened
    (G*T, BLK) score tiles with the q4 kernel's two-nibble-plane unpack.

    Slab geometry: tq <= 32 consecutive tokens starting at cache_len span at
    most TWO 64-token packing windows, whose packed rows live in
    [32w, 32w + 64) for w = cache_len//64 — one 64-packed-row slab anchored
    at 32w (clamped to pm-64) covers every RMW target. Ring reads may race
    the slab write-back, but fresh tokens are masked out of the ring phase
    (valid = token < cache_len) and folded separately from VMEM, so the
    result is order-independent."""
    prog = pl.program_id(0)
    lidx = layer_ref[0]
    gt = group * tq
    pm = k_in.shape[3]
    seqs = [len_ref[prog * spp + sp] for sp in range(spp)]
    live = [jax.lax.div(sl, 64) * 32
            + jnp.minimum(jax.lax.rem(sl, 64), 32) for sl in seqs]
    nblocks = [jax.lax.div(lr + (block - 1), block) for lr in live]
    max_nb = nblocks[0]
    for nb in nblocks[1:]:
        max_nb = jnp.maximum(max_nb, nb)

    # per-slot window base (packed row of the first window the span touches)
    wbases = [jax.lax.div(sl, 64) * 32 for sl in seqs]
    slab_starts = [jax.lax.mul(jax.lax.div(
        jnp.minimum(wb, pm - 64), 32), 32) for wb in wbases]
    if sslab >= pm:
        sslab_starts = [jnp.zeros((), jnp.int32) for _ in seqs]
    else:
        sslab_starts = [jax.lax.mul(jax.lax.div(
            jnp.minimum(wb, pm - sslab), 128), 128) for wb in wbases]

    # --- slab RMW: nibble-merge tq bytes + their plane scales per slot ---
    rcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        for j, (src, dst) in enumerate(((k_in, kslab), (v_in, vslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, kvh),
                       pl.ds(slab_starts[sp], 64)],
                dst.at[sp], wsems.at[j, sp])
            rc.start()
            rcopies.append(rc)
        for j, (src, dst) in enumerate(((ks_in, ksslab), (vs_in, vsslab))):
            rc = pltpu.make_async_copy(
                src.at[lidx, slot, pl.ds(0, 2 * kvh),
                       pl.ds(sslab_starts[sp], sslab)],
                dst.at[sp], wsems.at[2 + j, sp])
            rc.start()
            rcopies.append(rc)
    for rc in rcopies:
        rc.wait()
    wcopies = []
    for sp in range(spp):
        slot = prog * spp + sp
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * kvh, sslab), 1)
        plane_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * kvh, sslab), 0)
        for t in range(tq):
            s_tok = seqs[sp] + t
            r_t = (jax.lax.div(s_tok, 64) * 32 + jax.lax.rem(s_tok, 32))
            nib_t = jax.lax.div(jax.lax.rem(s_tok, 64), 32)
            row_sel = row_iota == r_t - slab_starts[sp]
            for h in range(kvh):
                for slab_ref, new_ref in ((kslab, newk_ref),
                                          (vslab, newv_ref)):
                    old = slab_ref[sp, h].astype(jnp.int32)
                    n4 = (new_ref[sp, t * kvh + h].astype(jnp.int32)
                          & 0xF)                           # (D,)
                    lo = (old & 0xF0) | n4[None, :]
                    hi = (old & 0x0F) | (n4[None, :] << 4)
                    merged = jnp.where(nib_t == 0, lo, hi)
                    merged = (((merged & 0xFF) ^ 0x80) - 0x80).astype(
                        jnp.int8)
                    slab_ref[sp, h] = jnp.where(row_sel, merged,
                                                slab_ref[sp, h])
            sel = ((col_iota == r_t - sslab_starts[sp])
                   & (plane_iota % 2 == nib_t))
            ksslab[sp] = jnp.where(
                sel,
                newks_ref[sp, t * 2 * kvh:(t + 1) * 2 * kvh].astype(
                    ksslab.dtype),
                ksslab[sp])
            vsslab[sp] = jnp.where(
                sel,
                newvs_ref[sp, t * 2 * kvh:(t + 1) * 2 * kvh].astype(
                    vsslab.dtype),
                vsslab[sp])
        for j, (src, dst, starts, size, n) in enumerate((
                (kslab, k_out, slab_starts, 64, kvh),
                (vslab, v_out, slab_starts, 64, kvh),
                (ksslab, ks_out, sslab_starts, sslab, 2 * kvh),
                (vsslab, vs_out, sslab_starts, sslab, 2 * kvh))):
            wc = pltpu.make_async_copy(
                src.at[sp], dst.at[lidx, slot, pl.ds(0, n),
                                   pl.ds(starts[sp], size)],
                wsems.at[j, sp])
            wc.start()
            wcopies.append(wc)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    def dmas(sp, i, buf_slot):
        slot = prog * spp + sp
        return [
            pltpu.make_async_copy(
                k_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
            pltpu.make_async_copy(
                v_in.at[lidx, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
            pltpu.make_async_copy(
                ks_in.at[lidx, slot, pl.ds(0, 2 * kvh),
                         pl.ds(i * block, block)],
                ksc_buf.at[sp, buf_slot], sems.at[2, sp, buf_slot]),
            pltpu.make_async_copy(
                vs_in.at[lidx, slot, pl.ds(0, 2 * kvh),
                         pl.ds(i * block, block)],
                vsc_buf.at[sp, buf_slot], sems.at[3, sp, buf_slot]),
        ]

    for sp in range(spp):
        for j in range(nbuf - 1):
            @pl.when(j < nblocks[sp])
            def _(sp=sp, j=j):
                for dma in dmas(sp, j, j):
                    dma.start()

    def body(i, _):
        cur = jax.lax.rem(i, nbuf)

        for sp in range(spp):
            @pl.when(i + nbuf - 1 < nblocks[sp])
            def _(sp=sp):
                pre = i + nbuf - 1
                for dma in dmas(sp, pre, jax.lax.rem(pre, nbuf)):
                    dma.start()

        for sp in range(spp):
            @pl.when(i < nblocks[sp])
            def _(sp=sp):
                for dma in dmas(sp, i, cur):
                    dma.wait()

                # packed-row columns -> token ids per nibble plane; ring
                # tokens < cache_len are visible to all tq queries
                g = i * block + jax.lax.broadcasted_iota(
                    jnp.int32, (gt, block), 1)
                tok_lo = ((g >> 5) << 6) + (g & 31)
                q = q_ref[sp]
                ksc = ksc_buf[sp, cur].astype(jnp.float32)  # (2*KVH, PBLK)
                vsc = vsc_buf[sp, cur].astype(jnp.float32)

                for h in range(kvh):
                    qh = q[h * gt:(h + 1) * gt]
                    kb = k_buf[sp, cur, h].astype(jnp.int32)
                    vb = v_buf[sp, cur, h].astype(jnp.int32)
                    rows = slice(h * gt, (h + 1) * gt)
                    for nib in (0, 1):
                        k = _q4_unpack_i32(kb, nib == 0).astype(compute_dtype)
                        valid = tok_lo + 32 * nib < seqs[sp]
                        s = jax.lax.dot_general(
                            qh, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * ksc[2 * h + nib][None, :]
                        s = jnp.where(valid, s * scale, NEG_INF)

                        m_prev = m_ref[sp, rows, 0:1]
                        l_prev = l_ref[sp, rows, 0:1]
                        m_new = jnp.maximum(
                            m_prev, jnp.max(s, axis=-1, keepdims=True))
                        p = jnp.exp(s - m_new)
                        alpha = jnp.exp(m_prev - m_new)
                        l_ref[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                            p, axis=-1, keepdims=True)
                        m_ref[sp, rows, 0:1] = m_new
                        v = _q4_unpack_i32(vb, nib == 0).astype(compute_dtype)
                        pv = jax.lax.dot_general(
                            (p * vsc[2 * h + nib][None, :]).astype(
                                compute_dtype),
                            v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                                + pv)
        return ()

    jax.lax.fori_loop(0, max_nb, body, ())

    # fold in the tq fresh rows (nibble values + plane scales from VMEM),
    # causally: query row h*G*T + g*T + t_q sees new key t_k iff t_k <= t_q
    t_of_row = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (gt, 1), 0), tq)
    for sp in range(spp):
        q = q_ref[sp]
        nks_f = newks_ref[sp][:, 0].astype(jnp.float32)   # (T*2*KVH,)
        nvs_f = newvs_ref[sp][:, 0].astype(jnp.float32)
        for h in range(kvh):
            rows = slice(h * gt, (h + 1) * gt)
            qh = q[rows]
            for t in range(tq):
                nk = (newk_ref[sp, t * kvh + h].astype(jnp.float32)
                      * nks_f[t * 2 * kvh + 2 * h])
                s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                              keepdims=True) * scale
                s_x = jnp.where(t_of_row >= t, s_x, NEG_INF)
                m_prev = m_ref[sp, rows, 0:1]
                l_prev = l_ref[sp, rows, 0:1]
                m_new = jnp.maximum(m_prev, s_x)
                p_x = jnp.exp(s_x - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_ref[sp, rows, 0:1] = alpha * l_prev + p_x
                m_ref[sp, rows, 0:1] = m_new
                nv = (newv_ref[sp, t * kvh + h].astype(jnp.float32)
                      * nvs_f[t * 2 * kvh + 2 * h])
                acc_ref[sp, rows, :] = (acc_ref[sp, rows, :] * alpha
                                        + p_x * nv[None, :])

    for wc in wcopies:
        wc.wait()

    for sp in range(spp):
        l = l_ref[sp, :, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[sp] = (acc_ref[sp] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block", "scale", "interpret", "nbuf",
                                    "spp"))
def paged_decode_append_multi_q4(
    q: jnp.ndarray,          # (B, T, H, D)
    new_k: jnp.ndarray,      # (B, T, KVH, D) int8 nibble values in [-7, 7]
    new_v: jnp.ndarray,      # (B, T, KVH, D)
    new_ks: jnp.ndarray,     # (B, T, KVH) row scales
    new_vs: jnp.ndarray,     # (B, T, KVH)
    k_cache: jnp.ndarray,    # (L, B, KVH, M/2, D) int8 packed, aliased
    v_cache: jnp.ndarray,    # (L, B, KVH, M/2, D)
    ks_cache: jnp.ndarray,   # (L, B, 2*KVH, M/2) nibble-plane scales
    vs_cache: jnp.ndarray,   # (L, B, 2*KVH, M/2)
    layer: jnp.ndarray,      # () int32
    cache_len: jnp.ndarray,  # (B,) int32 TOKENS present BEFORE the T new
    scale: Optional[float] = None,
    block: int = 1024,       # ring block in TOKENS (halved to packed rows)
    interpret: bool = False,
    nbuf: int = 2,
    spp: int = 4,
):
    """Fused multi-token append + verify attention over the nibble-packed
    int4 KV cache: the speculative-decoding analogue of
    paged_decode_append_multi_quant at the capacity operating point —
    removes decode_multi's int4 exclusion (B128 + speculation compose).
    Semantics match ops.attention.decode_attention_multi over the unpacked
    cache. Callers must keep cache_len <= M - T - 1 (the engine's spec loop
    clamps exactly that)."""
    b, tq, h, d = q.shape
    kvh = k_cache.shape[2]
    pm = k_cache.shape[3]
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    if nbuf < 2:
        raise ValueError("nbuf must be >= 2 (ring needs a consume buffer)")
    if tq > 32:
        raise ValueError(f"tq {tq} exceeds the 64-packed-row slab (32-token "
                         "span)")
    if pm % 32 or pm < 64:
        raise ValueError(
            f"packed bucket {pm} must be a multiple of 32 and >= 64 "
            "(the multi-token slab spans two 64-token windows)")
    block, spp, nbuf = _ring_env(block, spp, nbuf)
    block, spp = _fit_ring(pm, max(32, block // 2), spp, b, kvh, d, 1, nbuf,
                           budget=_RING_BUDGET or 8 << 20)
    sslab = pm if pm < 256 else 256
    if pm >= 256 and pm % 128:
        raise ValueError(f"packed bucket {pm} must be 128-aligned "
                         f"(max_seq_len {2 * pm} -> multiple of 256)")
    compute_dtype = q.dtype
    sdtype = ks_cache.dtype

    # rows h-major then g then t (see kernel docstring)
    qg = q.transpose(0, 2, 1, 3).reshape(b, h * tq, d)
    nk = new_k.reshape(b, tq * kvh, d)
    nv = new_v.reshape(b, tq * kvh, d)
    # plane-duplicated scales: rows t*2KVH + 2h and + 2h+1 both = head h of
    # token t (Mosaic can't lower the sublane interleave in-kernel)
    nks = jnp.repeat(new_ks.astype(sdtype), 2, axis=2).reshape(
        b, tq * 2 * kvh, 1)
    nvs = jnp.repeat(new_vs.astype(sdtype), 2, axis=2).reshape(
        b, tq * 2 * kvh, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // spp,),
        in_specs=[
            pl.BlockSpec((spp, kvh * group * tq, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * kvh, d), lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * 2 * kvh, 1),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, tq * 2 * kvh, 1),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((spp, kvh * group * tq, d),
                         lambda bb, lens, lay: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((spp, nbuf, kvh, block, d), k_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block, d), v_cache.dtype),
            pltpu.VMEM((spp, nbuf, 2 * kvh, block), sdtype),
            pltpu.VMEM((spp, nbuf, 2 * kvh, block), sdtype),
            pltpu.VMEM((spp, kvh, 64, d), k_cache.dtype),
            pltpu.VMEM((spp, kvh, 64, d), v_cache.dtype),
            pltpu.VMEM((spp, 2 * kvh, sslab), sdtype),
            pltpu.VMEM((spp, 2 * kvh, sslab), sdtype),
            pltpu.VMEM((spp, kvh * group * tq, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group * tq, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group * tq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, spp, nbuf)),
            pltpu.SemaphoreType.DMA((4, spp)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_append_multi_q4_kernel, block=block,
                          kvh=kvh, group=group, tq=tq, scale=scale,
                          sslab=sslab, nbuf=nbuf, spp=spp,
                          compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh * group * tq, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, sdtype),
            jax.ShapeDtypeStruct(vs_cache.shape, sdtype),
        ],
        # operands: 0 lens, 1 layer, 2 q, 3 new_k, 4 new_v, 5 new_ks,
        # 6 new_vs, 7 k_cache, 8 v_cache, 9 ks_cache, 10 vs_cache
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        interpret=interpret,
    )(cache_len.astype(jnp.int32),
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      qg, nk, nv, nks, nvs,
      k_cache, v_cache, ks_cache, vs_cache)

    attn, k_new, v_new, ks_new, vs_new = out
    attn = attn.reshape(b, kvh * group, tq, d).transpose(0, 2, 1, 3)
    return attn.reshape(b, tq, h, d), k_new, v_new, ks_new, vs_new
