"""Attention ops: Pallas TPU flash attention + jnp reference path.

This is the hot op of both the VLM decoder prefill and the vision encoder
(reference delegates it to flash-attention-2 inside vLLM / torch —
karanta/training/ocr_training.py:353-355, vLLM engine at pipeline.py:707-742).

Design notes (TPU):
  - Online-softmax flash attention tiled (block_q × block_k); grid
    (batch, q_heads, q_blocks, kv_blocks) with the kv axis innermost so the
    f32 accumulator lives in VMEM scratch across kv steps.
  - GQA is handled in the k/v index_map (kv_head = q_head // group) — no
    repeat_kv materialization, so HBM traffic for k/v is 1/group of the naive
    path.
  - Padding is masked via an optional float kv_mask (1 = valid); causal
    masking is positional. Fully-masked causal kv blocks are predicated off
    (compute skipped; the MXU never sees them).
  - All matmuls accumulate in float32 via preferred_element_type.

Public convention: q (B, Sq, H, D), k/v (B, Sk, KVH, D) — "BSHD".
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# tuning hook: (block_q, block_k) override for flash_attention, settable
# via KARANTA_FLASH_BLOCKS="512,512" (sweeps / per-host tuning)
_FLASH_BLOCKS_OVERRIDE = None
if os.environ.get("KARANTA_FLASH_BLOCKS"):
    _FLASH_BLOCKS_OVERRIDE = tuple(
        int(x) for x in os.environ["KARANTA_FLASH_BLOCKS"].split(","))


def _use_pallas() -> bool:
    force = os.environ.get("KARANTA_ATTENTION", "")
    if force == "pallas":
        return True
    if force == "reference":
        return False
    return jax.default_backend() == "tpu"


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    q_offset: int = 0,
) -> jnp.ndarray:
    """Dense attention in plain jnp. Shapes: q (B,Sq,H,D), k/v (B,Sk,KVH,D)."""
    b, sq, h, d = q.shape
    _, sk, kvh, _ = k.shape
    group = h // kvh
    scale = d ** -0.5 if scale is None else scale
    if group > 1:
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v, group, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    if causal:
        qpos = q_offset + jnp.arange(sq)[:, None]
        kpos = jnp.arange(sk)[None, :]
        s = jnp.where((qpos >= kpos)[None, None], s, NEG_INF)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,        # (B, 1, H, D)
    k_cache: jnp.ndarray,  # (B, KVH, M, D) — contiguous per-head slabs
    v_cache: jnp.ndarray,  # (B, KVH, M, D)
    kv_mask: jnp.ndarray,  # (B, M) 1 = valid
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # (B, KVH, M) int8-cache row scales
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-token decode attention, GQA-aware: no repeat_kv materialization
    (reads each cache byte exactly once — the decode path is HBM-bound and
    the cache is its largest stream). Shapes static; bound M is the cache
    bucket. The (B, KVH, M, D) layout keeps each head's slab contiguous.

    With k_scale/v_scale the caches are int8 rows: the int8->f32 convert
    fuses into the einsum operand load and the per-row scale applies to the
    f32 score / probability tensors — the dequantized cache never exists."""
    b, _, h, d = q.shape
    kvh = k_cache.shape[1]
    group = h // kvh
    scale = d ** -0.5 if scale is None else scale
    qg = q.reshape(b, kvh, group, d)
    compute_t = q.dtype if k_cache.dtype == jnp.int8 else k_cache.dtype
    # scores: (B, KVH, G, M) — f32 accumulation without materializing an
    # f32 (or head-repeated) copy of the cache
    s = jnp.einsum("bkgd,bkmd->bkgm", qg, k_cache.astype(compute_t),
                   preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        s = s * k_scale.astype(jnp.float32)[:, :, None, :]
    s = jnp.where(kv_mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        # int8 V: fold the row scale into p; the dot runs in the compute
        # dtype so the int8 convert fuses into the operand load (an f32 dot
        # made XLA materialize an f32 copy of the cache — measured slower)
        p = p * v_scale.astype(jnp.float32)[:, :, None, :]
    out = jnp.einsum("bkgm,bkmd->bkgd", p.astype(compute_t),
                     v_cache.astype(compute_t),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, 1, h, d).astype(q.dtype)


def decode_attention_multi(
    q: jnp.ndarray,        # (B, T, H, D) — T draft/verify positions
    k_cache: jnp.ndarray,  # (B, KVH, M, D) with the T new rows already written
    v_cache: jnp.ndarray,  # (B, KVH, M, D)
    cache_len: jnp.ndarray,  # (B,) rows present BEFORE the T new ones
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # (B, KVH, M) int8 row scales
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-token decode attention for speculative verification: position t
    attends cache rows [0, cache_len + t] (its own freshly written row and
    the earlier draft rows included). One cache read verifies T tokens, so
    the HBM cost of a verify step is ~1/T per token of normal decode."""
    b, tq, h, d = q.shape
    kvh = k_cache.shape[1]
    m = k_cache.shape[2]
    group = h // kvh
    scale = d ** -0.5 if scale is None else scale
    qg = q.reshape(b, tq, kvh, group, d)
    compute_t = q.dtype if k_cache.dtype == jnp.int8 else k_cache.dtype
    s = jnp.einsum("btkgd,bkmd->bkgtm", qg, k_cache.astype(compute_t),
                   preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        s = s * k_scale.astype(jnp.float32)[:, :, None, None, :]
    cols = jnp.arange(m)[None, None, :]
    horizon = cache_len[:, None, None] + jnp.arange(tq)[None, :, None]
    valid = cols <= horizon                       # (B, T, M)
    s = jnp.where(valid[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale.astype(jnp.float32)[:, :, None, None, :]
    out = jnp.einsum("bkgtm,bkmd->bkgtd", p.astype(compute_t),
                     v_cache.astype(compute_t),
                     preferred_element_type=jnp.float32)
    out = jnp.moveaxis(out, 3, 1)                 # (B, T, KVH, G, D)
    return out.reshape(b, tq, h, d).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  acc_ref, m_ref, l_ref, *,
                  scale: float, causal: bool, block_q: int, block_k: int,
                  has_mask: bool, q_offset: int = 0):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * block_q
    k_start = ki * block_k

    def body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            rows = (q_offset + q_start
                    + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        if has_mask:
            s = jnp.where(mask_ref[0, 0][None, :] > 0, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:, 0:1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv

    if causal:
        # Skip kv blocks entirely above the causal diagonal for this q block.
        @pl.when(k_start < q_offset + q_start + block_q)
        def _():
            body()
    else:
        body()

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:, 0:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "q_offset"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    q_offset: int = 0,
) -> jnp.ndarray:
    """Pallas flash attention. q (B,Sq,H,D), k/v (B,Sk,KVH,D), kv_mask (B,Sk).

    q_offset shifts query positions for causal masking: query row i sits at
    global position q_offset + i while kv rows start at 0 (prefix-cache
    continuation prefill)."""
    if _FLASH_BLOCKS_OVERRIDE is not None and (block_q, block_k) == (512, 1024):
        # env tuning hook applies only to default-block call sites
        block_q, block_k = _FLASH_BLOCKS_OVERRIDE
    b, sq, h, d = q.shape
    _, sk, kvh, _ = k.shape
    assert h % kvh == 0, (h, kvh)
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)

    block_q = min(block_q, max(_round_up(sq, 128), 128))
    block_k = min(block_k, max(_round_up(sk, 128), 128))

    sq_p, sk_p = _round_up(sq, block_q), _round_up(sk, block_k)
    has_mask = kv_mask is not None or sk_p != sk
    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), dtype=jnp.float32)
    # (B, 1, Sk): the unit middle dim satisfies TPU (sublane, lane) tiling
    # for the (1, 1, block_k) mask block.
    kv_mask = _pad_to(kv_mask.astype(jnp.float32), 1, block_k, 0.0)[:, None, :]

    # BSHD -> BHSD for contiguous per-head blocks.
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, block_q)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)

    grid = (b, h, sq_p // block_q, sk_p // block_k)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, has_mask=has_mask,
            q_offset=q_offset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, qi, ki: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, qi, ki, g=group: (bb, hh // g, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, qi, ki, g=group: (bb, hh // g, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bb, hh, qi, ki: (bb, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bb, hh, qi, ki: (bb, hh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, kv_mask)

    return jnp.swapaxes(out[:, :, :sq], 1, 2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                   scale: float, window: int, block: int, heads: int):
    """Block-diagonal attention: each block attends only within itself,
    masked down to `window`-sized segments. Written for the vision encoder's
    window layers (window=64 pre-merge patches): with block a multiple of
    window, every query's full kv set lives in its own aligned block, so no
    online softmax and no cross-block traffic is needed.

    All heads run inside one program (static python loop): a per-head grid
    made 320 programs/layer of ~20 MFLOP each, and program overhead
    dominated (profiled ~2.3 ms/layer against a ~0.55 ms matmul roofline).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    same_window = (rows // window) == (cols // window)
    live = mask_ref[0, 0][None, :] > 0
    keep = jnp.logical_and(same_window, live)
    for hh in range(heads):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(keep, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        p = p / denom
        out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, hh],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, hh] = out.astype(o_ref.dtype)


def _rot_half_matrix(d: int, dtype) -> jnp.ndarray:
    """Constant P with x @ P == rotate_half(x) == concat(-x[d/2:], x[:d/2]).

    Inside a pallas kernel, lane-dim slicing at d/2 (e.g. 40 of 80) fights
    the 128-lane tiling; a (d, d) matmul on the MXU is effectively free and
    tile-friendly."""
    h = d // 2
    p = np.zeros((d, d), np.float32)
    p[np.arange(h, d), np.arange(h)] = -1.0   # y[:h] = -x[h:]
    p[np.arange(h), np.arange(h, d)] = 1.0    # y[h:] = x[:h]
    return jnp.asarray(p, dtype)


def _window_rope_kernel(q_ref, k_ref, v_ref, mask_ref, cos_ref, sin_ref,
                        rot_ref, o_ref, *,
                        scale: float, window: int, block: int, heads: int):
    """_window_kernel with rope fused in: takes pre-rotation q/k plus
    cos/sin for the block and applies q*cos + (q@P)*sin in-register. The
    standalone rope pass materialized q/k twice per layer (slice_negate
    fusions, ~0.37 ms/layer of the vision encoder's 2.23 ms)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    same_window = (rows // window) == (cols // window)
    live = mask_ref[0, 0][None, :] > 0
    keep = jnp.logical_and(same_window, live)
    cos = cos_ref[0].astype(jnp.float32)           # (block, D)
    sin = sin_ref[0].astype(jnp.float32)
    rot = rot_ref[...]                             # (D, D) rotate-half matrix
    for hh in range(heads):
        qh = q_ref[0, hh]
        kh = k_ref[0, hh]
        # rot is a +-1 permutation, so the dot is EXACT in the input dtype
        # (f32 kernel matmuls lower off the MXU fast path — measured 96 ms
        # per call vs 0.12 ms); the rotation itself accumulates in f32 like
        # ops.rotary.apply_rope, then casts back
        qp = jax.lax.dot_general(qh, rot, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        kp = jax.lax.dot_general(kh, rot, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        q = (qh.astype(jnp.float32) * cos + qp * sin).astype(q_ref.dtype)
        k = (kh.astype(jnp.float32) * cos + kp * sin).astype(k_ref.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(keep, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        p = p / denom
        out = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, hh],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, hh] = out.astype(o_ref.dtype)


def _window_attention_kernel_call(q: jnp.ndarray, k: jnp.ndarray,
                                  v: jnp.ndarray,
                                  window: int,
                                  kv_mask: Optional[jnp.ndarray] = None,
                                  scale: Optional[float] = None,
                                  block: int = 256,
                                  interpret: bool = False,
                                  cos: Optional[jnp.ndarray] = None,
                                  sin: Optional[jnp.ndarray] = None,
                                  ) -> jnp.ndarray:
    """Raw pallas call for window_attention (no autodiff — see the
    custom-vjp wrapper below). With cos/sin (B, S, D), q/k are pre-rotation
    and rope is applied inside the kernel (saves a materialized elementwise
    pass over q and k per layer)."""
    b, s, h, d = q.shape
    assert s % window == 0, (s, window)
    block = min(block, s)
    if block % window != 0 or s % block != 0:
        block = window  # fallback: one window per block
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), jnp.float32)
    kv_mask = kv_mask.astype(jnp.float32)[:, None, :]

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    grid = (b, s // block)
    qkv_spec = pl.BlockSpec((1, h, block, d), lambda bb, si: (bb, 0, si, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, block), lambda bb, si: (bb, 0, si),
                             memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((1, h, block, d),
                               lambda bb, si: (bb, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )
    scale = float(d ** -0.5 if scale is None else scale)
    if cos is not None:
        cs_spec = pl.BlockSpec((1, block, d), lambda bb, si: (bb, si, 0),
                               memory_space=pltpu.VMEM)
        rot_spec = pl.BlockSpec((d, d), lambda bb, si: (0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_window_rope_kernel, scale=scale,
                              window=window, block=block, heads=h),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, cs_spec,
                      cs_spec, rot_spec],
            **common,
        )(qt, kt, vt, kv_mask, cos.astype(jnp.float32),
          sin.astype(jnp.float32), _rot_half_matrix(d, q.dtype))
        return jnp.swapaxes(out, 1, 2)
    out = pl.pallas_call(
        functools.partial(_window_kernel, scale=scale,
                          window=window, block=block, heads=h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        **common,
    )(qt, kt, vt, kv_mask)
    return jnp.swapaxes(out, 1, 2)


# ---------------------------------------------------------------------------
# Differentiable attention: pallas flash forward + blockwise jnp backward.
#
# pallas_call has no autodiff rule, so training through the flash kernel
# would crash; dense-reference autodiff would materialize the full (Sq, Sk)
# score matrix in both passes (4.3 GB per 8k-seq sample — off the table).
# Instead `attention` carries a custom_vjp whose backward recomputes scores
# one kv block at a time from the saved q/k/v (the flash-attention-2
# backward recurrence): one lax.scan pass rebuilds the row logsumexp, a
# second accumulates dq and emits per-block dk/dv. Peak extra memory is
# O(Sq * block) instead of O(Sq * Sk). A fused pallas backward kernel is a
# future perf item; this backward is XLA einsums on the MXU already.
# ---------------------------------------------------------------------------

_BWD_BLOCK = 512


def _score_block(qf, kb, maskb, causal, scale, q_offset, k_start):
    """Masked f32 scores for one kv block: (B, KVH, G, Sq, BLK)."""
    s = jnp.einsum("bqkgd,bmkd->bkgqm", qf, kb,
                   preferred_element_type=jnp.float32) * scale
    valid = maskb[:, None, None, None, :] > 0
    if causal:
        sq = qf.shape[1]
        blk = kb.shape[1]
        qpos = q_offset + jnp.arange(sq)[:, None]
        kpos = k_start + jnp.arange(blk)[None, :]
        valid = jnp.logical_and(valid, (qpos >= kpos)[None, None, None])
    return jnp.where(valid, s, NEG_INF)


def _attention_bwd_math(q, k, v, kv_mask, out, dout, causal, scale, q_offset):
    b, sq, h, d = q.shape
    _, sk, kvh, _ = k.shape
    group = h // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    blk = min(_BWD_BLOCK, max(_round_up(sk, 128), 128))
    sk_p = _round_up(sk, blk)
    nblk = sk_p // blk

    mask = jnp.ones((b, sk), jnp.float32) if kv_mask is None \
        else kv_mask.astype(jnp.float32)
    mask = _pad_to(mask, 1, blk, 0.0)
    kp = _pad_to(k.astype(jnp.float32), 1, blk)
    vp = _pad_to(v.astype(jnp.float32), 1, blk)
    qf = q.astype(jnp.float32).reshape(b, sq, kvh, group, d)
    kb_all = kp.reshape(b, nblk, blk, kvh, d)
    vb_all = vp.reshape(b, nblk, blk, kvh, d)
    mb_all = mask.reshape(b, nblk, blk)

    # pass 1: row logsumexp via online max/sum
    def lse_step(carry, xs):
        m, l = carry
        kb, mb, j = xs
        s = _score_block(qf, kb, mb, causal, scale, q_offset, j * blk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[..., None]),
                                             axis=-1)
        return (m_new, l), None

    m0 = jnp.full((b, kvh, group, sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, kvh, group, sq), jnp.float32)
    (m, l), _ = jax.lax.scan(
        lse_step, (m0, l0),
        (jnp.moveaxis(kb_all, 1, 0), jnp.moveaxis(mb_all, 1, 0),
         jnp.arange(nblk)))
    lse = m + jnp.log(jnp.maximum(l, 1e-30))            # (B, KVH, G, Sq)

    # pass 2: dq accumulates across blocks; dk/dv emitted per block
    doutf = dout.astype(jnp.float32).reshape(b, sq, kvh, group, d)
    outf = out.astype(jnp.float32).reshape(b, sq, kvh, group, d)
    drow = jnp.einsum("bqkgd,bqkgd->bkgq", doutf, outf)  # rowsum(dO * O)

    def grad_step(dq, xs):
        kb, vb, mb, j = xs
        s = _score_block(qf, kb, mb, causal, scale, q_offset, j * blk)
        p = jnp.exp(s - lse[..., None])                  # (B,KVH,G,Sq,BLK)
        dv = jnp.einsum("bkgqm,bqkgd->bmkd", p, doutf)
        dp = jnp.einsum("bqkgd,bmkd->bkgqm", doutf, vb)
        ds = p * (dp - drow[..., None])
        dq = dq + jnp.einsum("bkgqm,bmkd->bqkgd", ds, kb) * scale
        dk = jnp.einsum("bkgqm,bqkgd->bmkd", ds, qf) * scale
        return dq, (dk, dv)

    dq0 = jnp.zeros((b, sq, kvh, group, d), jnp.float32)
    dq, (dk, dv) = jax.lax.scan(
        grad_step, dq0,
        (jnp.moveaxis(kb_all, 1, 0), jnp.moveaxis(vb_all, 1, 0),
         jnp.moveaxis(mb_all, 1, 0), jnp.arange(nblk)))
    dk = jnp.moveaxis(dk, 0, 1).reshape(b, sk_p, kvh, d)[:, :sk]
    dv = jnp.moveaxis(dv, 0, 1).reshape(b, sk_p, kvh, d)[:, :sk]
    return (dq.reshape(b, sq, h, d).astype(q.dtype), dk.astype(k.dtype),
            dv.astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_cv(q, k, v, kv_mask, causal, scale, q_offset):
    if _use_pallas():
        return flash_attention(q, k, v, kv_mask=kv_mask, causal=causal,
                               scale=scale, q_offset=q_offset)
    return mha_reference(q, k, v, kv_mask=kv_mask, causal=causal, scale=scale,
                         q_offset=q_offset)


def _attention_cv_fwd(q, k, v, kv_mask, causal, scale, q_offset):
    out = _attention_cv(q, k, v, kv_mask, causal, scale, q_offset)
    return out, (q, k, v, kv_mask, out)


_BWD_Q_CHUNK = 512


def _attention_bwd_q_chunked(q, k, v, kv_mask, out, dout, causal, scale,
                             q_offset):
    """Query-chunked backward: scan q chunks through _attention_bwd_math.

    The monolithic backward carries a (B, Sq, KVH, G, D) f32 dq accumulator
    through its kv-block scan; at B4/S2048 on a 3B model that is a ~540 MB
    carry whose per-block read+write (and the S-minor layout XLA assigns it
    past ~500 MB) cost ~11 ms/layer vs ~1 ms at B1 — the measured source of
    the B>1 training per-row loss (BENCH_NOTES round-4 training section).
    Chunking Sq keeps every chunk's accumulator in the small-regime layout;
    dk/dv accumulate in a carry that is GQA-small ((B, Sk, KVH, D) f32)."""
    b, sq, h, d = q.shape
    cq = _BWD_Q_CHUNK
    pad = (-sq) % cq
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        op = jnp.pad(out, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dp = jnp.pad(dout, ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        qp, op, dp = q, out, dout
    nc = (sq + pad) // cq

    def chunk(i):
        return (jax.lax.dynamic_slice_in_dim(qp, i * cq, cq, 1),
                jax.lax.dynamic_slice_in_dim(op, i * cq, cq, 1),
                jax.lax.dynamic_slice_in_dim(dp, i * cq, cq, 1))

    def body(carry, i):
        dk_acc, dv_acc = carry
        q_c, out_c, dout_c = chunk(i)
        dq_c, dk_c, dv_c = _attention_bwd_math(
            q_c, k, v, kv_mask, out_c, dout_c, causal, scale,
            q_offset + i * cq)
        return ((dk_acc + dk_c.astype(jnp.float32),
                 dv_acc + dv_c.astype(jnp.float32)), dq_c)

    sk, kvh = k.shape[1], k.shape[2]
    zero = jnp.zeros((b, sk, kvh, d), jnp.float32)
    (dk, dv), dq_chunks = jax.lax.scan(body, (zero, zero), jnp.arange(nc))
    dq = jnp.moveaxis(dq_chunks, 0, 1).reshape(b, sq + pad, h, d)[:, :sq]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _attention_cv_bwd(causal, scale, q_offset, res, dout):
    q, k, v, kv_mask, out = res
    if q.shape[1] > _BWD_Q_CHUNK:
        dq, dk, dv = _attention_bwd_q_chunked(q, k, v, kv_mask, out, dout,
                                              causal, scale, q_offset)
    else:
        dq, dk, dv = _attention_bwd_math(q, k, v, kv_mask, out, dout,
                                         causal, scale, q_offset)
    dmask = None if kv_mask is None else jnp.zeros_like(kv_mask)
    return dq, dk, dv, dmask


_attention_cv.defvjp(_attention_cv_fwd, _attention_cv_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    q_offset: int = 0,
) -> jnp.ndarray:
    """Dispatch: Pallas flash kernel on TPU, jnp reference elsewhere (tests).
    Differentiable on both backends via the blockwise custom VJP above."""
    return _attention_cv(q, k, v, kv_mask, causal, scale, q_offset)


def _window_reference(q, k, v, window: int, kv_mask, scale):
    """Dense batched-windows reference for window attention (and the source
    of its gradients): (B, S, H, D) -> same, attention block-diagonal over
    contiguous `window`-token segments."""
    b, sq, h, d = q.shape
    nw = sq // window
    scale = float(d ** -0.5 if scale is None else scale)
    qb = q.reshape(b * nw, window, h, d)
    kb = k.reshape(b * nw, window, h, d)
    vb = v.reshape(b * nw, window, h, d)
    mb = None if kv_mask is None else kv_mask.reshape(b * nw, window)
    out = mha_reference(qb, kb, vb, kv_mask=mb, scale=scale)
    return out.reshape(b, sq, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5))
def _window_cv(q, k, v, window, kv_mask, scale):
    if _use_pallas():
        return _window_attention_kernel_call(q, k, v, window,
                                             kv_mask=kv_mask, scale=scale)
    return _window_reference(q, k, v, window, kv_mask, scale)


def _window_cv_fwd(q, k, v, window, kv_mask, scale):
    return _window_cv(q, k, v, window, kv_mask, scale), (q, k, v, kv_mask)


def _window_cv_bwd(window, scale, res, g):
    q, k, v, kv_mask = res
    # recompute-based exact backward through the dense-windows math; the
    # per-window score matrices are (window, window) — memory is trivial
    _, vjp = jax.vjp(
        lambda q, k, v: _window_reference(q, k, v, window, kv_mask, scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    dmask = None if kv_mask is None else jnp.zeros_like(kv_mask)
    return dq, dk, dv, dmask


_window_cv.defvjp(_window_cv_fwd, _window_cv_bwd)


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     window: int,
                     kv_mask: Optional[jnp.ndarray] = None,
                     scale: Optional[float] = None,
                     block: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """Attention restricted to contiguous `window`-token segments.

    q/k/v (B, S, H, D) with S a multiple of `window` and the same head count
    (no GQA here — the ViT has none). kv_mask (B, S) hides pad tokens.
    Pallas kernel forward on TPU, dense-windows math elsewhere and for
    gradients (pallas_call has no autodiff rule; training crashes without
    this wrapper)."""
    if interpret or block != 256:
        # explicit kernel-tuning path (tests/benchmarks)
        return _window_attention_kernel_call(q, k, v, window, kv_mask=kv_mask,
                                             scale=scale, block=block,
                                             interpret=interpret)
    return _window_cv(q, k, v, window, kv_mask, scale)
