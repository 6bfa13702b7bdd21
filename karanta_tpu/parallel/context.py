"""Context (sequence) parallelism for training attention.

The reference has no sequence parallelism — it caps context instead
(reference karanta/pipeline.py:280,336-339 MODEL_MAX_CONTEXT=16384;
training truncation karanta/training/ocr_training_args.py:253-259). This
module is the TPU-native headroom past that cap (SURVEY §5.7): shard the
*sequence* axis of training activations over a mesh axis ("seq"), keep
every dense op local to its sequence chunk, and give causal attention its
cross-chunk view by all-gathering K/V over ICI inside a shard_map.

Exact, not an approximation: each device's query chunk attends to the full
(gathered) key space at its true global offset, so loss and gradients match
the unsharded computation bit-for-bit up to reduction order (tested on the
virtual mesh in tests/test_context_parallel.py).

Memory: per-layer activations drop from O(S) to O(S/n) per device. The
transient gathered K/V is 2*S*kv_heads*head_dim per layer — for GQA models
(Qwen2.5-VL: 2-4 KV heads vs 16-28 query heads) that is small next to the
activation savings, which is why gathered-KV beats a ring schedule at the
16k-and-under contexts this workload sees: one all-gather per layer rides
ICI at full bandwidth with no per-block latency chain.

The q_offset each shard needs is static per branch (the flash kernel takes
it as a compile-time constant), so the SPMD program selects its branch via
lax.switch on axis_index — n tiny kernel variants in one executable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from karanta_tpu.ops.attention import attention
from karanta_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS


def _shard_map(f, mesh, in_specs, out_specs):
    # jax >= 0.8 renamed check_rep -> check_vma; replication checking must be
    # off: the pallas flash kernel and lax.switch-over-axis_index inside the
    # mapped function defeat the static replication analysis.
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def make_context_parallel_attention(
    mesh: Mesh,
    seq_axis: str = SEQ_AXIS,
    batch_axis: str = DATA_AXIS,
    heads_axis: str = MODEL_AXIS,
) -> Callable:
    """Build an `attention(q, k, v, kv_mask=, causal=, scale=)`-compatible
    callable that runs sequence-sharded over `mesh`'s `seq_axis`.

    q/k/v are passed as GLOBAL (B, S, H|KVH, D) arrays inside jit; the
    shard_map views them sharded (batch_axis, seq_axis, heads_axis, None) and
    each device computes attention for its own S/n query chunk against the
    all-gathered K/V. Drop-in for the decoder's `attn_impl` hook.
    """
    n = int(mesh.shape[seq_axis])

    def attn_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  kv_mask: Optional[jnp.ndarray] = None,
                  causal: bool = True,
                  scale: Optional[float] = None) -> jnp.ndarray:
        if n == 1:
            return attention(q, k, v, kv_mask=kv_mask, causal=causal,
                             scale=scale)
        b, s, h, d = q.shape
        kvh = k.shape[2]
        if s % n:
            raise ValueError(
                f"sequence length {s} must divide the {seq_axis!r} mesh axis "
                f"size {n} (pad the bucket ladder to a multiple)")
        chunk = s // n
        # shard heads over the TP axis only when both Q and KV head counts
        # divide it (GQA can have fewer KV heads than the axis); otherwise
        # compute with replicated heads — correct, just less sliced. Same
        # fallback for the batch dim: shard_map (unlike GSPMD) cannot pad an
        # uneven axis, and real training sees non-divisible batches (a final
        # partial batch, B=1 vision rows), so replicate batch when it does
        # not divide.
        m = int(mesh.shape.get(heads_axis, 1))
        d = int(mesh.shape.get(batch_axis, 1))
        hspec = heads_axis if (m > 1 and h % m == 0 and kvh % m == 0) else None
        bspec = batch_axis if (d > 1 and b % d == 0) else None
        qspec = P(bspec, seq_axis, hspec, None)
        kvspec = P(bspec, seq_axis, hspec, None)
        mspec = P(bspec, seq_axis)

        def local(q_l, k_l, v_l, mask_l):
            idx = jax.lax.axis_index(seq_axis)
            k_all = jax.lax.all_gather(k_l, seq_axis, axis=1, tiled=True)
            v_all = jax.lax.all_gather(v_l, seq_axis, axis=1, tiled=True)
            mask_all = (None if mask_l is None else
                        jax.lax.all_gather(mask_l, seq_axis, axis=1,
                                           tiled=True))

            def branch(i):
                def f(q_, k_, v_):
                    return attention(q_, k_, v_, kv_mask=mask_all,
                                     causal=causal, scale=scale,
                                     q_offset=i * chunk)
                return f

            return jax.lax.switch(idx, [branch(i) for i in range(n)],
                                  q_l, k_all, v_all)

        if kv_mask is None:
            fn = _shard_map(
                lambda q_, k_, v_: local(q_, k_, v_, None),
                mesh, in_specs=(qspec, kvspec, kvspec), out_specs=qspec)
            return fn(q, k, v)
        fn = _shard_map(local, mesh,
                        in_specs=(qspec, kvspec, kvspec, mspec),
                        out_specs=qspec)
        return fn(q, k, v, kv_mask)

    return attn_impl


def sequence_sharded_constraint(mesh: Mesh, batch: dict,
                                seq_axis: str = SEQ_AXIS,
                                batch_axis: str = DATA_AXIS) -> dict:
    """Pin the TEXT-sequence batch arrays to (batch_axis, seq_axis) layouts so
    GSPMD actually distributes activations over the seq axis (without the
    constraint it is free to keep them replicated and the memory win is lost).

    Vision arrays (pixel_values + per-image layout tables) are left alone —
    the vision tower runs data-parallel; its token dim is per-image, not the
    text sequence (splitting it would shard the pallas window kernel's input
    for no benefit at these sizes).
    """
    from jax.sharding import NamedSharding

    def pin(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    out = dict(batch)
    for key in ("token_ids", "labels", "attn_mask"):
        if batch.get(key) is not None:
            out[key] = pin(batch[key], P(batch_axis, seq_axis))
    if batch.get("positions") is not None:
        out["positions"] = pin(batch["positions"],
                               P(None, batch_axis, seq_axis))
    return out
