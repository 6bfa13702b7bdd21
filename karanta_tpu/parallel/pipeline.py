"""Pipeline parallelism over the "pipe" mesh axis.

The reference has no pipeline parallelism (SURVEY §2.9: PP absent — its
7B-class models fit one A100, so vLLM TP + process-level DP suffice). This
module is the TPU-native headroom for decoders past a single chip's HBM:
the stacked layer axis shards over the "pipe" mesh axis (each stage holds
L/n contiguous layers + their optimizer state) and microbatches stream
through a GPipe schedule expressed the XLA way — one `lax.scan` over
(n_micro + n_stages - 1) ticks, with `lax.ppermute` rotating activations to
the next stage each tick. No host round-trips, one compiled program, and the
per-tick transfer is a single microbatch activation riding ICI.

Exactness: outputs and gradients match the unsharded layer scan bit-for-bit
up to reduction order (tests/test_pipeline_parallel.py). Bubble overhead is
the standard (n_stages - 1) / (n_micro + n_stages - 1) GPipe fraction —
callers pick n_micro >> n_stages to amortize.

Composition: "pipe" composes with "data" (batch-sharded microbatches). TP
inside a pipelined stage would need in-kernel psums (shard_map is manual);
for this workload's model sizes PP×DP covers the need — PP exists to break
the HBM ceiling, TP already exists on the GSPMD path for serving.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from karanta_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def pipeline_apply(
    mesh: Mesh,
    layer_fn: Callable[[jnp.ndarray, Any, Any], jnp.ndarray],
    layers: Any,
    x: jnp.ndarray,
    extras: Any,
    n_micro: int,
    pipe_axis: str = PIPE_AXIS,
    data_axis: str = DATA_AXIS,
) -> jnp.ndarray:
    """Run x through a stacked layer pytree under a GPipe schedule.

    layer_fn(activation, one_layer_params, extras_microbatch) -> activation —
    the same body a plain `lax.scan(body, x, layers)` would run.
    layers: pytree with a leading stacked-layers axis L (L % n_stages == 0);
    viewed sharded over `pipe_axis`, so each stage scans its own L/n slice.
    x: (B, S, H) activations, batch-sharded over `data_axis`.
    extras: pytree of per-token tensors with leading batch axis (rope tables,
    masks) — microbatched alongside x and handed to every layer.
    n_micro: microbatch count; per-stage batch B_local must divide it.

    Returns the final activations, (B, S, H), batch-sharded like x.
    """
    n = int(mesh.shape[pipe_axis])
    if n == 1:
        def body(a, lyr):
            return layer_fn(a, lyr, extras), None
        out, _ = jax.lax.scan(body, x, layers)
        return out

    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % n:
        raise ValueError(f"{n_layers} layers must divide {n} pipeline stages")

    # shard_map cannot pad an uneven axis (GSPMD can): replicate the batch
    # dim when it does not divide the data axis (final partial batches).
    d = int(mesh.shape.get(data_axis, 1))
    bspec = data_axis if (d > 1 and x.shape[0] % d == 0) else None
    layer_specs = jax.tree.map(lambda _: P(pipe_axis), layers)
    xspec = P(bspec)
    extras_specs = jax.tree.map(lambda _: P(bspec), extras)

    def local(layers_l, x_l, extras_l):
        b_l = x_l.shape[0]
        if b_l % n_micro:
            raise ValueError(
                f"per-stage batch {b_l} must divide n_micro={n_micro}")
        mb = b_l // n_micro
        idx = jax.lax.axis_index(pipe_axis)
        x_mb = x_l.reshape((n_micro, mb) + x_l.shape[1:])
        extras_mb = jax.tree.map(
            lambda e: e.reshape((n_micro, mb) + e.shape[1:]), extras_l)

        def stage_apply(act, ext):
            def body(a, lyr):
                return layer_fn(a, lyr, ext), None
            out, _ = jax.lax.scan(body, act, layers_l)
            return out

        perm = [(i, (i + 1) % n) for i in range(n)]
        state0 = jnp.zeros((mb,) + x_l.shape[1:], x_l.dtype)
        out0 = jnp.zeros((n_micro, mb) + x_l.shape[1:], x_l.dtype)

        def tick(carry, t):
            state, outputs = carry
            # stage `idx` processes microbatch (t - idx) this tick
            m_idx = jnp.clip(t - idx, 0, n_micro - 1)
            ingest = jax.tree.map(
                lambda e: jax.lax.dynamic_index_in_dim(e, m_idx, 0,
                                                       keepdims=False),
                (x_mb, extras_mb))
            inj, ext = ingest
            act = jnp.where((idx == 0) & (t < n_micro), inj, state)
            out = stage_apply(act, ext)
            # the LAST stage finishes microbatch (t - (n-1)); record it
            w = t - (n - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, out, jnp.clip(w, 0, n_micro - 1), 0)
            outputs = jnp.where((w >= 0) & (w < n_micro), upd, outputs)
            # rotate activations one stage forward (wraparound carries
            # garbage back to stage 0, which overwrites it on ingest; its
            # downstream results are masked out of `outputs` by `w`)
            state = jax.lax.ppermute(out, pipe_axis, perm)
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(n_micro + n - 1))
        # only the last stage holds real outputs; psum broadcasts them so the
        # out_spec (replicated over pipe) is truthful
        outputs = jax.lax.psum(
            jnp.where(idx == n - 1, outputs, jnp.zeros_like(outputs)),
            pipe_axis)
        return outputs.reshape((b_l,) + x_l.shape[1:])

    fn = _shard_map(local, mesh,
                    in_specs=(layer_specs, xspec, extras_specs),
                    out_specs=xspec)
    return fn(layers, x, extras)
