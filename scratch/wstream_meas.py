"""Megakernel prototype gate (ROADMAP item 1): can a Pallas weight-streaming
int8 matmul beat XLA's ~75% HBM bandwidth at the decode weight-stream shape?

Shape: x (80, 3584) bf16  @  w (3584, 3584) int8 (per-out-channel scales)
— one 7B decode layer's o_proj at the bench batch. The whole decode weight
stream runs at ~580 GB/s under XLA (11.4 ms/step vs ~8.5 roofline); if a
hand-tiled Pallas kernel with K-streamed weight tiles gets closer to the
~820 GB/s the ring-DMA append kernel reaches, the cross-layer megakernel
is worth building. If not, the per-layer dispatch (3.5-4.5 ms/step) is the
only thing the megakernel can win and the call changes.

Variants (all iterated with a forced dependency chain inside ONE jit —
standalone loops over the axon tunnel time dispatch, not kernels):
  xla      — the production qmm (int8 weight, convert fused into the dot)
  pallas   — K-tiled grid, Pallas auto-pipelines the weight-tile DMAs;
             body converts the int8 tile to bf16 and MXU-dots it
  pallas8  — same with the body split into 128-row subtiles (helps Mosaic
             overlap the VPU convert of subtile j with the MXU dot of j-1)
  ceiling  — same grid/DMA pattern, body only max-reduces the int8 tile:
             the DMA-only roofline for this access pattern

Env: MB (batch, default 80), MKT (K tile rows, default 512), MITERS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from karanta_tpu.utils.compile_cache import enable_compilation_cache
from karanta_tpu.ops.quantization import quantize_weight, matmul as qmm

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

enable_compilation_cache()

B = int(os.environ.get("MB", 80))
K = N = 3584
KT = int(os.environ.get("MKT", 512))
ITERS = int(os.environ.get("MITERS", 50))
W_BYTES = K * N  # int8


def _mm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kt = w_ref.shape[0]
    sub = kt // subtiles
    for j in range(subtiles):
        rows = slice(j * sub, (j + 1) * sub)
        wt = w_ref[rows, :].astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[:, rows], wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def pallas_wstream(x, wq, scale, kt=KT, subtiles=1):
    b, k = x.shape
    n = wq.shape[1]
    grid = (k // kt,)
    return pl.pallas_call(
        partial(_mm_kernel, subtiles=subtiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, kt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x, wq, scale)


def _ceil_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = x_ref[...]

    # consume a 16-row sliver of the tile (the BlockSpec pipeline DMAs the
    # whole block regardless) so the DMA is the only real cost; fold into the
    # output so the call chains and can't hoist. int8 reductions are
    # unimplemented in Mosaic, so convert the sliver first.
    m = jnp.max(w_ref[0:16, :].astype(jnp.bfloat16), axis=0, keepdims=True)
    o_ref[...] += m * jnp.bfloat16(1e-4)


def pallas_ceiling(x, wq, kt=KT):
    b, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        _ceil_kernel,
        grid=(k // kt,),
        in_specs=[
            pl.BlockSpec((b, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(x, wq)


def _norm(x):
    return (x * jax.lax.rsqrt(jnp.mean(
        jnp.square(x.astype(jnp.float32))) + 1e-6)).astype(jnp.bfloat16)


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
w = quantize_weight(jax.random.normal(k1, (K, N), jnp.bfloat16) * 0.02)
x0 = jax.random.normal(k2, (B, K), jnp.bfloat16)
wq_arr, w_scale = w["int8_q"], w["scale"]


@partial(jax.jit, static_argnames=("which", "kt", "subtiles"))
def run(x, wq, scale, which, kt=KT, subtiles=1):
    def body(i, x):
        if which == "xla":
            o = qmm(x, {"int8_q": wq, "scale": scale})
        elif which == "ceiling":
            o = pallas_ceiling(x, wq, kt=kt)
        else:
            o = pallas_wstream(x, wq, scale, kt=kt, subtiles=subtiles)
        return _norm(o)
    return jax.lax.fori_loop(0, ITERS, body, x)


def check():
    ref = qmm(x0, w)
    got = pallas_wstream(x0, wq_arr, w_scale)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"correctness: max abs err vs XLA qmm = {err:.2e}", flush=True)


if __name__ == "__main__":
    check()
    variants = [("xla", {}), ("ceiling", {}),
                ("pallas", {"subtiles": 1}),
                ("pallas8", {"subtiles": 4})]
    # compile everything first (remote compiles are minutes each), then time
    for name, kw in variants:
        wh = "pallas" if name.startswith("pallas") else name
        t0 = time.perf_counter()
        run(x0, wq_arr, w_scale, wh, **kw).block_until_ready()
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    if os.environ.get("COMPILE_ONLY"):
        sys.exit(0)
    for name, kw in variants * 2:
        wh = "pallas" if name.startswith("pallas") else name
        r = run(x0, wq_arr, w_scale, wh, **kw)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = run(x0, wq_arr, w_scale, wh, **kw)
        r.block_until_ready()
        dt = time.perf_counter() - t0
        per_us = dt / ITERS * 1e6
        gbs = W_BYTES / (per_us / 1e6) / 1e9
        print(f"{name:8s}: {per_us:8.1f} us/call  -> {gbs:6.1f} GB/s "
              f"({gbs / 8.2:.0f}% of 820)", flush=True)
    print("OK")
