"""Decode-step weight-stream megakernel (dense phases).

One pallas_call runs every decoder layer's weight-bound matmuls for a
single decode step: grid=(layers, tiles), with the int8 weight tiles
streamed HBM->VMEM by the BlockSpec pipeline (double-buffered by Mosaic)
while the MXU consumes the previous tile. The hidden state (B, H) lives in
VMEM scratch for the whole call, so the per-layer XLA fusion launches and
the per-layer pallas dispatches (~126 us each, 3.5-4.5 ms/step at 28-36
layers — see BENCH_NOTES) collapse into one kernel launch per step.

Phase layout per layer (t axis):
  [0, nq)        K-tiled qkv projection: acc += xn[:, rows] @ wqkv[rows, :]
  [nq, nq+no)    K-tiled o projection of the attention output
  [nq+no, T)     fused MLP output-chunks: for a 256-row chunk j,
                 g = silu((xn @ wg_t[j].T) * gs), u = (xn @ wu_t[j].T) * us,
                 acc += (g*u) @ wd[j]   — no (B, FF) intermediate exists.

Weight layout: wqkv / wo / wd are stored (in, out) and K-tiled (contiguous
row slabs); gate/up are stored TRANSPOSED (out, in) so an output-chunk is
also a contiguous row slab. All dequantization (int8 -> bf16, per-output-
channel scales) happens on tile slices in VMEM.

This module currently implements the dense phases only; attention rides
the existing fused append kernel (ops/decode_attention.py). The full
megakernel (attention phases inline between qkv and o) builds on this.

Reference role: the reference delegates its decode loop entirely to vLLM's
CUDA kernels (karanta/pipeline.py:707-742); this is the TPU-native
equivalent of vLLM's fused decode path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KT = 256  # K-tile rows for qkv/o phases (divides 3584 and 2048)
MT = 256  # output-chunk rows for the fused MLP phase (divides 18944, 11008)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _kernel(x0_ref, ln1_ref, ln2_ref,
            wqkv_ref, qs_ref, bias_ref,
            attn_ref,
            wo_ref, os_ref,
            wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
            xout_ref, qkvout_ref,
            x_ref, xn_ref, accq_ref, acc_ref,
            *, nq: int, no: int, nm: int, eps: float):
    l = pl.program_id(0)
    t = pl.program_id(1)
    n_l = pl.num_programs(0)

    @pl.when((l == 0) & (t == 0))
    def _():
        x_ref[...] = x0_ref[...]

    # ---- qkv phase ----
    @pl.when(t == 0)
    def _():
        xn_ref[...] = _rms(x_ref[...], ln1_ref[0, 0],
                           eps).astype(xn_ref.dtype)
        accq_ref[...] = jnp.zeros_like(accq_ref)

    @pl.when(t < nq)
    def _():
        rows = pl.ds(t * KT, KT)
        accq_ref[...] += jax.lax.dot_general(
            xn_ref[:, rows], wqkv_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq - 1)
    def _():
        qkv = accq_ref[...] * qs_ref[0, 0] + bias_ref[0, 0].astype(
            jnp.float32)
        qkvout_ref[0] = qkv.astype(qkvout_ref.dtype)
        # dense prototype: "attention output" comes from the attn_ref input
        # (B, H) — the full megakernel computes it in attention phases here.
        xn_ref[...] = attn_ref[0]
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- o phase ----
    @pl.when((t >= nq) & (t < nq + no))
    def _():
        j = t - nq
        rows = pl.ds(j * KT, KT)
        h = xn_ref[:, rows]
        acc_ref[...] += jax.lax.dot_general(
            h, wo_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq + no - 1)
    def _():
        x = x_ref[...].astype(jnp.float32) + acc_ref[...] * os_ref[0, 0]
        x_ref[...] = x.astype(x_ref.dtype)
        xn_ref[...] = _rms(x, ln2_ref[0, 0], eps).astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # ---- fused MLP phase ----
    @pl.when(t >= nq + no)
    def _():
        xn = xn_ref[...]
        g = jax.lax.dot_general(xn, wg_ref[0].astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g * gs_ref[0, 0]
        u = jax.lax.dot_general(xn, wu_ref[0].astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = u * us_ref[0, 0]
        h = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot_general(
            h, wd_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq + no + nm - 1)
    def _():
        x = x_ref[...].astype(jnp.float32) + acc_ref[...] * ds_ref[0, 0]
        x_ref[...] = x.astype(x_ref.dtype)

        @pl.when(l == n_l - 1)
        def _():
            xout_ref[...] = x_ref[...]


def pack_stream_params(layers: dict) -> dict:
    """Repack the decoder's quantized stacked layers for the stream kernel.

    Input: params["text"]["layers"] with int8-quantized attn/mlp leaves
    (ops/quantization.quantize_decoder_params). Output dict:
      wqkv (L, H, QKV) int8, qs (L, 1, QKV) f32, bias (L, QKV) bf16,
      wo (L, H, H) int8, os (L, 1, H) f32,
      wg_t/wu_t (L, FF, H) int8 (transposed), gs/us (L, 1, FF) f32,
      wd (L, FF, H) int8, ds (L, 1, H) f32, ln1/ln2 (L, H).
    """
    attn, mlp = layers["attn"], layers["mlp"]

    def q(leaf):
        return leaf["int8_q"], leaf["scale"]

    wq, sq = q(attn["wq"])
    wk, sk = q(attn["wk"])
    wv, sv = q(attn["wv"])
    wo, so = q(attn["wo"])
    wg, sg = q(mlp["gate"])
    wu, su = q(mlp["up"])
    wd, sd = q(mlp["down"])
    # (L, 1, ·) so BlockSpec last-two-dims alignment holds (sublane dim 1
    # equals the array dim; a (1, H) block of an (L, H) array is illegal)
    return {
        "ln1": layers["ln1"][:, None, :], "ln2": layers["ln2"][:, None, :],
        "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
        "qs": jnp.concatenate([sq, sk, sv], axis=-1),
        "bias": jnp.concatenate([attn["bq"], attn["bk"], attn["bv"]],
                                axis=-1)[:, None, :],
        "wo": wo, "os": so,
        "wg_t": jnp.swapaxes(wg, 1, 2), "gs": sg,
        "wu_t": jnp.swapaxes(wu, 1, 2), "us": su,
        "wd": wd, "ds": sd,
    }


def dense_stream(x: jnp.ndarray,          # (B, H) bf16
                 attn_out: jnp.ndarray,   # (L, B, H) bf16 — per-layer stub
                 sp: dict,                # pack_stream_params output
                 eps: float = 1e-6,
                 interpret: bool = False,
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All layers' dense decode matmuls in one pallas_call.

    Prototype entry: attention outputs are an INPUT (per layer), and the
    per-layer qkv projections are an OUTPUT — the full megakernel closes
    the loop by computing attention between those phases. Returns
    (x_final (B, H), qkv (L, B, QKV) f32->bf16).
    """
    b, h = x.shape
    L, _, qkvd = sp["wqkv"].shape
    ff = sp["wd"].shape[1]
    assert h % KT == 0 and ff % MT == 0, (h, ff)
    nq = no = h // KT
    nm = ff // MT
    T = nq + no + nm

    grid = (L, T)

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    in_specs = [
        pl.BlockSpec((b, h), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        # wqkv tiles advance during the qkv phase, hold afterwards
        pl.BlockSpec((1, KT, qkvd),
                     lambda l, t: (l, clamp(t, 0, nq - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qkvd), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qkvd), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, h), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KT, h),
                     lambda l, t: (l, clamp(t - nq, 0, no - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, MT, h),
                     lambda l, t: (l, clamp(t - nq - no, 0, nm - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, MT),
                     lambda l, t: (l, 0, clamp(t - nq - no, 0, nm - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, MT, h),
                     lambda l, t: (l, clamp(t - nq - no, 0, nm - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, MT),
                     lambda l, t: (l, 0, clamp(t - nq - no, 0, nm - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, MT, h),
                     lambda l, t: (l, clamp(t - nq - no, 0, nm - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((b, h), lambda l, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, qkvd), lambda l, t: (l, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, nq=nq, no=no, nm=nm, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(jax.ShapeDtypeStruct((b, h), x.dtype),
                   jax.ShapeDtypeStruct((L, b, qkvd), x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((b, h), x.dtype),        # x carry
            pltpu.VMEM((b, h), x.dtype),        # xn (norm / o-phase input)
            pltpu.VMEM((b, qkvd), jnp.float32),  # qkv accumulator
            pltpu.VMEM((b, h), jnp.float32),     # o/mlp accumulator
        ],
        interpret=interpret,
    )(x, sp["ln1"], sp["ln2"], sp["wqkv"], sp["qs"], sp["bias"], attn_out,
      sp["wo"], sp["os"], sp["wg_t"], sp["gs"], sp["wu_t"], sp["us"],
      sp["wd"], sp["ds"])


def dense_stream_reference(x, attn_out, sp, eps: float = 1e-6):
    """Pure-jnp reference of dense_stream's math (for tests)."""
    L = sp["wqkv"].shape[0]
    qkvs = []
    for l in range(L):
        xn = _rms(x, sp["ln1"][l, 0], eps).astype(x.dtype)
        qkv = (jnp.matmul(xn, sp["wqkv"][l].astype(x.dtype),
                          preferred_element_type=jnp.float32)
               * sp["qs"][l, 0] + sp["bias"][l, 0].astype(jnp.float32))
        qkvs.append(qkv.astype(x.dtype))
        ao = attn_out[l]
        o = jnp.matmul(ao, sp["wo"][l].astype(x.dtype),
                       preferred_element_type=jnp.float32) * sp["os"][l, 0]
        x = (x.astype(jnp.float32) + o).astype(x.dtype)
        xn = _rms(x, sp["ln2"][l, 0], eps).astype(x.dtype)
        g = jax.lax.dot_general(xn, sp["wg_t"][l].astype(x.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = g * sp["gs"][l, 0]
        u = jax.lax.dot_general(xn, sp["wu_t"][l].astype(x.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        u = u * sp["us"][l, 0]
        hmid = (jax.nn.silu(g) * u).astype(x.dtype)
        d = jnp.matmul(hmid, sp["wd"][l].astype(x.dtype),
                       preferred_element_type=jnp.float32) * sp["ds"][l, 0]
        x = (x.astype(jnp.float32) + d).astype(x.dtype)
    return x, jnp.stack(qkvs)
