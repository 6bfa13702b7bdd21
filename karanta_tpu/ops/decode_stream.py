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


# ---------------------------------------------------------------------------
# Full decode megakernel: one pallas_call per decode step — qkv stream,
# fused cache-append attention (int8 KV), o stream, fused-MLP stream, for
# every layer, grid=(L, nq + B/spp + no + nm). The hidden state, the rope'd
# queries, and the attention outputs all live in VMEM scratch; the KV cache
# stays in HBM and is read block-wise / appended via the same ring-DMA +
# slab-RMW scheme as ops/decode_attention._decode_append_quant_kernel.
# ---------------------------------------------------------------------------

NEG_INF = -1e30


def _rotate_half(x):
    d = x.shape[-1]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    return jnp.concatenate([-x2, x1], axis=-1)


def _mega_kernel(len_ref,
                 x0_ref, cos_ref, sin_ref, ln1_ref, ln2_ref,
                 wqkv_ref, qs_ref, bias_ref,
                 wo_ref, os_ref,
                 wg_ref, gs_ref, wu_ref, us_ref, wd_ref, ds_ref,
                 k_in, v_in, ks_in, vs_in,
                 xout_ref, k_out, v_out, ks_out, vs_out,
                 x_ref, xn_ref, accq_ref,
                 qrot_ref, newk_ref, newv_ref, nks_ref, nvs_ref,
                 k_buf, v_buf, ksc_buf, vsc_buf,
                 kslab, vslab, ksslab, vsslab,
                 acc_a, m_a, l_a, sems, wsems,
                 *, ktq: int, kt: int, mt: int, spp: int, nbuf: int,
                 block: int, slab: int, sslab: int,
                 nq: int, na: int, no: int, nm: int,
                 kvh: int, group: int, d: int, qd: int, kvd: int,
                 scale: float, eps: float):
    l = pl.program_id(0)
    t = pl.program_id(1)
    n_l = pl.num_programs(0)
    hd = xn_ref.shape[1]

    @pl.when((l == 0) & (t == 0))
    def _():
        x_ref[...] = x0_ref[...]

    # ---------------- qkv phase ----------------
    @pl.when(t == 0)
    def _():
        xn_ref[...] = _rms(x_ref[...], ln1_ref[0, 0],
                           eps).astype(xn_ref.dtype)
        accq_ref[...] = jnp.zeros_like(accq_ref)

    @pl.when(t < nq)
    def _():
        rows = pl.ds(t * ktq, ktq)
        accq_ref[...] += jax.lax.dot_general(
            xn_ref[:, rows], wqkv_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq - 1)
    def _():
        # bias + scale, then round-trip through bf16 before rope/quantize —
        # the per-layer XLA path materializes bf16 q/k/v (qmm casts), so
        # matching that keeps greedy parity with the existing decode.
        qkv = (accq_ref[...] * qs_ref[0, 0]
               + bias_ref[0, 0].astype(jnp.float32)).astype(jnp.bfloat16)
        cos = cos_ref[...].astype(jnp.float32)          # (B, D)
        sin = sin_ref[...].astype(jnp.float32)
        for j in range(kvh * group):
            v = qkv[:, j * d:(j + 1) * d].astype(jnp.float32)
            qrot_ref[:, j, :] = (v * cos + _rotate_half(v) * sin
                                 ).astype(qrot_ref.dtype)
        for h in range(kvh):
            kvec = qkv[:, qd + h * d: qd + (h + 1) * d].astype(jnp.float32)
            kvec = (kvec * cos + _rotate_half(kvec) * sin
                    ).astype(jnp.bfloat16).astype(jnp.float32)
            ka = jnp.max(jnp.abs(kvec), axis=-1, keepdims=True)
            ks = jnp.maximum(ka / 127.0, 1e-8)
            newk_ref[:, h, :] = jnp.clip(jnp.round(kvec / ks), -127,
                                         127).astype(jnp.int8)
            nks_ref[:, h, :] = jnp.broadcast_to(
                ks, nks_ref.shape[:1] + (128,)).astype(nks_ref.dtype)
            vvec = qkv[:, qd + kvd + h * d:
                       qd + kvd + (h + 1) * d].astype(jnp.float32)
            va = jnp.max(jnp.abs(vvec), axis=-1, keepdims=True)
            vs = jnp.maximum(va / 127.0, 1e-8)
            newv_ref[:, h, :] = jnp.clip(jnp.round(vvec / vs), -127,
                                         127).astype(jnp.int8)
            nvs_ref[:, h, :] = jnp.broadcast_to(
                vs, nvs_ref.shape[:1] + (128,)).astype(nvs_ref.dtype)

    # ---------------- attention phase ----------------
    @pl.when((t >= nq) & (t < nq + na))
    def _():
        grp = t - nq
        base = grp * spp
        seqs = [len_ref[base + sp] for sp in range(spp)]
        nblocks = [jax.lax.div(sl + (block - 1), block) for sl in seqs]
        max_nb = nblocks[0]
        for nb in nblocks[1:]:
            max_nb = jnp.maximum(max_nb, nb)

        newk = newk_ref[pl.ds(base, spp)]         # (spp, KVH, D) int8
        newv = newv_ref[pl.ds(base, spp)]
        nks = nks_ref[pl.ds(base, spp)]           # (spp, KVH, 128)
        nvs = nvs_ref[pl.ds(base, spp)]
        qg = qrot_ref[pl.ds(base, spp)]           # (spp, KVH*G, D)

        # --- slab RMW: append this step's row + scale per slot ---
        slab_starts = [jax.lax.mul(jax.lax.div(sl, slab), slab)
                       for sl in seqs]
        sslab_starts = [jax.lax.mul(jax.lax.div(sl, sslab), sslab)
                        for sl in seqs]
        rcopies = []
        for sp in range(spp):
            slot = base + sp
            for j, (src, dst) in enumerate(((k_in, kslab), (v_in, vslab))):
                rc = pltpu.make_async_copy(
                    src.at[l, slot, pl.ds(0, kvh),
                           pl.ds(slab_starts[sp], slab)],
                    dst.at[sp], wsems.at[j, sp])
                rc.start()
                rcopies.append(rc)
            for j, (src, dst) in enumerate(((ks_in, ksslab),
                                            (vs_in, vsslab))):
                rc = pltpu.make_async_copy(
                    src.at[l, slot, pl.ds(0, kvh),
                           pl.ds(sslab_starts[sp], sslab)],
                    dst.at[sp], wsems.at[2 + j, sp])
                rc.start()
                rcopies.append(rc)
        for rc in rcopies:
            rc.wait()
        wcopies = []
        for sp in range(spp):
            slot = base + sp
            row_sel = (jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)
                       == seqs[sp] - slab_starts[sp])
            for h in range(kvh):
                kslab[sp, h] = jnp.where(row_sel, newk[sp, h][None, :],
                                         kslab[sp, h])
                vslab[sp, h] = jnp.where(row_sel, newv[sp, h][None, :],
                                         vslab[sp, h])
            col_sel = (jax.lax.broadcasted_iota(jnp.int32, (kvh, sslab), 1)
                       == seqs[sp] - sslab_starts[sp])
            ksslab[sp] = jnp.where(col_sel,
                                   nks[sp, :, 0:1].astype(ksslab.dtype),
                                   ksslab[sp])
            vsslab[sp] = jnp.where(col_sel,
                                   nvs[sp, :, 0:1].astype(vsslab.dtype),
                                   vsslab[sp])
            for j, (src, dst) in enumerate(((kslab, k_out), (vslab, v_out))):
                wc = pltpu.make_async_copy(
                    src.at[sp], dst.at[l, slot, pl.ds(0, kvh),
                                       pl.ds(slab_starts[sp], slab)],
                    wsems.at[j, sp])
                wc.start()
                wcopies.append(wc)
            for j, (src, dst) in enumerate(((ksslab, ks_out),
                                            (vsslab, vs_out))):
                wc = pltpu.make_async_copy(
                    src.at[sp], dst.at[l, slot, pl.ds(0, kvh),
                                       pl.ds(sslab_starts[sp], sslab)],
                    wsems.at[2 + j, sp])
                wc.start()
                wcopies.append(wc)

        acc_a[...] = jnp.zeros_like(acc_a)
        m_a[...] = jnp.full_like(m_a, NEG_INF)
        l_a[...] = jnp.zeros_like(l_a)

        def dmas(sp, i, buf_slot):
            slot = base + sp
            return [
                pltpu.make_async_copy(
                    k_in.at[l, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                    k_buf.at[sp, buf_slot], sems.at[0, sp, buf_slot]),
                pltpu.make_async_copy(
                    v_in.at[l, slot, pl.ds(0, kvh), pl.ds(i * block, block)],
                    v_buf.at[sp, buf_slot], sems.at[1, sp, buf_slot]),
                pltpu.make_async_copy(
                    ks_in.at[l, slot, pl.ds(0, kvh),
                             pl.ds(i * block, block)],
                    ksc_buf.at[sp, buf_slot], sems.at[2, sp, buf_slot]),
                pltpu.make_async_copy(
                    vs_in.at[l, slot, pl.ds(0, kvh),
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
                    cols = i * block + jax.lax.broadcasted_iota(
                        jnp.int32, (group, block), 1)
                    valid = cols < seqs[sp]
                    q = qg[sp]
                    ksc = ksc_buf[sp, cur].astype(jnp.float32)
                    vsc = vsc_buf[sp, cur].astype(jnp.float32)
                    for h in range(kvh):
                        qh = q[h * group:(h + 1) * group]
                        k = k_buf[sp, cur, h].astype(q.dtype)
                        s = jax.lax.dot_general(
                            qh, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * ksc[h][None, :]
                        s = jnp.where(valid, s * scale, NEG_INF)
                        rows = slice(h * group, (h + 1) * group)
                        m_prev = m_a[sp, rows, 0:1]
                        l_prev = l_a[sp, rows, 0:1]
                        m_new = jnp.maximum(
                            m_prev, jnp.max(s, axis=-1, keepdims=True))
                        p = jnp.exp(s - m_new)
                        alpha = jnp.exp(m_prev - m_new)
                        l_a[sp, rows, 0:1] = alpha * l_prev + jnp.sum(
                            p, axis=-1, keepdims=True)
                        m_a[sp, rows, 0:1] = m_new
                        pv = jax.lax.dot_general(
                            (p * vsc[h][None, :]).astype(q.dtype),
                            v_buf[sp, cur, h].astype(q.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc_a[sp, rows, :] = acc_a[sp, rows, :] * alpha + pv
            return ()

        jax.lax.fori_loop(0, max_nb, body, ())

        # fold in each slot's new token from VMEM
        for sp in range(spp):
            q = qg[sp]
            for h in range(kvh):
                rows = slice(h * group, (h + 1) * group)
                qh = q[rows]
                nk = (newk[sp, h].astype(jnp.float32)
                      * nks[sp, h, 0:1].astype(jnp.float32))
                s_x = jnp.sum(qh.astype(jnp.float32) * nk[None, :], axis=-1,
                              keepdims=True) * scale
                m_prev = m_a[sp, rows, 0:1]
                l_prev = l_a[sp, rows, 0:1]
                m_new = jnp.maximum(m_prev, s_x)
                p_x = jnp.exp(s_x - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_a[sp, rows, 0:1] = alpha * l_prev + p_x
                nv = (newv[sp, h].astype(jnp.float32)
                      * nvs[sp, h, 0:1].astype(jnp.float32))
                acc_a[sp, rows, :] = (acc_a[sp, rows, :] * alpha
                                      + p_x * nv[None, :])

        for wc in wcopies:
            wc.wait()

        for sp in range(spp):
            ll = l_a[sp, :, 0:1]
            ll = jnp.where(ll == 0.0, 1.0, ll)
            qrot_ref[base + sp] = (acc_a[sp] / ll).astype(qrot_ref.dtype)

    # ---------------- o phase ----------------
    @pl.when(t == nq + na)
    def _():
        for j in range(kvh * group):
            xn_ref[:, j * d:(j + 1) * d] = qrot_ref[:, j, :]
        accq_ref[:, :hd] = jnp.zeros_like(accq_ref[:, :hd])

    @pl.when((t >= nq + na) & (t < nq + na + no))
    def _():
        j = t - (nq + na)
        rows = pl.ds(j * kt, kt)
        accq_ref[:, :hd] += jax.lax.dot_general(
            xn_ref[:, rows], wo_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq + na + no - 1)
    def _():
        x = (x_ref[...].astype(jnp.float32)
             + accq_ref[:, :hd] * os_ref[0, 0])
        x_ref[...] = x.astype(x_ref.dtype)
        xn_ref[...] = _rms(x, ln2_ref[0, 0], eps).astype(xn_ref.dtype)
        accq_ref[:, :hd] = jnp.zeros_like(accq_ref[:, :hd])

    # ---------------- fused MLP phase ----------------
    @pl.when(t >= nq + na + no)
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
        accq_ref[:, :hd] += jax.lax.dot_general(
            h, wd_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(t == nq + na + no + nm - 1)
    def _():
        x = (x_ref[...].astype(jnp.float32)
             + accq_ref[:, :hd] * ds_ref[0, 0])
        x_ref[...] = x.astype(x_ref.dtype)

        @pl.when(l == n_l - 1)
        def _():
            xout_ref[...] = x_ref[...]


@functools.partial(
    jax.jit, static_argnames=("qd", "kvd", "ktq", "kt", "mt", "spp", "nbuf",
                              "block", "scale", "eps", "interpret"))
def decode_megakernel(x: jnp.ndarray,           # (B, H) bf16
                      cos: jnp.ndarray,         # (B, D) f32
                      sin: jnp.ndarray,         # (B, D) f32
                      sp: dict,                 # pack_stream_params output
                      k_cache: jnp.ndarray,     # (L, B, KVH, M, D) int8
                      v_cache: jnp.ndarray,
                      ks_cache: jnp.ndarray,    # (L, B, KVH, M) bf16
                      vs_cache: jnp.ndarray,
                      cache_len: jnp.ndarray,   # (B,) int32
                      qd: int | None = None,
                      kvd: int | None = None,
                      ktq: int = 128, kt: int = 128, mt: int = 256,
                      spp: int = 2, nbuf: int = 2, block: int = 512,
                      scale: float | None = None,
                      eps: float = 1e-6,
                      interpret: bool = False):
    """One decode step across ALL layers in a single pallas_call.

    Returns (x_final (B, H) pre-final-norm, k, v, ks, vs) with the int8 KV
    caches appended in place (input_output_aliases). The embedding lookup,
    rope tables, final norm and logits matmul stay outside (tiny).
    """
    b, h = x.shape
    L, _, kvh, m, d = k_cache.shape
    qkvd = sp["wqkv"].shape[2]
    ff = sp["wd"].shape[1]
    if qd is None:
        qd = h
    if kvd is None:
        kvd = (qkvd - qd) // 2
    group = qd // d // kvh
    scale = float(d ** -0.5 if scale is None else scale)
    block = min(block, m)
    while m % block:
        block //= 2
    slab = min(32, m)
    sslab = min(128, m)
    if m % slab or m % sslab:
        raise ValueError(f"bucket {m} must be a multiple of {slab}/{sslab}")
    if b % spp:
        raise ValueError(f"batch {b} not divisible by spp {spp}")
    assert h % ktq == 0 and h % kt == 0 and ff % mt == 0

    nq, no, nm = h // ktq, h // kt, ff // mt
    na = b // spp
    T = nq + na + no + nm

    def qkv_idx(l, t, lens):
        return (l, jnp.minimum(t, nq - 1), 0)

    def o_idx(l, t, lens):
        return (l, jnp.clip(t - nq - na, 0, no - 1), 0)

    def mlp_idx(l, t, lens):
        return (l, jnp.clip(t - nq - na - no, 0, nm - 1), 0)

    def mlp_s_idx(l, t, lens):
        return (l, 0, jnp.clip(t - nq - na - no, 0, nm - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, T),
        in_specs=[
            pl.BlockSpec((b, h), lambda l, t, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda l, t, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda l, t, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ktq, qkvd), qkv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qkvd), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qkvd), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, h), o_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, h), mlp_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mt), mlp_s_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, h), mlp_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mt), mlp_s_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, h), mlp_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda l, t, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((b, h), lambda l, t, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), x.dtype),                   # x carry
            pltpu.VMEM((b, h), x.dtype),                   # xn
            pltpu.VMEM((b, qkvd), jnp.float32),   # qkv acc; [:, :h] doubles
                                                  # as the o/mlp accumulator
            pltpu.VMEM((b, kvh * group, d), x.dtype),  # rope'd q / attn out
            pltpu.VMEM((b, kvh, d), jnp.int8),             # new k rows
            pltpu.VMEM((b, kvh, d), jnp.int8),             # new v rows
            pltpu.VMEM((b, kvh, 128), ks_cache.dtype),     # new k scales
            pltpu.VMEM((b, kvh, 128), vs_cache.dtype),     # new v scales
            pltpu.VMEM((spp, nbuf, kvh, block, d), jnp.int8),
            pltpu.VMEM((spp, nbuf, kvh, block, d), jnp.int8),
            pltpu.VMEM((spp, nbuf, kvh, block), ks_cache.dtype),
            pltpu.VMEM((spp, nbuf, kvh, block), vs_cache.dtype),
            pltpu.VMEM((spp, kvh, slab, d), jnp.int8),
            pltpu.VMEM((spp, kvh, slab, d), jnp.int8),
            pltpu.VMEM((spp, kvh, sslab), ks_cache.dtype),
            pltpu.VMEM((spp, kvh, sslab), vs_cache.dtype),
            pltpu.VMEM((spp, kvh * group, d), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.VMEM((spp, kvh * group, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, spp, nbuf)),
            pltpu.SemaphoreType.DMA((4, spp)),
        ],
    )

    kernel = functools.partial(
        _mega_kernel, ktq=ktq, kt=kt, mt=mt, spp=spp, nbuf=nbuf, block=block,
        slab=slab, sslab=sslab, nq=nq, na=na, no=no, nm=nm, kvh=kvh,
        group=group, d=d, qd=qd, kvd=kvd, scale=scale, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h), x.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks_cache.shape, ks_cache.dtype),
            jax.ShapeDtypeStruct(vs_cache.shape, vs_cache.dtype),
        ],
        # operands: 0 lens, 1 x0, 2 cos, 3 sin, 4 ln1, 5 ln2, 6 wqkv, 7 qs,
        # 8 bias, 9 wo, 10 os, 11 wg, 12 gs, 13 wu, 14 us, 15 wd, 16 ds,
        # 17 k, 18 v, 19 ks, 20 vs
        input_output_aliases={17: 1, 18: 2, 19: 3, 20: 4},
        interpret=interpret,
    )(cache_len.astype(jnp.int32), x, cos, sin,
      sp["ln1"], sp["ln2"], sp["wqkv"], sp["qs"], sp["bias"],
      sp["wo"], sp["os"], sp["wg_t"], sp["gs"], sp["wu_t"], sp["us"],
      sp["wd"], sp["ds"], k_cache, v_cache, ks_cache, vs_cache)
    return out


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
