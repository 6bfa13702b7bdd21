"""Qwen2.5-VL text decoder, TPU-native.

Numerics-compatible with HF Qwen2_5_VLTextModel (GQA attention with q/k/v
biases, SwiGLU MLP, RMSNorm, M-RoPE), redesigned for XLA:

  - Layers are stacked (leading `layers` axis) and run under lax.scan: one
    compiled layer body, O(1) compile time in depth.
  - Prefill uses the Pallas flash-attention kernel (causal); decode reads the
    KV cache with a length mask. Both are static-shaped; sequence lengths are
    bucketed by the serving engine.
  - The KV cache is a pytree of (layers, batch, kv_heads, max_len, head_dim)
    buffers threaded through the scan as per-layer xs — appended in place via
    scatter at per-slot write offsets (continuous batching writes at a
    different offset per row).

Tensor-parallel sharding happens via logical axes (decoder_param_axes) +
parallel/sharding rules; heads/mlp columns shard over the "model" mesh axis,
which turns the o_proj/down_proj matmuls into psum-reduced partial products —
XLA inserts the collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.models.qwen25_vl.config import TextConfig
from karanta_tpu.ops.attention import (attention, decode_attention,
                                        decode_attention_multi)
from karanta_tpu.ops.norms import rms_norm
from karanta_tpu.ops.quantization import matmul as qmm
from karanta_tpu.ops.quantization import matmul_w8a8
from karanta_tpu.ops.rotary import apply_rope, mrope_cos_sin

Params = Any


def init_decoder_params(cfg: TextConfig, key: jax.Array,
                        dtype=jnp.bfloat16) -> Params:
    h, L = cfg.hidden_size, cfg.num_layers
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim
    inter = cfg.intermediate_size
    keys = iter(jax.random.split(key, 16))

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / np.sqrt(shape[-2] if len(shape) > 1 else shape[0])).astype(dtype)

    def stack(k, shape):
        return dense(k, (L,) + shape)

    params = {
        "embed": (jax.random.normal(next(keys), (cfg.vocab_size, h),
                                    jnp.float32) * 0.02).astype(dtype),
        "layers": {
            "ln1": jnp.ones((L, h), dtype),
            "ln2": jnp.ones((L, h), dtype),
            "attn": {
                "wq": stack(next(keys), (h, qd)),
                "bq": jnp.zeros((L, qd), dtype),
                "wk": stack(next(keys), (h, kvd)),
                "bk": jnp.zeros((L, kvd), dtype),
                "wv": stack(next(keys), (h, kvd)),
                "bv": jnp.zeros((L, kvd), dtype),
                "wo": stack(next(keys), (qd, h)),
            },
            "mlp": {
                "gate": stack(next(keys), (h, inter)),
                "up": stack(next(keys), (h, inter)),
                "down": stack(next(keys), (inter, h)),
            },
        },
        "final_norm": jnp.ones((h,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), (h, cfg.vocab_size))
    return params


def decoder_param_axes(cfg: TextConfig) -> Params:
    axes = {
        "embed": ("vocab", "embed"),
        "layers": {
            "ln1": ("layers", "embed"),
            "ln2": ("layers", "embed"),
            "attn": {
                "wq": ("layers", "embed", "heads"),
                "bq": ("layers", "heads"),
                "wk": ("layers", "embed", "kv_heads"),
                "bk": ("layers", "kv_heads"),
                "wv": ("layers", "embed", "kv_heads"),
                "bv": ("layers", "kv_heads"),
                "wo": ("layers", "heads", "embed"),
            },
            "mlp": {
                "gate": ("layers", "embed", "mlp"),
                "up": ("layers", "embed", "mlp"),
                "down": ("layers", "mlp", "embed"),
            },
        },
        "final_norm": ("embed",),
    }
    if not cfg.tie_word_embeddings:
        axes["lm_head"] = ("embed", "vocab")
    return axes


@dataclasses.dataclass
class KVCache:
    """Per-layer key/value buffers: (layers, batch, kv_heads, max_len, head_dim).\n\n    The per-head max_len x head_dim slab is contiguous, so decode reads the\n    cache at full stride (the (..., max_len, kv_heads, ...) layout interleaved\n    heads and crippled read bandwidth)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: TextConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


jax.tree_util.register_pytree_node(
    KVCache, lambda c: ((c.k, c.v), None), lambda _, kv: KVCache(*kv))


@dataclasses.dataclass
class QuantKVCache:
    """int8 KV cache with per-row (per token, per kv head) absmax scales.

    Halves the decode path's dominant HBM stream (the cache read: 48% of
    chunk time at B32/M4096 per the XLA trace) and doubles the slot count a
    chip can hold. The int8->bf16 convert fuses into the attention einsum's
    operand load, the scale applies to the f32 score/probability tensors
    (vLLM's fp8 KV cache plays the same role in the reference's serving
    stack, pipeline.py:1128-1131)."""

    k: jnp.ndarray    # int8 (L, B, KVH, M, D)
    v: jnp.ndarray    # int8
    ks: jnp.ndarray   # bf16 (L, B, KVH, M)
    vs: jnp.ndarray   # bf16

    @classmethod
    def zeros(cls, cfg: TextConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "QuantKVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len,
                 cfg.head_dim)
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                   jnp.ones(shape[:-1], dtype), jnp.ones(shape[:-1], dtype))


jax.tree_util.register_pytree_node(
    QuantKVCache, lambda c: ((c.k, c.v, c.ks, c.vs), None),
    lambda _, t: QuantKVCache(*t))


def quantize_kv_rows(x: jnp.ndarray):
    """(..., D) -> (int8 (..., D), scale (...,)) with per-row absmax."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(a / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# int4 (nibble-packed) KV cache — the capacity operating point.
#
# Rows quantize to [-7, 7] with the same per-row absmax scales as int8, and
# PAIRS of token rows pack into one int8 byte along the sequence (sublane)
# axis, so the cache occupies half the HBM of the int8 cache and the decode
# kernel's cache read moves half the bytes. Packing is sublane-axis (not
# head_dim) because TPU HBM buffers tile the last two dims — packing head_dim
# 128 -> 64 would pad right back to 128 lanes and save nothing.
#
# Pairing: within each 64-token window w, packed row (32*w + j) holds token
# (64*w + j) in the LOW nibble and token (64*w + 32 + j) in the HIGH nibble
# (j in [0, 32)). 32 is the int8 sublane tile, so a window's packed rows are
# exactly one tile: the decode append's read-modify-write of a single byte
# nibble stays a one-tile slab, and a DMA block of packed rows always covers
# two contiguous token ranges.
#
# Scales stay UNPACKED per token but are stored in nibble-plane order
# (L, B, 2*KVH, M/2) with row 2h+nib = head h, nibble plane nib, so the
# kernel's scale tiles line up column-for-column with the unpacked score
# tiles without any in-kernel permute.
#
# Fidelity note: 4-bit KV is a documented capacity/throughput trade (the
# reference's vLLM stack serves FP8 KV; vLLM also ships int4 KV as opt-in).
# This mode is opt-in (`kv_quantize="int4"`) and excluded from the
# like-for-like headline bench.
# --------------------------------------------------------------------------

Q4_WINDOW = 64  # tokens per packing window (2 sublane tiles of 32)


def quantize_kv_rows_q4(x: jnp.ndarray):
    """(..., D) -> (int8 nibbles in [-7, 7] (..., D), scale (...,))."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(a / 7.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int8)
    return q, s.astype(jnp.bfloat16)


def _bits_to_int8(u: jnp.ndarray) -> jnp.ndarray:
    """int32 byte values in [0, 255] -> bit-identical int8."""
    return (((u & 0xFF) ^ 0x80) - 0x80).astype(jnp.int8)


def pack_q4_rows(q: jnp.ndarray) -> jnp.ndarray:
    """(..., S, D) int8 nibbles -> (..., S/2, D) packed bytes (S % 64 == 0)."""
    *lead, s, d = q.shape
    assert s % Q4_WINDOW == 0, s
    r = q.reshape(*lead, s // Q4_WINDOW, 2, 32, d).astype(jnp.int32)
    lo, hi = r[..., 0, :, :], r[..., 1, :, :]
    b = (lo & 0xF) | ((hi & 0xF) << 4)
    return _bits_to_int8(b).reshape(*lead, s // 2, d)


def unpack_q4_rows(p: jnp.ndarray) -> jnp.ndarray:
    """(..., S/2, D) packed -> (..., S, D) int8 nibble values, token order."""
    *lead, pm, d = p.shape
    b = p.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = b >> 4
    both = jnp.stack([lo, hi], axis=-3)                 # (..., 2, S/2, D)
    both = both.reshape(*lead, 2, pm // 32, 32, d)
    both = jnp.swapaxes(both, -4, -3)                   # (..., nw, 2, 32, D)
    return both.reshape(*lead, 2 * pm, d).astype(jnp.int8)


def pack_q4_scales(s: jnp.ndarray) -> jnp.ndarray:
    """Per-token scales (..., KVH, S) -> nibble planes (..., 2*KVH, S/2)."""
    *lead, kvh, seq = s.shape
    assert seq % Q4_WINDOW == 0, seq
    r = s.reshape(*lead, kvh, seq // Q4_WINDOW, 2, 32)
    r = jnp.moveaxis(r, -2, -3)                         # (..., KVH, 2, nw, 32)
    return r.reshape(*lead, 2 * kvh, seq // 2)


def unpack_q4_scales(p: jnp.ndarray) -> jnp.ndarray:
    """Nibble planes (..., 2*KVH, S/2) -> per-token scales (..., KVH, S)."""
    *lead, kvh2, pm = p.shape
    r = p.reshape(*lead, kvh2 // 2, 2, pm // 32, 32)
    r = jnp.moveaxis(r, -3, -2)                         # (..., KVH, nw, 2, 32)
    return r.reshape(*lead, kvh2 // 2, 2 * pm)


def q4_pack_prefill(k_rows: jnp.ndarray, v_rows: jnp.ndarray):
    """Quantize + pack prefill KV rows (..., KVH, S, D) for slot insert.

    Returns (k4, v4, ks, vs): packed bytes (..., KVH, ceil64(S)/2, D) and
    nibble-plane scales (..., 2*KVH, ceil64(S)/2). S pads up to a whole
    window with zero rows (dead nibbles — masked by cache_len downstream)."""
    kq, ks = quantize_kv_rows_q4(k_rows)
    vq, vs = quantize_kv_rows_q4(v_rows)
    s = kq.shape[-2]
    pad = (-s) % Q4_WINDOW
    if pad:
        widths_r = [(0, 0)] * (kq.ndim - 2) + [(0, pad), (0, 0)]
        widths_s = [(0, 0)] * (ks.ndim - 1) + [(0, pad)]
        kq = jnp.pad(kq, widths_r)
        vq = jnp.pad(vq, widths_r)
        ks = jnp.pad(ks, widths_s)
        vs = jnp.pad(vs, widths_s)
    return (pack_q4_rows(kq), pack_q4_rows(vq),
            pack_q4_scales(ks), pack_q4_scales(vs))


def _q4_row_nib(pos: jnp.ndarray):
    """Token position -> (packed row, nibble plane) under the pairing."""
    w = pos >> 6
    j = pos & 63
    return (w << 5) + (j & 31), j >> 5


@dataclasses.dataclass
class Q4KVCache:
    """Nibble-packed int4 KV cache (see the block comment above).

    Half the HBM footprint and half the decode cache-read bytes of
    QuantKVCache — the capacity operating point that roughly doubles the
    decode slot count a chip holds at a given context bucket."""

    k: jnp.ndarray    # int8 packed (L, B, KVH, M/2, D)
    v: jnp.ndarray    # int8 packed
    ks: jnp.ndarray   # bf16 (L, B, 2*KVH, M/2) nibble-plane scales
    vs: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: TextConfig, batch: int, max_len: int,
              dtype=jnp.bfloat16) -> "Q4KVCache":
        if max_len % Q4_WINDOW:
            raise ValueError(
                f"int4 KV cache needs max_seq_len % {Q4_WINDOW} == 0, "
                f"got {max_len}")
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len // 2,
                 cfg.head_dim)
        sshape = (cfg.num_layers, batch, 2 * cfg.num_kv_heads, max_len // 2)
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                   jnp.ones(sshape, dtype), jnp.ones(sshape, dtype))


jax.tree_util.register_pytree_node(
    Q4KVCache, lambda c: ((c.k, c.v, c.ks, c.vs), None),
    lambda _, t: Q4KVCache(*t))


def _paged_decode_mode(max_len: int, quant: bool = False) -> str:
    """Pallas decode-kernel selection.

    Auto (KARANTA_PAGED_DECODE unset): the fused append kernel for KV
    buckets >= 8192, and for int8 caches at ANY bucket — XLA's dense int8
    path materializes a bf16 copy of each layer's cache per step (measured
    5.1 ms/step of multiply_convert fusions at 7B B48 M1920; the kernel
    beat dense 2.35 vs 2.29 pages/s there). For bf16 caches below 8192 the
    dense path wins: its cache read scales with the bucket (23.6 ms/step
    at 16k, B32) while the kernel reads only live rows, but each of the
    per-layer pallas calls costs ~125 us of dispatch (~4.5 ms/step floor
    at 36 layers). Overrides: "0" dense, "1"/"append" fused kernel,
    "stacked" the read-only kernel + scatter (kept for A/B; 35x slower
    in-scan because XLA copies the carried cache defensively per call).
    """
    import os

    import jax

    if jax.default_backend() != "tpu":
        return ""
    mode = os.environ.get("KARANTA_PAGED_DECODE", "")
    if mode == "":
        return "append" if (quant or max_len >= 8192) else ""
    if mode == "0":
        return ""
    return "append" if mode == "1" else mode


# Test hook: force (mode, interpret) so the kernel integration runs on the
# CPU mesh in pallas interpret mode (the env gate requires a real TPU).
_PAGED_FORCE: Optional[tuple] = None


def _project_qkv(x, p, cfg: TextConfig, mm=qmm):
    b, s, _ = x.shape
    q = (mm(x, p["wq"]) + p["bq"]).reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = (mm(x, p["wk"]) + p["bk"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = (mm(x, p["wv"]) + p["bv"]).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


def _mlp(x, p, mm=qmm):
    return mm(jax.nn.silu(mm(x, p["gate"])) * mm(x, p["up"]), p["down"])


def prefill_forward(params: Params, cfg: TextConfig,
                    embeds: jnp.ndarray,           # (B, S, hidden)
                    positions: jnp.ndarray,        # (3, B, S) int32
                    kv_mask: Optional[jnp.ndarray] = None,  # (B, S) 1=valid
                    act_quant: bool = False,
                    remat: bool = False,
                    attn_impl: Optional[Any] = None,
                    ) -> tuple[jnp.ndarray, KVCache]:
    """Full-sequence causal forward. Returns (hidden_states, kv cache of S).

    attn_impl overrides the attention callable (signature of
    ops.attention.attention) — the hook context-parallel training uses to
    substitute the sequence-sharded shard_map kernel
    (parallel/context.py make_context_parallel_attention).

    act_quant=True runs the layer matmuls W8A8 (dynamic per-token int8
    activations x int8 weights on the MXU's 2x int8 path); requires
    quantized weights — plain bf16 leaves pass through unchanged.

    remat=True checkpoints the per-layer scan body so the backward pass
    keeps one residual per layer instead of every intermediate — the only
    placement that actually lowers peak HBM (checkpointing the whole
    forward replays it but still needs all per-layer residuals live at
    once during the replayed backward).
    """
    mm = matmul_w8a8 if act_quant else qmm
    attn_fn = attention if attn_impl is None else attn_impl
    b, s, _ = embeds.shape
    cos, sin = jax.vmap(
        lambda p: mrope_cos_sin(p, cfg.head_dim, cfg.mrope_section, cfg.rope_theta),
        in_axes=1, out_axes=0)(positions)
    cos = cos.astype(embeds.dtype)
    sin = sin.astype(embeds.dtype)

    def body(x, layer):
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(xn, layer["attn"], cfg, mm=mm)
        q, k = apply_rope(q, k, cos, sin)
        attn = attn_fn(q, k, v, kv_mask=kv_mask, causal=True)
        x = x + mm(attn.reshape(b, s, -1), layer["attn"]["wo"])
        x = x + _mlp(rms_norm(x, layer["ln2"], cfg.rms_norm_eps), layer["mlp"],
                     mm=mm)
        # store (B, KVH, S, D): contiguous per-head slabs for decode reads
        return x, (k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))

    if remat:
        body = jax.checkpoint(body)
    x, (ks, vs) = jax.lax.scan(body, embeds, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(ks, vs)


def pipeline_prefill_forward(params: Params, cfg: TextConfig,
                             embeds: jnp.ndarray,       # (B, S, hidden)
                             positions: jnp.ndarray,    # (3, B, S) int32
                             mesh,                      # Mesh w/ "pipe" axis
                             n_micro: int,
                             kv_mask: Optional[jnp.ndarray] = None,
                             remat: bool = False,
                             ) -> jnp.ndarray:
    """prefill_forward's layer stack under pipeline parallelism: the stacked
    layers shard over the mesh's "pipe" axis and microbatches stream through
    the GPipe schedule in parallel/pipeline.py. Returns hidden states only
    (training path — the prefill KV cache is a serving concern and serving
    runs the GSPMD TP path instead).

    The reference has no PP (SURVEY §2.9); this is the TPU-native route past
    a single chip's HBM for deeper decoders.
    """
    from karanta_tpu.parallel.pipeline import pipeline_apply

    b, s, _ = embeds.shape
    cos, sin = jax.vmap(
        lambda p: mrope_cos_sin(p, cfg.head_dim, cfg.mrope_section,
                                cfg.rope_theta),
        in_axes=1, out_axes=0)(positions)
    cos = cos.astype(embeds.dtype)
    sin = sin.astype(embeds.dtype)

    def layer_fn(x, layer, extras):
        cos_mb, sin_mb, mask_mb = extras
        mb, s_, _ = x.shape
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(xn, layer["attn"], cfg)
        q, k = apply_rope(q, k, cos_mb, sin_mb)
        attn = attention(q, k, v, kv_mask=mask_mb, causal=True)
        x = x + qmm(attn.reshape(mb, s_, -1), layer["attn"]["wo"])
        x = x + _mlp(rms_norm(x, layer["ln2"], cfg.rms_norm_eps),
                     layer["mlp"])
        return x

    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    x = pipeline_apply(mesh, layer_fn, params["layers"], embeds,
                       (cos, sin, kv_mask), n_micro)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def prefill_with_prefix(params: Params, cfg: TextConfig,
                        embeds: jnp.ndarray,          # (B, S, hidden) suffix
                        positions: jnp.ndarray,       # (3, B, S) absolute
                        prefix: KVCache,              # (L, B, KVH, P, D)
                        prefix_mask: jnp.ndarray,     # (B, P) 1=valid
                        kv_mask: Optional[jnp.ndarray] = None,  # (B, S)
                        act_quant: bool = False,
                        ) -> tuple[jnp.ndarray, KVCache]:
    """Continuation prefill over a cached prompt prefix.

    The prefix KV (already rope-rotated at absolute positions 0..P-1) is
    reused across requests sharing the same instruction prefix — every OCR
    page shares one — so prefill cost drops to the suffix. Returns hidden
    states for the suffix and the FULL (prefix + suffix) cache for decode.
    """
    b, s, _ = embeds.shape
    p = prefix.k.shape[3]
    cos, sin = jax.vmap(
        lambda q: mrope_cos_sin(q, cfg.head_dim, cfg.mrope_section,
                                cfg.rope_theta),
        in_axes=1, out_axes=0)(positions)
    cos = cos.astype(embeds.dtype)
    sin = sin.astype(embeds.dtype)

    suffix_mask = kv_mask if kv_mask is not None else jnp.ones((b, s),
                                                               jnp.float32)
    full_mask = jnp.concatenate(
        [prefix_mask.astype(jnp.float32), suffix_mask.astype(jnp.float32)], 1)

    mm = matmul_w8a8 if act_quant else qmm

    def body(x, layer_and_prefix):
        layer, pk, pv = layer_and_prefix
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(xn, layer["attn"], cfg, mm=mm)
        q, k = apply_rope(q, k, cos, sin)
        pk_bshd = pk.astype(k.dtype).transpose(0, 2, 1, 3)  # -> (B, P, KVH, D)
        pv_bshd = pv.astype(v.dtype).transpose(0, 2, 1, 3)
        k_full = jnp.concatenate([pk_bshd, k], axis=1)
        v_full = jnp.concatenate([pv_bshd, v], axis=1)
        attn = attention(q, k_full, v_full, kv_mask=full_mask, causal=True,
                         q_offset=p)
        x = x + mm(attn.reshape(b, s, -1), layer["attn"]["wo"])
        x = x + _mlp(rms_norm(x, layer["ln2"], cfg.rms_norm_eps), layer["mlp"],
                     mm=mm)
        return x, (k_full.transpose(0, 2, 1, 3), v_full.transpose(0, 2, 1, 3))

    x, (ks, vs) = jax.lax.scan(body, embeds,
                               (params["layers"], prefix.k, prefix.v))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(ks, vs)


def decode_step(params: Params, cfg: TextConfig,
                embeds: jnp.ndarray,        # (B, 1, hidden)
                positions: jnp.ndarray,     # (3, B) int32
                cache: KVCache,             # max_len M
                cache_len: jnp.ndarray,     # (B,) int32 — tokens already in cache
                attend_len: Optional[int] = None,  # static read horizon <= M
                ) -> tuple[jnp.ndarray, KVCache]:
    """One decode step: append kv at cache_len, attend over cache_len+1 keys.

    attend_len statically bounds how much of each slot's cache the attention
    reads (every cache_len must stay below it); the full buffers are still
    carried and written, but the HBM read stream shrinks to the live prefix.
    """
    b = embeds.shape[0]
    # token capacity (the int4 cache's row axis is nibble-packed, M/2 rows)
    m = attend_len or (cache.k.shape[3] * 2 if isinstance(cache, Q4KVCache)
                       else cache.k.shape[3])
    cos, sin = jax.vmap(
        lambda p: mrope_cos_sin(p[:, None], cfg.head_dim, cfg.mrope_section,
                                cfg.rope_theta),
        in_axes=1, out_axes=0)(positions)
    cos = cos.astype(embeds.dtype)
    sin = sin.astype(embeds.dtype)

    batch_idx = jnp.arange(b)
    kv_valid = (jnp.arange(m)[None, :] <= cache_len[:, None]).astype(jnp.float32)

    # The cache rides in the scan CARRY and is updated with a one-row scatter
    # per layer: XLA aliases loop carries in place, so the multi-GB buffers
    # are never copied. (Routing them through scan xs/ys stacks a fresh copy
    # of the whole cache every step — measured as the dominant decode cost.)
    quant = isinstance(cache, QuantKVCache)
    q4 = isinstance(cache, Q4KVCache)
    if _PAGED_FORCE is not None:
        paged_mode, paged_interp = _PAGED_FORCE
    else:
        paged_mode = _paged_decode_mode(cache.k.shape[3], quant=quant or q4)
        paged_interp = False
    # the quant caches only have the fused-append kernel (no stacked variant)
    quant_paged_mode = paged_mode if paged_mode == "append" else ""

    def body(carry, layer_and_idx):
        x, *bufs = carry
        layer, idx = layer_and_idx
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(xn, layer["attn"], cfg)
        q, k = apply_rope(q, k, cos, sin)
        if q4:
            k_all, v_all, ks_all, vs_all = bufs
            kq, ksc = quantize_kv_rows_q4(k[:, 0])
            vq, vsc = quantize_kv_rows_q4(v[:, 0])
            if quant_paged_mode == "append":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_append_q4,
                )

                attn, k_all, v_all, ks_all, vs_all = paged_decode_append_q4(
                    q, kq, vq, ksc, vsc, k_all, v_all, ks_all, vs_all, idx,
                    cache_len, block=1024, interpret=paged_interp)
            else:
                # dense fallback (CPU/tests): nibble-RMW the packed byte +
                # scale, then unpack the layer slice to token order
                r, nib = _q4_row_nib(cache_len)
                kvh = k_all.shape[2]
                old_k = k_all[idx, batch_idx, :, r].astype(jnp.int32)
                old_v = v_all[idx, batch_idx, :, r].astype(jnp.int32)

                def merge(old, new):
                    n4 = new.astype(jnp.int32) & 0xF
                    lo = (old & 0xF0) | n4
                    hi = (old & 0x0F) | (n4 << 4)
                    sel = (nib == 0)[:, None, None]
                    return _bits_to_int8(jnp.where(sel, lo, hi))

                k_all = k_all.at[idx, batch_idx, :, r].set(merge(old_k, kq))
                v_all = v_all.at[idx, batch_idx, :, r].set(merge(old_v, vq))
                rows2 = 2 * jnp.arange(kvh)[None, :] + nib[:, None]
                ks_all = ks_all.at[idx, batch_idx[:, None], rows2,
                                   r[:, None]].set(ksc.astype(ks_all.dtype))
                vs_all = vs_all.at[idx, batch_idx[:, None], rows2,
                                   r[:, None]].set(vsc.astype(vs_all.dtype))
                sl = lambda a: jax.lax.dynamic_index_in_dim(
                    a, idx, 0, keepdims=False)
                attn = decode_attention(
                    q, unpack_q4_rows(sl(k_all))[:, :, :m],
                    unpack_q4_rows(sl(v_all))[:, :, :m], kv_mask=kv_valid,
                    k_scale=unpack_q4_scales(sl(ks_all))[:, :, :m],
                    v_scale=unpack_q4_scales(sl(vs_all))[:, :, :m])
            new_bufs = (k_all, v_all, ks_all, vs_all)
        elif quant:
            k_all, v_all, ks_all, vs_all = bufs
            kq, ksc = quantize_kv_rows(k[:, 0])
            vq, vsc = quantize_kv_rows(v[:, 0])
            if quant_paged_mode == "append":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_append_quant,
                )

                attn, k_all, v_all, ks_all, vs_all = paged_decode_append_quant(
                    q, kq, vq, ksc, vsc, k_all, v_all, ks_all, vs_all, idx,
                    cache_len, block=1024, interpret=paged_interp)
            else:
                k_all = k_all.at[idx, batch_idx, :, cache_len].set(kq)
                v_all = v_all.at[idx, batch_idx, :, cache_len].set(vq)
                ks_all = ks_all.at[idx, batch_idx, :, cache_len].set(ksc)
                vs_all = vs_all.at[idx, batch_idx, :, cache_len].set(vsc)
                sl = lambda a: jax.lax.dynamic_index_in_dim(
                    a, idx, 0, keepdims=False)
                attn = decode_attention(q, sl(k_all)[:, :, :m],
                                        sl(v_all)[:, :, :m], kv_mask=kv_valid,
                                        k_scale=sl(ks_all)[:, :, :m],
                                        v_scale=sl(vs_all)[:, :, :m])
            new_bufs = (k_all, v_all, ks_all, vs_all)
        else:
            k_all, v_all = bufs
            if paged_mode == "append":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_append,
                )

                attn, k_all, v_all = paged_decode_append(
                    q, k[:, 0], v[:, 0], k_all, v_all, idx, cache_len,
                    block=1024, interpret=paged_interp)
            elif paged_mode == "stacked":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_attention_stacked,
                )

                k_all = k_all.at[idx, batch_idx, :, cache_len].set(k[:, 0])
                v_all = v_all.at[idx, batch_idx, :, cache_len].set(v[:, 0])
                attn, k_all, v_all = paged_decode_attention_stacked(
                    q, k_all, v_all, idx, cache_len, block=1024,
                    interpret=paged_interp)
            else:
                # write (B, KVH, D) rows at [layer, slot, :, pos]
                k_all = k_all.at[idx, batch_idx, :, cache_len].set(k[:, 0])
                v_all = v_all.at[idx, batch_idx, :, cache_len].set(v[:, 0])
                k_layer = jax.lax.dynamic_index_in_dim(
                    k_all, idx, 0, keepdims=False)[:, :, :m]
                v_layer = jax.lax.dynamic_index_in_dim(
                    v_all, idx, 0, keepdims=False)[:, :, :m]
                attn = decode_attention(q, k_layer, v_layer, kv_mask=kv_valid)
            new_bufs = (k_all, v_all)
        x = x + qmm(attn.reshape(b, 1, -1), layer["attn"]["wo"])
        x = x + _mlp(rms_norm(x, layer["ln2"], cfg.rms_norm_eps), layer["mlp"])
        return (x,) + new_bufs, None

    init = ((embeds, cache.k, cache.v, cache.ks, cache.vs) if (quant or q4)
            else (embeds, cache.k, cache.v))
    (x, *bufs), _ = jax.lax.scan(
        body, init, (params["layers"], jnp.arange(cfg.num_layers)))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    out_cache = (Q4KVCache(*bufs) if q4
                 else QuantKVCache(*bufs) if quant else KVCache(*bufs))
    return x, out_cache


def decode_multi(params: Params, cfg: TextConfig,
                 embeds: jnp.ndarray,        # (B, T, hidden)
                 positions: jnp.ndarray,     # (3, B, T) int32
                 cache: KVCache,
                 cache_len: jnp.ndarray,     # (B,) rows already in cache
                 act_quant: bool = False,
                 ) -> tuple[jnp.ndarray, KVCache]:
    """T-token decode for speculative verification: writes T kv rows per
    slot at cache_len + [0, T) and attends causally within the window plus
    the existing cache. One pass of weight/cache reads verifies T drafted
    tokens (reference capability: vLLM's speculative decoding; the
    reference delegates serving to vLLM, karanta/pipeline.py:707-742).

    act_quant=True runs the layer matmuls W8A8, like prefill_forward —
    at B*T rows XLA's bf16-dequant strategy for int8 weights halves the
    effective weight-stream bandwidth (profiled 20 vs 8.6 ms/pass at 7B
    B80 T4), while the int8 MXU path keeps the weights int8 end to end.

    Rollback is free: rejected rows simply stay past the slot's cache_len
    and every later read is bounded by it."""
    b, tq, _ = embeds.shape
    cos, sin = jax.vmap(
        lambda p: mrope_cos_sin(p, cfg.head_dim, cfg.mrope_section,
                                cfg.rope_theta),
        in_axes=1, out_axes=0)(positions)
    cos = cos.astype(embeds.dtype)
    sin = sin.astype(embeds.dtype)

    batch_idx = jnp.arange(b)[:, None]                     # (B, 1)
    write_pos = cache_len[:, None] + jnp.arange(tq)[None]  # (B, T)

    q4 = isinstance(cache, Q4KVCache)
    quant = isinstance(cache, QuantKVCache)
    if _PAGED_FORCE is not None:
        paged_mode, paged_interp = _PAGED_FORCE
    else:
        paged_mode = _paged_decode_mode(cache.k.shape[3], quant=quant or q4)
        paged_interp = False
    mm = matmul_w8a8 if act_quant else qmm

    def body(carry, layer_and_idx):
        x, *bufs = carry
        layer, idx = layer_and_idx
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        q, k, v = _project_qkv(xn, layer["attn"], cfg, mm=mm)
        q, k = apply_rope(q, k, cos, sin)
        sl = lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False)
        if q4:
            k_all, v_all, ks_all, vs_all = bufs
            kq, ksc = quantize_kv_rows_q4(k)             # (B, T, KVH, D)
            vq, vsc = quantize_kv_rows_q4(v)
            if paged_mode == "append":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_append_multi_q4,
                )

                (attn, k_all, v_all, ks_all,
                 vs_all) = paged_decode_append_multi_q4(
                    q, kq, vq, ksc, vsc, k_all, v_all, ks_all, vs_all, idx,
                    cache_len, block=1024, interpret=paged_interp)
            else:
                # dense fallback (CPU/tests): nibble-RMW one token at a
                # time (T is a small static gamma), then attend over the
                # unpacked layer slice
                kvh = k_all.shape[2]
                for t in range(tq):
                    r, nib = _q4_row_nib(cache_len + t)
                    old_k = k_all[idx, batch_idx[:, 0], :, r].astype(
                        jnp.int32)
                    old_v = v_all[idx, batch_idx[:, 0], :, r].astype(
                        jnp.int32)

                    def merge(old, new, nib=nib):
                        n4 = new.astype(jnp.int32) & 0xF
                        lo = (old & 0xF0) | n4
                        hi = (old & 0x0F) | (n4 << 4)
                        sel = (nib == 0)[:, None, None]
                        return _bits_to_int8(jnp.where(sel, lo, hi))

                    k_all = k_all.at[idx, batch_idx[:, 0], :, r].set(
                        merge(old_k, kq[:, t]))
                    v_all = v_all.at[idx, batch_idx[:, 0], :, r].set(
                        merge(old_v, vq[:, t]))
                    rows2 = 2 * jnp.arange(kvh)[None, :] + nib[:, None]
                    ks_all = ks_all.at[idx, batch_idx, rows2,
                                       r[:, None]].set(
                        ksc[:, t].astype(ks_all.dtype))
                    vs_all = vs_all.at[idx, batch_idx, rows2,
                                       r[:, None]].set(
                        vsc[:, t].astype(vs_all.dtype))
                m = 2 * k_all.shape[3]
                attn = decode_attention_multi(
                    q, unpack_q4_rows(sl(k_all))[:, :, :m],
                    unpack_q4_rows(sl(v_all))[:, :, :m], cache_len,
                    k_scale=unpack_q4_scales(sl(ks_all))[:, :, :m],
                    v_scale=unpack_q4_scales(sl(vs_all))[:, :, :m])
            new_bufs = (k_all, v_all, ks_all, vs_all)
        elif quant:
            k_all, v_all, ks_all, vs_all = bufs
            kq, ksc = quantize_kv_rows(k)                # (B, T, KVH, D)
            vq, vsc = quantize_kv_rows(v)
            if paged_mode == "append":
                from karanta_tpu.ops.decode_attention import (
                    paged_decode_append_multi_quant,
                )

                (attn, k_all, v_all, ks_all,
                 vs_all) = paged_decode_append_multi_quant(
                    q, kq, vq, ksc, vsc, k_all, v_all, ks_all, vs_all, idx,
                    cache_len, block=1024, interpret=paged_interp)
            else:
                # scatter T quantized rows per slot (XLA fallback: carries
                # full cache copies in the scan — fine for CPU/small buckets)
                k_all = k_all.at[idx, batch_idx, :, write_pos].set(kq)
                v_all = v_all.at[idx, batch_idx, :, write_pos].set(vq)
                ks_all = ks_all.at[idx, batch_idx, :, write_pos].set(ksc)
                vs_all = vs_all.at[idx, batch_idx, :, write_pos].set(vsc)
                attn = decode_attention_multi(q, sl(k_all), sl(v_all),
                                              cache_len, k_scale=sl(ks_all),
                                              v_scale=sl(vs_all))
            new_bufs = (k_all, v_all, ks_all, vs_all)
        else:
            k_all, v_all = bufs
            # scatter T rows per slot: k (B, T, KVH, D) -> [idx, b, :, pos_t]
            k_all = k_all.at[idx, batch_idx, :, write_pos].set(k)
            v_all = v_all.at[idx, batch_idx, :, write_pos].set(v)
            attn = decode_attention_multi(q, sl(k_all), sl(v_all), cache_len)
            new_bufs = (k_all, v_all)
        x = x + mm(attn.reshape(b, tq, -1), layer["attn"]["wo"])
        x = x + _mlp(rms_norm(x, layer["ln2"], cfg.rms_norm_eps), layer["mlp"],
                     mm=mm)
        return (x,) + new_bufs, None

    init = ((embeds, cache.k, cache.v, cache.ks, cache.vs) if (quant or q4)
            else (embeds, cache.k, cache.v))
    (x, *bufs), _ = jax.lax.scan(
        body, init, (params["layers"], jnp.arange(cfg.num_layers)))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    out_cache = (Q4KVCache(*bufs) if q4
                 else QuantKVCache(*bufs) if quant else KVCache(*bufs))
    return x, out_cache


def logits_from_hidden(params: Params, cfg: TextConfig,
                       hidden: jnp.ndarray,
                       act_quant: bool = False) -> jnp.ndarray:
    """Hidden -> vocab logits. The LM head is COMPUTE-bound even at decode
    (B rows x hidden x 152k vocab), so with act_quant the activations
    quantize per token onto the MXU's 2x int8 path — applied identically in
    per-step decode, prefill tails, and the speculative verify pass so the
    three paths stay token-exact with each other."""
    mm = matmul_w8a8 if act_quant else qmm
    if "logits_head" in params:  # int8 table for tied embeddings
        return mm(hidden, params["logits_head"])
    if cfg.tie_word_embeddings:
        return hidden @ params["embed"].T
    return mm(hidden, params["lm_head"])


def embed_tokens(params: Params, token_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], token_ids, axis=0)
