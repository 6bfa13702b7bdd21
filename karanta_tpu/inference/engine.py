"""TPU serving engine: bucketed multimodal prefill + slot-based batched decode.

Replaces the reference's vLLM subprocess engine (karanta/pipeline.py:707-742,
scripts/start_*_vllm_servers.sh) with a JAX-native design:

  - Static shapes everywhere: prompt lengths, image grids, and the KV cache
    are padded to buckets; XLA compiles each bucket once and caches.
  - Slot model: a fixed-size batch of decode slots (continuous batching).
    Prefill runs per request (image-heavy, one compile per seq bucket) and is
    inserted into a free slot; all active slots decode together.
  - Chunked decode: K decode steps run inside one jitted lax.scan per host
    round-trip, so host<->device latency (including remote-TPU tunnels) is
    amortized K-fold. Finished slots keep cycling harmlessly inside a chunk
    (their outputs are masked on host).
  - Per-slot temperature/top-p; temperature 0 is exact greedy — the retry
    temperature ladder of the pipeline (pipeline.py:281) maps onto this.
"""

from __future__ import annotations

import dataclasses
import io
import os
import logging
import time
from collections import OrderedDict
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from karanta_tpu.inference import chat
from karanta_tpu.inference.sampling import sample_tokens, spec_verify_sampled

# native PNG decoder (native/fastpng.cpp, `make native`); PIL fallback
import sys as _sys

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
if _NATIVE_DIR not in _sys.path:
    _sys.path.append(_NATIVE_DIR)
try:
    import fastpng as _fastpng
except ImportError:
    _fastpng = None
from karanta_tpu.inference.tokenizer import Tokenizer
from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl import vision as vis
from karanta_tpu.models.qwen25_vl.config import VLMConfig
from karanta_tpu.models.qwen25_vl.layout import build_vision_layout, mrope_positions
from karanta_tpu.ops.image_prep import (patchify, plan_image,
                                        preprocess_host, resize_patchify,
                                        src_px_bucket)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch_size: int = 8
    max_seq_len: int = 8192              # KV cache length per slot
    decode_chunk: int = 32               # decode steps per host round-trip
    prefill_buckets: tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192)
    image_token_buckets: tuple[int, ...] = (256, 512, 1024, 2048)
    max_output_tokens: int = 4000        # reference MAX_TOKENS (pipeline.py:124)
    min_pixels: int = 56 * 56
    max_pixels: int = 14 * 14 * 4 * 1280
    dtype: Any = jnp.bfloat16
    quantize: Optional[str] = None       # None | "int8" (decoder weights)
    # None | "int8" | "int4" (KV cache rows). "int4" is the nibble-packed
    # capacity mode: half the cache HBM and half the decode cache-read bytes
    # of int8, ~2x the slot count at a bucket. Opt-in (coarser KV fidelity
    # than the reference's FP8 serving); excluded from the headline bench.
    kv_quantize: Optional[str] = None
    # None | "int8": run prefill matmuls W8A8 (dynamic per-token int8
    # activations on the MXU's 2x int8 path). Requires int8 weights; decode
    # stays weight-only (HBM-bound). Mirrors vLLM FP8 serving's dynamic
    # activation quantization (reference default model is olmOCR-2-7B-FP8).
    act_quant: Optional[str] = None
    # None | "int8": quantize the vision encoder's weights and run its
    # matmuls W8A8. Opt-in separately from `quantize` (vLLM FP8 checkpoints
    # typically keep the vision tower bf16, so this goes beyond the
    # reference's serving precision).
    vision_quant: Optional[str] = None
    # prefix KV caching: reuse the cached KV of a shared instruction prefix
    # (every OCR page shares one) so prefill runs only over the suffix
    prefix_cache: bool = False
    # LCP gate below which prefix reuse doesn't fire. MEASURED (round 5,
    # interleaved A/B under the BPE tokenizer): the olmOCR instruction
    # head is ~226 tokens, and forcing it through at gate 192 was a ~10%
    # LOSS (128 reused rows don't cover the continuation-path overhead on
    # image-dominated prompts) — 256 is the pay-off threshold, not an
    # arbitrary floor. Caching pays when prompts share >=256 tokens
    # (few-shot headers, long system prompts, byte-level regimes: x1.19).
    prefix_min_tokens: int = 256
    prefix_cache_entries: int = 4
    # batched prefill: admit up to this many same-shaped unguided pages
    # through ONE fused vision+prefill executable. Default 1 (per-page):
    # on v5e the K=4 batch measured ~25 ms/page SLOWER on device (operand
    # concat copies + larger intermediates beat the saved dispatches); the
    # path exists for hosts where per-call overhead dominates.
    prefill_batch: int = 1
    # on-device page resize: ship the decoded (unresized) page to the chip
    # and run the bicubic resize as two resampling matmuls inside the
    # patchify executable. PIL-equivalent numerics (intermediate uint8
    # rounding reproduced; parity-tested to one u8 step) but removes the
    # ~60 ms/page host resize — the dominant prepare() cost on small hosts.
    device_resize: bool = True
    # greedy speculative decoding: draft gamma tokens per step by n-gram
    # lookup over the slot's own prompt+output history (prompt-lookup /
    # "assisted generation"; vLLM exposes the same as speculative ngram),
    # verify all of them in ONE multi-token forward. 0 = off. Exact for
    # greedy slots; sampling/guided batches fall back to normal decode.
    speculative_ngram: int = 0
    # bench/validation hook: honor per-request forced output streams. Each
    # step still runs the FULL decode/verify compute, but the token the
    # model "emitted" is overridden device-side by the request's
    # forced_output at that position (data-dependent where — XLA cannot
    # dead-code the real logits). This lets page throughput and speculative
    # acceptance be measured under REALISTIC output-text statistics on a
    # machine with random weights (no checkpoints/egress); acceptance then
    # reflects the forced text, compute reflects the real model. Bench-only
    # (bench.py --pipeline --teacher-force); never enabled by production
    # servers, and the HTTP server ignores the forced_output field unless
    # the engine was built with this on.
    teacher_force: bool = False


@dataclasses.dataclass
class GenRequest:
    messages: list[dict]                 # OpenAI chat format
    max_tokens: int = 4000
    temperature: float = 0.0
    top_p: float = 1.0
    request_id: str = ""
    guided_regex: Optional[str] = None
    logprobs: bool = False               # return per-token logprobs
    top_logprobs: int = 0                # 0..5 alternatives per position
    # per-request speculation hint: n-gram drafting pays off only when the
    # continuation repeats prompt/history text (anchored pages); the
    # pipeline sets this from the anchor signal. None = engine default
    # (speculate when the engine has --speculative-ngram), False = this
    # request prefers per-step decode.
    speculative: Optional[bool] = None
    # pre-decoded image bytes for sentinel data URLs (the HTTP server's
    # raw-body fast path; see chat.RAW_IMAGE_SENTINEL)
    raw_images: Optional[list] = None
    # teacher-forcing hook (EngineConfig.teacher_force): the completion text
    # this request must emit; ignored unless the engine enables the hook
    forced_output: Optional[str] = None


@dataclasses.dataclass
class GenResult:
    request_id: str
    text: str
    token_ids: list[int]
    finish_reason: str                   # "stop" | "length"
    prompt_tokens: int
    completion_tokens: int
    latency_s: float = 0.0
    # when requested: per emitted token, (logprob, [(alt_id, alt_lp) x k])
    logprobs: Optional[list] = None


@dataclasses.dataclass
class _Prepared:
    ids: np.ndarray                      # (S,) int32 prompt token ids
    positions: np.ndarray                # (3, S) int32 mrope positions
    image_feeds: list[dict]              # per image: device-call kwargs
    img_token_counts: list[int]
    max_tokens: int
    temperature: float
    top_p: float
    request_id: str
    guide: Optional[Any] = None          # DFA start state, bound at prefill
    guide_regex: Optional[str] = None    # requested constraint (unbound)
    prefix_len: int = 0                  # shared-prefix tokens (0 = no reuse)
    logprobs: bool = False
    top_logprobs: int = 0
    speculative: Optional[bool] = None   # per-request speculation hint
    staged: Optional[dict] = None        # fused-path operands pre-put on device
    staged_sfx: Optional[dict] = None    # prefix-path suffix operands on device
    forced_tokens: Optional[np.ndarray] = None  # teacher-forcing stream


class ContextLengthError(ValueError):
    """Prompt does not fit the engine's context window (maps to HTTP 400,
    like vLLM's maximum-context-length rejection)."""


class GuidedRegexBusy(RuntimeError):
    """A different guided regex is active with live slots. Callers defer the
    request until the active automaton drains — the constraint is never
    silently dropped."""


def _greedy_token(logits):
    """Greedy pick inside the prefill executable (last axis). Matches
    sample_tokens' temperature-0 branch (argmax over f32) so the greedy
    fast path needs no separate sampling dispatch — each extra jitted call
    is a full host round trip on remote/tunneled TPUs."""
    return jnp.argmax(logits.astype(jnp.float32), axis=-1)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


class Engine:
    """Single-model serving engine over one jax device mesh.

    With a multi-device mesh, parameters shard per the logical-axis rules
    (tensor parallelism over "model": qkv/mlp column-sharded, o/down
    row-sharded with psum — the reference delegates this to vLLM -tp,
    pipeline.py:719-720) and the KV cache shards its kv-head axis to match;
    decode slots shard over "data"."""

    def __init__(self, params: Any, cfg: VLMConfig, tokenizer: Tokenizer,
                 engine_cfg: EngineConfig = EngineConfig(),
                 rng_seed: int = 0, mesh=None):
        self.mesh = mesh
        if mesh is not None:
            from karanta_tpu.models.qwen25_vl.model import param_axes
            from karanta_tpu.parallel.sharding import (
                DEFAULT_RULES, logical_to_named_sharding, shard_pytree,
            )

            params = shard_pytree(params, param_axes(cfg), mesh, DEFAULT_RULES)
            self._cache_sharding = logical_to_named_sharding(
                mesh, ("layers", "batch", "kv_heads", "kv_seq", "head_dim"),
                DEFAULT_RULES)
        if engine_cfg.quantize == "int8":
            from karanta_tpu.ops.quantization import quantize_decoder_params

            params = {**params,
                      "text": quantize_decoder_params(params["text"])}
        elif engine_cfg.quantize:
            raise ValueError(f"unknown quantize mode {engine_cfg.quantize!r}")
        if engine_cfg.vision_quant == "int8":
            from karanta_tpu.ops.quantization import quantize_vision_params

            params = {**params,
                      "visual": quantize_vision_params(params["visual"])}
        elif engine_cfg.vision_quant:
            raise ValueError(
                f"unknown vision_quant {engine_cfg.vision_quant!r}")
        if engine_cfg.act_quant not in (None, "int8"):
            raise ValueError(f"unknown act_quant {engine_cfg.act_quant!r}")
        if engine_cfg.act_quant:
            from karanta_tpu.ops.quantization import is_quantized

            if not is_quantized(params["text"]["layers"]["attn"]["wq"]):
                raise ValueError(
                    "act_quant requires int8 decoder weights (set "
                    "quantize='int8' or pass pre-quantized params)")
        self._act_quant = bool(engine_cfg.act_quant)
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        # prefill buckets must fit the KV cache: a prefill padded past
        # max_seq_len cannot be inserted into a slot (shape mismatch at
        # insert). Clamp the ladder and make the full context a bucket.
        engine_cfg = dataclasses.replace(
            engine_cfg,
            prefill_buckets=tuple(sorted(
                {b for b in engine_cfg.prefill_buckets
                 if b <= engine_cfg.max_seq_len} | {engine_cfg.max_seq_len})),
            image_token_buckets=tuple(sorted(
                {b for b in engine_cfg.image_token_buckets
                 if b <= engine_cfg.max_seq_len} | {engine_cfg.max_seq_len})))
        self.ecfg = engine_cfg
        self._key = jax.random.PRNGKey(rng_seed)

        b, m = engine_cfg.max_batch_size, engine_cfg.max_seq_len
        if engine_cfg.kv_quantize == "int8":
            self.cache = dec.QuantKVCache.zeros(cfg.text, b, m,
                                                engine_cfg.dtype)
        elif engine_cfg.kv_quantize == "int4":
            if engine_cfg.speculative_ngram > 0 and m < 128:
                raise ValueError(
                    "kv_quantize='int4' speculation needs max_seq_len >= 128 "
                    "(the multi-token kernel's slab spans two 64-token "
                    "windows)")
            if m >= 256 and m % 256:
                # the append kernel's scale slab is a full 128-lane tile of
                # PACKED rows, so the token bucket must be 256-aligned
                raise ValueError(
                    f"kv_quantize='int4' needs max_seq_len % 256 == 0 "
                    f"(nibble packing: 128 packed rows per scale tile), "
                    f"got {m}; round up to {-(-m // 256) * 256}")
            self.cache = dec.Q4KVCache.zeros(cfg.text, b, m,
                                             engine_cfg.dtype)
        elif engine_cfg.kv_quantize:
            raise ValueError(f"unknown kv_quantize {engine_cfg.kv_quantize!r}")
        else:
            self.cache = dec.KVCache.zeros(cfg.text, b, m, engine_cfg.dtype)
        if mesh is not None:
            from karanta_tpu.parallel.sharding import (
                DEFAULT_RULES, logical_to_named_sharding,
            )

            if engine_cfg.kv_quantize in ("int8", "int4"):
                scale_sh = logical_to_named_sharding(
                    mesh, ("layers", "batch", "kv_heads", "kv_seq"),
                    DEFAULT_RULES)
                cls = (dec.QuantKVCache if engine_cfg.kv_quantize == "int8"
                       else dec.Q4KVCache)
                self.cache = cls(
                    jax.device_put(self.cache.k, self._cache_sharding),
                    jax.device_put(self.cache.v, self._cache_sharding),
                    jax.device_put(self.cache.ks, scale_sh),
                    jax.device_put(self.cache.vs, scale_sh))
            else:
                self.cache = dec.KVCache(
                    jax.device_put(self.cache.k, self._cache_sharding),
                    jax.device_put(self.cache.v, self._cache_sharding))
        self.cache_len = jnp.zeros((b,), jnp.int32)
        self.next_pos = jnp.zeros((b,), jnp.int32)
        self.last_token = jnp.zeros((b,), jnp.int32)
        self.temps = jnp.zeros((b,), jnp.float32)
        self.top_ps = jnp.ones((b,), jnp.float32)
        self.slot_free = [True] * b

        # guided decoding: token-automaton tables live on device; dfa state 0
        # is FREE (unguided slots). Compiled regexes share ONE flattened
        # state arena — each automaton occupies a contiguous row range with
        # its next_state values pre-offset, and a slot's dfa_state indexes
        # the arena absolutely, so requests with DIFFERENT regexes decode
        # concurrently in the same wave with no executable change.
        import threading

        self.dfa_state = jnp.zeros((b,), jnp.int32)
        self._automaton_lock = threading.Lock()
        self._slot_regex: list = [None] * b
        vocab = cfg.text.vocab_size
        self._allowed = jnp.ones((1, vocab), jnp.bool_)
        self._next_state = jnp.zeros((1, vocab), jnp.int32)
        # states where guided decoding is a no-op forever (speculation-safe);
        # with no automaton compiled only FREE (0) exists and is free
        self._free_state_mask = np.ones((1,), bool)
        self._arena: "OrderedDict[str, dict]" = OrderedDict()
        self._arena_used = 1               # row 0 is the shared FREE state
        self._automaton_cache: "OrderedDict[str, Any]" = OrderedDict()
        self._token_bytes = None           # lazy; expensive over big vocabs

        # prefix KV cache: prefix-id bytes -> (KVCache (L,1,P,KVH,D), P)

        self._prefix_kv: "OrderedDict[bytes, Any]" = OrderedDict()
        # running shared prompt head for LCP-based prefix detection; guarded
        # by a lock because prepare() runs in a thread pool
        self._prompt_head: Optional[np.ndarray] = None
        # consecutive below-threshold LCPs against the stored head; used to
        # re-seed the head if the first-ever request was an outlier prompt
        # (warmup / text-only probe) that would otherwise pin prefix caching
        # off for the engine's lifetime
        self._prefix_miss = 0
        import threading as _threading

        self._prefix_lock = _threading.Lock()
        # decoded-image cache: raw-bytes sha1 -> RGB uint8 array. Repeated
        # images (retries, rotation-correction re-requests, duplicated blank
        # pages) skip the PNG/JPEG decode (~18 ms/page on one core). vLLM
        # serves the same role with its multimodal processor cache.
        import threading

        self._img_cache: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        self._img_cache_bytes = 0
        self._img_cache_cap = int(os.environ.get(
            "KARANTA_IMG_CACHE_MB", "256")) * (1 << 20)
        self._img_cache_lock = threading.Lock()
        self._slot_wants_lp: dict = {}
        self._slot_logprobs: dict = {}
        self._last_logprobs = None
        self._first_logprob: dict = {}

        # speculative decoding: device copy of each slot's token history
        # (prompt + emitted), used for n-gram drafting inside the chunk
        if engine_cfg.speculative_ngram > 0:
            self.token_hist = jnp.zeros((b, m), jnp.int32)
            # acceptance observability: verify passes run / tokens emitted
            # (tokens/pass = 1 + mean accepted drafts; plain decode is 1.0)
            self.spec_passes = 0
            self.spec_tokens = 0
            self._hist_insert_jit = jax.jit(self._hist_insert_impl,
                                            donate_argnums=(0,))
            self._spec_chunk_jit = jax.jit(
                self._spec_chunk_impl,
                static_argnames=("steps", "gamma", "use_sampling",
                                 "use_forced"),
                donate_argnums=(1, 5))

        # teacher forcing (bench-only): per-slot forced-output streams,
        # indexed by history position (prompt at 0..len-1, first emitted
        # token at len); -1 = unforced (model's own token stands)
        self.forced = None
        if engine_cfg.teacher_force:
            self.forced = jnp.full((b, m), -1, jnp.int32)
            self._teacher_insert_jit = jax.jit(self._teacher_insert_impl,
                                               donate_argnums=(0,))

        # ---- jitted stage functions (cached per shape bucket) ----
        self._encode_image_jit = jax.jit(
            self._encode_image_impl, static_argnames=("n_windows",))
        self._prefill_jit = jax.jit(self._prefill_impl)
        self._prefill_prefix_jit = jax.jit(self._prefill_prefix_impl)
        self._prefill_prefix_fused_jit = jax.jit(
            self._prefill_prefix_fused_impl, static_argnames=("n_windows",))
        self._prefill_fused_jit = jax.jit(self._prefill_fused_impl,
                                          static_argnames=("n_windows",))
        self._prefill_fused_batch_jit = jax.jit(
            self._prefill_fused_batch_impl,
            static_argnames=("n_windows", "n_images"))
        self._insert_jit = jax.jit(self._insert_impl, donate_argnums=(1,))
        self._prefill_insert_jit = jax.jit(
            self._prefill_insert_impl, static_argnames=("n_windows",),
            donate_argnums=(11, 12, 13, 14, 15, 16, 17))
        self._insert_batch_jit = jax.jit(self._insert_batch_impl,
                                         donate_argnums=(1,))
        self._decode_chunk_jit = jax.jit(
            self._decode_chunk_impl,
            static_argnames=("steps", "use_top_p", "use_sampling",
                             "attend_len", "use_logprobs", "top_k_logprobs",
                             "use_guided", "use_forced"),
            donate_argnums=(1,))
        # static sampling gates: the nucleus sort / gumbel sampling only
        # compile in when some active slot actually needs them
        self._slot_top_p = [1.0] * b
        # per-slot speculation votes (None hint counts as yes); a decode
        # wave speculates when eligible voters are the majority (_spec_ok)
        self._slot_spec = [True] * b
        self._slot_temp = [0.0] * b
        # host mirror of per-slot lengths drives the static attend horizon
        self._slot_len = [0] * b
        # host mirror of guided state: gates the per-step mask gather
        # without a device readback per chunk
        self._slot_guided = [False] * b
        self._attend_buckets = tuple(
            n for n in (1024, 2048, 4096, 8192, 16384)
            if n <= engine_cfg.max_seq_len) or (engine_cfg.max_seq_len,)

    # ------------------------------------------------------------------
    # device-side implementations
    # ------------------------------------------------------------------

    def _encode_image_impl(self, params, pixel_values, perm, valid, pos_hw,
                           extract, *, n_windows):
        encoded = vis.encode_image(params["visual"], self.cfg.vision,
                                   pixel_values, perm, valid, pos_hw, n_windows)
        return jnp.take(encoded, extract, axis=0)  # (N_pad, out_hidden)

    def _prefill_impl(self, params, ids, positions, kv_mask, img_tokens,
                      img_positions, true_len):
        """ids (S,), img_tokens (N_pad, H) or zeros, -> (last_logits, cache)."""
        emb = dec.embed_tokens(params["text"], ids)
        emb = emb.at[img_positions].set(
            img_tokens.astype(emb.dtype), mode="drop")
        hidden, cache = dec.prefill_forward(
            params["text"], self.cfg.text, emb[None], positions[:, None, :],
            kv_mask=kv_mask[None], act_quant=self._act_quant)
        last = hidden[0, true_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        return logits, _greedy_token(logits), cache

    def _prefill_fused_impl(self, params, pixel_values, perm, valid, pos_hw,
                            extract, ids, positions, kv_mask, img_positions,
                            true_len, *, n_windows):
        """Single-image fast path: patch encoding, vision encoder, embedding
        merge, and decoder prefill in ONE executable — one host round-trip
        per page instead of three (dispatch latency is material on
        remote/tunneled TPUs)."""
        encoded = vis.encode_image(params["visual"], self.cfg.vision,
                                   pixel_values, perm, valid, pos_hw,
                                   n_windows)
        img_tokens = jnp.take(encoded, extract, axis=0)
        emb = dec.embed_tokens(params["text"], ids)
        emb = emb.at[img_positions].set(img_tokens.astype(emb.dtype),
                                        mode="drop")
        hidden, cache = dec.prefill_forward(
            params["text"], self.cfg.text, emb[None], positions[:, None, :],
            kv_mask=kv_mask[None], act_quant=self._act_quant)
        last = hidden[0, true_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        return logits, _greedy_token(logits), cache

    def _prefill_insert_impl(self, params, pixel_values, perm, valid, pos_hw,
                             extract, ids, positions, kv_mask, img_positions,
                             true_len, cache, cache_len, next_pos, last_token,
                             temps, top_ps, dfa_state, slot, pos_after,
                             *, n_windows):
        """Greedy single-page fast path: vision encode + decoder prefill +
        first-token argmax + slot insert fused into ONE executable. Each
        jitted dispatch is a full host round trip on remote/tunneled TPUs,
        so collapsing prefill→sample→insert (three dispatches) to one is a
        material per-page saving; it also keeps the page's prefill KV from
        round-tripping through an executable output."""
        encoded = vis.encode_image(params["visual"], self.cfg.vision,
                                   pixel_values, perm, valid, pos_hw,
                                   n_windows)
        img_tokens = jnp.take(encoded, extract, axis=0)
        emb = dec.embed_tokens(params["text"], ids)
        emb = emb.at[img_positions].set(img_tokens.astype(emb.dtype),
                                        mode="drop")
        hidden, pcache = dec.prefill_forward(
            params["text"], self.cfg.text, emb[None], positions[:, None, :],
            kv_mask=kv_mask[None], act_quant=self._act_quant)
        last = hidden[0, true_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        first = _greedy_token(logits)
        s = pcache.k.shape[3]
        if isinstance(cache, dec.Q4KVCache):
            k4, v4, ks4, vs4 = dec.q4_pack_prefill(pcache.k[:, 0],
                                                   pcache.v[:, 0])
            ps = k4.shape[-2]
            new_cache = dec.Q4KVCache(
                cache.k.at[:, slot, :, :ps].set(k4),
                cache.v.at[:, slot, :, :ps].set(v4),
                cache.ks.at[:, slot, :, :ps].set(ks4.astype(cache.ks.dtype)),
                cache.vs.at[:, slot, :, :ps].set(vs4.astype(cache.vs.dtype)))
        elif isinstance(cache, dec.QuantKVCache):
            kq, ksc = dec.quantize_kv_rows(pcache.k[:, 0])
            vq, vsc = dec.quantize_kv_rows(pcache.v[:, 0])
            new_cache = dec.QuantKVCache(
                cache.k.at[:, slot, :, :s].set(kq),
                cache.v.at[:, slot, :, :s].set(vq),
                cache.ks.at[:, slot, :, :s].set(ksc),
                cache.vs.at[:, slot, :, :s].set(vsc))
        else:
            new_cache = dec.KVCache(
                cache.k.at[:, slot, :, :s].set(pcache.k[:, 0]),
                cache.v.at[:, slot, :, :s].set(pcache.v[:, 0]))
        return (new_cache,
                cache_len.at[slot].set(true_len),
                next_pos.at[slot].set(pos_after),
                last_token.at[slot].set(first),
                temps.at[slot].set(jnp.float32(0.0)),
                top_ps.at[slot].set(jnp.float32(1.0)),
                dfa_state.at[slot].set(0),
                first)

    def _prefill_fused_batch_impl(self, params, pixel_values, perm, valid,
                                  pos_hw, extract, ids, positions, kv_mask,
                                  img_positions, true_len, *, n_windows,
                                  n_images):
        """K-page fused prefill: the K same-shaped page images run through
        the vision encoder as one token-axis concatenation (full-attention
        layers batch over the image axis), and the decoder prefill runs with
        batch K. One executable dispatch + one pallas call per kernel per K
        pages instead of per page."""
        encoded = vis.encode_image(params["visual"], self.cfg.vision,
                                   pixel_values, perm, valid, pos_hw,
                                   n_windows, n_images=n_images)
        img_tokens = jnp.take(encoded, extract, axis=0).reshape(
            n_images, -1, encoded.shape[-1])
        emb = dec.embed_tokens(params["text"], ids)          # (K, S, H)
        emb = jax.vmap(
            lambda e, t, p: e.at[p].set(t.astype(e.dtype), mode="drop"))(
                emb, img_tokens, img_positions)
        hidden, cache = dec.prefill_forward(
            params["text"], self.cfg.text, emb, positions, kv_mask=kv_mask,
            act_quant=self._act_quant)
        last = hidden[jnp.arange(n_images), true_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        return logits, _greedy_token(logits), cache

    def _insert_batch_impl(self, prefill_cache, cache, cache_len, next_pos,
                           last_token, temps, top_ps, dfa_state, slots,
                           true_lens, first_tokens, pos_afters, temps_new,
                           top_ps_new):
        """Insert K prefilled pages into K slots (unguided fast path)."""
        s = prefill_cache.k.shape[3]
        if isinstance(cache, dec.Q4KVCache):
            k4, v4, ks4, vs4 = dec.q4_pack_prefill(prefill_cache.k,
                                                   prefill_cache.v)
            ps = k4.shape[-2]
            new_cache = dec.Q4KVCache(
                cache.k.at[:, slots, :, :ps].set(k4),
                cache.v.at[:, slots, :, :ps].set(v4),
                cache.ks.at[:, slots, :, :ps].set(ks4.astype(cache.ks.dtype)),
                cache.vs.at[:, slots, :, :ps].set(vs4.astype(cache.vs.dtype)))
        elif isinstance(cache, dec.QuantKVCache):
            kq, ksc = dec.quantize_kv_rows(prefill_cache.k)
            vq, vsc = dec.quantize_kv_rows(prefill_cache.v)
            new_cache = dec.QuantKVCache(
                cache.k.at[:, slots, :, :s].set(kq),
                cache.v.at[:, slots, :, :s].set(vq),
                cache.ks.at[:, slots, :, :s].set(ksc),
                cache.vs.at[:, slots, :, :s].set(vsc))
        else:
            new_cache = dec.KVCache(
                cache.k.at[:, slots, :, :s].set(prefill_cache.k),
                cache.v.at[:, slots, :, :s].set(prefill_cache.v))
        return (
            new_cache,
            cache_len.at[slots].set(true_lens),
            next_pos.at[slots].set(pos_afters),
            last_token.at[slots].set(first_tokens),
            temps.at[slots].set(temps_new),
            top_ps.at[slots].set(top_ps_new),
            dfa_state.at[slots].set(0),
        )

    def _prefill_prefix_fused_impl(self, params, pixel_values, perm, valid,
                                   pos_hw, extract, ids, positions, kv_mask,
                                   img_positions, true_suffix_len,
                                   prefix_k, prefix_v, prefix_mask,
                                   *, n_windows):
        """Single-image prefix continuation in ONE executable: vision encode
        + suffix prefill over the cached prefix KV + first-token argmax.
        Keeps the fused fast path's dispatch count while prefilling only the
        (shorter) suffix bucket — the shared olmOCR instruction prefix is
        paid once per engine, not once per page."""
        encoded = vis.encode_image(params["visual"], self.cfg.vision,
                                   pixel_values, perm, valid, pos_hw,
                                   n_windows)
        img_tokens = jnp.take(encoded, extract, axis=0)
        emb = dec.embed_tokens(params["text"], ids)
        emb = emb.at[img_positions].set(img_tokens.astype(emb.dtype),
                                        mode="drop")
        hidden, cache = dec.prefill_with_prefix(
            params["text"], self.cfg.text, emb[None], positions[:, None, :],
            dec.KVCache(prefix_k, prefix_v), prefix_mask[None],
            kv_mask=kv_mask[None], act_quant=self._act_quant)
        last = hidden[0, true_suffix_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        return logits, _greedy_token(logits), cache

    def _prefill_prefix_impl(self, params, ids, positions, kv_mask,
                             img_tokens, img_positions, true_suffix_len,
                             prefix_k, prefix_v, prefix_mask):
        """Continuation prefill: ids/positions cover only the suffix; the
        prefix KV (L, 1, P, KVH, D) is reused. Returns (last_logits,
        full cache over prefix+suffix)."""
        emb = dec.embed_tokens(params["text"], ids)
        emb = emb.at[img_positions].set(img_tokens.astype(emb.dtype),
                                        mode="drop")
        hidden, cache = dec.prefill_with_prefix(
            params["text"], self.cfg.text, emb[None], positions[:, None, :],
            dec.KVCache(prefix_k, prefix_v), prefix_mask[None],
            kv_mask=kv_mask[None], act_quant=self._act_quant)
        last = hidden[0, true_suffix_len - 1]
        logits = dec.logits_from_hidden(params["text"], self.cfg.text, last,
                                        act_quant=self._act_quant)
        return logits, _greedy_token(logits), cache

    def _insert_impl(self, prefill_cache, cache, cache_len, next_pos,
                     last_token, temps, top_ps, dfa_state, slot, true_len,
                     first_token, pos_after, temp, top_p, dfa_val):
        s = prefill_cache.k.shape[3]
        if isinstance(cache, dec.Q4KVCache):
            # prefill emits bf16 rows; quantize + nibble-pack at insert time
            k4, v4, ks4, vs4 = dec.q4_pack_prefill(prefill_cache.k[:, 0],
                                                   prefill_cache.v[:, 0])
            ps = k4.shape[-2]
            new_cache = dec.Q4KVCache(
                cache.k.at[:, slot, :, :ps].set(k4),
                cache.v.at[:, slot, :, :ps].set(v4),
                cache.ks.at[:, slot, :, :ps].set(ks4.astype(cache.ks.dtype)),
                cache.vs.at[:, slot, :, :ps].set(vs4.astype(cache.vs.dtype)))
        elif isinstance(cache, dec.QuantKVCache):
            # prefill emits bf16 rows; quantize at insert time
            kq, ksc = dec.quantize_kv_rows(prefill_cache.k[:, 0])
            vq, vsc = dec.quantize_kv_rows(prefill_cache.v[:, 0])
            new_cache = dec.QuantKVCache(
                cache.k.at[:, slot, :, :s].set(kq),
                cache.v.at[:, slot, :, :s].set(vq),
                cache.ks.at[:, slot, :, :s].set(ksc),
                cache.vs.at[:, slot, :, :s].set(vsc))
        else:
            new_cache = dec.KVCache(
                cache.k.at[:, slot, :, :s].set(prefill_cache.k[:, 0]),
                cache.v.at[:, slot, :, :s].set(prefill_cache.v[:, 0]))
        return (
            new_cache,
            cache_len.at[slot].set(true_len),
            next_pos.at[slot].set(pos_after),
            last_token.at[slot].set(first_token),
            temps.at[slot].set(temp),
            top_ps.at[slot].set(top_p),
            dfa_state.at[slot].set(dfa_val),
        )

    def _decode_chunk_impl(self, params, cache, cache_len, next_pos,
                           last_token, temps, top_ps, dfa_state,
                           allowed, next_state, key, forced=None, *,
                           steps, use_top_p, use_sampling, attend_len,
                           use_logprobs=False, top_k_logprobs=0,
                           use_guided=True, use_forced=False):
        # token capacity: the int4 cache's row axis is nibble-packed (M/2)
        m = cache.k.shape[3] * (2 if isinstance(cache, dec.Q4KVCache) else 1)

        def step(carry, step_key):
            cache, cache_len, next_pos, last_token, dfa_state = carry
            emb = dec.embed_tokens(params["text"], last_token)[:, None]
            pos = jnp.broadcast_to(next_pos[None, :], (3,) + next_pos.shape)
            hidden, cache = dec.decode_step(
                params["text"], self.cfg.text, emb, pos, cache,
                jnp.minimum(cache_len, m - 1), attend_len=attend_len)
            logits = dec.logits_from_hidden(
                params["text"], self.cfg.text, hidden[:, 0],
                act_quant=self._act_quant)
            if use_guided:  # static gate: the (B, V) mask gather + where
                # costs real HBM every step; skip when no slot is guided
                mask = allowed[dfa_state]  # (B, V)
                logits = jnp.where(mask, logits, -jnp.inf)
            tokens = sample_tokens(logits, step_key,
                                   temps if use_sampling else None,
                                   top_ps if use_top_p else None)
            if use_forced:  # teacher forcing (bench-only): override the
                # sampled token with the request's forced stream at this
                # history position (the new token lands at cache_len + 1)
                fpos = jnp.minimum(cache_len + 1, m - 1)
                frow = jnp.take_along_axis(forced, fpos[:, None],
                                           axis=1)[:, 0]
                tokens = jnp.where(frow >= 0, frow, tokens)
            if use_guided:
                dfa_state = next_state[dfa_state, tokens]
            cache_len = jnp.minimum(cache_len + 1, m - 1)
            next_pos = next_pos + 1
            ys = tokens
            if use_logprobs:  # static gate: separate executable when on
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                chosen = jnp.take_along_axis(logp, tokens[:, None],
                                             axis=-1)[:, 0]
                k = max(1, top_k_logprobs)
                top_vals, top_ids = jax.lax.top_k(logp, k)
                ys = (tokens, chosen, top_vals, top_ids)
            return (cache, cache_len, next_pos, tokens, dfa_state), ys

        keys = jax.random.split(key, steps)
        (cache, cache_len, next_pos, last_token, dfa_state), ys = jax.lax.scan(
            step, (cache, cache_len, next_pos, last_token, dfa_state), keys)
        return cache, cache_len, next_pos, last_token, dfa_state, ys

    def _hist_insert_impl(self, hist, slot, ids, true_len, first_token):
        """Record a slot's prompt ids + first sampled token."""
        hist = jax.lax.dynamic_update_slice(
            hist, ids[None].astype(jnp.int32),
            (slot, jnp.zeros((), jnp.int32)))
        return hist.at[slot, true_len].set(first_token)

    def _teacher_insert_impl(self, forced, last_token, slot, row, true_len,
                             hist=None):
        """Upload a slot's forced-output row (history-position indexed) and
        repoint the pending token — the prefill executable sampled the
        model's own first token; under teacher forcing the first emitted
        token is the forced stream's — in last_token (and the speculative
        history, when kept). row[true_len] = -1 clears the slot."""
        forced = jax.lax.dynamic_update_slice(
            forced, row[None], (slot, jnp.zeros((), jnp.int32)))
        tok0 = row[true_len]
        tok0 = jnp.where(tok0 >= 0, tok0, last_token[slot])
        last_token = last_token.at[slot].set(tok0)
        if hist is None:
            return forced, last_token
        return forced, last_token, hist.at[slot, true_len].set(tok0)

    def _spec_chunk_impl(self, params, cache, cache_len, next_pos,
                         last_token, hist, temps, key, forced=None, *,
                         steps, gamma, use_sampling=False,
                         use_forced=False):
        """Chunk with n-gram speculation: each step drafts `gamma` tokens
        from the slot's own history (most recent earlier occurrence of its
        trailing bigram) and verifies them with one decode_multi pass;
        rejected rows are simply left beyond cache_len. use_sampling (static)
        verifies temp>0 rows by rejection sampling (spec_verify_sampled) —
        exact under the output distribution; off, verification is argmax."""
        # token capacity, NOT cache.k.shape[3]: the int4 cache's row axis
        # counts PACKED rows (tokens/2)
        m = self.ecfg.max_seq_len
        b = cache_len.shape[0]
        t = gamma + 1
        bidx = jnp.arange(b)

        def step(carry, step_key):
            cache, cache_len, next_pos, last_token, hist = carry
            cache_len = jnp.minimum(cache_len, m - t - 1)
            ntok = cache_len + 1          # history entries incl. pending token
            t0 = hist[bidx, jnp.maximum(ntok - 2, 0)]
            t1 = hist[bidx, ntok - 1]
            # most recent earlier occurrence of the trailing bigram
            pos = jnp.arange(m - 1)[None, :]
            match = ((hist[:, :-1] == t0[:, None])
                     & (hist[:, 1:] == t1[:, None])
                     & (pos < (ntok - 2)[:, None]))
            start = jnp.max(jnp.where(match, pos, -1), axis=1) + 2  # (B,)
            start = jnp.clip(start, 0, m - gamma - 1)
            draft = hist[bidx[:, None], start[:, None] + jnp.arange(gamma)]

            feed = jnp.concatenate([last_token[:, None], draft], axis=1)
            emb = jax.vmap(lambda r: dec.embed_tokens(params["text"], r))(feed)
            p1 = next_pos[:, None] + jnp.arange(t)[None]
            positions = jnp.broadcast_to(p1[None], (3, b, t))
            hidden, cache = dec.decode_multi(params["text"], self.cfg.text,
                                             emb, positions, cache, cache_len,
                                             act_quant=self._act_quant)
            logits = dec.logits_from_hidden(params["text"], self.cfg.text,
                                            hidden,
                                            act_quant=self._act_quant)
            # output positions of the T candidates (also the forcing index)
            wpos = jnp.minimum(ntok[:, None] + jnp.arange(t)[None], m - 1)
            if use_sampling:  # static gate: greedy batches keep the
                # argmax-only executable (no gumbel/logsumexp work)
                y, n_new = spec_verify_sampled(logits, draft, temps, step_key)
            else:
                y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
                if use_forced:  # teacher forcing (bench-only): the "model
                    # output" is the forced stream; accept/reject drafts
                    # against it by the normal exact-prefix rule, so
                    # acceptance reflects the forced text's statistics
                    # while the verify pass runs the real compute
                    fr = jnp.take_along_axis(forced, wpos, axis=1)  # (B, T)
                    y = jnp.where(fr >= 0, fr, y)
                ok = jnp.cumprod((y[:, :gamma] == draft).astype(jnp.int32),
                                 axis=1)
                n_new = 1 + jnp.sum(ok, axis=1)                # (B,) 1..T
            # record all T candidates; rejected ones get overwritten later
            hist = hist.at[bidx[:, None], wpos].set(y)
            last_token = y[bidx, n_new - 1]
            cache_len = cache_len + n_new
            next_pos = next_pos + n_new
            return (cache, cache_len, next_pos, last_token, hist), (y, n_new)

        keys = jax.random.split(key, steps)
        (cache, cache_len, next_pos, last_token, hist), (toks, counts) = \
            jax.lax.scan(step, (cache, cache_len, next_pos, last_token, hist),
                         keys)
        return cache, cache_len, next_pos, last_token, hist, toks, counts

    def decode_chunk_spec(self, steps: Optional[int] = None):
        """Speculative chunk. Returns (toks (S, B, gamma+1) np,
        counts (S, B) np): step s emitted counts[s, b] tokens, the first
        counts[s, b] entries of toks[s, b]."""
        gamma = self.ecfg.speculative_ngram
        steps = steps or max(1, self.ecfg.decode_chunk // (gamma + 1))
        active = [i for i, free in enumerate(self.slot_free) if not free]
        use_sampling = any(self._slot_temp[i] > 0.0 for i in active)
        if use_sampling:
            self._key, sub = jax.random.split(self._key)
        else:
            sub = self._key
        # teacher forcing: outputs are the forced streams, so the verify
        # rule is draft-vs-forced exact prefix regardless of temperature
        # (the pipeline's attempt-0 temp is 0.1; rejection-sampling a
        # distribution that forcing then overrides would be meaningless)
        use_forced = self.ecfg.teacher_force
        use_sampling = use_sampling and not use_forced
        (self.cache, self.cache_len, self.next_pos, self.last_token,
         self.token_hist, toks, counts) = self._spec_chunk_jit(
            self.params, self.cache, self.cache_len, self.next_pos,
            self.last_token, self.token_hist, self.temps, sub,
            self.forced if use_forced else None,
            steps=steps, gamma=gamma, use_sampling=use_sampling,
            use_forced=use_forced)
        # acceptance accounting happens host-side in the consumer, from the
        # truncated-at-EOS emission lists — the raw device counts include
        # post-EOS steps whose tokens the host discards, which skewed
        # spec_tokens_per_pass for short completions
        return np.asarray(toks), np.asarray(counts)

    def spec_emissions(self, spec_toks, spec_counts,
                       budgets: dict) -> dict:
        """Truncate raw speculative-chunk emissions at EOS/budget per slot
        and account acceptance metrics from what the host actually keeps
        (post-EOS steps and their tokens don't count — raw device counts
        skew spec_tokens_per_pass for short completions). `budgets` maps
        slot -> remaining token budget; returns slot -> kept token list.
        Shared by engine.generate and the server's engine loop."""
        emitted: dict = {}
        for slot, budget in budgets.items():
            toks_list: list = []
            passes = 0
            done = False
            for st in range(spec_toks.shape[0]):
                if done or len(toks_list) >= budget:
                    break
                passes += 1
                for tok in spec_toks[st, slot, :spec_counts[st, slot]]:
                    toks_list.append(int(tok))
                    if (int(tok) == self.tok.eos_token_id
                            or len(toks_list) >= budget):
                        done = True
                        break
            self.spec_passes += passes
            self.spec_tokens += len(toks_list)
            emitted[slot] = toks_list
        return emitted

    def _spec_ok(self) -> bool:
        """Speculation applies when enabled and every active slot samples
        plainly (temperature-only — nucleus filtering and per-token logprobs
        need the per-step path) and is past any guided constraint: its DFA
        state sits in the closed free set (all tokens allowed forever), so
        skipping the mask gather cannot change output semantics."""
        if self.ecfg.speculative_ngram <= 0:
            return False
        active = [i for i, free in enumerate(self.slot_free) if not free]
        if not active:
            return False
        if any(self._slot_top_p[i] < 1.0 for i in active):
            return False
        if any(self._slot_wants_lp.get(i, False) for i in active):
            return False  # per-token logprobs need the per-step path
        # per-request votes: speculate when opted-in slots are the majority
        # of the wave. Verification is exact either way; this balances
        # anchored pages (measured win) against scanned pages (measured
        # loss, acceptance ~1.03) sharing a batch.
        if 2 * sum(self._slot_spec[i] for i in active) <= len(active):
            return False
        states = np.asarray(self.dfa_state)
        return bool(self._free_state_mask[states[active]].all())

    # ------------------------------------------------------------------
    # host-side orchestration
    # ------------------------------------------------------------------

    def _decode_image(self, raw: bytes) -> np.ndarray:
        """Decode image bytes to an RGB uint8 array, LRU-cached by content
        hash (KARANTA_IMG_CACHE_MB, 0 disables). Retries and rotation
        re-requests resend identical bytes; the decode is the single most
        expensive host step (~18 ms/page on one core). The native decoder
        (native/fastpng.cpp, `make native`) handles the common 8-bit PNG
        case; anything else goes through PIL."""
        import hashlib

        key = hashlib.sha1(raw).digest() if self._img_cache_cap else None
        if key is not None:
            with self._img_cache_lock:
                hit = self._img_cache.get(key)
                if hit is not None:
                    self._img_cache.move_to_end(key)
                    return hit
        rgb = None
        if _fastpng is not None and raw[:8] == b"\x89PNG\r\n\x1a\n":
            try:
                buf, h, w = _fastpng.decode_rgb(raw)
                rgb = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
            except ValueError:
                rgb = None  # unsupported variant: PIL fallback
        if rgb is None:
            from PIL import Image

            pil = Image.open(io.BytesIO(raw))
            if pil.mode != "RGB":
                pil = pil.convert("RGB")
            rgb = np.asarray(pil, np.uint8)
        rgb.setflags(write=False)  # shared across cache hits
        if key is not None:
            with self._img_cache_lock:
                # two prep threads can miss the same key concurrently; the
                # overwrite must not double-count the budget
                old = self._img_cache.pop(key, None)
                if old is not None:
                    self._img_cache_bytes -= old.nbytes
                self._img_cache[key] = rgb
                self._img_cache_bytes += rgb.nbytes
                while self._img_cache_bytes > self._img_cache_cap \
                        and len(self._img_cache) > 1:
                    _, old = self._img_cache.popitem(last=False)
                    self._img_cache_bytes -= old.nbytes
        return rgb

    def staging_headroom(self, pending_pages: int) -> bool:
        """True when the device has HBM room to stage one more prepared page.

        The server's prep-ahead window holds up to max(8, B) prepared pages
        (~17 MB of staged operands each) on top of the KV cache; at int4-KV
        x prefix-cache B96 that window was the measured OOM cause ("prep
        window + prefix cache", BENCH_NOTES round 4). Rather than a static
        per-config ceiling, gate staging on LIVE allocator stats: stage
        another page only if current use plus the not-yet-materialized
        staged pages leaves ~8% of HBM free for executable transients.
        Platforms without memory_stats (CPU tests) never gate."""
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = int(stats.get("bytes_limit") or 0)
            in_use = int(stats.get("bytes_in_use") or 0)
        except Exception:
            return True
        if not limit:
            return True
        page = int(self.ecfg.max_pixels * 3
                   * (jnp.dtype(self.ecfg.dtype).itemsize + 1) * 1.3)
        return in_use + (pending_pages + 1) * page <= int(limit * 0.92)

    def prepare(self, request: GenRequest) -> _Prepared:
        parsed = chat.parse_openai_messages(
            request.messages, raw_images=request.raw_images)
        image_feeds = []
        img_token_counts = []
        grids = []
        for raw in parsed.images:
            rgb = self._decode_image(raw)
            img_h, img_w = rgb.shape[:2]
            sbh = src_px_bucket(img_h) if self.ecfg.device_resize else None
            sbw = src_px_bucket(img_w) if self.ecfg.device_resize else None
            if sbh is not None and sbw is not None:
                # on-device resize: ship the decoded page and run the PIL-
                # equivalent bicubic + patchify in one executable (the host
                # resize is ~60 ms/page on one core; the matmuls are free)
                plan = plan_image(img_h, img_w,
                                  self.ecfg.min_pixels, self.ecfg.max_pixels)
                src = np.zeros((sbh, sbw, 3), np.uint8)
                src[:img_h, :img_w] = rgb
                arr = None
                pix_dev = resize_patchify(
                    jax.device_put(src),
                    jnp.asarray(img_h, jnp.int32),
                    jnp.asarray(img_w, jnp.int32),
                    grid_h=plan.grid_h, grid_w=plan.grid_w,
                    pad_grid_h=plan.pad_grid_h, pad_grid_w=plan.pad_grid_w,
                    out_dtype=self.ecfg.dtype)
            else:
                from PIL import Image

                arr, plan = preprocess_host(Image.fromarray(rgb),
                                            self.ecfg.min_pixels,
                                            self.ecfg.max_pixels)
                pix_dev = None
            layout = build_vision_layout(plan, self.cfg.vision)
            n_pad = _bucket(layout.num_merged, self.ecfg.image_token_buckets)
            extract = np.zeros((n_pad,), np.int32)
            extract[: layout.num_merged] = layout.extract
            if pix_dev is None:
                # stage the image on device from the prepare thread:
                # device_put + patchify dispatch asynchronously, so the H2D
                # transfer (~40 ms over the remote tunnel) and the patch
                # reshape overlap with the previous page's prefill instead
                # of serializing in prefill()
                pix_dev = patchify(jax.device_put(arr), grid_h=plan.grid_h,
                                   grid_w=plan.grid_w,
                                   pad_grid_h=plan.pad_grid_h,
                                   pad_grid_w=plan.pad_grid_w,
                                   out_dtype=self.ecfg.dtype)
            image_feeds.append(dict(
                image_u8=arr, plan=plan, layout=layout, extract=extract,
                n_pad=n_pad, pix_dev=pix_dev))
            img_token_counts.append(layout.num_merged)
            grids.append(plan.grid_thw)

        ids = self.tok.encode(parsed.text)
        ids = chat.expand_image_pads(ids, self.tok.image_pad_id,
                                     img_token_counts)
        ids = np.asarray(ids, np.int32)
        positions = mrope_positions(ids, grids, self.tok.image_pad_id,
                                    self.cfg.vision.spatial_merge_size)
        # the automaton is bound at prefill time, not here: prepare() runs in
        # a thread pool, and an eager table swap could invalidate another
        # in-flight request's start state between its prepare and insert
        prefix_len = 0
        if self.ecfg.prefix_cache:
            # Shared-prefix detection by longest common prefix against the
            # running prompt head. The OCR pipeline's prompts are
            # [instruction text .. anchor .. image] (reference
            # karanta/data/utils.py:269-297: text first, image second), so
            # the shared part is the instruction head BEFORE the per-page
            # anchor — an image-position boundary alone would make every
            # page's "prefix" unique and the cache useless. The head is
            # seeded by the first request (which takes a full prefill) and
            # monotonically shrinks to the true cross-request common prefix.
            img_idx = np.flatnonzero(ids == self.tok.image_pad_id)
            limit = int(img_idx[0]) if len(img_idx) else len(ids) - 1
            head = ids[:limit]
            with self._prefix_lock:
                stored = self._prompt_head
                if stored is None:
                    self._prompt_head = head.copy()
                    self._prefix_miss = 0
                else:
                    n = min(len(stored), len(head))
                    neq = np.flatnonzero(stored[:n] != head[:n])
                    lcp = int(neq[0]) if len(neq) else n
                    if lcp < self.ecfg.prefix_min_tokens:
                        # stored head doesn't represent this prompt family;
                        # after a few consecutive misses re-seed from the
                        # current prompt so an outlier first request (warmup,
                        # text-only probe) can't disable caching forever
                        self._prefix_miss += 1
                        if self._prefix_miss >= 4:
                            self._prompt_head = head.copy()
                            self._prefix_miss = 0
                    else:
                        self._prefix_miss = 0
                        if lcp < len(stored):
                            self._prompt_head = stored[:lcp].copy()
                        # quantize down to 128-token granularity so the
                        # prefix length (a static shape in the continuation
                        # executables) stabilizes instead of recompiling per
                        # tiny LCP jitter; exact below one granule
                        prefix_len = lcp if lcp < 128 else (lcp // 128) * 128
            if prefix_len and prefix_len + _bucket(
                    len(ids) - prefix_len,
                    self.ecfg.prefill_buckets) > self.ecfg.max_seq_len:
                # prefix rows + padded suffix bucket must fit the slot at
                # insert time; long prompts near the context cap prefill
                # whole instead
                prefix_len = 0

        if len(ids) >= self.ecfg.max_seq_len:
            raise ContextLengthError(
                f"prompt is {len(ids)} tokens but the maximum context length "
                f"is {self.ecfg.max_seq_len} (>=1 output token required)")

        prepared = _Prepared(
            ids=ids, positions=positions, image_feeds=image_feeds,
            img_token_counts=img_token_counts, max_tokens=request.max_tokens,
            temperature=request.temperature, top_p=request.top_p,
            request_id=request.request_id, guide=None,
            guide_regex=request.guided_regex or None, prefix_len=prefix_len,
            logprobs=request.logprobs,
            top_logprobs=min(int(request.top_logprobs or 0), 5),
            speculative=request.speculative)

        if self.ecfg.teacher_force and getattr(request, "forced_output",
                                               None):
            if request.guided_regex:
                # a forced token the automaton forbids would silently poison
                # the DFA state; the bench never combines the two, so reject
                # loudly instead of decoding nonsense
                raise ValueError("teacher forcing does not compose with "
                                 "guided decoding (forced tokens bypass the "
                                 "automaton)")
            f = np.asarray(self.tok.encode(request.forced_output), np.int32)
            # fit the completion budget and the slot (minus the speculative
            # path's verify headroom, whose end-of-cache clamp would rewind
            # the forcing index), EOS-terminated so the forced completion
            # finishes with reason "stop" like a real one
            budget = min(int(request.max_tokens),
                         self.ecfg.max_seq_len - len(ids) - 2
                         - self.ecfg.speculative_ngram)
            f = f[:max(0, budget - 1)]
            prepared.forced_tokens = np.concatenate(
                [f, [self.tok.eos_token_id]]).astype(np.int32)

        if len(image_feeds) == 1 and not prefix_len:
            # stage the fused-path prompt operands on device from the
            # prepare thread too: the padded-array builds + H2D puts were
            # ~25 ms/page of serial prefill() dispatch time
            feed = image_feeds[0]
            layout = feed["layout"]
            s = len(ids)
            s_pad = _bucket(s, self.ecfg.prefill_buckets)
            ids_p = np.zeros((s_pad,), np.int32)
            ids_p[:s] = ids
            pos_p = np.zeros((3, s_pad), np.int32)
            pos_p[:, :s] = positions
            kvm = np.zeros((s_pad,), np.float32)
            kvm[:s] = 1.0
            img_pos = np.full((feed["n_pad"],), s_pad, np.int32)
            img_pos[: layout.num_merged] = np.flatnonzero(
                ids == self.tok.image_pad_id)
            prepared.staged = dict(
                ids=jax.device_put(ids_p), positions=jax.device_put(pos_p),
                kv_mask=jax.device_put(kvm), img_pos=jax.device_put(img_pos),
                perm=jax.device_put(np.asarray(layout.perm)),
                valid=jax.device_put(np.asarray(layout.valid)),
                pos_hw=jax.device_put(np.asarray(layout.pos_hw)),
                extract=jax.device_put(feed["extract"]),
                true_len=jnp.asarray(s, jnp.int32))
        elif len(image_feeds) == 1 and prefix_len:
            # prefix-continuation staging: suffix-only prompt operands (the
            # prefix KV is reused from the LRU cache at prefill time)
            feed = image_feeds[0]
            layout = feed["layout"]
            p = prefix_len
            s = len(ids)
            n_sfx = s - p
            s_pad = _bucket(n_sfx, self.ecfg.prefill_buckets)
            ids_p = np.zeros((s_pad,), np.int32)
            ids_p[:n_sfx] = ids[p:]
            pos_p = np.zeros((3, s_pad), np.int32)
            pos_p[:, :n_sfx] = positions[:, p:]
            kvm = np.zeros((s_pad,), np.float32)
            kvm[:n_sfx] = 1.0
            img_pos = np.full((feed["n_pad"],), s_pad, np.int32)
            img_pos[: layout.num_merged] = np.flatnonzero(
                ids == self.tok.image_pad_id) - p
            prepared.staged_sfx = dict(
                ids=jax.device_put(ids_p), positions=jax.device_put(pos_p),
                kv_mask=jax.device_put(kvm), img_pos=jax.device_put(img_pos),
                perm=jax.device_put(np.asarray(layout.perm)),
                valid=jax.device_put(np.asarray(layout.valid)),
                pos_hw=jax.device_put(np.asarray(layout.pos_hw)),
                extract=jax.device_put(feed["extract"]),
                true_len=jnp.asarray(n_sfx, jnp.int32))
        return prepared

    _ARENA_BUCKETS = (64, 256, 1024, 4096)
    ARENA_MAX_ROWS = 4096

    def guided_available(self, regex: str) -> bool:
        """Can a request with this regex be admitted right now? True when it
        is already resident in the state arena, fits beside the resident
        automatons, or every resident automaton has drained (the arena then
        resets at bind time). Requests held back here are re-offered by the
        server each admission round — never dropped."""
        with self._automaton_lock:
            if regex in self._arena:
                return True
            n = self._compile_automaton_locked(regex).allowed.shape[0] - 1
            if self._arena_used + n <= self.ARENA_MAX_ROWS:
                return True
            return not self._live_regexes_locked()

    def _live_regexes_locked(self) -> set:
        return {r for r, free in zip(self._slot_regex, self.slot_free)
                if r is not None and not free}

    def _compile_automaton_locked(self, regex: str):
        """Host-side regex -> token-automaton compile, LRU-cached (the token
        walk over a 152k vocab is the expensive part; arena resets reuse it)."""
        hit = self._automaton_cache.get(regex)
        if hit is not None:
            self._automaton_cache.move_to_end(regex)
            return hit
        from karanta_tpu.inference.guided import (
            build_token_automaton, token_bytes_from_tokenizer,
        )

        if self._token_bytes is None:
            self._token_bytes = token_bytes_from_tokenizer(
                self.tok, self.cfg.text.vocab_size)
        automaton = build_token_automaton(regex, self._token_bytes,
                                          self.tok.eos_token_id)
        self._automaton_cache[regex] = automaton
        while len(self._automaton_cache) > 8:
            self._automaton_cache.popitem(last=False)
        return automaton

    def _ensure_automaton(self, regex: str) -> int:
        """Make `regex` resident in the state arena. Returns the (absolute)
        DFA start state for a newly-admitted slot; raises GuidedRegexBusy
        when the arena is full of OTHER regexes with live slots (callers
        defer until one drains — the constraint is never dropped)."""
        with self._automaton_lock:
            return self._ensure_automaton_locked(regex)

    def _ensure_automaton_locked(self, regex: str) -> int:
        entry = self._arena.get(regex)
        if entry is not None:
            self._arena.move_to_end(regex)
            return entry["start"]
        automaton = self._compile_automaton_locked(regex)
        n = automaton.allowed.shape[0] - 1   # its rows minus its FREE row
        if 1 + n > self.ARENA_MAX_ROWS:
            raise ValueError(
                f"guided regex needs {n} token-automaton states; the arena "
                f"holds at most {self.ARENA_MAX_ROWS - 1}")
        if self._arena_used + n > self.ARENA_MAX_ROWS:
            if self._live_regexes_locked():
                raise GuidedRegexBusy(
                    "guided state arena is full with live automatons; "
                    "retry when one drains")
            # nothing live: drop every resident automaton and start over
            # (host compiles are cached, so this is just a table rebuild)
            self._arena.clear()
            self._arena_used = 1
        offset = self._arena_used
        start = offset + (automaton.start - 1)
        self._arena[regex] = {"offset": offset, "n": n, "start": start}
        self._arena_used += n
        self._upload_arena_locked()
        return start

    def _upload_arena_locked(self) -> None:
        """Rebuild + upload the flattened guided tables.

        Layout: row 0 is the shared FREE state (everything allowed,
        self-loop, speculation-safe); automaton `a` with n_a regex states
        occupies rows [offset_a, offset_a + n_a) with next-state values
        pre-offset, so `allowed[dfa_state]` and `next_state[dfa_state,
        token]` in the decode step need no per-automaton index. The row axis
        is padded to a bucket so resident-set changes within a bucket reuse
        the compiled decode executable (a new bucket recompiles — measured
        ~4 min on CPU, minutes on the remote TPU compile service too)."""
        from karanta_tpu.inference.guided import closed_free_states

        vocab = self.cfg.text.vocab_size
        bucket = next(b for b in self._ARENA_BUCKETS
                      if b >= self._arena_used)
        allowed = np.zeros((bucket, vocab), bool)
        nxt = np.zeros((bucket, vocab), np.int32)  # default: fall to FREE
        free_mask = np.zeros((bucket,), bool)
        allowed[0] = True
        free_mask[0] = True
        eos = self.tok.eos_token_id
        if 0 <= eos < vocab:
            allowed[1:, eos] = True  # unoccupied rows (unreachable): safety
        # speculation-safe states: once a guided slot's DFA enters the
        # closed free set (e.g. the [\s\S]+ tail of the pipeline regex),
        # masking is a no-op forever and the slot may speculate. Byte-less
        # tokens (vocab holes) are exempt from the check — they self-loop
        # and add no text — but EOS never is (early EOS truncates the match)
        zero_len = np.array([len(t) == 0 for t in self._token_bytes], bool)
        if 0 <= eos < len(zero_len):
            zero_len[eos] = False
        for regex, entry in self._arena.items():
            automaton = self._compile_automaton_locked(regex)
            o, n = entry["offset"], entry["n"]
            allowed[o:o + n] = automaton.allowed[1:]
            # local states 1..n map to arena rows o..o+n-1 (no local row
            # beyond FREE ever transitions to local 0, so +o-1 is exact)
            nxt[o:o + n] = automaton.next_state[1:] + (o - 1)
            local_free = closed_free_states(
                automaton.allowed, automaton.next_state, zero_len)
            free_mask[o:o + n] = local_free[1:]
        self._allowed = jnp.asarray(allowed)
        self._next_state = jnp.asarray(nxt)
        self._free_state_mask = free_mask

    def _encode_images(self, prepared: _Prepared):
        """Run the vision encoder for each image; returns padded token arrays
        (concatenated) + their positions in the prompt sequence."""
        if not prepared.image_feeds:
            h = self.cfg.vision.out_hidden_size
            return (jnp.zeros((1, h), self.ecfg.dtype),
                    np.full((1,), 1 << 30, np.int32))

        all_tokens = []
        all_positions = []
        # positions of image tokens in the prompt = where ids == image_pad_id
        img_pos_all = np.flatnonzero(prepared.ids == self.tok.image_pad_id)
        offset = 0
        for feed in prepared.image_feeds:
            plan, layout = feed["plan"], feed["layout"]
            pix = feed.get("pix_dev")
            if pix is None:  # staged in prepare(); fallback for direct calls
                pix = patchify(jnp.asarray(feed["image_u8"]),
                               grid_h=plan.grid_h, grid_w=plan.grid_w,
                               pad_grid_h=plan.pad_grid_h,
                               pad_grid_w=plan.pad_grid_w,
                               out_dtype=self.ecfg.dtype)
            tokens = self._encode_image_jit(
                self.params, pix,
                jnp.asarray(layout.perm), jnp.asarray(layout.valid),
                jnp.asarray(layout.pos_hw), jnp.asarray(feed["extract"]),
                n_windows=layout.n_windows)
            all_tokens.append(tokens)
            pos = np.full((feed["n_pad"],), 1 << 30, np.int32)
            pos[: layout.num_merged] = img_pos_all[offset:offset + layout.num_merged]
            all_positions.append(pos)
            offset += layout.num_merged
        return jnp.concatenate(all_tokens, 0), np.concatenate(all_positions)

    def _get_prefix_cache(self, prefix_ids: np.ndarray):
        """KV for a shared text prefix, built once and LRU-cached."""
        key = prefix_ids.tobytes()
        if key in self._prefix_kv:
            self._prefix_kv.move_to_end(key)
            return self._prefix_kv[key]
        p = len(prefix_ids)
        s_pad = _bucket(p, self.ecfg.prefill_buckets)
        ids = np.zeros((s_pad,), np.int32)
        ids[:p] = prefix_ids
        positions = np.zeros((3, s_pad), np.int32)
        positions[:, :p] = mrope_positions(prefix_ids, [],
                                           self.tok.image_pad_id)
        kv_mask = np.zeros((s_pad,), np.float32)
        kv_mask[:p] = 1.0
        dummy_tokens = jnp.zeros((1, self.cfg.vision.out_hidden_size),
                                 self.ecfg.dtype)
        _, _, cache = self._prefill_jit(
            self.params, jnp.asarray(ids), jnp.asarray(positions),
            jnp.asarray(kv_mask), dummy_tokens,
            jnp.asarray(np.full((1,), s_pad, np.int32)),
            jnp.asarray(p, jnp.int32))
        trimmed = dec.KVCache(cache.k[:, :, :, :p], cache.v[:, :, :, :p])
        self._prefix_kv[key] = trimmed
        while len(self._prefix_kv) > self.ecfg.prefix_cache_entries:
            self._prefix_kv.popitem(last=False)
        logger.info("cached prompt prefix of %d tokens", p)
        return trimmed

    def prefill(self, prepared: _Prepared):
        """Run prefill; returns (cache, first_token_array, true_len, next_pos)."""
        if prepared.guide_regex and prepared.guide is None:
            # bind the automaton now (not at prepare): raises GuidedRegexBusy
            # when a different regex still has live slots
            prepared.guide = self._ensure_automaton(prepared.guide_regex)
        s = len(prepared.ids)

        if len(prepared.image_feeds) == 1 and not prepared.prefix_len:
            # single-image fast path: one fused executable per page
            feed = prepared.image_feeds[0]
            plan, layout = feed["plan"], feed["layout"]
            pix = feed.get("pix_dev")
            if pix is None:  # staged in prepare(); fallback for direct calls
                pix = patchify(jnp.asarray(feed["image_u8"]),
                               grid_h=plan.grid_h, grid_w=plan.grid_w,
                               pad_grid_h=plan.pad_grid_h,
                               pad_grid_w=plan.pad_grid_w,
                               out_dtype=self.ecfg.dtype)
            st = prepared.staged
            if st is None:  # fallback for direct calls
                s_pad = _bucket(s, self.ecfg.prefill_buckets)
                ids = np.zeros((s_pad,), np.int32)
                ids[:s] = prepared.ids
                positions = np.zeros((3, s_pad), np.int32)
                positions[:, :s] = prepared.positions
                kv_mask = np.zeros((s_pad,), np.float32)
                kv_mask[:s] = 1.0
                img_pos = np.full((feed["n_pad"],), s_pad, np.int32)
                img_pos[: layout.num_merged] = np.flatnonzero(
                    prepared.ids == self.tok.image_pad_id)
                st = dict(
                    ids=jnp.asarray(ids), positions=jnp.asarray(positions),
                    kv_mask=jnp.asarray(kv_mask), img_pos=jnp.asarray(img_pos),
                    perm=jnp.asarray(layout.perm),
                    valid=jnp.asarray(layout.valid),
                    pos_hw=jnp.asarray(layout.pos_hw),
                    extract=jnp.asarray(feed["extract"]),
                    true_len=jnp.asarray(s, jnp.int32))
            logits, greedy, cache = self._prefill_fused_jit(
                self.params, pix, st["perm"], st["valid"], st["pos_hw"],
                st["extract"], st["ids"], st["positions"], st["kv_mask"],
                st["img_pos"], st["true_len"], n_windows=layout.n_windows)
            return self._sample_first(prepared, logits, cache, s, greedy)

        if (len(prepared.image_feeds) == 1 and prepared.prefix_len
                and prepared.staged_sfx is not None):
            # single-image prefix continuation: same dispatch count as the
            # fused fast path, suffix-bucket prefill only
            feed = prepared.image_feeds[0]
            plan, layout = feed["plan"], feed["layout"]
            pix = feed.get("pix_dev")
            if pix is None:  # staged in prepare(); fallback for direct calls
                pix = patchify(jnp.asarray(feed["image_u8"]),
                               grid_h=plan.grid_h, grid_w=plan.grid_w,
                               pad_grid_h=plan.pad_grid_h,
                               pad_grid_w=plan.pad_grid_w,
                               out_dtype=self.ecfg.dtype)
            p = prepared.prefix_len
            prefix_kv = self._get_prefix_cache(prepared.ids[:p])
            st = prepared.staged_sfx
            logits, greedy, cache = self._prefill_prefix_fused_jit(
                self.params, pix, st["perm"], st["valid"], st["pos_hw"],
                st["extract"], st["ids"], st["positions"], st["kv_mask"],
                st["img_pos"], st["true_len"], prefix_kv.k, prefix_kv.v,
                jnp.ones((p,), jnp.float32), n_windows=layout.n_windows)
            return self._sample_first(prepared, logits, cache, s, greedy)

        img_tokens, img_positions = self._encode_images(prepared)

        if prepared.prefix_len:
            p = prepared.prefix_len
            prefix_kv = self._get_prefix_cache(prepared.ids[:p])
            suffix = prepared.ids[p:]
            n_sfx = len(suffix)
            s_pad = _bucket(n_sfx, self.ecfg.prefill_buckets)
            ids = np.zeros((s_pad,), np.int32)
            ids[:n_sfx] = suffix
            positions = np.zeros((3, s_pad), np.int32)
            positions[:, :n_sfx] = prepared.positions[:, p:]
            kv_mask = np.zeros((s_pad,), np.float32)
            kv_mask[:n_sfx] = 1.0
            img_pos_sfx = np.where(img_positions < s, img_positions - p,
                                   s_pad).astype(np.int32)
            img_pos_sfx = np.where(img_pos_sfx < s_pad, img_pos_sfx, s_pad)
            prefix_mask = jnp.ones((p,), jnp.float32)
            logits, greedy, cache = self._prefill_prefix_jit(
                self.params, jnp.asarray(ids), jnp.asarray(positions),
                jnp.asarray(kv_mask), img_tokens, jnp.asarray(img_pos_sfx),
                jnp.asarray(n_sfx, jnp.int32),
                prefix_kv.k, prefix_kv.v, prefix_mask)
        else:
            s_pad = _bucket(s, self.ecfg.prefill_buckets)
            ids = np.zeros((s_pad,), np.int32)
            ids[:s] = prepared.ids
            positions = np.zeros((3, s_pad), np.int32)
            positions[:, :s] = prepared.positions
            kv_mask = np.zeros((s_pad,), np.float32)
            kv_mask[:s] = 1.0
            # clamp out-of-bucket image positions to the drop sentinel
            img_positions = np.where(img_positions < s_pad, img_positions,
                                     s_pad)

            logits, greedy, cache = self._prefill_jit(
                self.params, jnp.asarray(ids), jnp.asarray(positions),
                jnp.asarray(kv_mask), img_tokens,
                jnp.asarray(img_positions.astype(np.int32)),
                jnp.asarray(s, jnp.int32))

        return self._sample_first(prepared, logits, cache, s, greedy)

    def _sample_first(self, prepared: _Prepared, logits, cache, s: int,
                      greedy=None):
        """Shared prefill tail: guided mask, first-token sample, dfa advance.

        greedy is the argmax token computed INSIDE the prefill executable;
        for greedy unguided no-logprobs requests it is used directly, saving
        the random-split + sample_tokens dispatches (two host round trips
        per page over remote tunnels)."""
        if (greedy is not None and prepared.temperature <= 0.0
                and prepared.guide is None and not prepared.logprobs):
            next_pos = (int(prepared.positions.max()) + 1) if s else 0
            return cache, greedy, s, next_pos, 0
        state0 = prepared.guide if prepared.guide is not None else 0
        if prepared.guide is not None:
            logits = jnp.where(self._allowed[state0], logits, -jnp.inf)
        self._key, sub = jax.random.split(self._key)
        first = sample_tokens(
            logits[None], sub,
            jnp.asarray([prepared.temperature], jnp.float32),
            jnp.asarray([prepared.top_p], jnp.float32))[0]
        dfa_after = (int(self._next_state[state0, first])
                     if prepared.guide is not None else 0)
        if prepared.logprobs:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            k = max(1, prepared.top_logprobs)
            top_vals, top_ids = jax.lax.top_k(logp, k)
            self._first_logprob[prepared.request_id] = (
                float(logp[first]),
                list(zip(np.asarray(top_ids).tolist(),
                         np.asarray(top_vals, np.float64).tolist())))
        # The first sampled token is *fed* at the next decode step; its
        # position is max(prompt positions) + 1.
        next_pos = (int(prepared.positions.max()) + 1) if s else 0
        return cache, first, s, next_pos, dfa_after

    def prefill_insert_batch(self, group: list, slots: list):
        """Fused prefill + insert for K same-shaped unguided pages.

        group: list of _Prepared with identical staged shapes and one image
        each. Returns the (K,) first-token device array (synced by the
        caller's wave)."""
        k = len(group)
        p_tokens = group[0].image_feeds[0]["pix_dev"].shape[0]
        pad_merged = p_tokens // self.cfg.vision.merge_unit
        layout0 = group[0].image_feeds[0]["layout"]

        pix = jnp.concatenate([g.image_feeds[0]["pix_dev"] for g in group], 0)
        perm = jnp.concatenate(
            [g.staged["perm"] + i * p_tokens for i, g in enumerate(group)], 0)
        valid = jnp.concatenate([g.staged["valid"] for g in group], 0)
        pos_hw = jnp.concatenate([g.staged["pos_hw"] for g in group], 0)
        extract = jnp.concatenate(
            [g.staged["extract"] + i * pad_merged
             for i, g in enumerate(group)], 0)
        ids = jnp.stack([g.staged["ids"] for g in group])
        positions = jnp.stack([g.staged["positions"] for g in group], axis=1)
        kv_mask = jnp.stack([g.staged["kv_mask"] for g in group])
        img_pos = jnp.stack([g.staged["img_pos"] for g in group])
        true_lens = jnp.stack([g.staged["true_len"] for g in group])

        logits, greedy, cache = self._prefill_fused_batch_jit(
            self.params, pix, perm, valid, pos_hw, extract, ids, positions,
            kv_mask, img_pos, true_lens,
            n_windows=layout0.n_windows * k, n_images=k)

        temps = jnp.asarray([g.temperature for g in group], jnp.float32)
        top_ps = jnp.asarray([g.top_p for g in group], jnp.float32)
        if all(g.temperature <= 0.0 for g in group):
            firsts = greedy  # computed inside the prefill executable
        else:
            self._key, sub = jax.random.split(self._key)
            firsts = sample_tokens(logits, sub, temps, top_ps)    # (K,)
        pos_afters = jnp.asarray(
            [int(g.positions.max()) + 1 for g in group], jnp.int32)

        slots_a = jnp.asarray(slots, jnp.int32)
        (self.cache, self.cache_len, self.next_pos, self.last_token,
         self.temps, self.top_ps, self.dfa_state) = self._insert_batch_jit(
            cache, self.cache, self.cache_len, self.next_pos,
            self.last_token, self.temps, self.top_ps, self.dfa_state,
            slots_a, true_lens, firsts, pos_afters, temps, top_ps)
        for i, (g, slot) in enumerate(zip(group, slots)):
            self.slot_free[slot] = False
            self._slot_guided[slot] = False
            self._slot_regex[slot] = None
            self._slot_top_p[slot] = float(g.top_p)
            self._slot_temp[slot] = float(g.temperature)
            self._slot_len[slot] = len(g.ids)
            self._slot_wants_lp[slot] = False
            self._slot_logprobs[slot] = 0
            self._slot_spec[slot] = getattr(g, "speculative",
                                            None) is not False
            if self.ecfg.speculative_ngram > 0:
                m = self.ecfg.max_seq_len
                arr = np.zeros((m,), np.int32)
                arr[: len(g.ids)] = g.ids[:m]
                self.token_hist = self._hist_insert_jit(
                    self.token_hist, jnp.asarray(slot), jnp.asarray(arr),
                    jnp.asarray(len(g.ids), jnp.int32), firsts[i])
            if self.ecfg.teacher_force:
                self._apply_teacher(slot, g, len(g.ids))
        for g in group:
            self._release_page_buffers(g)
        if self.ecfg.teacher_force:
            return [self._teacher_first(g, firsts[i])
                    for i, g in enumerate(group)]
        return firsts

    @staticmethod
    def _batch_key(prepared: "_Prepared"):
        """Pages batch together when every staged operand shape matches."""
        if (prepared.staged is None or len(prepared.image_feeds) != 1
                or prepared.guide_regex or prepared.logprobs):
            return None
        feed = prepared.image_feeds[0]
        return (int(prepared.staged["ids"].shape[0]),
                tuple(feed["pix_dev"].shape), int(feed["n_pad"]),
                int(feed["layout"].n_windows))

    def insert(self, slot: int, prepared: _Prepared, cache, first_token,
               true_len: int, next_pos: int, dfa_val: int = 0):
        (self.cache, self.cache_len, self.next_pos, self.last_token,
         self.temps, self.top_ps, self.dfa_state) = self._insert_jit(
            cache, self.cache, self.cache_len, self.next_pos, self.last_token,
            self.temps, self.top_ps, self.dfa_state, jnp.asarray(slot),
            jnp.asarray(true_len, jnp.int32),
            first_token, jnp.asarray(next_pos, jnp.int32),
            jnp.asarray(prepared.temperature, jnp.float32),
            jnp.asarray(prepared.top_p, jnp.float32),
            jnp.asarray(dfa_val, jnp.int32))
        self.slot_free[slot] = False
        self._slot_guided[slot] = dfa_val > 0
        self._slot_regex[slot] = (prepared.guide_regex
                                  if dfa_val > 0 else None)
        self._slot_top_p[slot] = float(prepared.top_p)
        self._slot_temp[slot] = float(prepared.temperature)
        self._slot_len[slot] = true_len
        self._slot_wants_lp[slot] = bool(getattr(prepared, "logprobs", False))
        self._slot_logprobs[slot] = int(getattr(prepared, "top_logprobs", 0))
        self._slot_spec[slot] = getattr(prepared, "speculative",
                                        None) is not False
        if self.ecfg.speculative_ngram > 0:
            m = self.ecfg.max_seq_len
            ids = np.zeros((m,), np.int32)
            ids[: len(prepared.ids)] = prepared.ids[:m]
            self.token_hist = self._hist_insert_jit(
                self.token_hist, jnp.asarray(slot), jnp.asarray(ids),
                jnp.asarray(true_len, jnp.int32), first_token)
        if self.ecfg.teacher_force:
            self._apply_teacher(slot, prepared, true_len)

    def _apply_teacher(self, slot: int, prepared: _Prepared,
                       true_len: int) -> None:
        """Upload the request's forced-output stream for its slot (teacher
        forcing, bench-only). Always uploads — a cleared row (-1) for
        unforced requests, so a reused slot never inherits a stale one."""
        m = self.ecfg.max_seq_len
        row = np.full((m,), -1, np.int32)
        ft = getattr(prepared, "forced_tokens", None)
        if ft is not None and len(ft):
            n = min(len(ft), m - true_len)
            row[true_len:true_len + n] = ft[:n]
        if self.ecfg.speculative_ngram > 0:
            self.forced, self.last_token, self.token_hist = \
                self._teacher_insert_jit(
                    self.forced, self.last_token, jnp.asarray(slot),
                    jnp.asarray(row), jnp.asarray(true_len, jnp.int32),
                    self.token_hist)
        else:
            self.forced, self.last_token = self._teacher_insert_jit(
                self.forced, self.last_token, jnp.asarray(slot),
                jnp.asarray(row), jnp.asarray(true_len, jnp.int32))

    def prefill_insert(self, slot: int, prepared: _Prepared):
        """Prefill a page and insert it into `slot`; returns the first-token
        device scalar (unsynced). Greedy unguided single-image pages take
        the fused one-dispatch executable; everything else falls back to
        prefill() + insert()."""
        feed = (prepared.image_feeds[0]
                if len(prepared.image_feeds) == 1 else None)
        st = prepared.staged
        fast = (st is not None and feed is not None
                and feed.get("pix_dev") is not None
                and not prepared.prefix_len
                and prepared.temperature <= 0.0
                and not prepared.guide_regex and not prepared.logprobs)
        if not fast:
            cache, first, true_len, next_pos, dfa_val = self.prefill(prepared)
            self.insert(slot, prepared, cache, first, true_len, next_pos,
                        dfa_val)
            self._release_page_buffers(prepared)
            return self._teacher_first(prepared, first)
        layout = feed["layout"]
        pos_after = ((int(prepared.positions.max()) + 1)
                     if len(prepared.ids) else 0)
        (self.cache, self.cache_len, self.next_pos, self.last_token,
         self.temps, self.top_ps, self.dfa_state,
         first) = self._prefill_insert_jit(
            self.params, feed["pix_dev"], st["perm"], st["valid"],
            st["pos_hw"], st["extract"], st["ids"], st["positions"],
            st["kv_mask"], st["img_pos"], st["true_len"], self.cache,
            self.cache_len, self.next_pos, self.last_token, self.temps,
            self.top_ps, self.dfa_state, jnp.asarray(slot),
            jnp.asarray(pos_after, jnp.int32), n_windows=layout.n_windows)
        self.slot_free[slot] = False
        self._slot_guided[slot] = False
        self._slot_regex[slot] = None
        self._slot_top_p[slot] = 1.0
        self._slot_temp[slot] = 0.0
        self._slot_len[slot] = len(prepared.ids)
        self._slot_wants_lp[slot] = False
        self._slot_logprobs[slot] = 0
        self._slot_spec[slot] = getattr(prepared, "speculative",
                                        None) is not False
        if self.ecfg.speculative_ngram > 0:
            m = self.ecfg.max_seq_len
            arr = np.zeros((m,), np.int32)
            arr[: len(prepared.ids)] = prepared.ids[:m]
            self.token_hist = self._hist_insert_jit(
                self.token_hist, jnp.asarray(slot), jnp.asarray(arr),
                jnp.asarray(len(prepared.ids), jnp.int32), first)
        if self.ecfg.teacher_force:
            self._apply_teacher(slot, prepared, len(prepared.ids))
        self._release_page_buffers(prepared)
        return self._teacher_first(prepared, first)

    def _teacher_first(self, prepared: _Prepared, first):
        """Under teacher forcing the first emitted token is the forced
        stream's, not the prefill executable's sample — report that one to
        the host (a plain scalar; callers only int() it)."""
        ft = getattr(prepared, "forced_tokens", None)
        if self.ecfg.teacher_force and ft is not None and len(ft):
            return np.int32(ft[0])
        return first

    @staticmethod
    def _release_page_buffers(prepared: _Prepared) -> None:
        """Drop the per-page staged device operands once the page's prefill
        has been dispatched: the dispatched executable holds its own
        references, and `prepared` stays alive in the decode loop for the
        page's whole lifetime — without this, each active slot pins ~17 MB
        of HBM (pixel feed + prompt operands) it no longer needs."""
        prepared.staged = None
        prepared.staged_sfx = None
        for feed in prepared.image_feeds:
            feed["pix_dev"] = None
            feed["image_u8"] = None

    def decode_chunk(self, steps: Optional[int] = None) -> np.ndarray:
        """K decode steps for all active slots; blocks and returns (K, B)
        tokens. See decode_chunk_async for the non-blocking variant."""
        return self.decode_chunk_async(steps)()

    def decode_chunk_async(self, steps: Optional[int] = None):
        """Dispatch a decode chunk WITHOUT blocking on its tokens.

        JAX dispatch is asynchronous: the returned handles (and the engine's
        updated cache/state handles) exist immediately, so a caller can
        dispatch chunk k+1 against chunk k's output handles before reading
        chunk k's tokens — the host<->device round trip (readback + next
        dispatch, ~0.3 s/chunk over remote tunnels) hides behind device
        execution. Returns a zero-arg callable that materializes the tokens
        ((K, B) np.ndarray) when invoked."""
        steps = steps or self.ecfg.decode_chunk
        active = [i for i, free in enumerate(self.slot_free) if not free]
        use_sampling = any(self._slot_temp[i] > 0.0 for i in active)
        use_top_p = use_sampling and any(
            self._slot_top_p[i] < 1.0 for i in active)
        if os.environ.get("KARANTA_ATTEND_BUCKETS") == "1":
            needed = max((self._slot_len[i] for i in active),
                         default=0) + steps + 1
            attend_len = next(
                (b for b in self._attend_buckets if b >= needed),
                self.ecfg.max_seq_len)
        else:
            attend_len = self.ecfg.max_seq_len
        for i in active:
            self._slot_len[i] = min(self._slot_len[i] + steps,
                                    self.ecfg.max_seq_len - 1)
        use_guided = any(self._slot_guided[i] for i in active)
        use_logprobs = any(self._slot_logprobs.get(i, 0) >= 0
                           and self._slot_wants_lp.get(i, False)
                           for i in active)
        top_k = max([self._slot_logprobs.get(i, 0) for i in active
                     if self._slot_wants_lp.get(i, False)] or [0])
        if use_sampling:
            self._key, sub = jax.random.split(self._key)
        else:
            sub = self._key
        (self.cache, self.cache_len, self.next_pos, self.last_token,
         self.dfa_state, ys) = self._decode_chunk_jit(
            self.params, self.cache, self.cache_len, self.next_pos,
            self.last_token, self.temps, self.top_ps, self.dfa_state,
            self._allowed, self._next_state, sub, self.forced, steps=steps,
            use_top_p=use_top_p, use_sampling=use_sampling,
            attend_len=attend_len, use_logprobs=use_logprobs,
            top_k_logprobs=top_k, use_guided=use_guided,
            use_forced=self.ecfg.teacher_force)
        return lambda: self._collect_chunk(ys, use_logprobs)

    def decode_headroom(self, steps: int) -> bool:
        """True if every active slot can absorb `steps` more cache rows —
        the safety bound for dispatching a lookahead chunk."""
        active = [i for i, free in enumerate(self.slot_free) if not free]
        top = max((self._slot_len[i] for i in active), default=0)
        return top + steps + 1 < self.ecfg.max_seq_len

    def _collect_chunk(self, ys, use_logprobs: bool) -> np.ndarray:
        if use_logprobs:
            toks, chosen, top_vals, top_ids = ys
            self._last_logprobs = (np.asarray(chosen), np.asarray(top_vals),
                                   np.asarray(top_ids))
            return np.asarray(toks)
        self._last_logprobs = None
        return np.asarray(ys)  # (K, B)

    def free_slot(self, slot: int):
        self.slot_free[slot] = True
        self._slot_guided[slot] = False
        self._slot_regex[slot] = None
        self._slot_spec[slot] = True

    # ------------------------------------------------------------------

    def generate(self, requests: list[GenRequest]) -> list[GenResult]:
        """Synchronous batch generation (the server drives slots directly).

        Host-side request preparation (image decode/resize/layout planning)
        runs in a thread pool so it overlaps the device's decode chunks."""
        from concurrent.futures import ThreadPoolExecutor

        timing = os.environ.get("KARANTA_ENGINE_TIMING") == "1"
        tacc = {"prep_wait": 0.0, "prefill": 0.0, "insert": 0.0,
                "sync": 0.0, "decode": 0.0, "collect": 0.0, "total": 0.0,
                "prefills": 0, "chunks": 0}
        t_gen0 = time.perf_counter()

        results: dict[int, GenResult] = {}
        # size the pool to the host: on small (1-2 core) hosts extra decode
        # threads just thrash the GIL against the dispatch thread, which
        # showed up as ~0.3 s of added wall time per decode chunk
        n_prep = max(2, min(8, os.cpu_count() or 1))
        prep_pool = ThreadPoolExecutor(max_workers=n_prep)
        prep_futures: dict = {}
        pending = list(enumerate(requests))
        # prep ahead only a bounded window: each prepared page stages device
        # buffers (pixel feed ~12 MB), so prepping a whole large request list
        # upfront both floods HBM and burns host CPU the decode loop needs
        b = self.ecfg.max_batch_size
        prep_window = max(16, b + b // 2)  # active wave + half the next

        def top_up_prep():
            for idx, r in pending[:prep_window]:
                if idx not in prep_futures:
                    prep_futures[idx] = prep_pool.submit(self.prepare, r)

        top_up_prep()
        # slot -> (req_idx, prepared, collected tokens, start time, first token)
        active: dict[int, list] = {}
        # lookahead: collector for a decode chunk dispatched before the
        # previous chunk's tokens were read (admission waits until drained —
        # inserting into a slot the inflight chunk still writes would race)
        inflight = None

        while pending or active:
            top_up_prep()
            # Admission wave: dispatch prefill+insert for every free slot
            # WITHOUT syncing between pages, then read back all the first
            # tokens at once. The per-page dispatch->sync round trip was
            # ~78 ms/page over the remote-TPU tunnel (device exec is 163 ms)
            # — batching the syncs collapses it to one wait per wave.
            wave: list[tuple] = []
            free_count = sum(self.slot_free) if inflight is None else 0
            partial: dict = {}
            pb = max(1, self.ecfg.prefill_batch)

            def dispatch_single(req_idx, prepared, start):
                slot = self.slot_free.index(True)
                t0 = time.perf_counter()
                first = self.prefill_insert(slot, prepared)
                tacc["prefill"] += time.perf_counter() - t0
                tacc["prefills"] += 1
                wave.append((req_idx, prepared, slot, start, first))

            def dispatch_batch(chunk):
                slots = [i for i, f in enumerate(self.slot_free)
                         if f][: len(chunk)]
                t0 = time.perf_counter()
                firsts = self.prefill_insert_batch(
                    [p for _, p, _ in chunk], slots)
                tacc["prefill"] += time.perf_counter() - t0
                tacc["prefills"] += len(chunk)
                for i, (req_idx, prepared, start) in enumerate(chunk):
                    wave.append((req_idx, prepared, slots[i], start,
                                 firsts[i]))

            # stream dispatches: a full group (or an unbatchable page) goes
            # to the device immediately, so later pages' host prep overlaps
            # earlier pages' prefill instead of idling the chip
            deferred: list[tuple] = []
            while pending and free_count > 0:
                req_idx, request = pending.pop(0)
                if (request.guided_regex
                        and not self.guided_available(request.guided_regex)):
                    # a different regex has live slots: hold this request
                    # until they drain rather than dropping the constraint
                    deferred.append((req_idx, request))
                    continue
                t0 = time.perf_counter()
                if req_idx not in prep_futures:
                    prep_futures[req_idx] = prep_pool.submit(
                        self.prepare, request)
                prepared = prep_futures[req_idx].result()
                tacc["prep_wait"] += time.perf_counter() - t0
                # keep prompt + completion within the cache
                prepared.max_tokens = min(
                    prepared.max_tokens,
                    max(1, self.ecfg.max_seq_len - len(prepared.ids) - 1))
                free_count -= 1
                entry = (req_idx, prepared, time.time())
                key = self._batch_key(prepared) if pb > 1 else None
                if key is None:
                    dispatch_single(*entry)
                    continue
                group = partial.setdefault(key, [])
                group.append(entry)
                if len(group) >= pb:
                    dispatch_batch(group)
                    partial[key] = []
            # leftovers below pb run per-page (a partial-K batch would
            # compile its own executable for little gain)
            for group in partial.values():
                for entry in group:
                    dispatch_single(*entry)
            if deferred:
                pending = deferred + pending
            t0 = time.perf_counter()
            for req_idx, prepared, slot, start, first in wave:
                first_host = int(np.asarray(first))
                collected = [first_host]
                lp = ([self._first_logprob.pop(prepared.request_id, None)]
                      if prepared.logprobs else None)
                if (first_host == self.tok.eos_token_id
                        or prepared.max_tokens <= 1):
                    reason = ("stop" if first_host == self.tok.eos_token_id
                              else "length")
                    results[req_idx] = self._finish(
                        prepared, collected, reason, start, lp)
                    self.free_slot(slot)
                else:
                    active[slot] = [req_idx, prepared, collected, start, lp]
            if wave:
                tacc["sync"] += time.perf_counter() - t0

            if not active:
                if inflight is not None:
                    inflight()  # every slot finished via eos: drain + discard
                    inflight = None
                continue

            t0 = time.perf_counter()
            if inflight is not None and self._spec_ok():
                # slot mix changed under the inflight chunk: drain it through
                # the normal path before switching to speculative decode
                toks = inflight()
                inflight = None
                emitted = {slot: [int(t) for t in toks[:, slot]]
                           for slot in active}
            elif self._spec_ok():
                spec_toks, spec_counts = self.decode_chunk_spec()
                emitted = self.spec_emissions(spec_toks, spec_counts, {
                    slot: active[slot][1].max_tokens - len(active[slot][2])
                    for slot in active})
            else:
                steps = self.ecfg.decode_chunk
                collect = inflight if inflight is not None \
                    else self.decode_chunk_async()
                inflight = None
                # Dispatch the NEXT chunk before blocking on this one when
                # every active slot still needs more than `steps` tokens (so
                # another chunk is required regardless, barring eos) and the
                # cache has headroom: the readback + host turnaround
                # (~0.3 s/chunk over remote tunnels) then hides behind the
                # device executing chunk k+1.
                min_remaining = min(
                    (st[1].max_tokens - len(st[2]) for st in active.values()),
                    default=0)
                if min_remaining > steps and self.decode_headroom(steps):
                    inflight = self.decode_chunk_async()
                toks = collect()  # (K, B)
                emitted = {slot: [int(t) for t in toks[:, slot]]
                           for slot in active}
            tacc["decode"] += time.perf_counter() - t0
            tacc["chunks"] += 1
            t0 = time.perf_counter()
            lp_data = self._last_logprobs
            for slot in list(active):
                req_idx, prepared, collected, start, lp = active[slot]
                finished = None
                for j, token in enumerate(emitted[slot]):
                    collected.append(token)
                    if lp is not None and lp_data is not None:
                        chosen, tv, ti = lp_data
                        k = prepared.top_logprobs
                        lp.append((float(chosen[j, slot]),
                                   list(zip(ti[j, slot, :k].tolist(),
                                            tv[j, slot, :k].tolist()))))
                    if token == self.tok.eos_token_id:
                        finished = "stop"
                        break
                    if len(collected) >= prepared.max_tokens:
                        finished = "length"
                        break
                if finished:
                    results[req_idx] = self._finish(
                        prepared, collected, finished, start, lp)
                    del active[slot]
                    self.free_slot(slot)
            tacc["collect"] += time.perf_counter() - t0

        prep_pool.shutdown(wait=False)
        if timing:
            tacc["total"] = time.perf_counter() - t_gen0
            other = tacc["total"] - sum(
                tacc[k] for k in ("prep_wait", "prefill", "insert", "sync",
                                  "decode", "collect"))
            logger.warning(
                "engine timing: total %.2fs | prep_wait %.2fs | prefill "
                "%.2fs (%d, %.0f ms each) | insert %.2fs | sync %.2fs | "
                "decode %.2fs (%d chunks, %.0f ms each) | collect %.2fs | "
                "other %.2fs",
                tacc["total"], tacc["prep_wait"], tacc["prefill"],
                tacc["prefills"],
                tacc["prefill"] / max(tacc["prefills"], 1) * 1e3,
                tacc["insert"], tacc["sync"], tacc["decode"], tacc["chunks"],
                tacc["decode"] / max(tacc["chunks"], 1) * 1e3,
                tacc["collect"], other)
        return [results[i] for i in range(len(requests))]

    def _finish(self, prepared: _Prepared, collected: list[int],
                reason: str, start: float,
                logprobs: Optional[list] = None) -> GenResult:
        out_ids = [t for t in collected if t != self.tok.eos_token_id]
        if logprobs is not None:
            logprobs = [x for t, x in zip(collected, logprobs)
                        if t != self.tok.eos_token_id][: len(out_ids)]
        return GenResult(
            request_id=prepared.request_id,
            text=self.tok.decode(out_ids),
            token_ids=out_ids,
            finish_reason=reason,
            prompt_tokens=int(len(prepared.ids)),
            completion_tokens=len(collected),
            latency_s=time.time() - start,
            logprobs=logprobs,
        )
