"""Qwen2.5-VL composite model: vision encoder + text decoder glue.

The serving engine and trainer drive these functions; this module owns
parameter assembly, multimodal embedding merge, and the jit-friendly
end-to-end forward used for training and compile checks.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from karanta_tpu.models.qwen25_vl import decoder as dec
from karanta_tpu.models.qwen25_vl import vision as vis
from karanta_tpu.models.qwen25_vl.config import VLMConfig

Params = Any


def init_params(cfg: VLMConfig, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "visual": vis.init_vision_params(cfg.vision, kv, dtype),
        "text": dec.init_decoder_params(cfg.text, kt, dtype),
    }


def param_axes(cfg: VLMConfig) -> Params:
    return {
        "visual": vis.vision_param_axes(cfg.vision),
        "text": dec.decoder_param_axes(cfg.text),
    }


def merge_image_embeddings(token_embeds: jnp.ndarray,     # (S, hidden)
                           image_tokens: jnp.ndarray,     # (N_pad, hidden)
                           positions: jnp.ndarray,        # (N_pad,) int32
                           ) -> jnp.ndarray:
    """Scatter vision tokens into the text embedding at image-token positions.

    Padded entries must carry positions >= S; scatter mode 'drop' ignores them.
    """
    return token_embeds.at[positions].set(
        image_tokens.astype(token_embeds.dtype), mode="drop")


def forward_train(params: Params, cfg: VLMConfig,
                  token_ids: jnp.ndarray,        # (B, S)
                  positions: jnp.ndarray,        # (3, B, S)
                  pixel_values: Optional[jnp.ndarray] = None,   # (B, T_pad, 1176)
                  vis_perm: Optional[jnp.ndarray] = None,       # (B, T_pad)
                  vis_valid: Optional[jnp.ndarray] = None,      # (B, T_pad)
                  vis_pos_hw: Optional[jnp.ndarray] = None,     # (B, T_pad, 2)
                  vis_extract: Optional[jnp.ndarray] = None,    # (B, N_pad)
                  image_positions: Optional[jnp.ndarray] = None,  # (B, N_pad)
                  n_windows: int = 0,
                  attn_mask: Optional[jnp.ndarray] = None,      # (B, S)
                  remat: bool = False,
                  return_hidden: bool = False,
                  attn_impl: Optional[Any] = None,
                  pp_mesh: Optional[Any] = None,
                  pp_micro: int = 1,
                  ) -> jnp.ndarray:
    """Teacher-forced forward over full sequences. Returns logits (B, S, V),
    or the post-final-norm hidden states (B, S, H) when return_hidden=True
    (the chunked-CE loss computes per-chunk logits itself so the full
    (B, S, vocab) tensor never materializes).

    All vision tensors are padded to one static bucket per batch; per-image
    layout arrays come from the host planner (layout.py).

    remat=True checkpoints the decoder's per-layer scan body and the
    per-image vision encode (gradient checkpointing — reference semantics:
    ocr_training.py gradient_checkpointing_enable).
    """
    embeds = jax.vmap(lambda ids: dec.embed_tokens(params["text"], ids))(token_ids)

    if pixel_values is not None:
        def encode_one(pix, perm, valid, pos_hw, extract, img_pos, emb):
            # trainable=True: differentiable window attention (forward_train
            # is the training/eval entry; the serving engine calls
            # encode_image directly with the faster non-AD kernel path).
            # remat checkpoints per vision block inside encode_image — a
            # checkpoint around this whole function would still hold all
            # depth blocks' residuals during the replayed backward.
            # Run the tower in the compute dtype: the collator ships f32
            # pixels, and f32 activations halve the MXU rate and blow the
            # window kernel's VMEM budget (serving preps bf16 on device).
            enc = vis.encode_image(params["visual"], cfg.vision,
                                   pix.astype(emb.dtype),
                                   perm, valid, pos_hw, n_windows,
                                   trainable=True, remat=remat)
            tokens = jnp.take(enc, extract, axis=0)
            return merge_image_embeddings(emb, tokens, img_pos)

        embeds = jax.vmap(encode_one)(
            pixel_values, vis_perm, vis_valid, vis_pos_hw, vis_extract,
            image_positions, embeds)

    if pp_mesh is not None:
        # pipeline-parallel decoder stack (parallel/pipeline.py): stages own
        # L/n layers, microbatches stream via ppermute. attn_impl (context
        # parallelism) does not compose with PP — see pipeline.py docstring.
        hidden = dec.pipeline_prefill_forward(
            params["text"], cfg.text, embeds, positions, pp_mesh,
            n_micro=pp_micro, kv_mask=attn_mask, remat=remat)
    else:
        hidden, _ = dec.prefill_forward(params["text"], cfg.text, embeds,
                                        positions, kv_mask=attn_mask,
                                        remat=remat, attn_impl=attn_impl)
    if return_hidden:
        return hidden
    return dec.logits_from_hidden(params["text"], cfg.text, hidden)
