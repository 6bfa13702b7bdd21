"""HF checkpoint conversion: Qwen2.5-VL safetensors/state-dict -> our pytree.

Accepts both the modern transformers layout (model.visual.*,
model.language_model.*) and the original hub layout (visual.*, model.*).
The reference obtains weights through vLLM/transformers directly
(karanta/pipeline.py:916-952 download_model); here we convert once into the
stacked-layer layout the scan-based decoder expects.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from karanta_tpu.models.qwen25_vl.config import VLMConfig

Array = np.ndarray


def _normalize_key(key: str) -> str:
    """Map any known naming scheme onto model.visual.* / model.language_model.*"""
    if key.startswith("visual."):
        return "model." + key
    if key.startswith("model.visual.") or key.startswith("model.language_model."):
        return key
    if key == "lm_head.weight":
        return key
    if key.startswith("model."):
        return "model.language_model." + key[len("model."):]
    return key


def _to_np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        import torch  # noqa: F401
        if hasattr(t, "detach"):
            t = t.detach()
            if t.dtype == __import__("torch").bfloat16:
                t = t.float()
            return t.cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def convert_state_dict(state: Mapping[str, Any], cfg: VLMConfig,
                       dtype=jnp.bfloat16,
                       quantize: str | None = None) -> Dict[str, Any]:
    """Convert an HF state dict (torch tensors or numpy) to our param pytree.

    quantize="int8" quantizes the decoder matmul stacks leaf-by-leaf AS they
    transfer: device peak stays at one bf16 stack + its int8 copy. The
    naive load-then-quantize path keeps the full bf16 decoder alive next to
    the int8 copies (~22 GB for the 7B) and OOMs a 16 GB chip.
    """
    sd = {_normalize_key(k): v for k, v in state.items()}

    def get(key: str) -> Array:
        return _to_np(sd[key])

    def lin(key: str) -> Array:  # torch Linear weight (out, in) -> (in, out)
        return get(key).T

    v = cfg.vision
    t = cfg.text
    h = v.hidden_size

    def vstack(fn: Callable[[int], Array]) -> jnp.ndarray:
        return jnp.asarray(np.stack([fn(i) for i in range(v.depth)]), dtype)

    def tstack(fn: Callable[[int], Array]) -> jnp.ndarray:
        return jnp.asarray(np.stack([fn(i) for i in range(t.num_layers)]), dtype)

    def tstack_q(fn: Callable[[int], Array]):
        """Decoder matmul stack: quantized on transfer when requested."""
        stacked = np.stack([fn(i) for i in range(t.num_layers)])
        if quantize == "int8":
            from karanta_tpu.ops.quantization import quantize_weight

            return quantize_weight(jnp.asarray(stacked, dtype))
        return jnp.asarray(stacked, dtype)

    def _q(arr: np.ndarray):
        if quantize == "int8":
            from karanta_tpu.ops.quantization import quantize_weight

            return quantize_weight(jnp.asarray(arr, dtype))
        return jnp.asarray(arr, dtype)

    vb = "model.visual.blocks.{}."

    def qkv_w(i: int, part: int) -> Array:
        w = get(vb.format(i) + "attn.qkv.weight")  # (3h, h)
        return w[part * h:(part + 1) * h].T

    def qkv_b(i: int, part: int) -> Array:
        b = get(vb.format(i) + "attn.qkv.bias")
        return b[part * h:(part + 1) * h]

    if v.mlp_type == "gated":
        vision_mlp = {
            "gate": vstack(lambda i: lin(vb.format(i) + "mlp.gate_proj.weight")),
            "gate_b": vstack(lambda i: get(vb.format(i) + "mlp.gate_proj.bias")),
            "up": vstack(lambda i: lin(vb.format(i) + "mlp.up_proj.weight")),
            "up_b": vstack(lambda i: get(vb.format(i) + "mlp.up_proj.bias")),
            "down": vstack(lambda i: lin(vb.format(i) + "mlp.down_proj.weight")),
            "down_b": vstack(lambda i: get(vb.format(i) + "mlp.down_proj.bias")),
        }
    else:  # Qwen2-VL plain MLP
        vision_mlp = {
            "fc1": vstack(lambda i: lin(vb.format(i) + "mlp.fc1.weight")),
            "fc1_b": vstack(lambda i: get(vb.format(i) + "mlp.fc1.bias")),
            "fc2": vstack(lambda i: lin(vb.format(i) + "mlp.fc2.weight")),
            "fc2_b": vstack(lambda i: get(vb.format(i) + "mlp.fc2.bias")),
        }

    visual = {
        "patch_embed": {
            # Conv3d weight (out, C, T, P, P) -> (C*T*P*P, out); feature order
            # (C, T, P, P) matches ops/image_prep.patchify.
            "kernel": jnp.asarray(
                get("model.visual.patch_embed.proj.weight")
                .reshape(h, -1).T, dtype),
        },
        "blocks": {
            "norm1": vstack(lambda i: get(vb.format(i) + "norm1.weight")),
            "norm2": vstack(lambda i: get(vb.format(i) + "norm2.weight")),
            "attn": {
                "wq": vstack(lambda i: qkv_w(i, 0)),
                "bq": vstack(lambda i: qkv_b(i, 0)),
                "wk": vstack(lambda i: qkv_w(i, 1)),
                "bk": vstack(lambda i: qkv_b(i, 1)),
                "wv": vstack(lambda i: qkv_w(i, 2)),
                "bv": vstack(lambda i: qkv_b(i, 2)),
                "wo": vstack(lambda i: lin(vb.format(i) + "attn.proj.weight")),
                "bo": vstack(lambda i: get(vb.format(i) + "attn.proj.bias")),
            },
            "mlp": vision_mlp,
        },
        "merger": {
            "ln_q": jnp.asarray(get("model.visual.merger.ln_q.weight"), dtype),
            "w1": jnp.asarray(lin("model.visual.merger.mlp.0.weight"), dtype),
            "b1": jnp.asarray(get("model.visual.merger.mlp.0.bias"), dtype),
            "w2": jnp.asarray(lin("model.visual.merger.mlp.2.weight"), dtype),
            "b2": jnp.asarray(get("model.visual.merger.mlp.2.bias"), dtype),
        },
    }
    if v.norm_type == "layernorm":
        visual["blocks"]["norm1_b"] = vstack(
            lambda i: get(vb.format(i) + "norm1.bias"))
        visual["blocks"]["norm2_b"] = vstack(
            lambda i: get(vb.format(i) + "norm2.bias"))
        visual["merger"]["ln_q_b"] = jnp.asarray(
            get("model.visual.merger.ln_q.bias"), dtype)

    tb = "model.language_model.layers.{}."
    text = {
        "embed": jnp.asarray(get("model.language_model.embed_tokens.weight"), dtype),
        "layers": {
            "ln1": tstack(lambda i: get(tb.format(i) + "input_layernorm.weight")),
            "ln2": tstack(lambda i: get(tb.format(i) + "post_attention_layernorm.weight")),
            "attn": {
                "wq": tstack_q(lambda i: lin(tb.format(i) + "self_attn.q_proj.weight")),
                "bq": tstack(lambda i: get(tb.format(i) + "self_attn.q_proj.bias")),
                "wk": tstack_q(lambda i: lin(tb.format(i) + "self_attn.k_proj.weight")),
                "bk": tstack(lambda i: get(tb.format(i) + "self_attn.k_proj.bias")),
                "wv": tstack_q(lambda i: lin(tb.format(i) + "self_attn.v_proj.weight")),
                "bv": tstack(lambda i: get(tb.format(i) + "self_attn.v_proj.bias")),
                "wo": tstack_q(lambda i: lin(tb.format(i) + "self_attn.o_proj.weight")),
            },
            "mlp": {
                "gate": tstack_q(lambda i: lin(tb.format(i) + "mlp.gate_proj.weight")),
                "up": tstack_q(lambda i: lin(tb.format(i) + "mlp.up_proj.weight")),
                "down": tstack_q(lambda i: lin(tb.format(i) + "mlp.down_proj.weight")),
            },
        },
        "final_norm": jnp.asarray(get("model.language_model.norm.weight"), dtype),
    }
    if not t.tie_word_embeddings:
        text["lm_head"] = _q(lin("lm_head.weight"))
    elif quantize == "int8":
        # tied embeddings: per-step logits matmul served off an int8 table
        # (hidden, vocab) = embed transposed, matching quantize_decoder_params
        text["logits_head"] = _q(
            get("model.language_model.embed_tokens.weight").T)

    return {"visual": visual, "text": text}


def load_hf_checkpoint(path: str, cfg: VLMConfig, dtype=jnp.bfloat16,
                       quantize: str | None = None):
    """Load all *.safetensors under `path` and convert.

    quantize="int8": decoder matmuls quantize on transfer (see
    convert_state_dict) — required to fit 7B-class checkpoints on a 16 GB
    chip; callers must then construct the Engine with quantize=None.
    """
    from safetensors import safe_open

    state: Dict[str, Array] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"No safetensors files under {path}")
    for file in files:
        with safe_open(file, framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return convert_state_dict(state, cfg, dtype, quantize=quantize)
