"""Page-image preprocessing: resize planning + on-device normalize/patchify.

TPU-native replacement for the host-side PIL/AutoProcessor image path of the
reference (karanta/data/utils.py:186-225 base64_to_grayscale; HF processor
inside vLLM). Design:

  - `smart_resize` reproduces Qwen-VL's resizing rule (dims divisible by 28,
    pixel budget clamped) so token counts match the reference engine.
  - The host resizes the decoded page (PIL, bicubic) — pure I/O-side work —
    and hands a uint8 HxWx3 array to the device.
  - `patchify` runs jitted on device: rescale, CLIP-normalize, optional
    grayscale, and reshape into Qwen-VL `pixel_values` layout
    (seq = t*h*w patches grouped in 2x2 merge units; features =
    C*T*patch*patch = 1176). Shapes are padded to static grid buckets so XLA
    compiles once per bucket; padded tokens carry a mask consumed by the
    vision encoder.

Feature layout matches the HF Qwen2-VL image processor exactly
(sequence order (t, h_block, w_block, merge_h, merge_w); feature order
(C, T, patch_h, patch_w)) so converted checkpoints see identical inputs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants (HF image processor defaults).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

PATCH_SIZE = 14
MERGE_SIZE = 2
TEMPORAL_PATCH_SIZE = 2
FACTOR = PATCH_SIZE * MERGE_SIZE  # 28
MIN_PIXELS = 56 * 56
MAX_PIXELS = 14 * 14 * 4 * 1280

# Grid buckets (in pre-merge patches per side, multiples of the 8-patch
# window); padded grids compile once each.
GRID_BUCKETS = (8, 16, 24, 32, 48, 64, 80, 96, 112, 128)


def smart_resize(height: int, width: int, factor: int = FACTOR,
                 min_pixels: int = MIN_PIXELS,
                 max_pixels: int = MAX_PIXELS) -> tuple[int, int]:
    """Qwen-VL resize rule: dims divisible by factor, pixel budget respected."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def bucket_side(patches: int) -> int:
    for b in GRID_BUCKETS:
        if patches <= b:
            return b
    raise ValueError(f"Image grid side {patches} exceeds largest bucket")


@dataclasses.dataclass(frozen=True)
class ImagePlan:
    """Host-side layout plan for one image."""

    resized_h: int          # pixels after smart_resize
    resized_w: int
    grid_h: int             # pre-merge patches
    grid_w: int
    pad_grid_h: int         # bucketed (static) grid
    pad_grid_w: int

    @property
    def grid_thw(self) -> tuple[int, int, int]:
        return (1, self.grid_h, self.grid_w)

    @property
    def num_tokens(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def num_merged_tokens(self) -> int:
        return (self.grid_h // MERGE_SIZE) * (self.grid_w // MERGE_SIZE)

    @property
    def pad_tokens(self) -> int:
        return self.pad_grid_h * self.pad_grid_w


def plan_image(height: int, width: int,
               min_pixels: int = MIN_PIXELS,
               max_pixels: int = MAX_PIXELS) -> ImagePlan:
    rh, rw = smart_resize(height, width, FACTOR, min_pixels, max_pixels)
    gh, gw = rh // PATCH_SIZE, rw // PATCH_SIZE
    return ImagePlan(rh, rw, gh, gw, bucket_side(gh), bucket_side(gw))


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w", "pad_grid_h",
                                             "pad_grid_w", "grayscale", "out_dtype"))
def patchify(image_u8: jnp.ndarray, *, grid_h: int, grid_w: int,
             pad_grid_h: int, pad_grid_w: int, grayscale: bool = False,
             out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 (grid_h*14, grid_w*14, 3) -> pixel_values (pad_seq, 1176).

    Padded tokens (beyond grid_h/grid_w) are zero; callers mask them.
    """
    x = image_u8.astype(jnp.float32) / 255.0
    ph, pw = pad_grid_h * PATCH_SIZE, pad_grid_w * PATCH_SIZE
    x = jnp.pad(x, ((0, ph - x.shape[0]), (0, pw - x.shape[1]), (0, 0)))
    return _patchify_core(x, valid_h=grid_h * PATCH_SIZE,
                          valid_w=grid_w * PATCH_SIZE,
                          pad_grid_h=pad_grid_h, pad_grid_w=pad_grid_w,
                          grayscale=grayscale, out_dtype=out_dtype)


def _patchify_core(x: jnp.ndarray, *, valid_h: int, valid_w: int,
                   pad_grid_h: int, pad_grid_w: int,
                   grayscale: bool, out_dtype) -> jnp.ndarray:
    """float [0,1] pixels (pad_grid_h*14, pad_grid_w*14, 3) -> (pad_seq, 1176).

    Pixels at/beyond (valid_h, valid_w) are forced to exactly zero AFTER
    normalization, preserving the zero-padded-feature contract for tokens
    the vision mask drops."""
    if grayscale:
        luma = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        x = jnp.stack([luma, luma, luma], axis=-1)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = (x - mean) / std
    if valid_h < x.shape[0] or valid_w < x.shape[1]:
        row_ok = (jnp.arange(x.shape[0]) < valid_h)[:, None, None]
        col_ok = (jnp.arange(x.shape[1]) < valid_w)[None, :, None]
        x = jnp.where(row_ok & col_ok, x, 0.0)

    # HWC -> (C, gh//2, 2, 14, gw//2, 2, 14)
    x = x.transpose(2, 0, 1)
    x = x.reshape(3, pad_grid_h // MERGE_SIZE, MERGE_SIZE, PATCH_SIZE,
                  pad_grid_w // MERGE_SIZE, MERGE_SIZE, PATCH_SIZE)
    # -> (gh//2, gw//2, merge_h, merge_w, C, patch_h, patch_w)
    x = x.transpose(1, 4, 2, 5, 0, 3, 6)
    x = x.reshape(pad_grid_h * pad_grid_w, 3 * PATCH_SIZE * PATCH_SIZE)
    # temporal duplication (T=2 for still images: frame repeated)
    x = _temporal_expand(x)
    return x.astype(out_dtype)


def _temporal_expand(x: jnp.ndarray) -> jnp.ndarray:
    """(seq, C*P*P) -> (seq, C*T*P*P) with the frame repeated T times.

    Feature order must be (C, T, P, P): insert the T axis after C.
    """
    seq = x.shape[0]
    x = x.reshape(seq, 3, 1, PATCH_SIZE, PATCH_SIZE)
    x = jnp.broadcast_to(x, (seq, 3, TEMPORAL_PATCH_SIZE, PATCH_SIZE, PATCH_SIZE))
    return x.reshape(seq, 3 * TEMPORAL_PATCH_SIZE * PATCH_SIZE * PATCH_SIZE)


# Source-pixel buckets for the on-device resize path: decoded pages are
# zero-padded per side to one of these so each (src bucket, grid) pair
# compiles once. Pages beyond the largest bucket fall back to host resize.
SRC_PX_BUCKETS = (448, 896, 1344, 1792, 2240, 2688, 3136, 3584, 4032)


def src_px_bucket(px: int) -> int | None:
    for b in SRC_PX_BUCKETS:
        if px <= b:
            return b
    return None


def _cubic_kernel(x: jnp.ndarray) -> jnp.ndarray:
    """Keys bicubic, a = -0.5 (PIL's BICUBIC filter)."""
    ax = jnp.abs(x)
    return jnp.where(
        ax < 1.0, (1.5 * ax - 2.5) * ax * ax + 1.0,
        jnp.where(ax < 2.0, ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0, 0.0))


def _resample_matrix(n_src: int, n_dst: int, src_valid, dst_valid: int):
    """(n_src, n_dst) f32 resampling matrix, column j = filter taps for
    output pixel j. Reproduces PIL's resampling scheme: antialiased kernel
    (support scaled by the downscale factor), edge taps clipped to the valid
    source range and renormalized. src_valid is traced, so one executable
    serves every true source size within the bucket."""
    scale = src_valid / dst_valid                     # traced f32
    fscale = jnp.maximum(scale, 1.0)                  # antialias on downscale
    centers = (jnp.arange(n_dst, dtype=jnp.float32) + 0.5) * scale - 0.5
    i = jnp.arange(n_src, dtype=jnp.float32)
    w = _cubic_kernel((i[:, None] - centers[None, :]) / fscale)
    w = jnp.where(i[:, None] < src_valid, w, 0.0)     # clip to valid source
    return w / jnp.maximum(jnp.abs(w.sum(0, keepdims=True)), 1e-6)


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w", "pad_grid_h",
                                             "pad_grid_w", "grayscale",
                                             "out_dtype"))
def resize_patchify(src_u8: jnp.ndarray, src_h, src_w, *, grid_h: int,
                    grid_w: int, pad_grid_h: int, pad_grid_w: int,
                    grayscale: bool = False,
                    out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Decoded page -> pixel_values entirely on device.

    src_u8 is the raw decoded image zero-padded to (src_bucket_h,
    src_bucket_w, 3); src_h/src_w are its true (traced) dimensions. The
    bicubic resize runs as two dense resampling matmuls on the MXU
    (microseconds) instead of PIL on the host (~60 ms/page on one core —
    the dominant prepare() cost), then feeds the normalize/patchify core.
    Replaces preprocess_host + patchify on the serving hot path (SURVEY.md
    §7.2's device-side preprocessing design; reference host path:
    karanta/data/process_pdf_utils.py:50-75 + HF processor inside vLLM)."""
    x = src_u8.astype(jnp.float32)
    rh, rw = grid_h * PATCH_SIZE, grid_w * PATCH_SIZE
    wh = _resample_matrix(x.shape[0], pad_grid_h * PATCH_SIZE,
                          jnp.asarray(src_h, jnp.float32), rh)  # (SBH, ph)
    ww = _resample_matrix(x.shape[1], pad_grid_w * PATCH_SIZE,
                          jnp.asarray(src_w, jnp.float32), rw)  # (SBW, pw)
    # PIL resamples horizontally first and stores the intermediate as uint8;
    # reproduce both (the round/clip between passes bounds bicubic overshoot
    # exactly the way PIL does)
    y = jnp.einsum("wt,swc->stc", ww, x, precision="highest")
    y = jnp.clip(jnp.round(y), 0.0, 255.0)
    y = jnp.einsum("sd,swc->dwc", wh, y, precision="highest")
    y = jnp.clip(jnp.round(y), 0.0, 255.0) / 255.0    # PIL emits uint8
    return _patchify_core(y, valid_h=rh, valid_w=rw, pad_grid_h=pad_grid_h,
                          pad_grid_w=pad_grid_w, grayscale=grayscale,
                          out_dtype=out_dtype)


def preprocess_host(image: "np.ndarray | object",
                    min_pixels: int = MIN_PIXELS,
                    max_pixels: int = MAX_PIXELS) -> tuple[np.ndarray, ImagePlan]:
    """Resize a decoded image (np array or PIL.Image) per the plan (host side).

    Returns (uint8 array of shape (resized_h, resized_w, 3), plan).
    """
    from PIL import Image  # lazy: PIL is host-side only

    if isinstance(image, np.ndarray):
        pil = Image.fromarray(image)
    else:
        pil = image
    if pil.mode != "RGB":
        pil = pil.convert("RGB")
    plan = plan_image(pil.height, pil.width, min_pixels, max_pixels)
    resized = pil.resize((plan.resized_w, plan.resized_h), Image.Resampling.BICUBIC)
    return np.asarray(resized, dtype=np.uint8), plan
