"""Real-chip LoRA training-step throughput (ROADMAP completeness item).

Measures the production inline-LoRA train step (training/lora.py
make_lora_train_step) on the 3B preset, text-only batches, on whatever
chip jax gives us. Text-only keeps the measurement about the train step
itself — the host-side data pipeline on this 1-core host would otherwise
dominate and obscure the device number.

Memory budget at the default point (3B bf16 base 6.2 GB + rank-16
factors + Adam moments ~0.1 GB): remat keeps activations per layer
instead of per op, so B1/S2048 fits the 16 GB chip.

Usage: python scratch/train_meas.py [--seq 2048] [--batch 1] [--steps 5]
       [--preset qwen2.5-vl-3b] [--rank 16] [--no-remat]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="qwen2.5-vl-3b")
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--rank", type=int, default=16)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--trace", default=None,
                   help="write a jax.profiler trace of 2 warm steps here")
    p.add_argument("--ce-chunk", dest="ce_chunk", type=int, default=512,
                   help="chunked-CE tokens per scan chunk (per ROW; the "
                        "fp32 logits transient is B*chunk*vocab)")
    p.add_argument("--vision", action="store_true",
                   help="one 1288px-longest page image per row (the "
                        "reference's training render dim), anchor prompt + "
                        "image span + trained completion")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from karanta_tpu.models.qwen25_vl.config import get_config
    from karanta_tpu.models.qwen25_vl.model import init_params
    from karanta_tpu.training.lora import (
        init_lora_params, make_lora_train_step, trainable_lora,
    )
    from karanta_tpu.training.train_step import create_train_state

    cfg = get_config(args.preset)
    print(f"devices: {jax.devices()}")
    print(f"preset={args.preset} B={args.batch} S={args.seq} "
          f"rank={args.rank} remat={not args.no_remat}")

    t0 = time.time()
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init 3B params: {time.time() - t0:.1f}s")

    lora = init_lora_params(params, args.rank, jax.random.PRNGKey(1))
    opt = optax.adamw(1e-4)
    state = create_train_state(trainable_lora(lora), opt)
    step = jax.jit(make_lora_train_step(cfg, opt,
                                        remat=not args.no_remat,
                                        ce_chunk=args.ce_chunk))

    rng = np.random.default_rng(0)
    B, S = args.batch, args.seq
    n_windows = 0
    if args.vision:
        from karanta_tpu.models.qwen25_vl.layout import mrope_positions
        from karanta_tpu.ops.image_prep import plan_image
        from karanta_tpu.training.data import DataCollator

        # one US-letter-ish page rendered at 1288 px longest side
        plan = plan_image(1288, 996)
        n_img = plan.num_merged_tokens
        prompt_len, completion_len = 600, 700
        n = prompt_len + n_img + completion_len
        ids = rng.integers(0, cfg.text.vocab_size, n)
        ids[prompt_len:prompt_len + n_img] = cfg.image_token_id
        labels = np.full(n, -100, np.int64)
        labels[prompt_len + n_img:] = ids[prompt_len + n_img:]
        pos = mrope_positions(ids, [(1, plan.grid_h, plan.grid_w)],
                              cfg.image_token_id)
        sample = {
            "input_ids": ids, "labels": labels, "positions": pos,
            "plan": plan, "image_start": prompt_len,
            "image_u8": rng.integers(
                0, 255, (plan.resized_h, plan.resized_w, 3), np.uint8),
        }
        collator = DataCollator(vision_cfg=cfg.vision)
        np_batch = collator([sample] * B)
        n_windows = np_batch.pop("n_windows")
        batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
        print(f"vision: grid {plan.grid_h}x{plan.grid_w} pad "
              f"{plan.pad_grid_h}x{plan.pad_grid_w}, {n_img} image tokens, "
              f"seq {n} -> bucket {batch['token_ids'].shape[1]}, "
              f"n_windows {n_windows}")
        S = batch["token_ids"].shape[1]
        step = jax.jit(make_lora_train_step(cfg, opt,
                                            remat=not args.no_remat,
                                            n_windows=n_windows,
                                            ce_chunk=args.ce_chunk))
    else:
        token_ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, S)),
                                jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
        # mask the first 25% as prompt (label -100), train on the rest
        labels = jnp.where(jnp.arange(S)[None, :] < S // 4, -100, token_ids)
        batch = {"token_ids": token_ids, "positions": positions,
                 "labels": labels}

    t0 = time.time()
    state, metrics = step(state, params, lora, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+step0: {time.time() - t0:.1f}s  "
          f"loss={float(metrics['loss']):.4f}")

    times = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step(state, params, lora, batch)
        jax.block_until_ready(metrics["loss"])
        times.append(time.time() - t0)
        print(f"step {i + 1}: {times[-1] * 1e3:.0f} ms  "
              f"loss={float(metrics['loss']):.4f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(2):
                state, metrics = step(state, params, lora, batch)
                jax.block_until_ready(metrics["loss"])
        print(f"trace written to {args.trace} (parse with "
              "scripts/parse_trace.py)")

    best = min(times)
    med = sorted(times)[len(times) // 2]
    tok_s = B * S / best
    print(f"best {best * 1e3:.0f} ms/step, median {med * 1e3:.0f} ms — "
          f"{tok_s:,.0f} tokens/s/chip (B{B} S{S})")


if __name__ == "__main__":
    main()
