"""Real-chip FULL-parameter fine-tune throughput with Muon (ROADMAP
completeness item: the round-2 verdict noted Muon had correctness tests
but no measured run, and no full fine-tune had ever been measured).

The 3B/7B presets cannot full-fine-tune on one 16 GB v5e (3B needs
params 6.2 + f32 Adam moments 24.8 GB even before activations — the
reference's own 4xGPU DeepSpeed setup exists for the same reason), so
this measures the largest preset that fits: qwen2-vl-2b (~2.1 B params).
Muon keeps one momentum tree in the param dtype (bf16, 4.2 GB) instead
of Adam's two f32 moments (16.6 GB), so 2B + Muon fits where 2B + AdamW
does not: params 4.2 + momentum 4.2 + bf16 grads 4.2 (transient) +
remat'd activations.

Text-only batches keep the measurement about the train step itself
(same rationale as scratch/train_meas.py). The loss is measured on one
repeated random batch, so it must DECREASE across steps — that is the
end-to-end "Muon optimizes" check on real hardware, complementing the
unit tests (tests/test_training.py muon cases).

Usage: python scratch/muon_fullft_meas.py [--seq 2048] [--batch 1]
       [--steps 8] [--preset qwen2-vl-2b] [--optimizer muon] [--no-remat]
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
    p.add_argument("--preset", default="qwen2-vl-2b")
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--optimizer", default="muon", choices=["muon", "adamw"])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--no-guards", action="store_true",
                   help="drop grad-clip + apply_if_finite (each can pin an "
                        "extra state-sized buffer at the 16 GB boundary)")
    args = p.parse_args()

    from karanta_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from karanta_tpu.models.qwen25_vl.config import get_config
    from karanta_tpu.models.qwen25_vl.model import init_params
    from karanta_tpu.training.optimizer import make_optimizer
    from karanta_tpu.training.train_step import (
        create_train_state, make_train_step,
    )

    cfg = get_config(args.preset)
    print(f"devices: {jax.devices()}")
    print(f"preset={args.preset} B={args.batch} S={args.seq} "
          f"opt={args.optimizer} remat={not args.no_remat}")

    t0 = time.time()
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"init params: {time.time() - t0:.1f}s")

    if args.no_guards:
        opt = make_optimizer(args.optimizer, args.lr,
                             max_grad_norm=None, skip_nonfinite=False)
    else:
        opt = make_optimizer(args.optimizer, args.lr)
    state = create_train_state(params, opt)
    del params  # the state holds the only copy; free before compile
    step = jax.jit(make_train_step(cfg, opt, remat=not args.no_remat),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    B, S = args.batch, args.seq
    token_ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, S)),
                            jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
    labels = jnp.where(jnp.arange(S)[None, :] < S // 4, -100, token_ids)
    batch = {"token_ids": token_ids, "positions": positions,
             "labels": labels}

    t0 = time.time()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+step0: {time.time() - t0:.1f}s  "
          f"loss={float(metrics['loss']):.4f}")

    times, losses = [], []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # also forces the readback
        times.append(time.time() - t0)
        losses.append(loss)
        print(f"step {i + 1}: {times[-1] * 1e3:.0f} ms  loss={loss:.4f}")

    best = min(times)
    med = sorted(times)[len(times) // 2]
    tok_s = B * S / best
    print(f"best {best * 1e3:.0f} ms/step, median {med * 1e3:.0f} ms — "
          f"{tok_s:,.0f} tokens/s/chip (B{B} S{S}, full params, "
          f"{args.optimizer})")
    assert losses[-1] < losses[0], "loss did not decrease"
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f} over {args.steps} steps")


if __name__ == "__main__":
    main()
