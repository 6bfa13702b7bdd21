"""Prototype: can the tiny VLM learn synthetic digit OCR end to end?

Phase 1: corpus -> train.main -> checkpoint.
Phase 2: restore params -> Engine.generate on held-out pages -> accuracy.
Run with JAX_PLATFORMS=cpu.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from karanta_tpu.data.synthetic import make_corpus

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/closed_loop_proto"
STEPS = int(os.environ.get("PROTO_STEPS", "400"))
N_TRAIN = int(os.environ.get("PROTO_TRAIN", "192"))

train_dir = os.path.join(ROOT, "corpus_train")
eval_dir = os.path.join(ROOT, "corpus_eval")
out_dir = os.path.join(ROOT, "train")

t0 = time.time()
if not os.path.exists(os.path.join(train_dir, "pdfs")):
    make_corpus(train_dir, N_TRAIN, n_chars=int(os.environ.get("PROTO_CHARS","1")), char_px=48, seed=0)
    make_corpus(eval_dir, 8, n_chars=int(os.environ.get("PROTO_CHARS","1")), char_px=48, seed=10_000)
print(f"corpus: {time.time()-t0:.1f}s", flush=True)

from karanta_tpu.training.checkpoint import get_last_checkpoint

if not get_last_checkpoint(out_dir):
    from karanta_tpu.training.train import main as train_main

    t0 = time.time()
    metrics = train_main([
        "configs/training/ocr/closed_loop.yaml",
        "--dataset_root", train_dir,
        "--output_dir", out_dir,
        "--max_steps", str(STEPS),
    ])
    print(f"train: {time.time()-t0:.1f}s final metrics {metrics}", flush=True)

# ---- restore + serve through the engine ----
import jax.numpy as jnp

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.training.checkpoint import restore_checkpoint

tok = ByteTokenizer()
cfg = tiny_config(vocab_size=tok.vocab_size)
last = get_last_checkpoint(out_dir)
state, meta = restore_checkpoint(last, None)
params = jax.tree.map(jnp.asarray, state[0])
print(f"restored {last} (step {meta.get('step')})", flush=True)

ecfg = EngineConfig(max_batch_size=4, max_seq_len=512, decode_chunk=16,
                    prefill_buckets=(256, 512), image_token_buckets=(64, 128),
                    dtype=jnp.float32)
engine = Engine(params, cfg, tok, ecfg)

import asyncio

from karanta_tpu.pipeline.runner import build_page_query

truths = {}
for name in sorted(os.listdir(os.path.join(eval_dir, "json"))):
    with open(os.path.join(eval_dir, "json", name)) as f:
        page = json.loads(json.loads(f.read())["result"]["text"])[0]
    truths[name[:-5]] = page["natural_text"]

reqs, names = [], []
for name in sorted(truths):
    q = asyncio.run(build_page_query(
        os.path.join(eval_dir, "pdfs", f"{name}.pdf"), 1,
        target_longest_image_dim=128,
        prompt_key="olmo_ocr_system_prompt",
        prompt_path="configs/prompts/closed_loop.yaml"))
    reqs.append(GenRequest(messages=q["messages"], max_tokens=200,
                           temperature=0.0, request_id=name))
    names.append(name)

t0 = time.time()
results = engine.generate(reqs)
print(f"generate: {time.time()-t0:.1f}s", flush=True)

n_ok = 0
for name, res in zip(names, results):
    text = res.text
    try:
        nt = json.loads(text)[0]["natural_text"]
    except Exception:
        nt = f"<unparseable: {text[:60]!r}>"
    ok = nt == truths[name]
    n_ok += ok
    print(f"{name}: truth={truths[name]!r} got={nt!r} {'OK' if ok else 'MISS'}")
print(f"eval exact-match: {n_ok}/{len(names)}")
