"""One-command real-checkpoint fidelity validation (VERDICT r2 #4).

    python scripts/validate_checkpoint.py <hf-checkpoint-dir> [options]

The day real weights land on a machine, this single command de-risks the
accuracy half of the north star (<=0.5% CER delta vs the reference serving
stack): it loads the HF checkpoint through the native converter, OCRs a
fixed synthetic page set with the native engine, generates the SAME pages
with HF transformers `generate` on identical inputs (token ids + pixel
values from the native preprocessor, so the comparison isolates the
serving stack), and reports per-page token exact-match + CER:

  1. native bf16        vs HF generate     (conversion + engine fidelity)
  2. native quantized   vs native bf16     (quantization fidelity delta)
  3. native quantized   vs HF generate     (the deployed operating point)

Exit code 1 when a CER bound is exceeded (--max-cer, --max-quant-delta).
CI exercises the full command on a tiny random-init checkpoint
(tests/test_validate_checkpoint.py), so the harness is proven before
weights exist. Reference eval surface: karanta/data/utils.py:443-604,
configs/prompts/create_tests.yaml (LLM-scored); this harness is the
deterministic, offline complement.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="python scripts/validate_checkpoint.py",
        description="Validate a HF checkpoint through the native TPU stack")
    p.add_argument("checkpoint", help="HF checkpoint dir (safetensors [+ "
                                      "tokenizer]; 'tiny:<dir>' in CI)")
    p.add_argument("--preset", default=None,
                   help="architecture preset (default: inferred from the "
                        "checkpoint dir name; 'tiny' for the CI model)")
    p.add_argument("--pages", type=int, default=8)
    p.add_argument("--page-dim", dest="page_dim", type=int, default=1288)
    p.add_argument("--decode-tokens", dest="decode_tokens", type=int,
                   default=256)
    p.add_argument("--max-seq-len", dest="max_seq_len", type=int,
                   default=2048)
    p.add_argument("--image-token-buckets", dest="image_token_buckets",
                   type=lambda s: [int(x) for x in s.split(",")],
                   default=[2048])
    p.add_argument("--quantize", default="int8", choices=["none", "int8"])
    p.add_argument("--kv-quantize", dest="kv_quantize", default="int8",
                   choices=["none", "int8", "int4"])
    p.add_argument("--act-quant", dest="act_quant", default="int8",
                   choices=["none", "int8"])
    p.add_argument("--skip-hf", action="store_true",
                   help="skip the HF-generate reference pass (no torch, or "
                        "checkpoint too large for host RAM)")
    p.add_argument("--skip-quantized", action="store_true")
    p.add_argument("--modes", default="int4kv,spec,spec-int4kv",
                   help="comma list of extra serving modes to validate "
                        "against native bf16 (each is one more engine pass): "
                        "int4kv (nibble-packed KV capacity mode), spec "
                        "(greedy n-gram speculation, exact by construction), "
                        "spec-int4kv (the combined capacity+spec operating "
                        "point). Empty string skips the matrix.")
    p.add_argument("--max-cer", dest="max_cer", type=float, default=0.005,
                   help="bound on native-vs-HF CER (north-star 0.5%%)")
    p.add_argument("--max-quant-delta", dest="max_quant_delta", type=float,
                   default=0.005,
                   help="bound on quantized-vs-bf16 CER delta")
    p.add_argument("--max-mode-delta", dest="max_mode_delta", type=float,
                   default=None,
                   help="bound on the --modes rows' CER delta vs bf16 "
                        "(default: --max-quant-delta). CI loosens this: "
                        "int4 KV on a tiny RANDOM model flips tokens "
                        "legitimately; the tight bound is for real weights.")
    p.add_argument("--out", default=None, help="write a markdown report here")
    p.add_argument("--text-layer", dest="text_layer", action="store_true",
                   default=True)
    p.add_argument("--no-text-layer", dest="text_layer",
                   action="store_false")
    return p.parse_args(argv)


def _build_messages(args) -> list[list[dict]]:
    """Fixed page set -> pipeline-identical vision messages."""
    import asyncio
    import tempfile

    from karanta_tpu.bench.pipeline_bench import build_corpus
    from karanta_tpu.pipeline.runner import build_page_query

    with tempfile.TemporaryDirectory() as td:
        pdfs = build_corpus(td, args.pages, text_layer=args.text_layer,
                            height=args.page_dim)

        async def build_all():
            return [await build_page_query(
                path, 1, args.page_dim, max_tokens=args.decode_tokens,
                prompt_key=args.prompt_key, prompt_path=args.prompt_path)
                for path in pdfs]

        queries = asyncio.run(build_all())
    return [q["messages"] for q in queries]


def _engine_cfg(args, dtype, mode: str):
    """mode: bf16 | quantized | int4kv | spec | spec-int4kv. `quantized` is
    the full deployed point (int8 weights + KV + W8A8, TPU-only fusions);
    the matrix modes engage on any backend so CI proves them."""
    import jax

    from karanta_tpu.inference.engine import EngineConfig

    on_tpu = jax.default_backend() == "tpu"
    quant = args.quantize != "none" and mode == "quantized" and on_tpu
    kvq = None
    if mode == "quantized" and quant and args.kv_quantize != "none":
        kvq = args.kv_quantize
    elif "int4kv" in mode:
        kvq = "int4"
    return EngineConfig(
        max_batch_size=max(2, min(8, args.pages)),
        max_seq_len=args.max_seq_len,
        decode_chunk=16,
        prefill_buckets=tuple(
            b for b in (256, 512, 1024, 1536, 2048)
            if b <= args.max_seq_len) or (args.max_seq_len,),
        image_token_buckets=tuple(args.image_token_buckets),
        dtype=dtype,
        quantize=None,  # quantize-on-transfer happens in the loader
        kv_quantize=kvq,
        act_quant=("int8" if quant and args.act_quant != "none" else None),
        speculative_ngram=(3 if mode.startswith("spec") else 0),
    ), ("int8" if quant else None)


def _load_engine(args, mode: str):
    import jax
    import jax.numpy as jnp

    from karanta_tpu.inference.engine import Engine
    from karanta_tpu.inference.tokenizer import ByteTokenizer, HFTokenizer
    from karanta_tpu.models.qwen25_vl.config import get_config, tiny_config
    from karanta_tpu.models.qwen25_vl.loading import load_hf_checkpoint

    preset = args.preset or args.checkpoint
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if (args.preset or "").lower() == "tiny":
        tok = ByteTokenizer()
        cfg = tiny_config(vocab_size=tok.vocab_size)
    else:
        cfg = get_config(preset)
        tok = HFTokenizer(args.checkpoint)
    ecfg, load_quant = _engine_cfg(args, dtype, mode)
    params = load_hf_checkpoint(args.checkpoint, cfg, dtype,
                                quantize=load_quant)
    return Engine(params, cfg, tok, ecfg), cfg, tok


def _native_pass(args, messages, mode: str):
    """Run the page set through a freshly built native engine; returns
    (prompt_ids per page, token ids per page, text per page). The engine is
    freed before returning so the serial mode passes fit 16 GB."""
    from karanta_tpu.inference.engine import GenRequest

    engine, cfg, tok = _load_engine(args, mode)
    reqs = [GenRequest(messages=m, max_tokens=args.decode_tokens,
                       temperature=0.0, request_id=f"page-{i}")
            for i, m in enumerate(messages)]
    prepared = ([engine.prepare(r) for r in reqs]
                if not args.skip_hf and mode == "bf16" else None)
    prepared_ids = ([np.asarray(p.ids) for p in prepared]
                    if prepared is not None
                    else [np.asarray(engine.prepare(r).ids) for r in reqs])
    results = engine.generate(reqs)
    toks = [list(r.token_ids) for r in results]
    texts = [r.text for r in results]
    eos = tok.eos_token_id
    toks = [t[:-1] if t and t[-1] == eos else t for t in toks]
    del engine
    return prepared_ids, toks, texts, prepared, tok


def _hf_pass(args, messages, prepared_ids, feeds, tok):
    """HF transformers generate on IDENTICAL inputs (ids + pixel values from
    the native preprocessor), greedy, CPU."""
    import torch
    import transformers
    from transformers import AutoConfig

    from karanta_tpu.ops.image_prep import patchify

    path = args.checkpoint
    hf_cfg = AutoConfig.from_pretrained(path)
    arch = (hf_cfg.architectures or ["Qwen2_5_VLForConditionalGeneration"])[0]
    model_cls = getattr(transformers, arch)
    model = model_cls.from_pretrained(
        path, torch_dtype=torch.float32, attn_implementation="eager").eval()

    outs = []
    for ids, prepared in zip(prepared_ids, feeds):
        kwargs = {}
        if prepared.image_feeds:
            import jax.numpy as jnp

            feed = prepared.image_feeds[0]
            plan = feed["plan"]
            pix = feed.get("pix_dev")
            if pix is None:
                pix = patchify(jnp.asarray(feed["image_u8"]),
                               grid_h=plan.grid_h, grid_w=plan.grid_w,
                               pad_grid_h=plan.pad_grid_h,
                               pad_grid_w=plan.pad_grid_w,
                               out_dtype=jnp.float32)
            arr = np.asarray(pix, np.float32).reshape(
                plan.pad_grid_h // 2, plan.pad_grid_w // 2, 4, -1)
            valid = (arr[: plan.grid_h // 2, : plan.grid_w // 2]
                     .reshape(plan.num_tokens, -1))
            kwargs = dict(
                pixel_values=torch.tensor(valid),
                image_grid_thw=torch.tensor([[1, plan.grid_h, plan.grid_w]]))
        with torch.no_grad():
            out = model.generate(
                input_ids=torch.tensor(ids[None].astype(np.int64)),
                attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
                do_sample=False, max_new_tokens=args.decode_tokens,
                eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
                **kwargs)
        new = [int(t) for t in out[0, len(ids):]]
        if new and new[-1] == tok.eos_token_id:
            new = new[:-1]
        outs.append(new)
    del model
    return outs


@dataclasses.dataclass
class Pairing:
    name: str
    exact: int
    total: int
    mean_cer: float


def _compare(name, toks_a, toks_b, tok) -> Pairing:
    from karanta_tpu.bench.scoring import cer

    exact = sum(a == b for a, b in zip(toks_a, toks_b))
    cers = [cer(tok.decode(b), tok.decode(a))
            for a, b in zip(toks_a, toks_b)]
    return Pairing(name, exact, len(toks_a), float(np.mean(cers)))


def main(argv=None) -> int:
    args = parse_args(argv)
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # honor an explicit CPU request even when a sitecustomize pinned a
        # TPU platform (CI runs the harness on the host platform)
        import jax

        jax.config.update("jax_platforms", "cpu")
    # prompt defaults: tiny CI model uses the short closed-loop prompt
    # (byte tokenizer); real checkpoints use the production olmOCR prompt
    if (args.preset or "").lower() == "tiny":
        args.prompt_key = "olmo_ocr_system_prompt_no_anchor"
        args.prompt_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "prompts", "closed_loop.yaml")
    else:
        args.prompt_key = "olmo_ocr_system_prompt"
        args.prompt_path = None

    from karanta_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    messages = _build_messages(args)
    print(f"# validating {args.checkpoint}: {args.pages} pages, "
          f"{args.decode_tokens} tokens/page", flush=True)

    ids, bf16_toks, bf16_texts, feeds, tok = _native_pass(
        args, messages, mode="bf16")
    pairings: list[Pairing] = []

    if not args.skip_hf:
        hf_toks = _hf_pass(args, messages, ids, feeds, tok)
        pairings.append(_compare("native-bf16 vs HF-generate",
                                 bf16_toks, hf_toks, tok))

    if not args.skip_quantized:
        _, q_toks, _, _, _ = _native_pass(args, messages, mode="quantized")
        pairings.append(_compare("quantized vs native-bf16",
                                 q_toks, bf16_toks, tok))
        if not args.skip_hf:
            pairings.append(_compare("quantized vs HF-generate",
                                     q_toks, hf_toks, tok))

    skipped_modes: list[str] = []
    for mode in [m.strip() for m in (args.modes or "").split(",") if m.strip()]:
        try:
            _, m_toks, _, _, _ = _native_pass(args, messages, mode=mode)
        except (NotImplementedError, ValueError) as exc:
            # a mode the engine (or this backend) excludes is reported, not
            # fatal — the matrix documents what is validatable today
            skipped_modes.append(f"{mode}: SKIPPED ({exc})")
            continue
        pairings.append(_compare(f"mode {mode} vs native-bf16",
                                 m_toks, bf16_toks, tok))

    mode_bound = (args.max_mode_delta if args.max_mode_delta is not None
                  else args.max_quant_delta)
    lines = [f"# checkpoint validation: {args.checkpoint}", ""]
    failed = False
    for p in pairings:
        bound = (mode_bound if p.name.startswith("mode ")
                 else args.max_quant_delta if "vs native-bf16" in p.name
                 else args.max_cer)
        ok = p.mean_cer <= bound
        failed |= not ok
        lines.append(f"- {p.name}: exact {p.exact}/{p.total}, "
                     f"mean CER {p.mean_cer:.5f} "
                     f"({'OK' if ok else 'FAIL'} <= {bound})")
    for s in skipped_modes:
        lines.append(f"- {s}")
    report = "\n".join(lines)
    print(report)
    print(json.dumps({
        "checkpoint": args.checkpoint,
        "pairings": [dataclasses.asdict(p) for p in pairings],
        "skipped_modes": skipped_modes,
        "passed": not failed,
    }))
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
