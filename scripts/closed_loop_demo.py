"""Closed-loop accuracy demo: train -> checkpoint -> serve -> pipeline -> CER.

Exercises every production surface of the framework on real compute with a
corpus whose ground truth is exact by construction
(karanta_tpu/data/synthetic.py):

  1. generate a synthetic scanned-page corpus (rendered digit strings as
     image-only PDFs + ground-truth JSON),
  2. fine-tune the tiny VLM with the NATIVE trainer
     (configs/training/ocr/closed_loop.yaml),
  3. serve the resulting native checkpoint with the REAL inference server
     (--native-checkpoint, continuous batching, OpenAI HTTP surface),
  4. OCR a HELD-OUT corpus (unseen digit strings) through the REAL
     scale-out pipeline (work queue, retry ladder, admission control,
     Dolma JSONL output),
  5. score CER/WER against ground truth with the native scorer
     (bench/scoring.py) and write runs/closed_loop/report.md.

The reference has no offline accuracy loop at all — its model quality is
validated only against cloud teacher LLM outputs (SURVEY.md §4). This demo
is the hermetic equivalent: a user can prove the whole train->serve->OCR
stack is wired correctly, end to end, without network or checkpoints.

Targets are PlainTextFormat (pipeline runs with --accept_raw_text) rather
than the production JSON envelope: for the tiny model the ~140-token
constant scaffold dilutes the vision gradient ~35:1 and the digits never
train (measured: loss pinned at the digits-at-chance floor through 3500
steps), while plain-text targets converge in hundreds of steps. Real-scale
fine-tunes keep JSONOutputFormat; the strict-envelope pipeline path is
covered by tests/test_pipeline.py against the fake server.

Usage (CPU, ~20-30 min on one core; most of it the 1800-step fine-tune):
  JAX_PLATFORMS=cpu python scripts/closed_loop_demo.py
  # resume after training once the checkpoint exists:
  JAX_PLATFORMS=cpu python scripts/closed_loop_demo.py --skip-train
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

# a CPU-scale demo by design: override the sitecustomize TPU pin (opt out
# with KARANTA_DEMO_PLATFORM=tpu to fine-tune on the chip instead)
os.environ["JAX_PLATFORMS"] = os.environ.get("KARANTA_DEMO_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# the training config references configs/prompts/*.yaml repo-relative; run
# from anywhere without silently diverging the trained prompt
os.chdir(REPO)

CONFIG = os.path.join(REPO, "configs/training/ocr/closed_loop.yaml")
PROMPTS = os.path.join(REPO, "configs/prompts/closed_loop.yaml")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root", default=os.path.join(REPO, "runs/closed_loop"))
    p.add_argument("--model", default="tiny", choices=["tiny", "small"],
                   help="hermetic preset: 'small' (~40x tiny compute) is "
                        "the capacity point where the anchor-copy circuit "
                        "generalizes (VERDICT r4 #6); 'tiny' is the "
                        "CPU-minutes demo default")
    p.add_argument("--train-pages", type=int, default=512)
    p.add_argument("--eval-pages", type=int, default=16)
    p.add_argument("--chars", type=int, default=4)
    p.add_argument("--words", type=int, default=None,
                   help="words per line (default: one word per page)")
    p.add_argument("--lines", type=int, default=1, help="lines per page")
    p.add_argument("--vocab", type=int, default=None,
                   help="draw words from a fixed vocab of this size "
                        "(prose-like repetition)")
    p.add_argument("--text-layer", action="store_true",
                   help="embed each page's text as an invisible PDF text "
                        "layer, so the pipeline's anchor extraction feeds "
                        "it into the prompt (the prompt-lookup setting for "
                        "speculative decoding)")
    p.add_argument("--speculative-ngram", type=int, default=0,
                   help="serve with n-gram speculative decoding (gamma)")
    p.add_argument("--max-model-len", type=int, default=512)
    p.add_argument("--max-length", type=int, default=None,
                   help="training sequence cap override (longer pages)")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=None,
                   help="override the config learning rate")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse an existing checkpoint under <root>/train")
    p.add_argument("--eval-from-train", action="store_true",
                   help="evaluate on training strings (memorization check; "
                        "used by the fast CI variant where every glyph class "
                        "must appear in training)")
    p.add_argument("--port", type=int, default=0, help="0 = pick a free port")
    p.add_argument("--time-pipeline", action="store_true",
                   help="run the pipeline phase twice — one untimed warmup "
                        "pass (compiles), one timed pass — and record "
                        "pages/s in the report (the speculative-decoding "
                        "throughput measurement)")
    p.add_argument("--serve-batch", type=int, default=4,
                   help="server decode slots")
    p.add_argument("--decode-chunk", type=int, default=8)
    p.add_argument("--pipeline-workers", type=int, default=4)
    return p.parse_args(argv)


def gen_corpora(args) -> list[tuple[str, str]]:
    from karanta_tpu.data.synthetic import make_corpus, random_texts

    train_dir = os.path.join(args.root, "corpus_train")
    eval_dir = os.path.join(args.root, "corpus_eval")
    kw = dict(n_chars=args.chars, words=args.words, lines=args.lines,
              vocab=args.vocab)
    train_texts = random_texts(args.train_pages, seed=0, **kw)
    if args.eval_from_train:
        eval_texts = train_texts[: args.eval_pages]
    else:
        seen = set(train_texts)
        eval_texts = [t for t in random_texts(args.eval_pages * 4, seed=99,
                                              **kw)
                      if t not in seen][: args.eval_pages]
    # regenerate the train corpus whenever its contents would differ (a
    # stale-pdfs/ check would silently train on an old corpus after a
    # --train-pages/--chars change)
    manifest_path = os.path.join(train_dir, "manifest.json")
    want = {"texts": train_texts, "text_layer": args.text_layer}
    have = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            have = json.load(f)
    if have != want:
        import shutil

        shutil.rmtree(train_dir, ignore_errors=True)
        make_corpus(train_dir, len(train_texts), texts=train_texts,
                    char_px=48, seed=0, text_layer=args.text_layer)
        with open(manifest_path, "w") as f:
            json.dump(want, f)
    manifest = make_corpus(eval_dir, len(eval_texts), texts=eval_texts,
                           char_px=48, seed=1, text_layer=args.text_layer)
    print(f"corpora: {len(train_texts)} train / {len(manifest)} held-out "
          f"pages under {args.root}", flush=True)
    return manifest


def train(args) -> str:
    from karanta_tpu.training.checkpoint import get_last_checkpoint
    from karanta_tpu.training.train import main as train_main

    out_dir = os.path.join(args.root, "train")
    if args.skip_train and get_last_checkpoint(out_dir):
        print(f"reusing checkpoint {get_last_checkpoint(out_dir)}", flush=True)
        return out_dir
    t0 = time.time()
    argv = [
        CONFIG,
        "--dataset_root", os.path.join(args.root, "corpus_train"),
        "--output_dir", out_dir,
        "--max_steps", str(args.steps),
        "--model_name_or_path", args.model,
    ]
    if args.lr is not None:
        argv += ["--learning_rate", str(args.lr)]
    if args.max_length is not None:
        argv += ["--max_length", str(args.max_length)]
    metrics = train_main(argv)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s: "
          f"loss={metrics['loss']:.4f}", flush=True)
    return out_dir


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def serve(args, ckpt_dir: str) -> tuple[subprocess.Popen, int]:
    port = args.port or _free_port()
    # the server subprocess runs on the same platform as the rest of the
    # demo (KARANTA_DEMO_PLATFORM=tpu serves the fine-tune on the chip)
    env = dict(os.environ, JAX_PLATFORMS=os.environ["JAX_PLATFORMS"],
               # EXTEND PYTHONPATH: this environment loads its TPU plugin via a
               # sitecustomize dir already on PYTHONPATH — clobbering it would
               # unregister the TPU backend in the subprocess
               PYTHONPATH=os.pathsep.join(
                   [REPO] + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    cmd = [sys.executable, "-m", "karanta_tpu.inference.server",
           "--native-checkpoint", ckpt_dir, "--preset", args.model,
           "--host", "127.0.0.1", "--port", str(port),
           "--max-batch-size", str(args.serve_batch), "--max-model-len",
           str(args.max_model_len), "--decode-chunk",
           str(args.decode_chunk)]
    if args.speculative_ngram:
        cmd += ["--speculative-ngram", str(args.speculative_ngram)]
    proc = subprocess.Popen(
        cmd,
        env=env, stdout=open(os.path.join(args.root, "server.log"), "w"),
        stderr=subprocess.STDOUT)
    # first-ever compile of a preset's executables over the remote-compile
    # tunnel can take several minutes; warm runs are ready in seconds
    deadline = time.time() + 900
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError("server exited early; see server.log")
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2) as r:
                if r.status == 200:
                    print(f"server ready on :{port}", flush=True)
                    return proc, port
        except Exception:
            time.sleep(1.0)
    proc.terminate()
    raise RuntimeError("server did not become ready in 900s")


def run_pipeline(args, port: int) -> dict[str, str]:
    """OCR the eval corpus through the real pipeline; return pdf->text."""
    from karanta_tpu.pipeline.runner import main as pipeline_main

    import shutil

    workspace = os.path.join(args.root, "workspace")
    shutil.rmtree(workspace, ignore_errors=True)  # fresh queue every run
    eval_pdfs = os.path.join(args.root, "corpus_eval", "pdfs")
    pdfs = sorted(
        os.path.join(eval_pdfs, f) for f in os.listdir(eval_pdfs))
    pipeline_main([
        workspace,
        "--pdfs", *pdfs,
        "--server", f"http://127.0.0.1:{port}/v1",
        "--workers", str(args.pipeline_workers),
        "--pages_per_group", "8",
        "--max_page_retries", "3",
        "--target_longest_image_dim", "128",
        # parity with the branch FinetuningPrompt took at train time:
        # text-layer corpora train on the anchored prompt, image-only on
        # the no_anchor one
        "--prompt_key", ("olmo_ocr_system_prompt" if args.text_layer
                         else "olmo_ocr_system_prompt_no_anchor"),
        "--prompt_path", PROMPTS,
        "--markdown",
        "--accept_raw_text",
    ])
    outputs: dict[str, str] = {}
    results_dir = os.path.join(workspace, "results")
    if not os.path.isdir(results_dir):
        # no document survived the failure budget: report CER 1.0, not a
        # stack trace
        print("pipeline produced no result files", flush=True)
        return outputs
    for name in os.listdir(results_dir):
        with open(os.path.join(results_dir, name)) as f:
            for line in f:
                doc = json.loads(line)
                src = os.path.basename(doc["metadata"]["Source-File"])
                outputs[src.removesuffix(".pdf")] = doc["text"]
    return outputs


def score(args, manifest: list[tuple[str, str]],
          outputs: dict[str, str], spec_metrics: dict = {}) -> dict:
    from karanta_tpu.bench.scoring import cer, wer

    rows, cers, wers, exact = [], [], [], 0
    for name, truth in manifest:
        got = outputs.get(name, "").strip()
        c, w = cer(truth, got), wer(truth, got)
        cers.append(c)
        wers.append(w)
        exact += got == truth
        rows.append((name, truth, got, c))
    summary = {
        "pages": len(manifest),
        "exact_match": exact,
        "mean_cer": sum(cers) / max(1, len(cers)),
        "mean_wer": sum(wers) / max(1, len(wers)),
    }
    summary.update(spec_metrics)
    report = os.path.join(args.root, "report.md")
    with open(report, "w") as f:
        f.write("# Closed-loop demo: train -> serve -> pipeline -> CER\n\n")
        f.write(f"Held-out pages: {summary['pages']} (page texts unseen "
                "in training)\n\n")
        f.write(f"- exact match: {exact}/{summary['pages']}\n")
        f.write(f"- mean CER: {summary['mean_cer']:.4f}\n")
        f.write(f"- mean WER: {summary['mean_wer']:.4f}\n")
        if "spec_tokens_per_pass" in summary:
            f.write(f"- speculative tokens/verify-pass: "
                    f"{summary['spec_tokens_per_pass']} "
                    f"({summary['spec_tokens']} tokens / "
                    f"{summary['spec_passes']} passes; plain decode = 1.0)\n")
        if "pipeline_pages_per_sec" in summary:
            f.write(f"- pipeline throughput (timed 2nd pass): "
                    f"{summary['pipeline_pages_per_sec']} pages/s "
                    f"({summary['pages']} pages in "
                    f"{summary['pipeline_elapsed_s']}s)\n")
        f.write("\n")
        f.write("| page | truth | pipeline output | CER |\n|---|---|---|---|\n")
        for name, truth, got, c in rows:
            f.write(f"| {name} | `{truth}` | `{got}` | {c:.3f} |\n")
    with open(os.path.join(args.root, "scores.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"report: {report}\n{json.dumps(summary)}", flush=True)
    return summary


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.root, exist_ok=True)
    manifest = gen_corpora(args)
    ckpt_dir = train(args)
    proc, port = serve(args, ckpt_dir)
    spec_metrics = {}
    try:
        outputs = run_pipeline(args, port)
        if args.time_pipeline:
            # pass 1 above triggered every compile; this pass is the
            # measurement (same held-out corpus, fresh work queue)
            t0 = time.time()
            outputs = run_pipeline(args, port)
            elapsed = time.time() - t0
            spec_metrics["pipeline_elapsed_s"] = round(elapsed, 3)
            spec_metrics["pipeline_pages_per_sec"] = round(
                len(manifest) / elapsed, 4)
            print(f"timed pipeline pass: {len(manifest)} pages in "
                  f"{elapsed:.1f}s = {len(manifest)/elapsed:.3f} pages/s",
                  flush=True)
        if args.speculative_ngram:
            # acceptance observability: tokens emitted per verify pass
            # (plain decode = 1.0/step) — the n-gram drafter's measured
            # win on this corpus
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=5) as r:
                m = json.loads(r.read())
            spec = {k: m[k] for k in
                    ("spec_passes", "spec_tokens",
                     "spec_tokens_per_pass") if k in m}
            spec_metrics.update(spec)  # keep the --time-pipeline numbers
            print(f"speculative decoding: {spec}", flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()  # mid-compile servers can ignore SIGTERM
            proc.wait(timeout=10)
    return score(args, manifest, outputs, spec_metrics)


if __name__ == "__main__":
    main()
