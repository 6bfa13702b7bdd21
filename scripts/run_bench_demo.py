"""Run the full native bench loop hermetically and write a scored artifact.

create_tests (heuristic offline teacher) -> convert.py over 3 methods ->
scoring.py -> runs/bench/scores.{json,md}. The three methods span the
discrimination range the scorer must resolve:
  anchor_text          — the PDF's own text layer (near-perfect on text PDFs)
  karanta_echo         — pipeline against a server that echoes the anchor
                         text from the prompt (a "perfect model" stand-in)
  karanta_lorem        — pipeline against a server returning canned lorem
                         (a "broken model" stand-in; should score ~chance)

Usage: python scripts/run_bench_demo.py [--out runs/bench]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAGES = {
    "colonial_gazette": [
        "The weekly gazette reports that the harvest festival drew crowds "
        "from every district and the market squares were full by noon.",
        "Officials announced a new railway timetable effective the first of "
        "the month with additional services to the coastal towns.",
    ],
    "daily_herald": [
        "A severe storm passed over the northern province on Tuesday causing "
        "damage to several warehouses near the river docks.",
        "The editor received letters praising the new public library and "
        "asking for longer opening hours during the dry season.",
    ],
    "market_bulletin": [
        "Cocoa prices rose for the third consecutive week while groundnut "
        "shipments remained steady according to the trade commission.",
    ],
}


def build_corpus(out_dir: str) -> None:
    from tests.pdf_helpers import make_pdf

    pdf_dir = os.path.join(out_dir, "pdfs")
    gt_dir = os.path.join(out_dir, "gt")
    os.makedirs(pdf_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for base, pages in PAGES.items():
        spec = []
        for text in pages:
            words = text.split()
            lines, y = [], 720
            for i in range(0, len(words), 9):
                lines.append((72.0, float(y), " ".join(words[i:i + 9])))
                y -= 18
            spec.append(lines)
        with open(os.path.join(pdf_dir, f"{base}.pdf"), "wb") as f:
            f.write(make_pdf(spec))
        for n, text in enumerate(pages, start=1):
            with open(os.path.join(gt_dir, f"{base}_pg{n}.md"), "w") as f:
                f.write(text)


def _echo_responder(server):
    """Return the anchor text embedded in the prompt as the transcription
    (stands in for a model that reads the page perfectly)."""

    def responder(request, idx):
        content = request["messages"][0]["content"]
        text = next(part["text"] for part in content
                    if part.get("type") == "text")
        # the prompt may carry literal backslash-n sequences (the template
        # yaml stores them escaped), so accept both newline encodings
        match = re.search(r"RAW_TEXT_START(?:\\n|\n)(.*?)(?:\\n|\n)"
                          r"RAW_TEXT_END", text, re.DOTALL)
        page_text = match.group(1).strip() if match else ""
        lines = re.split(r"\\n|\n", page_text)
        # anchor lines carry [x,y] position prefixes; strip back to prose
        cleaned = " ".join(
            re.sub(r"^\[[-\d.]+x[-\d.]+\]", "", ln).strip()
            for ln in lines
            if ln.strip() and not ln.startswith("Page dimensions:"))
        return 200, server.completion([server.page_json(cleaned or None)])

    return responder


async def run_methods(out_dir: str) -> None:
    from karanta_tpu.bench.convert import METHOD_REGISTRY, process_pdfs
    from tests.fake_server import FakeOpenAIServer

    echo = FakeOpenAIServer()
    echo.responder = _echo_responder(echo)
    lorem = FakeOpenAIServer(lambda req, idx: (200, FakeOpenAIServer.completion(
        [FakeOpenAIServer.page_json("lorem ipsum dolor sit amet nonsense")])))
    await echo.start()
    await lorem.start()
    METHOD_REGISTRY.setdefault(
        "karanta_echo",
        "karanta_tpu.bench.runners.run_karanta:run_karanta_pipeline")
    METHOD_REGISTRY.setdefault(
        "karanta_lorem",
        "karanta_tpu.bench.runners.run_karanta:run_karanta_pipeline")
    try:
        methods = [
            ("anchor_text", {}),
            ("karanta_echo", {"server": echo.url, "max_page_retries": 1,
                              "target_longest_image_dim": 256}),
            ("karanta_lorem", {"server": lorem.url, "max_page_retries": 1,
                               "target_longest_image_dim": 256}),
        ]
        counts = await process_pdfs(methods, out_dir, repeats=1,
                                    max_parallel=4, remove_text=False,
                                    force=True)
        print("converted:", counts)
    finally:
        await echo.stop()
        await lorem.stop()


def score_all(out_dir: str) -> dict:
    from karanta_tpu.bench.scoring import cer, load_tests, score_method, wer

    tests = load_tests(os.path.join(out_dir, "tests.jsonl"))
    table: dict = {"tests": len(tests), "methods": {}}
    for method in ("anchor_text", "karanta_echo", "karanta_lorem"):
        ms = score_method(out_dir, method, tests)
        cers, wers = [], []
        for base, pages in PAGES.items():
            for n, gt in enumerate(pages, start=1):
                path = os.path.join(out_dir, method,
                                    f"{base}_pg{n}_repeat1.md")
                hyp = open(path).read() if os.path.exists(path) else ""
                cers.append(cer(gt, hyp))
                wers.append(wer(gt, hyp))
        table["methods"][method] = {
            "passed": ms.passed, "total": ms.total,
            "score": round(ms.score, 4),
            "missing_outputs": ms.missing_outputs,
            "cer": round(sum(cers) / len(cers), 4),
            "wer": round(sum(wers) / len(wers), 4),
        }
    return table


def write_report(out_dir: str, table: dict) -> None:
    with open(os.path.join(out_dir, "scores.json"), "w") as f:
        json.dump(table, f, indent=2)
    lines = [
        "# Native bench scoring run",
        "",
        f"{table['tests']} heuristic test cases over "
        f"{sum(len(p) for p in PAGES.values())} pages / {len(PAGES)} PDFs.",
        "Regenerate: `python scripts/run_bench_demo.py`.",
        "",
        "| method | unit-test score | passed/total | CER | WER |",
        "|---|---|---|---|---|",
    ]
    for method, row in table["methods"].items():
        lines.append(
            f"| {method} | {row['score']:.3f} | "
            f"{row['passed']}/{row['total']} | {row['cer']:.3f} | "
            f"{row['wer']:.3f} |")
    with open(os.path.join(out_dir, "scores.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(REPO, "runs", "bench"))
    args = parser.parse_args()

    build_corpus(args.out)
    from karanta_tpu.bench.create_tests import main as create_tests_main

    create_tests_main(["--transcriptions", os.path.join(args.out, "gt"),
                       "--output", os.path.join(args.out, "tests.jsonl"),
                       "--provider", "heuristic", "--per-page", "3"])
    asyncio.run(run_methods(args.out))
    write_report(args.out, score_all(args.out))


if __name__ == "__main__":
    main()
