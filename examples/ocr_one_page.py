"""Example: OCR a single page end to end, no server.

Replaces the reference's exploratory notebooks (notebooks/*.ipynb) with
runnable scripts.

    python examples/ocr_one_page.py --pdf my_scan.pdf --model-path /ckpts/3b
    python examples/ocr_one_page.py --pdf my_scan.pdf --preset tiny  # smoke
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from karanta_tpu.inference.server import build_engine_from_args
from karanta_tpu.inference.single_page import build_message, run_inference


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pdf", required=True)
    parser.add_argument("--page", type=int, default=1)
    parser.add_argument("--model-path", default=None)
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--max-batch-size", type=int, default=1)
    parser.add_argument("--max-model-len", type=int, default=8192)
    parser.add_argument("--decode-chunk", type=int, default=32)
    args = parser.parse_args()

    engine, name = build_engine_from_args(args)
    messages = build_message(args.pdf, args.page, target_dim=1288,
                             prompt_key="olmo_ocr_system_prompt",
                             prompt_path=None)
    result = run_inference(engine, messages, max_tokens=512)
    print(json.dumps({"model": name, **result}, indent=2, ensure_ascii=False))


if __name__ == "__main__":
    main()
