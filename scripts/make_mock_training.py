"""Generate the tiny data/mock_training set the dummy train config uses.

The reference keeps a small mock_training directory for its de-facto
training integration test (reference configs/training/ocr/dummy.yaml);
binary PDFs don't belong in git, so this synthesizes an equivalent set:
N single-page image PDFs plus the paired ground-truth JSONs in the
data-generation result schema the training pipeline ingests.

Usage: python scripts/make_mock_training.py [--root data/mock_training] [-n 4]
"""

import argparse
import io
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/mock_training")
    ap.add_argument("-n", type=int, default=4)
    args = ap.parse_args()

    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

    root = pathlib.Path(args.root)
    pdf_dir = root / "pdfs"
    json_dir = root / "json"
    pdf_dir.mkdir(parents=True, exist_ok=True)
    json_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(0)
    for i in range(args.n):
        page = np.full((160, 128), 240, np.uint8)
        for y in range(20, 140, 14):  # text-like dark rows
            page[y:y + 6, 12:116] = rng.integers(40, 120, (6, 104))
        img = Image.fromarray(np.stack([page] * 3, axis=-1))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdf_dir / f"doc{i}.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))
        page_resp = {
            "primary_language": "en",
            "is_rotation_valid": True,
            "rotation_correction": 0,
            "is_table": False,
            "is_diagram": False,
            "natural_text": f"Mock page {i}: the quick brown fox "
                            f"jumps over the lazy dog ({i}).",
        }
        (json_dir / f"doc{i}.json").write_text(
            json.dumps({"result": {"text": json.dumps([page_resp])}}))
    print(f"wrote {args.n} pdf+json pairs under {root}")


if __name__ == "__main__":
    main()
