"""Data-tooling tests: batch pdf<->image conversion and corpus statistics."""

import io
import json

import numpy as np
import pytest

from karanta_tpu.data.convert_pdf_2_image import (
    convert_images_to_pdfs, convert_pdfs_to_images,
)
from karanta_tpu.data.corpus_stats import CorpusAnalyzer, LocalPdfBackend


def _scanned_pdf_bytes(h=60, w=48, seed=0):
    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

    img = Image.fromarray(np.random.default_rng(seed).integers(
        150, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return convert_image_to_pdf_bytes(buf.getvalue())


class TestConvertPdf2Image:
    def test_pdf_to_images_and_back(self, tmp_path):
        src = tmp_path / "pdfs"
        src.mkdir()
        (src / "a.pdf").write_bytes(_scanned_pdf_bytes())
        out = tmp_path / "imgs"
        n = convert_pdfs_to_images(str(src), str(out), target_dim=64,
                                   workers=1)
        assert n == 1
        images = list(out.glob("*.png"))
        assert images and images[0].name == "a_pg_1.png"

        back = tmp_path / "pdfs2"
        assert convert_images_to_pdfs(str(out), str(back)) == 1
        assert (back / "a_pg_1.pdf").exists()


class TestCorpusStats:
    def test_resumable_scan(self, tmp_path):
        root = tmp_path / "corpus"
        (root / "folderA").mkdir(parents=True)
        (root / "folderB").mkdir(parents=True)
        (root / "folderA" / "x.pdf").write_bytes(_scanned_pdf_bytes(seed=1))
        (root / "folderB" / "y.pdf").write_bytes(_scanned_pdf_bytes(seed=2))
        (root / "folderB" / "bad.pdf").write_bytes(b"not a pdf at all")

        state = tmp_path / "state.json"
        analyzer = CorpusAnalyzer(LocalPdfBackend(str(root)), str(state),
                                  max_workers=2)
        stats = analyzer.run()
        assert stats["total"]["documents"] == 3
        assert stats["folders"]["folderA"]["pages"] == 1
        assert state.exists()

        # resume: nothing re-scanned, same totals
        analyzer2 = CorpusAnalyzer(LocalPdfBackend(str(root)), str(state))
        processed_before = dict(analyzer2.state["processed"])
        stats2 = analyzer2.run()
        assert stats2["total"] == stats["total"]
        assert analyzer2.state["processed"].keys() == processed_before.keys()
