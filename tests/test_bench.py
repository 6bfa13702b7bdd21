"""Bench harness tests: method registry, conversion flow against the fake
server, and scoring (present/absent/order, CER/WER)."""

import asyncio
import io
import json
import os

import numpy as np
import pytest

from karanta_tpu.bench.convert import parse_method_arg, process_pdfs
from karanta_tpu.bench.scoring import (
    MethodScore, cer, edit_distance, load_tests, run_test, score_method, wer,
)
from tests.fake_server import FakeOpenAIServer


class TestMethodSpecs:
    def test_parse(self):
        name, kwargs = parse_method_arg(
            "karanta_pipeline:server=http://x=1:max_page_retries=2:flag=true")
        assert name == "karanta_pipeline"
        assert kwargs["max_page_retries"] == 2
        assert kwargs["flag"] is True

    def test_parse_url_value_keeps_colons(self):
        name, kwargs = parse_method_arg(
            "server:server=http://127.0.0.1:30024/v1:model=m")
        assert name == "server"
        assert kwargs["server"] == "http://127.0.0.1:30024/v1"
        assert kwargs["model"] == "m"

    def test_parse_rejects_bare_segment(self):
        # a typo'd option must error, not corrupt the previous value
        # (reference convert.py raises for non key=value extras)
        with pytest.raises(ValueError, match="key=value"):
            parse_method_arg("karanta_engine:preset=tiny:quantize")


class TestScoring:
    def test_edit_distance(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance("abc", "abc") == 0

    def test_present_absent_order(self):
        out = "The quick brown fox\njumps over the lazy dog."
        assert run_test({"type": "present", "text": "brown fox"}, out)
        assert run_test({"type": "present", "text": "brwn fox",
                         "max_diffs": 2}, out)
        assert not run_test({"type": "present", "text": "purple cat"}, out)
        assert run_test({"type": "absent", "text": "purple cat"}, out)
        assert run_test({"type": "order", "before": "quick",
                         "after": "lazy"}, out)
        assert not run_test({"type": "order", "before": "lazy",
                             "after": "quick"}, out)

    def test_case_insensitive(self):
        assert run_test({"type": "present", "text": "BROWN",
                         "case_sensitive": False}, "the brown fox")

    def test_cer_wer(self):
        assert cer("abcd", "abcd") == 0.0
        assert cer("abcd", "abce") == 0.25
        assert wer("a b c d", "a b x d") == 0.25

    def test_score_method(self, tmp_path):
        method_dir = tmp_path / "m"
        method_dir.mkdir()
        (method_dir / "doc_pg1_repeat1.md").write_text("hello world")
        tests = [
            {"pdf": "doc.pdf", "page": 1, "id": "t1", "type": "present",
             "text": "hello"},
            {"pdf": "doc.pdf", "page": 1, "id": "t2", "type": "absent",
             "text": "goodbye"},
            {"pdf": "missing.pdf", "page": 1, "id": "t3", "type": "present",
             "text": "x"},
        ]
        score = score_method(str(tmp_path), "m", tests)
        assert score.passed == 2 and score.total == 3
        assert score.missing_outputs == 1

    def test_load_tests(self, tmp_path):
        with open(tmp_path / "tests.jsonl", "w") as f:
            f.write(json.dumps({"pdf": "a.pdf", "page": 1, "id": "x",
                                "type": "present", "text": "y"}) + "\n")
        assert len(load_tests(str(tmp_path / "tests.jsonl"))) == 1


class TestConvertFlow:
    def test_convert_with_pipeline_method(self, tmp_path):
        from PIL import Image

        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

        pdfs = tmp_path / "pdfs"
        pdfs.mkdir()
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(150, 255, (100, 80, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdfs / "doc.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))

        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                return await process_pdfs(
                    [("karanta_pipeline",
                      {"server": server.url, "max_page_retries": 2,
                       "target_longest_image_dim": 128})],
                    str(tmp_path), repeats=1, max_parallel=2)
            finally:
                await server.stop()

        counts = asyncio.run(run())
        assert counts.get("karanta_pipeline") == 1
        out = tmp_path / "karanta_pipeline" / "doc_pg1_repeat1.md"
        assert out.read_text() == "Hello from fake model"

    def test_server_method_single_call(self, tmp_path):
        """The native `server` method: one raw call to any OpenAI endpoint."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

        pdfs = tmp_path / "pdfs"
        pdfs.mkdir()
        rng = np.random.default_rng(1)
        img = Image.fromarray(rng.integers(150, 255, (100, 80, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdfs / "doc.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))

        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                return await process_pdfs(
                    [("server", {"server": server.url,
                                 "target_longest_image_dim": 128})],
                    str(tmp_path), repeats=1, max_parallel=2)
            finally:
                await server.stop()

        counts = asyncio.run(run())
        assert counts.get("server") == 1
        out = tmp_path / "server" / "doc_pg1_repeat1.md"
        assert out.read_text() == "Hello from fake model"

    def test_engine_method_inproc(self, tmp_path):
        """The native `karanta_engine` method: serverless in-process engine
        (tiny random weights — only the plumbing contract is asserted)."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

        pdfs = tmp_path / "pdfs"
        pdfs.mkdir()
        rng = np.random.default_rng(2)
        img = Image.fromarray(rng.integers(150, 255, (64, 56, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdfs / "doc.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))

        counts = asyncio.run(process_pdfs(
            [("karanta_engine",
              {"preset": "tiny", "max_model_len": 512,
               "target_longest_image_dim": 64})],
            str(tmp_path), repeats=1, max_parallel=1))
        out = tmp_path / "karanta_engine" / "doc_pg1_repeat1.md"
        # random tiny weights may emit an instant EOS (empty -> no file) but
        # the method must not error; when text came back the file exists
        assert counts.get("karanta_engine", 0) in (0, 1)
        if counts.get("karanta_engine"):
            assert out.read_text()
