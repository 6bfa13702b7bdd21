"""Tests for corpus tooling (sampler, splitter, batch prompts) and LLM clients."""

import asyncio
import io
import json
import os

import numpy as np
import pytest

from karanta_tpu.data.sampler import (
    allocate_samples, systematic_sample, two_phase_sample,
)
from karanta_tpu.llm_clients.base import MockLLM, strip_json_fences
from karanta_tpu.llm_clients.openai_client import OpenAICompatLLM, get_client
from karanta_tpu.llm_clients.utils import json_parse_model_output
from karanta_tpu.prompts.schemas import PageAnalysis
from tests.fake_server import FakeOpenAIServer
from tests.pdf_helpers import make_pdf


class TestSampler:
    def test_systematic_coverage(self):
        rng = np.random.default_rng(0)
        idx = systematic_sample(100, 10, rng)
        assert len(idx) == 10
        assert max(idx) < 100 and min(idx) >= 0
        gaps = np.diff(idx)
        assert gaps.max() <= 12  # roughly even spacing

    def test_allocation_modes(self):
        sizes = {"a": 100, "b": 300}
        prop = allocate_samples(sizes, 40, "proportional")
        assert sum(prop.values()) <= 40
        assert prop["b"] > prop["a"]
        bal = allocate_samples(sizes, 40, "balanced")
        assert bal["a"] == bal["b"] == 20

    def test_two_phase_coverage(self):
        catalog = ([{"folder": "big", "document": f"d{i}", "pages": 50}
                    for i in range(4)]
                   + [{"folder": "small", "document": "s0", "pages": 2}])
        samples = two_phase_sample(catalog, 20, coverage_per_folder=2)
        folders = {s["folder"] for s in samples}
        assert folders == {"big", "small"}
        assert len(samples) <= 22


class TestPdfSplit:
    def test_split_roundtrip(self, tmp_path):
        from karanta_tpu.data.split_pdf import split_pdfs
        from karanta_tpu.pdf.minipdf import PdfDocument
        from karanta_tpu.pdf.textextract import extract_plain_text

        src = tmp_path / "in"
        src.mkdir()
        (src / "two.pdf").write_bytes(make_pdf(
            [[(72, 700, "first page text")], [(72, 700, "second page text")]]))
        out = tmp_path / "out"
        n = split_pdfs(str(src), str(out), workers=1)
        assert n == 2
        doc = PdfDocument.open(str(out / "two_page_2.pdf"))
        assert doc.num_pages() == 1
        assert "second page text" in extract_plain_text(doc, 0)


class TestBatchPrompts:
    def test_build_requests(self, tmp_path):
        from PIL import Image

        from karanta_tpu.data.create_batch_data_prompts import build_requests
        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

        pdf_dir = tmp_path / "pdfs"
        pdf_dir.mkdir()
        img = Image.fromarray(np.full((60, 60, 3), 230, np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        (pdf_dir / "a.pdf").write_bytes(
            convert_image_to_pdf_bytes(buf.getvalue()))

        out = tmp_path / "reqs"
        n = build_requests(str(pdf_dir), str(out), "gpt-4o",
                           flavor="openai", pages_per_pdf=1, target_dim=128)
        assert n == 1
        files = list(out.glob("*.jsonl"))
        assert len(files) == 1
        line = json.loads(files[0].read_text().splitlines()[0])
        assert line["custom_id"] == "a_pg1"
        assert line["body"]["response_format"]["type"] == "json_schema"
        assert line["body"]["messages"][0]["content"][1]["type"] == "image_url"


class TestClients:
    def test_strip_fences(self):
        assert strip_json_fences('```json\n{"a": 1}\n```') == '{"a": 1}'
        assert strip_json_fences('{"a": 1}') == '{"a": 1}'

    def test_json_parse_model_output(self):
        text = 'Sure! Here is the JSON: {"x": [1, 2], "y": "a}b"} trailing'
        assert json_parse_model_output(text) == {"x": [1, 2], "y": "a}b"}
        assert json_parse_model_output("no json here") is None

    def test_mock_llm_structured(self):
        llm = MockLLM()
        (completion,) = llm.completion(["read this"],
                                       structured_object=PageAnalysis)
        assert isinstance(completion.response, PageAnalysis)
        assert completion.response.natural_text == "mock transcription"
        assert llm.calls

    def test_openai_compat_against_fake_server(self):
        server = FakeOpenAIServer()

        async def run():
            port = await server.start()
            try:
                llm = OpenAICompatLLM(
                    "fake", base_url=f"http://127.0.0.1:{port}/v1",
                    api_key="k", max_retries=2)
                return await llm.acompletion(
                    ["hello"], structured_object=None, max_tokens=8)
            finally:
                await server.stop()

        (completion,) = asyncio.run(run())
        assert "natural_text" in completion.response
        assert completion.completion_tokens == 20

    def test_factory(self):
        assert isinstance(get_client("mock", "m"), MockLLM)
        with pytest.raises(ValueError):
            get_client("nope", "m")

    def test_credential_gate(self, monkeypatch):
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        with pytest.raises(EnvironmentError):
            OpenAICompatLLM("gpt-4o")
