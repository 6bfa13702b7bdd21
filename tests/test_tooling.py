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


class TestAzureClient:
    """Azure URL/auth shape + structured-output channels (reference
    karanta/llm_clients/azure_client.py:28-154)."""

    def _run(self, server, client_fn):
        async def run():
            port = await server.start()
            try:
                return await client_fn(port)
            finally:
                await server.stop()
        return asyncio.run(run())

    def test_api_version_in_url_and_api_key_header(self, monkeypatch):
        from karanta_tpu.llm_clients.openai_client import AzureOpenAILLM

        server = FakeOpenAIServer()
        monkeypatch.setenv("AZURE_OPENAI_API_KEY", "sekret")

        async def go(port):
            monkeypatch.setenv("AZURE_OPENAI_ENDPOINT",
                               f"http://127.0.0.1:{port}")
            llm = AzureOpenAILLM("gpt-4o", deployment="dep1",
                                 api_version="2024-10-21", max_retries=1)
            return await llm.acompletion(["hi"], max_tokens=4)

        (completion,) = self._run(server, go)
        assert completion.completion_tokens == 20
        raw = server.raw_calls[0]
        assert raw["path"] == "/openai/deployments/dep1/chat/completions"
        assert raw["query"] == "api-version=2024-10-21"
        assert raw["headers"].get("api-key") == "sekret"
        # api-version must NOT leak into the JSON body (real Azure rejects it)
        assert "api-version" not in json.loads(raw["body"])
        assert "authorization" not in raw["headers"]

    def test_new_api_uses_json_schema_response_format(self, monkeypatch):
        from karanta_tpu.llm_clients.openai_client import AzureOpenAILLM

        server = FakeOpenAIServer(lambda req, i: (
            200, FakeOpenAIServer.completion(FakeOpenAIServer.page_json())))
        monkeypatch.setenv("AZURE_OPENAI_API_KEY", "k")

        async def go(port):
            monkeypatch.setenv("AZURE_OPENAI_ENDPOINT",
                               f"http://127.0.0.1:{port}")
            llm = AzureOpenAILLM("gpt-4o", api_version="2024-08-01-preview",
                                 max_retries=1)
            return await llm.acompletion(["hi"],
                                         structured_object=PageAnalysis)

        (completion,) = self._run(server, go)
        assert isinstance(completion.response, PageAnalysis)
        body = server.calls[0]
        assert body["response_format"]["type"] == "json_schema"
        assert "tools" not in body

    def test_old_api_falls_back_to_function_tool(self, monkeypatch):
        from karanta_tpu.llm_clients.openai_client import AzureOpenAILLM

        def tool_responder(req, i):
            # old deployments answer structured requests via tool_calls
            # (reference azure_client.py:136-141)
            args = json.dumps(FakeOpenAIServer.page_json("tooled"))
            return 200, {
                "id": "fake-1", "object": "chat.completion", "model": "fake",
                "choices": [{
                    "index": 0,
                    "message": {"role": "assistant", "content": None,
                                "tool_calls": [{
                                    "id": "c1", "type": "function",
                                    "function": {"name": "PageAnalysis",
                                                 "arguments": args}}]},
                    "finish_reason": "tool_calls"}],
                "usage": {"prompt_tokens": 5, "completion_tokens": 9,
                          "total_tokens": 14},
            }

        server = FakeOpenAIServer(tool_responder)
        monkeypatch.setenv("AZURE_OPENAI_API_KEY", "k")

        async def go(port):
            monkeypatch.setenv("AZURE_OPENAI_ENDPOINT",
                               f"http://127.0.0.1:{port}")
            llm = AzureOpenAILLM("gpt-4o", api_version="2024-02-01",
                                 max_retries=1)
            return await llm.acompletion(["hi"],
                                         structured_object=PageAnalysis)

        (completion,) = self._run(server, go)
        assert isinstance(completion.response, PageAnalysis)
        assert completion.response.natural_text == "tooled"
        body = server.calls[0]
        assert body["tools"][0]["type"] == "function"
        assert body["tools"][0]["function"]["name"] == "PageAnalysis"
        assert "response_format" not in body

    def test_azure_old_forces_tools_even_on_new_api(self, monkeypatch):
        from karanta_tpu.llm_clients.openai_client import AzureOldDeploymentsLLM

        monkeypatch.setenv("AZURE_OPENAI_API_KEY", "k")
        monkeypatch.setenv("AZURE_OPENAI_ENDPOINT", "http://x")
        llm = AzureOldDeploymentsLLM("gpt-4o",
                                     api_version="2025-01-01-preview")
        body = {"model": "m", "messages": []}
        llm._apply_structured(body, PageAnalysis)
        assert "tools" in body and "response_format" not in body


class TestProviderShims:
    """gemini/anthropic/together reached via their OpenAI-compat surfaces
    (reference litellm dispatch, karanta/llm_clients/litellm_client.py)."""

    def test_factory_builds_shims(self, monkeypatch):
        monkeypatch.setenv("GEMINI_API_KEY", "g")
        monkeypatch.setenv("ANTHROPIC_API_KEY", "a")
        monkeypatch.setenv("TOGETHER_API_KEY", "t")
        gem = get_client("gemini", "gemini-1.5-pro")
        assert "generativelanguage.googleapis.com" in gem.base_url
        ant = get_client("anthropic", "claude-sonnet-4-5")
        assert ant.extra_headers.get("anthropic-version")
        tog = get_client("together", "llama-3.1-70b")
        assert "together.xyz" in tog.base_url

    def test_shim_requires_key(self, monkeypatch):
        monkeypatch.delenv("GEMINI_API_KEY", raising=False)
        with pytest.raises(EnvironmentError):
            get_client("gemini", "gemini-1.5-pro")

    def test_shim_request_shape(self, monkeypatch):
        server = FakeOpenAIServer()

        async def go():
            port = await server.start()
            try:
                llm = get_client("anthropic", "claude-sonnet-4-5",
                                 api_key="sk-ant", max_retries=1,
                                 base_url=f"http://127.0.0.1:{port}/v1")
                return await llm.acompletion(["hello"], max_tokens=4)
            finally:
                await server.stop()

        (completion,) = asyncio.run(go())
        assert completion.completion_tokens == 20
        raw = server.raw_calls[0]
        assert raw["headers"].get("authorization") == "Bearer sk-ant"
        assert raw["headers"].get("anthropic-version")
