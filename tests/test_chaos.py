"""Fault-injection tests: the pipeline must complete every page — with no
anchor fallbacks — while the model server misbehaves in every way the retry
machinery claims to handle (HTTP 500, malformed JSON, dropped connections,
truncated generations, sustained outage).

Goes beyond the reference (SURVEY.md §5.3: fault injection absent in both);
the failure-handling semantics under test mirror
/root/reference/karanta/pipeline.py:275-453 (attempt ladder, transport
backoff without consuming attempts).
"""

import asyncio
import json
import os

import pytest

from karanta_tpu.pipeline.runner import PipelineArgs, amain, print_stats
from tests.fake_server import FakeOpenAIServer
from tests.test_pipeline import _scanned_pdf

TEXT = "chaos survived"


def _args(tmp_path, server_url, **kw):
    defaults = dict(
        workspace=str(tmp_path / "ws"), server=server_url, workers=2,
        max_page_retries=8, target_longest_image_dim=256,
        admission_poll_interval=0.02, admission_release_interval=0.0,
    )
    defaults.update(kw)
    return PipelineArgs(**defaults)


def _collect_docs(workspace):
    results_dir = os.path.join(workspace, "results")
    docs = []
    for name in os.listdir(results_dir):
        with open(os.path.join(results_dir, name)) as f:
            docs += [json.loads(line) for line in f if line.strip()]
    return docs


class TestChaosPipeline:
    def test_mixed_faults_complete_without_fallback(self, tmp_path,
                                                    monkeypatch):
        """Every 6-call window injects a 500, a garbage body, a connection
        drop, and a truncated generation; all pages must still finish with
        real model output."""
        monkeypatch.setenv("KARANTA_BACKOFF_BASE", "0.01")
        server = FakeOpenAIServer()

        def chaotic(request, idx):
            mode = idx % 6
            if mode == 0:
                return 500, {"error": "injected"}
            if mode == 1:
                return 200, b"{{{ not json"
            if mode == 2:
                raise RuntimeError("injected connection drop")
            if mode == 3:
                return 200, server.completion([server.page_json(TEXT)],
                                              finish_reason="length")
            return 200, server.completion([server.page_json(TEXT)])

        server.responder = chaotic
        pdfs = [_scanned_pdf(tmp_path, f"chaos{i}.pdf") for i in range(6)]

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url, pdfs=pdfs)
                await amain(args)
                return args
            finally:
                await server.stop()

        args = asyncio.run(run())
        docs = _collect_docs(args.workspace)
        assert len(docs) == 6
        # fallback pages would carry anchor text (empty for scanned PDFs),
        # not the model's output — so this also proves zero fallbacks
        assert all(doc["text"] == TEXT for doc in docs)
        assert len(server.calls) > 6  # faults actually forced retries

        stats = print_stats(args.workspace)
        assert stats["documents"] == 6 and stats["pages"] == 6

    def test_sustained_outage_then_recovery(self, tmp_path, monkeypatch):
        """The server drops every connection for a while, then recovers:
        transport backoff must ride out the outage without consuming page
        attempts, and every page completes."""
        monkeypatch.setenv("KARANTA_BACKOFF_BASE", "0.01")
        server = FakeOpenAIServer()
        outage_drops = 10

        def flaky(request, idx):
            if idx < outage_drops:
                raise RuntimeError("outage")
            return 200, server.completion([server.page_json(TEXT)])

        server.responder = flaky
        pdfs = [_scanned_pdf(tmp_path, f"out{i}.pdf") for i in range(3)]

        async def run():
            await server.start()
            try:
                # max_page_retries=2 < drops seen per page: only survivable
                # because transport errors don't consume attempts
                args = _args(tmp_path, server.url, pdfs=pdfs,
                             max_page_retries=2)
                await amain(args)
                return args
            finally:
                await server.stop()

        args = asyncio.run(run())
        docs = _collect_docs(args.workspace)
        assert len(docs) == 3
        assert all(doc["text"] == TEXT for doc in docs)
