"""Pipeline tests: end-to-end against the fake OpenAI server, retry ladder,
rotation correction, failure budget, Dolma schema, work queue, stats."""

import asyncio
import io
import json
import os

import numpy as np
import pytest

from karanta_tpu.pipeline.dolma import (
    ListPageResponse, PageResponse, PageResult, build_dolma_document,
)
from karanta_tpu.pipeline.runner import (
    PipelineArgs, amain, print_stats, process_page,
)
from karanta_tpu.pipeline.work_queue import LocalBackend, WorkQueue
from tests.fake_server import FakeOpenAIServer
from tests.pdf_helpers import make_pdf


def _scanned_pdf(tmp_path, name="scan.pdf"):
    """An image-only PDF (the scanned-document case) renderable natively."""
    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes

    rng = np.random.default_rng(42)
    img = Image.fromarray(rng.integers(200, 255, (400, 300, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    pdf = convert_image_to_pdf_bytes(buf.getvalue())
    path = tmp_path / name
    path.write_bytes(pdf)
    return str(path)


def _args(tmp_path, server_url, **kw):
    defaults = dict(
        workspace=str(tmp_path / "ws"), server=server_url, workers=2,
        max_page_retries=3, target_longest_image_dim=256,
        admission_poll_interval=0.02, admission_release_interval=0.0,
    )
    defaults.update(kw)
    return PipelineArgs(**defaults)


class TestWorkQueue:
    def test_populate_group_and_resume(self, tmp_path):
        backend = LocalBackend(str(tmp_path / "ws"))
        queue = WorkQueue(backend)
        n = queue.populate_queue(["a.pdf", "b.pdf", "c.pdf"], items_per_group=2)
        assert n == 2
        # repopulating with same paths adds nothing
        assert queue.populate_queue(["a.pdf", "b.pdf", "c.pdf"], 2) == 2
        assert queue.initialize_queue() == 2

        async def drain():
            item = await queue.get_work()
            # simulate completion: write result file
            os.makedirs(backend.results_dir, exist_ok=True)
            open(backend.output_path(item.hash), "w").close()
            await queue.mark_done(item)

        asyncio.run(drain())
        fresh = WorkQueue(LocalBackend(backend.workspace))
        assert fresh.initialize_queue() == 1  # one group already done


class TestDolma:
    def test_document_schema(self):
        results = [
            PageResult("doc.pdf", 1, ListPageResponse(
                pages=[PageResponse(natural_text="page one")]),
                input_tokens=10, output_tokens=5, is_fallback=False),
            PageResult("doc.pdf", 2, ListPageResponse(
                pages=[PageResponse(natural_text="page two", is_table=True)]),
                input_tokens=12, output_tokens=6, is_fallback=True),
        ]
        doc = build_dolma_document("doc.pdf", results)
        assert doc["text"] == "page one\npage two"
        assert doc["attributes"]["pdf_page_numbers"] == [[0, 9, 1], [9, 17, 2]]
        assert doc["attributes"]["is_table"] == [False, True]
        assert doc["metadata"]["total-fallback-pages"] == 1
        assert len(doc["id"]) == 40

    def test_empty_document_is_none(self):
        results = [PageResult("d.pdf", 1, ListPageResponse(
            pages=[PageResponse(natural_text=None)]), 0, 0, False)]
        assert build_dolma_document("d.pdf", results) is None

    def test_rotation_validation(self):
        with pytest.raises(ValueError):
            PageResponse(natural_text="x", rotation_correction=45)


class TestProcessPage:
    def test_retry_ladder_temperatures(self, tmp_path):
        pdf = _scanned_pdf(tmp_path)
        server = FakeOpenAIServer()
        seen_temps = []

        def responder(request, idx):
            seen_temps.append(request["temperature"])
            if idx < 2:
                return 500, b"boom"
            return 200, server.completion([server.page_json("recovered")])

        server.responder = responder

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url)
                return await process_page(args, 0, pdf, pdf, 1)
            finally:
                await server.stop()

        result = asyncio.run(run())
        assert not result.is_fallback
        assert result.response.pages[0].natural_text == "recovered"
        assert seen_temps == [0.1, 0.1, 0.2]

    def test_rotation_correction_loop(self, tmp_path):
        pdf = _scanned_pdf(tmp_path)
        server = FakeOpenAIServer()

        def responder(request, idx):
            if idx == 0:
                return 200, server.completion([server.page_json(
                    "sideways", is_rotation_valid=False,
                    rotation_correction=90)])
            return 200, server.completion([server.page_json("upright")])

        server.responder = responder

        async def run():
            await server.start()
            try:
                return await process_page(
                    _args(tmp_path, server.url), 0, pdf, pdf, 1)
            finally:
                await server.stop()

        result = asyncio.run(run())
        assert result.response.pages[0].natural_text == "upright"
        assert len(server.calls) == 2

    def test_fallback_after_exhaustion(self, tmp_path):
        pdf = _scanned_pdf(tmp_path)
        server = FakeOpenAIServer(lambda req, idx: (500, b"always broken"))

        async def run():
            await server.start()
            try:
                return await process_page(
                    _args(tmp_path, server.url), 0, pdf, pdf, 1)
            finally:
                await server.stop()

        result = asyncio.run(run())
        assert result.is_fallback


class TestEndToEnd:
    def test_pipeline_produces_dolma_and_markdown(self, tmp_path):
        pdfs = [_scanned_pdf(tmp_path, f"doc{i}.pdf") for i in range(3)]
        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url, pdfs=pdfs, markdown=True)
                await amain(args)
                return args
            finally:
                await server.stop()

        args = asyncio.run(run())
        results_dir = os.path.join(args.workspace, "results")
        files = os.listdir(results_dir)
        assert files, "no result files written"
        docs = []
        for name in files:
            with open(os.path.join(results_dir, name)) as f:
                docs += [json.loads(line) for line in f if line.strip()]
        assert len(docs) == 3
        for doc in docs:
            assert doc["text"] == "Hello from fake model"
            assert doc["metadata"]["pdf-total-pages"] == 1
        md_dir = os.path.join(args.workspace, "markdown")
        assert len(os.listdir(md_dir)) == 3

        stats = print_stats(args.workspace)
        assert stats["documents"] == 3 and stats["pages"] == 3

        # resume: re-running does nothing (idempotent completion markers)
        async def rerun():
            await server.start()
            try:
                calls_before = len(server.calls)
                await amain(_args(tmp_path, server.url, pdfs=pdfs))
                return calls_before
            finally:
                await server.stop()

        before = asyncio.run(rerun())
        assert len(server.calls) == before  # no new model calls


class TestEndToEndRemoteWorkspace:
    def test_pipeline_over_object_store(self, tmp_path, monkeypatch):
        """Full pipeline run against an s3:// workspace backed by an
        in-memory object store: results upload, completion markers live
        remotely, and a fresh mirror resumes without rework."""
        from karanta_tpu.pipeline import runner as runner_mod
        from karanta_tpu.pipeline.work_queue import RemoteBackend
        from tests.test_pipeline_queue import _MemStore

        store = _MemStore()
        mirrors = iter([str(tmp_path / "m1"), str(tmp_path / "m2")])

        def fake_make_backend(workspace):
            return RemoteBackend(workspace, store=store,
                                 local_mirror=next(mirrors))

        monkeypatch.setattr(runner_mod, "make_backend", fake_make_backend)
        pdfs = [_scanned_pdf(tmp_path, f"r{i}.pdf") for i in range(2)]
        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                await amain(_args(tmp_path, server.url, pdfs=pdfs,
                                  workspace="s3://bucket/jobs/run1"))
            finally:
                await server.stop()

        asyncio.run(run())
        uploaded = [k for k in store.objects if k.startswith("jobs/run1/results/")]
        assert uploaded, store.objects.keys()
        docs = []
        for key in uploaded:
            docs += [json.loads(line)
                     for line in store.objects[key].decode().splitlines()
                     if line.strip()]
        assert len(docs) == 2
        assert all(d["text"] == "Hello from fake model" for d in docs)
        assert "jobs/run1/work_index_list.csv.zstd" in store.objects

        # resume from a different machine (fresh mirror): nothing to do
        async def rerun():
            await server.start()
            try:
                before = len(server.calls)
                await amain(_args(tmp_path, server.url, pdfs=pdfs,
                                  workspace="s3://bucket/jobs/run1"))
                return before
            finally:
                await server.stop()

        before = asyncio.run(rerun())
        assert len(server.calls) == before  # no pages reprocessed


class TestSpeculativeAutoEnable:
    """The pipeline's per-request speculation hint (VERDICT r2 #1): pages
    with a non-trivial anchor vote speculation ON, scanned pages vote it
    OFF, and the flag reaches the server request body verbatim."""

    def _captured_request(self, tmp_path, pdf):
        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url, max_page_retries=1)
                await process_page(args, 0, pdf, pdf, 1)
            finally:
                await server.stop()

        asyncio.run(run())
        return server.calls[0]

    def test_scanned_page_votes_off(self, tmp_path):
        body = self._captured_request(tmp_path, _scanned_pdf(tmp_path))
        assert body["speculative"] is False

    def test_anchored_page_votes_on(self, tmp_path):
        from karanta_tpu.data.synthetic import page_to_pdf_bytes

        text = "\n".join(f"line {i} of the page text layer" for i in range(20))
        img = np.full((400, 300, 3), 250, np.uint8)
        path = tmp_path / "anchored.pdf"
        path.write_bytes(page_to_pdf_bytes(img, text_layer=text))
        body = self._captured_request(tmp_path, str(path))
        assert body["speculative"] is True
