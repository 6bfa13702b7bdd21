"""Queue-depth admission control, remote document fetch, preflight checks.

Mirrors the reference's worker-ramp semantics (pipeline.py:815-843,1366):
workers start gated on one permit; more are minted only when the engine's
waiting queue drains below 20% of peak running.
"""

import asyncio
import json
import os

import pytest

from karanta_tpu.pipeline.runner import PipelineArgs, admission_controller, amain
from tests.fake_server import FakeOpenAIServer
from tests.test_pipeline import _args, _scanned_pdf
from tests.test_pipeline_queue import _MemStore


class TestAdmissionController:
    def test_release_requires_drained_queue(self, tmp_path):
        """No permit while waiting is high; one permit once the queue drains
        and running has decreased."""
        server = FakeOpenAIServer()
        server.metrics = {"running": 5, "waiting": 5}

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url,
                             admission_poll_interval=0.02,
                             admission_release_interval=0.0)
                sem = asyncio.Semaphore(1)
                await sem.acquire()  # all permits in use
                stop = asyncio.Event()
                task = asyncio.create_task(
                    admission_controller(args, sem, stop))

                # waiting=5 > 20% of peak running (5) -> no release
                await asyncio.sleep(0.3)
                assert sem.locked()

                # queue drains + running decreases -> exactly the gate opens
                server.metrics = {"running": 2, "waiting": 0}
                for _ in range(100):
                    if not sem.locked():
                        break
                    await asyncio.sleep(0.02)
                assert not sem.locked(), "permit was never released"

                stop.set()
                await task
            finally:
                await server.stop()

        asyncio.run(run())

    def test_no_release_while_running_grows(self, tmp_path):
        """Even with an empty waiting queue, a busy engine whose running
        count never decreased (and is nonzero) gets no extra workers."""
        server = FakeOpenAIServer()
        server.metrics = {"running": 3, "waiting": 0}

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url,
                             admission_poll_interval=0.02,
                             admission_release_interval=0.0)
                sem = asyncio.Semaphore(1)
                await sem.acquire()
                stop = asyncio.Event()
                task = asyncio.create_task(
                    admission_controller(args, sem, stop))
                await asyncio.sleep(0.3)
                assert sem.locked()
                stop.set()
                await task
            finally:
                await server.stop()

        asyncio.run(run())

    def test_starved_engine_fast_ramps(self, tmp_path):
        """A server advertising idle decode slots (running < slots, empty
        queue) releases at the poll cadence, bypassing both the release
        timer and the running-decreased gate — an under-filled engine can't
        be overloaded by admitting more work."""
        server = FakeOpenAIServer()
        # same running/waiting as test_no_release_while_running_grows, but
        # the server advertises capacity: 3 of 64 slots busy
        server.metrics = {"running": 3, "waiting": 0, "slots": 64}

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url,
                             admission_poll_interval=0.02,
                             admission_release_interval=60.0)
                sem = asyncio.Semaphore(1)
                await sem.acquire()
                stop = asyncio.Event()
                task = asyncio.create_task(
                    admission_controller(args, sem, stop))
                for _ in range(100):
                    if not sem.locked():
                        break
                    await asyncio.sleep(0.02)
                assert not sem.locked(), "starved engine never fast-ramped"
                stop.set()
                await task
            finally:
                await server.stop()

        asyncio.run(run())


class TestAdmissionFallback:
    def test_unreachable_metrics_releases_on_timer(self, tmp_path):
        """A dead/unscrapable metrics endpoint must not wedge the pipeline:
        after ~30 failed polls the controller falls back to timed releases."""

        async def run():
            args = _args(tmp_path, "http://127.0.0.1:1/v1",  # nothing there
                         admission_poll_interval=0.01,
                         admission_release_interval=0.0)
            sem = asyncio.Semaphore(1)
            await sem.acquire()
            stop = asyncio.Event()
            task = asyncio.create_task(admission_controller(args, sem, stop))
            for _ in range(300):
                if not sem.locked():
                    break
                await asyncio.sleep(0.02)
            assert not sem.locked(), "controller never fell back"
            stop.set()
            await task

        asyncio.run(run())


class TestAdmissionEndToEnd:
    def test_workers_ramp_with_queue_depth(self, tmp_path):
        """Two one-document groups, two workers: while the engine reports a
        deep waiting queue only the first group runs; once it drains the
        second is admitted and the run completes."""
        pdfs = [_scanned_pdf(tmp_path, f"ramp{i}.pdf") for i in range(2)]
        server = FakeOpenAIServer()
        server.metrics = {"running": 5, "waiting": 5}

        async def run():
            await server.start()
            try:
                args = _args(tmp_path, server.url, pdfs=pdfs, workers=2,
                             pages_per_group=1,  # one document per group
                             admission_poll_interval=0.02,
                             admission_release_interval=0.0)
                main_task = asyncio.create_task(amain(args))
                results_dir = os.path.join(args.workspace, "results")

                # first group completes on the initial permit; the second
                # stays gated while the queue is deep
                for _ in range(200):
                    done = (os.path.isdir(results_dir)
                            and len(os.listdir(results_dir)) >= 1)
                    if done:
                        break
                    await asyncio.sleep(0.05)
                assert len(os.listdir(results_dir)) == 1
                await asyncio.sleep(0.3)
                assert len(os.listdir(results_dir)) == 1, \
                    "second group ran despite a saturated engine queue"
                assert not main_task.done()

                server.metrics = {"running": 1, "waiting": 0}
                await asyncio.wait_for(main_task, timeout=30)
                assert len(os.listdir(results_dir)) == 2
            finally:
                await server.stop()

        asyncio.run(run())


class TestRemoteDocumentFetch:
    def test_pipeline_fetches_pdfs_from_object_store(self, tmp_path,
                                                     monkeypatch):
        """Work documents live on s3:// (not just the workspace): the hot
        path fetches them through the store with the workspace remote too —
        the fully-remote deployment the reference runs
        (pipeline.py:456-470)."""
        from karanta_tpu.pipeline import runner as runner_mod
        from karanta_tpu.pipeline import work_queue as wq

        store = _MemStore()
        monkeypatch.setitem(wq.STORE_FACTORIES, "s3", lambda bucket: store)
        wq.clear_store_cache()

        local = [_scanned_pdf(tmp_path, f"s{i}.pdf") for i in range(2)]
        uris = []
        for i, path in enumerate(local):
            with open(path, "rb") as f:
                store.put(f"docs/s{i}.pdf", f.read())
            uris.append(f"s3://bucket/docs/s{i}.pdf")

        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                await amain(_args(tmp_path, server.url, pdfs=uris,
                                  workspace="s3://bucket/jobs/remote-docs"))
            finally:
                await server.stop()
                wq.clear_store_cache()

        asyncio.run(run())
        result_keys = [k for k in store.objects
                       if k.startswith("jobs/remote-docs/results/")]
        assert result_keys
        docs = []
        for key in result_keys:
            docs += [json.loads(line)
                     for line in store.objects[key].decode().splitlines()
                     if line.strip()]
        assert len(docs) == 2
        assert {d["metadata"]["Source-File"] for d in docs} == set(uris)

    def test_fetch_backoff_then_success(self, monkeypatch):
        from karanta_tpu.pipeline import work_queue as wq

        class FlakyStore(_MemStore):
            def __init__(self):
                super().__init__()
                self.failures = 2

            def get(self, key):
                if self.failures:
                    self.failures -= 1
                    raise ConnectionError("transient")
                return super().get(key)

        store = FlakyStore()
        store.put("k/doc.pdf", b"%PDF-data")
        monkeypatch.setitem(wq.STORE_FACTORIES, "s3", lambda bucket: store)
        wq.clear_store_cache()
        try:
            data = wq.fetch_remote_bytes("s3://b/k/doc.pdf", base_delay=0.01)
            assert data == b"%PDF-data"
        finally:
            wq.clear_store_cache()

    def test_fetch_missing_raises_file_not_found(self, monkeypatch):
        from karanta_tpu.pipeline import work_queue as wq

        monkeypatch.setitem(wq.STORE_FACTORIES, "s3",
                            lambda bucket: _MemStore())
        wq.clear_store_cache()
        try:
            with pytest.raises(FileNotFoundError):
                wq.fetch_remote_bytes("s3://b/missing.pdf", base_delay=0.01)
        finally:
            wq.clear_store_cache()


class TestPreflight:
    def test_rasterizer_check_passes(self):
        from karanta_tpu.pipeline.preflight import check_rasterizer

        check_rasterizer()

    def test_device_check(self, monkeypatch):
        from karanta_tpu.pipeline.preflight import check_device

        # tests run on the virtual CPU platform: accelerator check must fail
        # unless explicitly allowed
        monkeypatch.delenv("KARANTA_ALLOW_CPU", raising=False)
        with pytest.raises(RuntimeError):
            check_device(require_accelerator=True)
        monkeypatch.setenv("KARANTA_ALLOW_CPU", "1")
        check_device(require_accelerator=True)
        monkeypatch.delenv("KARANTA_ALLOW_CPU", raising=False)
        check_device(require_accelerator=False)
