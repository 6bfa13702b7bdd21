"""Bulk layer tests: job store, least-loaded routing, dispatcher retries,
end-to-end CLI with resume."""

import asyncio
import json
import os

import pytest

from karanta_tpu.bulk.database import JobDatabase
from karanta_tpu.bulk.dispatcher import BulkDispatcher, ServerRouter
from karanta_tpu.bulk.main import amain, parse_args
from tests.fake_server import FakeOpenAIServer


def _requests(n=5):
    return [{"custom_id": f"req-{i}",
             "messages": [{"role": "user", "content": f"page {i}"}],
             "max_tokens": 16} for i in range(n)]


class TestJobDatabase:
    def test_create_and_progress(self, tmp_path):
        db = JobDatabase(str(tmp_path / "jobs.db"))
        job_id = db.create_job(_requests(3))
        job = db.get_job(job_id)
        assert job["total_tasks"] == 3
        assert job["progress"] == 0.0

        tasks = db.get_pending_tasks(job_id)
        assert len(tasks) == 3
        db.update_task_status(tasks[0]["task_id"], "processing")
        db.update_task_status(tasks[0]["task_id"], "completed",
                              result_path="/r/0.json")
        job = db.get_job(job_id)
        assert job["status_counts"]["completed"] == 1
        assert 0 < job["progress"] < 1

    def test_failed_retry_eligibility(self, tmp_path):
        db = JobDatabase(str(tmp_path / "jobs.db"))
        job_id = db.create_job(_requests(1))
        (task,) = db.get_pending_tasks(job_id)
        for _ in range(3):
            db.update_task_status(task["task_id"], "processing")
            db.update_task_status(task["task_id"], "failed", error="x")
        assert db.get_pending_tasks(job_id, max_retries=10)
        assert not db.get_pending_tasks(job_id, max_retries=3)

    def test_analytics(self, tmp_path):
        db = JobDatabase(str(tmp_path / "jobs.db"))
        job_id = db.create_job(_requests(2))
        for task in db.get_pending_tasks(job_id):
            db.update_task_status(task["task_id"], "processing")
            db.update_task_status(task["task_id"], "completed")
        stats = db.get_job_analytics(job_id)
        assert stats["n"] == 2
        assert stats["avg_ms"] is not None


class TestDispatcher:
    def test_processes_all_tasks(self, tmp_path):
        server = FakeOpenAIServer()

        async def run():
            await server.start()
            try:
                db = JobDatabase(str(tmp_path / "jobs.db"))
                job_id = db.create_job(_requests(6))
                router = ServerRouter([server.url.replace("/v1", "")])
                dispatcher = BulkDispatcher(db, router,
                                            str(tmp_path / "results"),
                                            concurrency=3)
                return await dispatcher.run_job(job_id), db, job_id
            finally:
                await server.stop()

        job, db, job_id = asyncio.run(run())
        assert job["status_counts"].get("completed") == 6
        results = os.listdir(tmp_path / "results")
        assert len(results) == 6
        with open(tmp_path / "results" / sorted(results)[0]) as f:
            payload = json.load(f)
        assert payload["response"]["choices"][0]["message"]["content"]

    def test_retries_transient_failures(self, tmp_path):
        server = FakeOpenAIServer()
        fail_once = set()

        def responder(request, idx):
            key = request["messages"][0]["content"]
            if key not in fail_once:
                fail_once.add(key)
                return 500, b"transient"
            return 200, server.completion([server.page_json("ok")])

        server.responder = responder

        async def run():
            await server.start()
            try:
                db = JobDatabase(str(tmp_path / "jobs.db"))
                job_id = db.create_job(_requests(4))
                router = ServerRouter([server.url.replace("/v1", "")])
                dispatcher = BulkDispatcher(db, router,
                                            str(tmp_path / "results"),
                                            concurrency=2, max_retries=5)
                return await dispatcher.run_job(job_id)
            finally:
                await server.stop()

        job = asyncio.run(run())
        assert job["status_counts"].get("completed") == 4


class TestBulkCLI:
    def test_end_to_end_with_resume(self, tmp_path):
        reqs_dir = tmp_path / "reqs"
        reqs_dir.mkdir()
        with open(reqs_dir / "batch0.jsonl", "w") as f:
            for req in _requests(3):
                f.write(json.dumps(req) + "\n")
        # OpenAI batch format variant
        with open(reqs_dir / "batch1.jsonl", "w") as f:
            f.write(json.dumps({
                "custom_id": "b1-0",
                "body": {"messages": [{"role": "user", "content": "x"}],
                         "max_tokens": 8}}) + "\n")

        server = FakeOpenAIServer()

        async def run():
            port = await server.start()
            try:
                args = parse_args([
                    "--input", str(reqs_dir), "--output", str(tmp_path / "out"),
                    "--servers", f"http://127.0.0.1:{port}"])
                jobs = await amain(args)
                calls1 = len(server.calls)
                jobs2 = await amain(args)  # resume: all results exist
                return jobs, calls1, len(server.calls), jobs2
            finally:
                await server.stop()

        jobs, calls1, calls2, jobs2 = asyncio.run(run())
        assert len(jobs) == 2
        assert jobs[0]["status_counts"].get("completed") == 3
        assert calls1 == 4
        assert calls2 == 4  # no re-processing on resume
        assert (tmp_path / "out" / "batch0" / "job_id.txt").exists()
