"""System test: the pipeline spawns and supervises its own inference-server
subprocess (--serve-inproc), the full loop runs against it."""

import asyncio
import io
import os
import socket

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_pipeline_spawns_and_supervises_server(tmp_path, monkeypatch):
    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes
    from karanta_tpu.pipeline.runner import PipelineArgs, amain

    # the spawned server must run on CPU in tests; preflight must accept it
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("KARANTA_ALLOW_CPU", "1")

    img = Image.fromarray(np.random.default_rng(0).integers(
        180, 255, (60, 48, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    pdf_path = tmp_path / "scan.pdf"
    pdf_path.write_bytes(convert_image_to_pdf_bytes(buf.getvalue()))

    port = _free_port()
    args = PipelineArgs(
        workspace=str(tmp_path / "ws"), pdfs=[str(pdf_path)],
        server=f"http://127.0.0.1:{port}/v1", workers=1,
        max_page_retries=1, max_page_error_rate=1.0,
        target_longest_image_dim=64, serve_inproc=True,
        server_extra_args=["--preset", "tiny", "--max-batch-size", "2",
                           "--max-model-len", "256"])
    asyncio.run(amain(args))

    results = os.listdir(os.path.join(args.workspace, "results"))
    assert len(results) == 1


def test_pipeline_restarts_crashed_server(tmp_path, monkeypatch):
    """Kill the spawned inference server mid-run: the supervisor restarts it
    (reference pipeline.py:865-882) and the transport-error backoff retries
    the in-flight pages until the restarted server answers — every document
    still completes."""
    from PIL import Image

    from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes
    from karanta_tpu.pipeline import runner

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("KARANTA_ALLOW_CPU", "1")
    monkeypatch.setenv("KARANTA_BACKOFF_BASE", "0.5")  # don't sleep minutes

    spawned = []
    orig_spawn = runner._spawn_server

    async def spy(args):
        proc = await orig_spawn(args)
        spawned.append(proc)
        return proc

    monkeypatch.setattr(runner, "_spawn_server", spy)

    rng = np.random.default_rng(0)
    pdfs = []
    for i in range(4):
        img = Image.fromarray(rng.integers(180, 255, (60, 48, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        path = tmp_path / f"scan_{i}.pdf"
        path.write_bytes(convert_image_to_pdf_bytes(buf.getvalue()))
        pdfs.append(str(path))

    port = _free_port()
    args = runner.PipelineArgs(
        workspace=str(tmp_path / "ws"), pdfs=pdfs,
        server=f"http://127.0.0.1:{port}/v1", workers=1,
        pages_per_group=1,  # one work group per pdf: work remains post-kill
        max_page_retries=2, max_page_error_rate=1.0,
        target_longest_image_dim=64, serve_inproc=True,
        server_extra_args=["--preset", "tiny", "--max-batch-size", "2",
                           "--max-model-len", "256"])

    async def drive():
        run_task = asyncio.create_task(runner.amain(args))
        results_dir = os.path.join(args.workspace, "results")
        # wait for the first completed group, then crash the server
        while not (os.path.isdir(results_dir) and os.listdir(results_dir)):
            if run_task.done():
                await run_task  # surface an early failure
                raise AssertionError("pipeline finished before the kill")
            await asyncio.sleep(0.2)
        assert spawned and spawned[0].returncode is None
        spawned[0].kill()
        await run_task

    asyncio.run(drive())
    assert len(spawned) >= 2, "supervisor never restarted the server"
    results = os.listdir(os.path.join(args.workspace, "results"))
    assert len(results) == 4
