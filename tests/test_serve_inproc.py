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
