"""Bench runners: the karanta pipeline method + anchor-text baseline.

Parity with reference karanta/bench/runners/run_karanta_pipeline.py:28-115:
adapts pipeline.process_page into the bench method signature
async fn(pdf_path, page_num, **kwargs) -> markdown text | None.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass, field
from typing import Optional

from karanta_tpu.constants import PIPELINE_IMAGE_DIM


@dataclass
class RunnerArgs:
    """Mirror of the pipeline args the runner needs
    (reference run_karanta_pipeline.py:28-43)."""

    model: str = "karanta-ocr"
    server: str = "http://localhost:30024/v1"
    target_longest_image_dim: int = PIPELINE_IMAGE_DIM
    max_page_retries: int = 8
    max_page_error_rate: float = 0.004
    prompt_key: str = "olmo_ocr_system_prompt"
    prompt_path: Optional[str] = None
    guided_decoding: bool = False
    api_key: Optional[str] = None
    workspace: str = field(default="/tmp/karanta_bench_ws")


_server_check_lock = asyncio.Lock()
_server_checked: set[str] = set()


async def run_karanta_pipeline(pdf_path: str, page_num: int,
                               **kwargs) -> Optional[str]:
    """OCR one page through the pipeline's process_page against a server."""
    from karanta_tpu.pipeline.runner import process_page, server_ready

    args = RunnerArgs(**{k: v for k, v in kwargs.items()
                         if k in RunnerArgs.__dataclass_fields__})

    async with _server_check_lock:
        if args.server not in _server_checked:
            if not await server_ready(args.server, attempts=30):
                raise RuntimeError(f"server {args.server} not ready")
            _server_checked.add(args.server)

    result = await process_page(args, 0, pdf_path, pdf_path, page_num)
    if result.is_fallback:
        return None
    return result.response.natural_text


async def run_anchor_baseline(pdf_path: str, page_num: int,
                              **kwargs) -> Optional[str]:
    """No-model baseline: the PDF's own text layer, linearized."""
    from karanta_tpu.pdf.anchor import get_anchor_text

    text = await asyncio.to_thread(
        get_anchor_text, pdf_path, page_num, "pdftotext")
    return text or None
