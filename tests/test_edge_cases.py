"""Edge cases across the stack: multi-page documents, minimal token budgets,
empty inputs, oversized prompts."""

import asyncio
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from karanta_tpu.inference.engine import Engine, EngineConfig, GenRequest
from karanta_tpu.inference.tokenizer import ByteTokenizer
from karanta_tpu.models.qwen25_vl.config import tiny_config
from karanta_tpu.models.qwen25_vl.model import init_params
from tests.fake_server import FakeOpenAIServer
from tests.pdf_helpers import make_pdf

TOK = ByteTokenizer()
CFG = tiny_config(vocab_size=TOK.vocab_size)


@pytest.fixture(scope="module")
def engine():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=128, decode_chunk=4,
                        prefill_buckets=(64, 128),
                        image_token_buckets=(16,), dtype=jnp.float32)
    return Engine(params, CFG, TOK, ecfg)


class TestEngineEdges:
    def test_max_tokens_one(self, engine):
        (res,) = engine.generate([GenRequest(
            messages=[{"role": "user", "content": "x"}], max_tokens=1)])
        assert res.completion_tokens == 1

    def test_prompt_fills_bucket(self, engine):
        # prompt long enough to hit the largest prefill bucket; completion
        # budget is clamped to fit the cache
        long_text = "a" * 60
        (res,) = engine.generate([GenRequest(
            messages=[{"role": "user", "content": long_text}],
            max_tokens=4000)])
        assert res.prompt_tokens + res.completion_tokens <= 128

    def test_prompt_too_long_raises(self, engine):
        from karanta_tpu.inference.engine import ContextLengthError

        # rejected at prepare, before any device work (maps to HTTP 400)
        with pytest.raises(ContextLengthError):
            engine.prepare(GenRequest(
                messages=[{"role": "user", "content": "b" * 500}]))

    def test_empty_user_text(self, engine):
        (res,) = engine.generate([GenRequest(
            messages=[{"role": "user", "content": ""}], max_tokens=4)])
        assert res.completion_tokens >= 1

    def test_grayscale_png_input(self, engine):
        """The pipeline sends L-mode (grayscale) PNGs (convert_to_grayscale);
        the engine must normalize them to RGB."""
        import base64
        import io

        from PIL import Image

        img = Image.fromarray(
            np.random.default_rng(3).integers(0, 255, (56, 56), dtype=np.uint8),
            mode="L")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        (res,) = engine.generate([GenRequest(messages=[{
            "role": "user",
            "content": [
                {"type": "text", "text": "read"},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
            ]}], max_tokens=4)])
        assert res.prompt_tokens > 10


class TestMultiPagePipeline:
    def test_two_page_scanned_doc(self, tmp_path):
        """A 2-page image PDF produces a Dolma doc with two page spans."""
        from PIL import Image

        from karanta_tpu.pdf.minipdf import PdfDocument
        from karanta_tpu.pipeline.runner import PipelineArgs, amain

        # build a 2-page PDF: two embedded JPEG pages
        from karanta_tpu.pdf.primitives import convert_image_to_pdf_bytes
        from karanta_tpu.pdf.writer import extract_page

        rng = np.random.default_rng(0)
        pages = []
        for _ in range(2):
            img = Image.fromarray(rng.integers(180, 255, (60, 48, 3),
                                               dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            pages.append(convert_image_to_pdf_bytes(buf.getvalue()))
        # merge: write both single-page PDFs, then rebuild a 2-page PDF by
        # concatenating their page objects via the test helper
        merged = _merge_two_single_page_pdfs(pages[0], pages[1])
        pdf_path = tmp_path / "two.pdf"
        pdf_path.write_bytes(merged)
        assert PdfDocument.open(str(pdf_path)).num_pages() == 2

        calls = []
        server = FakeOpenAIServer()

        def responder(request, idx):
            calls.append(idx)
            return 200, server.completion(
                [server.page_json(f"page text {idx}")])

        server.responder = responder

        async def run():
            await server.start()
            try:
                args = PipelineArgs(
                    workspace=str(tmp_path / "ws"), pdfs=[str(pdf_path)],
                    server=server.url, workers=1, max_page_retries=2,
                    target_longest_image_dim=128)
                await amain(args)
                return args
            finally:
                await server.stop()

        args = asyncio.run(run())
        results_dir = os.path.join(args.workspace, "results")
        docs = []
        for name in os.listdir(results_dir):
            with open(os.path.join(results_dir, name)) as f:
                docs += [json.loads(line) for line in f if line.strip()]
        assert len(docs) == 1
        spans = docs[0]["attributes"]["pdf_page_numbers"]
        assert [s[2] for s in spans] == [1, 2]
        assert len(calls) == 2


def _merge_two_single_page_pdfs(pdf_a: bytes, pdf_b: bytes) -> bytes:
    """Crude 2-page merge for tests: re-embed both page images."""
    from karanta_tpu.pdf.minipdf import Name, PdfDocument, Stream

    import zlib

    parts = []
    for data in (pdf_a, pdf_b):
        doc = PdfDocument.open(data)
        page = doc.pages[0]
        res = doc.resolve(page.get(Name("Resources")))
        xo = doc.resolve(doc.resolve(res[Name("XObject")])[Name("Im0")])
        w = doc.resolve(xo.dict[Name("Width")])
        h = doc.resolve(xo.dict[Name("Height")])
        parts.append((xo.raw, int(w), int(h),
                      str(doc.resolve(xo.dict[Name("Filter")]))))

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    objects = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
    for i, (raw, w, h, filt) in enumerate(parts):
        img_num = 5 + i * 2
        content_num = 6 + i * 2
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /XObject << /Im0 {img_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>".encode())
    for raw, w, h, filt in parts:
        objects.append(
            (f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
             f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /{filt} "
             f"/Length {len(raw)} >>").encode()
            + b"\nstream\n" + raw + b"\nendstream")
        content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
        objects.append(f"<< /Length {len(content)} >>".encode()
                       + b"\nstream\n" + content + b"\nendstream")
    ordered = objects  # append order already matches numbering
    offsets = []
    for i, body in enumerate(ordered, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(ordered) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(f"trailer\n<< /Size {len(ordered) + 1} /Root 1 0 R >>\n"
              f"startxref\n{xref}\n%%EOF\n".encode())
    return out.getvalue()
