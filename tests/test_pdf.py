"""PDF stack tests: reader, text extraction, anchor generation, primitives."""

import base64
import io

import numpy as np
import pytest

from karanta_tpu.pdf.anchor import get_anchor_text
from karanta_tpu.pdf.minipdf import PdfDocument
from karanta_tpu.pdf.primitives import (
    convert_image_to_pdf_bytes, get_image_dimensions,
    get_png_dimensions_from_base64, is_jpeg, is_pdf, is_png,
)
from karanta_tpu.pdf.textextract import extract_page_report, extract_plain_text
from tests.pdf_helpers import make_pdf

PAGES = [
    [(72, 720, "Hello TPU world"), (72, 700, "Second line of text")],
    [(100, 650, "Page two content")],
]


class TestMiniPdf:
    @pytest.mark.parametrize("compress", [False, True])
    def test_pages_and_mediabox(self, compress, tmp_path):
        data = make_pdf(PAGES, compress=compress)
        path = tmp_path / "t.pdf"
        path.write_bytes(data)
        doc = PdfDocument.open(str(path))
        assert doc.num_pages() == 2
        assert doc.media_box(0) == (0, 0, 612, 792)

    @pytest.mark.parametrize("compress", [False, True])
    def test_text_positions(self, compress):
        doc = PdfDocument.open(make_pdf(PAGES, compress=compress))
        report = extract_page_report(doc, 0)
        texts = {e.text: (e.x, e.y) for e in report.text_elements}
        assert texts["Hello TPU world"] == (72, 720)
        assert texts["Second line of text"] == (72, 700)

    def test_plain_text_order(self):
        doc = PdfDocument.open(make_pdf(PAGES))
        text = extract_plain_text(doc, 0)
        assert text.index("Hello TPU world") < text.index("Second line")

    def test_image_elements(self):
        doc = PdfDocument.open(make_pdf(PAGES, with_image=True))
        report = extract_page_report(doc, 0)
        assert len(report.image_elements) == 1
        im = report.image_elements[0]
        assert (im.x0, im.y0, im.x1, im.y1) == (50, 600, 150, 680)

    def test_escaped_strings(self):
        doc = PdfDocument.open(make_pdf([[(10, 10, "paren (x) and \\ back")]]))
        report = extract_page_report(doc, 0)
        assert report.text_elements[0].text == "paren (x) and \\ back"

    def test_render_mode_tracked(self):
        doc = PdfDocument.open(make_pdf(PAGES, text_render_mode=3))
        report = extract_page_report(doc, 0)
        assert all(el.render_mode == 3 for el in report.text_elements)
        doc2 = PdfDocument.open(make_pdf(PAGES))
        report2 = extract_page_report(doc2, 0)
        assert all(el.render_mode == 0 for el in report2.text_elements)


class TestAnchor:
    def test_pdfreport_format(self, tmp_path):
        path = tmp_path / "t.pdf"
        path.write_bytes(make_pdf(PAGES, with_image=True))
        anchor = get_anchor_text(str(path), 1, "pdfreport")
        assert anchor.startswith("Page dimensions: 612.0x792.0")
        assert "[72x720]Hello TPU world" in anchor
        assert "[Image 50x600 to 150x680]" in anchor

    def test_budget_respected(self, tmp_path):
        many = [[(50, 700 - 12 * i, f"line {i} " + "x" * 60)
                 for i in range(200)]]
        path = tmp_path / "big.pdf"
        path.write_bytes(make_pdf(many))
        anchor = get_anchor_text(str(path), 1, "pdfreport", target_length=1000)
        assert len(anchor) <= 1100
        # edge elements survive the budget
        assert "line 0 " in anchor and "line 199 " in anchor

    def test_pdftotext_engine(self, tmp_path):
        path = tmp_path / "t.pdf"
        path.write_bytes(make_pdf(PAGES))
        text = get_anchor_text(str(path), 2, "pdftotext")
        assert "Page two content" in text

    def test_malformed_returns_empty(self, tmp_path):
        path = tmp_path / "bad.pdf"
        path.write_bytes(b"%PDF-1.4 garbage")
        assert get_anchor_text(str(path), 1) == ""


class TestPrimitives:
    def test_png_dimensions(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (123, 45)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        assert get_png_dimensions_from_base64(b64) == (123, 45)

    def test_jpeg_dimensions(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (64, 32)).save(buf, format="JPEG")
        assert get_image_dimensions(buf.getvalue()) == (64, 32)

    def test_sniffers(self, tmp_path):
        from PIL import Image

        png = io.BytesIO()
        Image.new("RGB", (4, 4)).save(png, format="PNG")
        assert is_png(png.getvalue()) and not is_jpeg(png.getvalue())
        assert is_pdf(make_pdf(PAGES))

    def test_image_to_pdf_roundtrip(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(0).integers(0, 255, (40, 60, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        pdf_bytes = convert_image_to_pdf_bytes(buf.getvalue())
        doc = PdfDocument.open(pdf_bytes)
        assert doc.num_pages() == 1
        assert doc.media_box(0) == (0, 0, 60, 40)
        report = extract_page_report(doc, 0)
        assert len(report.image_elements) == 1

    def test_image_pdf_with_text_layer(self, tmp_path):
        """An OCRed-scan page: invisible text layer under the image is
        anchor-extractable, special chars escape, and rendering still
        returns the embedded image (not the born-digital text fallback)."""
        from PIL import Image

        from karanta_tpu.pdf.anchor import get_anchor_text
        from karanta_tpu.pdf.primitives import render_pdf_to_base64png
        from karanta_tpu.pdf.textextract import extract_plain_text

        rng = np.random.default_rng(1)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(200, 255, (80, 120, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        text = "line one (with) \\escapes\nline two"
        pdf_bytes = convert_image_to_pdf_bytes(buf.getvalue(),
                                               text_layer=text)
        path = tmp_path / "scan.pdf"
        path.write_bytes(pdf_bytes)
        doc = PdfDocument.open(str(path))
        extracted = extract_plain_text(doc, 0)
        assert "line one (with) \\escapes" in extracted
        assert "line two" in extracted
        anchor = get_anchor_text(str(path), 1, pdf_engine="pdfreport")
        assert "line one" in anchor
        # render: the near-white embedded image, not black glyph redraws
        b64 = render_pdf_to_base64png(str(path), 1, 128)
        arr = np.asarray(
            Image.open(io.BytesIO(base64.b64decode(b64))).convert("L"))
        assert (arr < 128).mean() < 0.01

    def test_dominant_image_with_visible_text_keeps_text(self, tmp_path):
        """Born-digital page with a >50%-coverage image AND visible text:
        the fallback renderer must draw both (the image-only shortcut is
        reserved for invisible OCR layers, Tr 3)."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import render_pdf_to_base64png

        text = [(72, 760, "Caption over a big figure")]
        # image covers ~94% of the 612x792 page
        pdf_bytes = make_pdf([text], with_image=True,
                             image_cm="600 0 0 760 6 16")
        path = tmp_path / "figure.pdf"
        path.write_bytes(pdf_bytes)
        b64 = render_pdf_to_base64png(str(path), 1, 256)
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("L")
        arr = np.asarray(img)
        # page-shaped canvas (not the bare 64x64 embedded image)...
        assert max(img.size) == 256 and img.size[1] > img.size[0]
        # ...with the black embedded image pasted over most of it
        assert (arr < 128).mean() > 0.5
        # ...and the text drawn in the white margin above it (y=760pt
        # maps near the top; the image top edge is at 776pt -> row ~5)
        top_band = arr[:12]
        assert (top_band < 128).any()

    def test_invisible_layer_takes_image_only_path(self, tmp_path):
        """Same dominant image but a Tr-3 text layer: image-only path
        (output is the embedded 64x64 image, not a page-shaped canvas)."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import render_pdf_to_base64png

        pdf_bytes = make_pdf([[(72, 760, "hidden ocr text")]],
                             with_image=True, image_cm="600 0 0 760 6 16",
                             text_render_mode=3)
        path = tmp_path / "scan2.pdf"
        path.write_bytes(pdf_bytes)
        b64 = render_pdf_to_base64png(str(path), 1, 256)
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
        assert img.size == (64, 64)

    def test_scanned_jpeg_passthrough(self, tmp_path):
        """Scanned page whose embedded JPEG already sits at the requested
        resolution: the renderer ships the raw DCTDecode bytes untouched
        (no decode/resize/re-encode on the pipeline host)."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import render_pdf_to_base64png

        rng = np.random.default_rng(7)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=90)
        raw = buf.getvalue()
        pdf_bytes = convert_image_to_pdf_bytes(raw, text_layer="ocr layer")
        path = tmp_path / "scan3.pdf"
        path.write_bytes(pdf_bytes)
        out = base64.b64decode(render_pdf_to_base64png(str(path), 1, 128))
        assert out == raw  # byte-identical pass-through

    def test_jpeg_passthrough_skips_offsize(self, tmp_path):
        """Same scanned page but the embedded JPEG is half the requested
        resolution: pass-through must NOT fire (the consumer asked for 256
        px; ship a real resize instead of lying about resolution)."""
        from PIL import Image

        from karanta_tpu.pdf.primitives import render_pdf_to_base64png

        rng = np.random.default_rng(8)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(buf, format="JPEG", quality=90)
        pdf_bytes = convert_image_to_pdf_bytes(buf.getvalue())
        path = tmp_path / "scan4.pdf"
        path.write_bytes(pdf_bytes)
        out = base64.b64decode(render_pdf_to_base64png(str(path), 1, 256))
        assert is_png(out)
        img = Image.open(io.BytesIO(out))
        assert max(img.size) == 128  # image-only path, native resolution

    def test_vision_message_mime_follows_bytes(self):
        """The data-URL MIME must match the payload: pass-through pages are
        JPEG ("/9j/" = base64 SOI), rendered pages are PNG."""
        from karanta_tpu.prompts.templates import (
            create_vision_message, load_prompt_template,
        )

        tmpl = load_prompt_template("olmo_ocr_system_prompt_no_anchor")
        jpeg_b64 = base64.b64encode(b"\xff\xd8\xff\xe0 fake").decode()
        png_b64 = base64.b64encode(b"\x89PNG fake").decode()
        for payload, mime in ((jpeg_b64, "image/jpeg"),
                              (png_b64, "image/png")):
            msg = create_vision_message(tmpl, None, payload)
            url = msg[0]["content"][1]["image_url"]["url"]
            assert url.startswith(f"data:{mime};base64,")


class TestFontEncodings:
    """Simple-font /Encoding fidelity: WinAnsi high-range punctuation and
    /Differences glyph names (accented Latin — the reference's newspaper
    corpora) must reach the anchor as real unicode, not latin-1 mojibake
    (reference analogue: pypdf's encoding tables in anchor extraction)."""

    @staticmethod
    def _one_font_pdf(font_dict: bytes, text_bytes: bytes) -> bytes:
        content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <"
                   + text_bytes.hex().encode() + b"> Tj ET")
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox "
               b"[0 0 612 792] /Resources << /Font << /F1 4 0 R >> >> "
               b"/Contents 5 0 R >>\nendobj\n"
               b"4 0 obj\n" + font_dict + b"\nendobj\n")
        pdf += (b"5 0 obj\n<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
        xref = len(pdf)
        pdf += (b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
                + f"startxref\n{xref}\n%%EOF\n".encode())
        return pdf

    def _anchor(self, tmp_path, font_dict, text_bytes):
        import os

        from karanta_tpu.pdf.anchor import get_anchor_text

        path = os.path.join(str(tmp_path), "font.pdf")
        with open(path, "wb") as f:
            f.write(self._one_font_pdf(font_dict, text_bytes))
        return get_anchor_text(path, 1)

    def test_winansi_quotes(self, tmp_path):
        anchor = self._anchor(
            tmp_path,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
            b"\x93Hi\x94 \x96 ok")  # cp1252 curly quotes + en dash
        assert "“Hi”" in anchor, anchor
        assert "–" in anchor

    def test_differences_accented_names(self, tmp_path):
        anchor = self._anchor(
            tmp_path,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
            b"/Encoding << /Differences [ 65 /eacute /ntilde /ccedilla "
            b"/uni0153 ] >> >>",
            b"ABCD")  # codes 65..68 remapped
        for ch in ("é", "ñ", "ç", "œ"):
            assert ch in anchor, (ch, anchor)

    def test_differences_fallback_to_base(self, tmp_path):
        # codes outside the Differences array decode via the base codec
        anchor = self._anchor(
            tmp_path,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /F "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [ 90 /bullet ] >> >>",
            b"aZb")
        assert "a•b" in anchor, anchor
