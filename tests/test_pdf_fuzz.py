"""Corruption sweep for the dependency-free PDF stack.

The pipeline parses PDFs from the wild (minipdf backs primitives, anchor
text, and the splitter); a parser hang or uncaught exception class would
stall or crash a production worker. Every corrupted variant must either
parse or raise PdfError/ValueError — quickly, never hanging or segfaulting.
"""

import pytest

from karanta_tpu.pdf.minipdf import PdfDocument, PdfError
from tests.pdf_helpers import make_pdf


def _base_pdf() -> bytes:
    return make_pdf(
        [[(72, 700, "Hello world"), (72, 680, "second line")],
         [(100, 500, "page two")]],
        compress=True, with_image=True)


def _try_parse(data: bytes):
    try:
        doc = PdfDocument(data)
        for i in range(doc.num_pages()):
            _ = doc.media_box(i)
            _ = doc.page_content(i)
    except (PdfError, ValueError, KeyError, IndexError):
        pass  # graceful refusal is fine; hangs/other crashes are not


class TestPdfCorruption:
    def test_truncations(self):
        raw = _base_pdf()
        step = max(1, len(raw) // 64)
        for end in range(0, len(raw), step):
            _try_parse(raw[:end])

    def test_byte_flips(self):
        raw = _base_pdf()
        step = max(1, len(raw) // 80)
        for pos in range(0, len(raw), step):
            corrupted = bytearray(raw)
            corrupted[pos] ^= 0xFF
            _try_parse(bytes(corrupted))

    def test_xref_offset_garbage(self):
        raw = _base_pdf()
        # point startxref at every implausible place
        head, sep, _tail = raw.rpartition(b"startxref")
        assert sep
        for claim in (b"0", b"1", b"999999999", b"-5", b"abc"):
            _try_parse(head + b"startxref\n" + claim + b"\n%%EOF")

    def test_cyclic_reference_terminates(self):
        # object 1 resolves to a reference back to itself
        body = (b"%PDF-1.4\n"
                b"1 0 obj\n1 0 R\nendobj\n"
                b"trailer << /Root 1 0 R >>\n"
                b"startxref\n9\n%%EOF")
        _try_parse(body)

    def test_deep_nesting_terminates(self):
        deep = b"[" * 2000 + b"]" * 2000
        body = (b"%PDF-1.4\n1 0 obj\n" + deep + b"\nendobj\n"
                b"trailer << /Root 1 0 R >>\nstartxref\n9\n%%EOF")
        try:
            _try_parse(body)
        except RecursionError:
            pytest.fail("parser recursion unbounded on nested arrays")
