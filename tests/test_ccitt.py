"""CCITT Group 4 decoder: parity against libtiff's encoder, corruption
tolerance, and end-to-end rasterization of a /CCITTFaxDecode page (the
dominant bitonal codec in real archives — poppler handles it natively,
reference karanta/data/process_pdf_utils.py:56-74)."""

import base64
import io
import os

import numpy as np
import pytest
from PIL import Image

from karanta_tpu.pdf.ccitt import CCITTError, decode_g4


def g4_payload(arr: np.ndarray) -> bytes:
    """Raw Group-4 bytes for a boolean bitmap, via PIL/libtiff (a trusted
    independent encoder)."""
    img = Image.fromarray(arr.astype(bool))
    buf = io.BytesIO()
    img.save(buf, format="TIFF", compression="group4",
             tiffinfo={278: arr.shape[0]})  # single strip
    buf.seek(0)
    t = Image.open(buf)
    offs, counts = t.tag_v2[273], t.tag_v2[279]
    assert len(offs) == 1
    return buf.getvalue()[offs[0]:offs[0] + counts[0]]


class TestG4Decoder:
    @pytest.mark.parametrize("name,make", [
        ("random50", lambda r: r.random((64, 80)) > 0.5),
        ("sparse", lambda r: r.random((48, 200)) > 0.9),
        ("dense", lambda r: r.random((48, 200)) > 0.1),
        ("triangle", lambda r: np.tril(np.ones((33, 100))) > 0),
        ("stripes", lambda r: (np.indices((120, 256)).sum(0) % 7 < 3)),
        ("blank", lambda r: np.zeros((20, 144), bool)),
        ("solid", lambda r: np.ones((20, 144), bool)),
        ("textlike", lambda r: (r.random((100, 800)) > 0.85)),
    ])
    def test_matches_libtiff(self, name, make):
        arr = make(np.random.default_rng(hash(name) % 2**31))
        got = decode_g4(g4_payload(arr), columns=arr.shape[1],
                        rows=arr.shape[0])
        np.testing.assert_array_equal(got, arr.astype(np.uint8), err_msg=name)

    def test_row_pad_when_stream_short(self):
        arr = np.eye(16, 32, dtype=bool)
        got = decode_g4(g4_payload(arr), columns=32, rows=24)
        assert got.shape == (24, 32)
        np.testing.assert_array_equal(got[:16], arr.astype(np.uint8))
        assert not got[16:].any()

    def test_corruption_never_hangs(self):
        arr = np.random.default_rng(3).random((40, 96)) > 0.6
        raw = g4_payload(arr)
        step = max(1, len(raw) // 32)
        for pos in range(0, len(raw), step):
            bad = bytearray(raw)
            bad[pos] ^= 0xFF
            try:
                out = decode_g4(bytes(bad), columns=96, rows=40)
                assert out.shape == (40, 96)
            except CCITTError:
                pass  # graceful refusal
        for end in range(0, len(raw), step):
            try:
                decode_g4(raw[:end], columns=96, rows=40)
            except CCITTError:
                pass


def _ccitt_pdf(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    payload = g4_payload(arr)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>\n"
        b"endobj\n")
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
    pdf += (b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    pdf += (b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width "
            + str(w).encode() + b" /Height " + str(h).encode()
            + b" /ColorSpace /DeviceGray /BitsPerComponent 1"
            b" /Filter /CCITTFaxDecode /DecodeParms << /K -1 /Columns "
            + str(w).encode() + b" /Rows " + str(h).encode() + b" >>"
            b" /Length " + str(len(payload)).encode() + b" >>\nstream\n"
            + payload + b"\nendstream\nendobj\n")
    xref_pos = len(pdf)
    pdf += (b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
            + f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return pdf


def test_render_ccitt_page(tmp_path):
    """A scanned bitonal page (CCITT G4 image XObject) rasterizes through
    the poppler-free renderer with the ink in the right place."""
    from karanta_tpu.pdf.primitives import render_pdf_to_base64png

    arr = np.zeros((256, 198), bool)
    arr[40:80, 30:160] = True  # a black bar
    path = os.path.join(str(tmp_path), "fax.pdf")
    with open(path, "wb") as f:
        f.write(_ccitt_pdf(arr))
    png = base64.b64decode(render_pdf_to_base64png(
        path, 1, target_longest_image_dim=256))
    img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
    assert img.shape[0] >= 200
    h, w = img.shape
    # the bar region is dark, the rest light (coordinates scale with render)
    bar = img[int(h * 40 / 256):int(h * 80 / 256),
              int(w * 30 / 198):int(w * 160 / 198)]
    rest = img[int(h * 120 / 256):, :]
    assert bar.mean() < 80, bar.mean()
    assert rest.mean() > 200, rest.mean()


class TestG3Decoder:
    @staticmethod
    def _payload(arr, t4options=None):
        img = Image.fromarray(arr.astype(bool))
        buf = io.BytesIO()
        info = {278: arr.shape[0]}
        if t4options is not None:
            info[292] = t4options
        img.save(buf, format="TIFF", compression="group3", tiffinfo=info)
        buf.seek(0)
        t = Image.open(buf)
        offs, counts = t.tag_v2[273], t.tag_v2[279]
        assert len(offs) == 1
        return buf.getvalue()[offs[0]:offs[0] + counts[0]]

    @pytest.mark.parametrize("two_d", [False, True])
    def test_matches_libtiff(self, two_d):
        from karanta_tpu.pdf.ccitt import decode_g3

        rng = np.random.default_rng(7)
        for arr in (rng.random((40, 96)) > 0.6,
                    np.tril(np.ones((24, 64))) > 0,
                    np.zeros((10, 80), bool)):
            raw = self._payload(arr, t4options=1 if two_d else None)
            got = decode_g3(raw, columns=arr.shape[1], rows=arr.shape[0],
                            two_d=two_d)
            np.testing.assert_array_equal(got, arr.astype(np.uint8))

    def test_corruption_never_hangs(self):
        from karanta_tpu.pdf.ccitt import decode_g3

        arr = np.random.default_rng(9).random((30, 64)) > 0.5
        raw = self._payload(arr)
        for pos in range(0, len(raw), max(1, len(raw) // 24)):
            bad = bytearray(raw)
            bad[pos] ^= 0xFF
            try:
                decode_g3(bytes(bad), columns=64, rows=30)
            except CCITTError:
                pass


def test_encrypted_ccitt_page_renders(tmp_path):
    """Composition: an RC4-encrypted PDF whose page image is CCITT G4 —
    decryption and fax decoding compose through the real render path."""
    from karanta_tpu.pdf.primitives import render_pdf_to_base64png
    from tests.pdf_helpers import encrypt_pdf

    arr = np.zeros((128, 96), bool)
    arr[30:60, 20:80] = True
    raw = encrypt_pdf(_ccitt_pdf(arr), method="rc4-128")
    path = os.path.join(str(tmp_path), "enc_fax.pdf")
    with open(path, "wb") as f:
        f.write(raw)
    png = base64.b64decode(render_pdf_to_base64png(
        path, 1, target_longest_image_dim=128))
    img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
    h, w = img.shape
    bar = img[int(h * 30 / 128):int(h * 60 / 128),
              int(w * 20 / 96):int(w * 80 / 96)]
    assert bar.mean() < 80, bar.mean()


def test_render_jpx_page(tmp_path):
    """A JPEG2000 (JPXDecode) page image rasterizes via PIL/openjpeg."""
    from karanta_tpu.pdf.primitives import render_pdf_to_base64png

    rng = np.random.default_rng(2)
    arr = np.full((128, 96, 3), 250, np.uint8)
    arr[30:60, 20:80] = (20, 30, 40)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG2000")
    payload = buf.getvalue()
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
    pdf = (b"%PDF-1.5\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>\n"
           b"endobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 96 "
           b"/Height 128 /ColorSpace /DeviceRGB /BitsPerComponent 8 "
           b"/Filter /JPXDecode /Length " + str(len(payload)).encode()
           + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n")
    xref = len(pdf)
    pdf += (b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
            + f"startxref\n{xref}\n%%EOF\n".encode())
    path = os.path.join(str(tmp_path), "jpx.pdf")
    with open(path, "wb") as f:
        f.write(pdf)
    png = base64.b64decode(render_pdf_to_base64png(
        path, 1, target_longest_image_dim=128))
    img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
    h, w = img.shape
    bar = img[int(h * 30 / 128):int(h * 60 / 128),
              int(w * 20 / 96):int(w * 80 / 96)]
    assert bar.mean() < 100, bar.mean()
    del rng
