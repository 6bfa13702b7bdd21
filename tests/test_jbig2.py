"""JBIG2 (T.88) decoder: MQ coder round-trips, cross-implementation
parity (pure-Python reference vs native/jbig2core.cpp), embedded-stream
handling, and end-to-end rasterization of /JBIG2Decode pages — including
the encrypted composition (VERDICT r4 next #5).

No trusted JBIG2 codec exists in this image (libjbig is JBIG1), so
validation is structural: encoder and decoder are implemented
independently from the spec's encoder/decoder flowcharts, and the C++
fast path must match the Python reference bit-for-bit.
"""

import base64
import io
import os
import random

import numpy as np
import pytest
from PIL import Image

from karanta_tpu.pdf import jbig2
from karanta_tpu.pdf.jbig2 import (JBIG2Error, MQContexts, MQDecoder,
                                   MQEncoder, decode_embedded,
                                   decode_generic_region, encode_embedded,
                                   encode_generic_region, parse_segments)


class TestMQCoder:
    def test_round_trip_random_streams(self):
        rng = random.Random(0)
        for trial in range(25):
            n = rng.randrange(1, 3000)
            bits = [rng.randrange(2) for _ in range(n)]
            ctxs = [rng.randrange(32) for _ in range(n)]
            enc = MQEncoder()
            cx = MQContexts(32)
            for b, c in zip(bits, ctxs):
                enc.encode(b, cx, c)
            data = enc.flush()
            dec = MQDecoder(data)
            cx2 = MQContexts(32)
            assert [dec.decode(cx2, c) for c in ctxs] == bits, trial

    def test_skewed_stream_compresses(self):
        """An all-MPS stream must code far below 1 bit/symbol (sanity that
        the adaptive state machine actually adapts)."""
        enc = MQEncoder()
        cx = MQContexts(1)
        for _ in range(10_000):
            enc.encode(0, cx, 0)
        data = enc.flush()
        assert len(data) < 60, len(data)
        dec = MQDecoder(data)
        cx2 = MQContexts(1)
        assert all(dec.decode(cx2, 0) == 0 for _ in range(10_000))

    def test_ff_stuffing(self):
        """Streams that emit 0xFF bytes exercise the 7-bit stuffing path."""
        rng = random.Random(3)
        for trial in range(40):
            bits = [rng.randrange(2) for _ in range(400)]
            enc = MQEncoder()
            cx = MQContexts(4)
            for i, b in enumerate(bits):
                enc.encode(b, cx, i % 4)
            data = enc.flush()
            dec = MQDecoder(data)
            cx2 = MQContexts(4)
            got = [dec.decode(cx2, i % 4) for i in range(len(bits))]
            assert got == bits


class TestGenericRegion:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    @pytest.mark.parametrize("tpgdon", [False, True])
    def test_round_trip(self, template, tpgdon, monkeypatch):
        monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "0")
        rng = np.random.default_rng(template * 2 + tpgdon)
        bm = (rng.random((21, 37)) < 0.3).astype(np.uint8)
        bm[7] = bm[6]  # a typical row for TPGDON
        data = encode_generic_region(bm, template, tpgdon=tpgdon)
        out = decode_generic_region(data, 37, 21, template, tpgdon=tpgdon)
        np.testing.assert_array_equal(out, bm)

    def test_non_nominal_at_pixels(self, monkeypatch):
        monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "0")
        at = ((1, -1), (-1, -1), (1, -2), (-3, -2))
        rng = np.random.default_rng(5)
        bm = (rng.random((18, 29)) < 0.4).astype(np.uint8)
        data = encode_generic_region(bm, 0, at=at)
        out = decode_generic_region(data, 29, 18, 0, at=at)
        np.testing.assert_array_equal(out, bm)
        # ...and decoding with DIFFERENT at pixels must not reproduce it
        other = decode_generic_region(data, 29, 18, 0)
        assert not (other == bm).all()

    @pytest.mark.skipif(jbig2._native is None,
                        reason="native jbig2core not built")
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_native_matches_python(self, template, monkeypatch):
        rng = np.random.default_rng(11 + template)
        bm = (rng.random((48, 67)) < 0.35).astype(np.uint8)
        bm[20] = bm[19]
        for tpgdon in (False, True):
            data = encode_generic_region(bm, template, tpgdon=tpgdon)
            monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "0")
            py = decode_generic_region(data, 67, 48, template,
                                       tpgdon=tpgdon)
            monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "1")
            nat = decode_generic_region(data, 67, 48, template,
                                        tpgdon=tpgdon)
            np.testing.assert_array_equal(py, nat)
            np.testing.assert_array_equal(nat, bm)

    def test_text_like_page_compresses(self):
        """Structured (text-like) content must compress well and survive
        the round trip at realistic page size (native decode path)."""
        bm = np.zeros((440, 350), np.uint8)
        rng = np.random.default_rng(2)
        for y in range(20, 420, 22):
            row = (rng.random((12, 310)) < 0.45).astype(np.uint8)
            bm[y:y + 12, 20:330] = row
        data = encode_generic_region(bm, 0, tpgdon=True)
        assert len(data) < bm.size // 8  # beats raw 1bpp packing
        out = decode_generic_region(data, 350, 440, 0, tpgdon=True)
        np.testing.assert_array_equal(out, bm)


class TestEmbeddedStream:
    def test_round_trip(self):
        rng = np.random.default_rng(9)
        bm = (rng.random((33, 46)) < 0.25).astype(np.uint8)
        stream = encode_embedded(bm, tpgdon=True)
        np.testing.assert_array_equal(decode_embedded(stream), bm)

    def test_segment_parse(self):
        bm = np.zeros((8, 8), np.uint8)
        segs = parse_segments(encode_embedded(bm))
        assert [s.type for s in segs] == [48, 39, 49]
        assert all(s.page == 1 for s in segs)

    def test_dims_from_pdf_dict_override(self):
        """PDF /Width//Height take over when page info is striped."""
        rng = np.random.default_rng(4)
        bm = (rng.random((12, 20)) < 0.5).astype(np.uint8)
        stream = encode_embedded(bm)
        out = decode_embedded(stream, width=20, height=12)
        np.testing.assert_array_equal(out, bm)

    def test_truncated_stream_raises(self):
        rng = np.random.default_rng(6)
        bm = (rng.random((24, 40)) < 0.5).astype(np.uint8)
        stream = encode_embedded(bm)
        # cut inside the generic-region segment payload: its header then
        # claims more data than exists
        with pytest.raises(JBIG2Error):
            decode_embedded(stream[: len(stream) // 2])

    def test_garbage_never_hangs(self):
        rng = random.Random(1)
        for _ in range(30):
            blob = bytes(rng.randrange(256) for _ in range(200))
            try:
                decode_embedded(blob, width=16, height=16)
            except (JBIG2Error, Exception):
                pass


def _jbig2_pdf(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    payload = encode_embedded(arr, tpgdon=True)
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
            b" /Filter /JBIG2Decode"
            b" /Length " + str(len(payload)).encode() + b" >>\nstream\n"
            + payload + b"\nendstream\nendobj\n")
    xref_pos = len(pdf)
    pdf += (b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
            + f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return pdf


def test_render_jbig2_page(tmp_path):
    """A JBIG2 page image rasterizes through the poppler-free renderer
    with the ink in the right place."""
    from karanta_tpu.pdf.primitives import render_pdf_to_base64png

    arr = np.zeros((256, 198), bool)
    arr[40:80, 30:160] = True
    path = os.path.join(str(tmp_path), "jbig2.pdf")
    with open(path, "wb") as f:
        f.write(_jbig2_pdf(arr))
    png = base64.b64decode(render_pdf_to_base64png(
        path, 1, target_longest_image_dim=256))
    img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
    h, w = img.shape
    bar = img[int(h * 40 / 256):int(h * 80 / 256),
              int(w * 30 / 198):int(w * 160 / 198)]
    rest = img[int(h * 120 / 256):, :]
    assert bar.mean() < 80, bar.mean()
    assert rest.mean() > 200, rest.mean()


def test_encrypted_jbig2_page_renders(tmp_path):
    """Composition (VERDICT r4 #5 done-condition): an RC4-encrypted PDF
    whose page image is JBIG2 renders through decryption + T.88 decode."""
    from karanta_tpu.pdf.primitives import render_pdf_to_base64png
    from tests.pdf_helpers import encrypt_pdf

    arr = np.zeros((128, 96), bool)
    arr[30:60, 20:80] = True
    raw = encrypt_pdf(_jbig2_pdf(arr), method="rc4-128")
    path = os.path.join(str(tmp_path), "enc_jbig2.pdf")
    with open(path, "wb") as f:
        f.write(raw)
    png = base64.b64decode(render_pdf_to_base64png(
        path, 1, target_longest_image_dim=128))
    img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
    h, w = img.shape
    bar = img[int(h * 30 / 128):int(h * 60 / 128),
              int(w * 20 / 96):int(w * 80 / 96)]
    assert bar.mean() < 80, bar.mean()


def test_striped_page_grows():
    """Unknown-height striped pages (page info height 0xFFFFFFFF) grow as
    stripes arrive (7.4.8.2) when no PDF /Height overrides."""
    import struct as _s

    from karanta_tpu.pdf.jbig2 import (IMMEDIATE_LOSSLESS_GENERIC,
                                       _segment_header,
                                       encode_generic_region)

    rng = np.random.default_rng(12)
    stripe0 = (rng.random((16, 40)) < 0.4).astype(np.uint8)
    stripe1 = (rng.random((20, 40)) < 0.4).astype(np.uint8)

    page_info = _s.pack(">IIIIBH", 40, 0xFFFFFFFF, 0, 0, 0x20, 16)
    out = _segment_header(0, 48, (), 1, len(page_info)) + page_info
    for i, (stripe, y0) in enumerate(((stripe0, 0), (stripe1, 16))):
        h, w = stripe.shape
        region = _s.pack(">IIIIB", w, h, 0, y0, 0)
        region += bytes([0])  # template 0, no tpgdon
        for dx, dy in ((3, -1), (-3, -1), (2, -2), (-2, -2)):
            region += _s.pack("bb", dx, dy)
        region += encode_generic_region(stripe, 0)
        out += _segment_header(i + 1, IMMEDIATE_LOSSLESS_GENERIC, (), 1,
                               len(region)) + region

    page = decode_embedded(out)
    assert page.shape == (36, 40)
    np.testing.assert_array_equal(page[:16], stripe0)
    np.testing.assert_array_equal(page[16:], stripe1)

    # with a PDF /Height the declared dims stay authoritative (clipping)
    clipped = decode_embedded(out, width=40, height=24)
    assert clipped.shape == (24, 40)
    np.testing.assert_array_equal(clipped[:16], stripe0)


def test_mmr_generic_region():
    """MMR=1 generic regions route to the T.6 decoder (which is validated
    bit-exact against libtiff) — libtiff is the encoding oracle here."""
    import struct as _s

    from tests.test_ccitt import g4_payload
    from karanta_tpu.pdf.jbig2 import (IMMEDIATE_LOSSLESS_GENERIC,
                                       PAGE_INFO, _segment_header)

    rng = np.random.default_rng(13)
    bm = (rng.random((30, 64)) < 0.4)

    page_info = _s.pack(">IIIIBH", 64, 30, 0, 0, 0, 0)
    out = _segment_header(0, PAGE_INFO, (), 1, len(page_info)) + page_info
    region = _s.pack(">IIIIB", 64, 30, 0, 0, 0)
    region += bytes([1])  # MMR=1
    region += g4_payload(bm)
    out += _segment_header(1, IMMEDIATE_LOSSLESS_GENERIC, (), 1,
                           len(region)) + region

    page = decode_embedded(out)
    np.testing.assert_array_equal(page, bm.astype(np.uint8))
