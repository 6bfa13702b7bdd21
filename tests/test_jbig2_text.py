"""JBIG2 symbol-coded layer: integer/IAID coders, refinement, symbol
dictionaries, text regions — validated by round-trip (encoder and decoder
written independently from the spec's procedures) and composed through
the embedded-segment layer and the PDF renderer."""

import base64
import io
import random
import struct

import numpy as np
import pytest
from PIL import Image

from karanta_tpu.pdf.jbig2 import (IMMEDIATE_TEXT, JBIG2Error, MQContexts,
                                   MQDecoder, MQEncoder, PAGE_INFO,
                                   SYMBOL_DICT, _segment_header,
                                   decode_embedded)
from karanta_tpu.pdf import jbig2_text as jt


class TestIntegerCoder:
    def test_round_trip_all_ranges(self):
        values = [0, 1, 2, 3, 4, 5, 19, 20, 21, 83, 84, 85, 339, 340, 341,
                  4435, 4436, 4437, 100_000, 2**31 - 1]
        values += [-v for v in values if v] + [jt.OOB]
        enc = MQEncoder()
        ic = jt.IntContext()
        for v in values:
            jt.encode_int(enc, ic, v)
        data = enc.flush()
        mq = MQDecoder(data)
        ic2 = jt.IntContext()
        got = [jt.decode_int(mq, ic2) for _ in values]
        assert got == values

    def test_round_trip_random(self):
        rng = random.Random(0)
        values = [rng.randrange(-5000, 5000) for _ in range(500)]
        enc = MQEncoder()
        ic = jt.IntContext()
        for v in values:
            jt.encode_int(enc, ic, v)
        mq = MQDecoder(enc.flush())
        ic2 = jt.IntContext()
        assert [jt.decode_int(mq, ic2) for _ in values] == values

    def test_iaid_round_trip(self):
        for n_syms in (1, 2, 3, 9, 200):
            codelen = jt._symcodelen(n_syms)
            ids = [i % n_syms for i in range(50)]
            enc = MQEncoder()
            ic = jt.IDContext(codelen)
            for i in ids:
                jt.encode_iaid(enc, ic, i)
            mq = MQDecoder(enc.flush())
            ic2 = jt.IDContext(codelen)
            assert [jt.decode_iaid(mq, ic2) for _ in ids] == ids


class TestRefinement:
    @pytest.mark.parametrize("template", [0, 1])
    @pytest.mark.parametrize("tpgron", [False, True])
    def test_round_trip(self, template, tpgron):
        rng = np.random.default_rng(template * 2 + tpgron)
        ref = (rng.random((14, 18)) < 0.4).astype(np.uint8)
        # target = reference with a few pixels flipped (the refinement
        # regime), plus a size change
        bitmap = np.zeros((15, 19), np.uint8)
        bitmap[:14, :18] = ref
        for _ in range(6):
            y, x = rng.integers(0, 15), rng.integers(0, 19)
            bitmap[y, x] ^= 1
        enc = MQEncoder()
        cx = MQContexts(1 << 13)
        jt.encode_refinement(enc, cx, bitmap, ref, 0, 0, template,
                             tpgron=tpgron)
        mq = MQDecoder(enc.flush())
        cx2 = MQContexts(1 << 13)
        out = jt.decode_refinement(mq, cx2, 19, 15, ref, 0, 0, template,
                                   tpgron=tpgron)
        np.testing.assert_array_equal(out, bitmap)

    def test_round_trip_with_offset(self):
        rng = np.random.default_rng(5)
        ref = (rng.random((10, 10)) < 0.5).astype(np.uint8)
        bitmap = np.roll(ref, (1, -2), axis=(0, 1))
        enc = MQEncoder()
        cx = MQContexts(1 << 13)
        jt.encode_refinement(enc, cx, bitmap, ref, 2, -1)
        mq = MQDecoder(enc.flush())
        out = jt.decode_refinement(mq, MQContexts(1 << 13), 10, 10, ref,
                                   2, -1)
        np.testing.assert_array_equal(out, bitmap)


def _glyphs(rng, n=5):
    """Random distinct small 'glyphs', sorted by height (6.5.5 order)."""
    glyphs = []
    for i in range(n):
        h = int(rng.integers(4, 9))
        w = int(rng.integers(3, 10))
        g = (rng.random((h, w)) < 0.55).astype(np.uint8)
        g[0, 0] = 1  # no blank top-left, keeps placement assertions simple
        glyphs.append(g)
    return sorted(glyphs, key=lambda g: (g.shape[0], g.shape[1]))


class TestSymbolDict:
    def test_round_trip(self):
        rng = np.random.default_rng(1)
        glyphs = _glyphs(rng, 7)
        payload = jt.encode_symbol_dict(glyphs)
        out = jt.decode_symbol_dict(payload, [], [])
        assert len(out) == len(glyphs)
        for a, b in zip(out, glyphs):
            np.testing.assert_array_equal(a, b)

    def test_huffman_raises(self):
        with pytest.raises(JBIG2Error, match="Huffman"):
            jt.decode_symbol_dict(struct.pack(">H", 1) + b"\0" * 16, [], [])


def _paint(page, glyphs, placements):
    for sym_id, x, y in placements:
        g = glyphs[sym_id]
        page[y:y + g.shape[0], x:x + g.shape[1]] |= g


class TestTextRegion:
    @pytest.mark.parametrize("ref_corner", [0, 1, 2, 3])
    def test_round_trip_corners(self, ref_corner):
        rng = np.random.default_rng(2 + ref_corner)
        glyphs = _glyphs(rng, 4)
        placements = [(i % 4, 5 + 14 * i, 3 + 11 * (i % 3))
                      for i in range(9)]
        payload = jt.encode_text_region(150, 44, glyphs, placements,
                                        ref_corner=ref_corner)
        info, region = jt.decode_text_region(payload, glyphs, [])
        expected = np.zeros((44, 150), np.uint8)
        _paint(expected, glyphs, placements)
        np.testing.assert_array_equal(region, expected)

    def test_round_trip_transposed(self):
        rng = np.random.default_rng(9)
        glyphs = _glyphs(rng, 3)
        placements = [(i % 3, 4 + 13 * (i % 2), 2 + 12 * i)
                      for i in range(6)]
        payload = jt.encode_text_region(40, 90, glyphs, placements,
                                        ref_corner=1, transposed=1)
        _, region = jt.decode_text_region(payload, glyphs, [])
        expected = np.zeros((90, 40), np.uint8)
        _paint(expected, glyphs, placements)
        np.testing.assert_array_equal(region, expected)

    def test_bad_symbol_id_raises(self):
        glyphs = _glyphs(np.random.default_rng(3), 2)
        payload = jt.encode_text_region(30, 20, glyphs, [(1, 2, 3)])
        with pytest.raises(JBIG2Error):
            jt.decode_text_region(payload, glyphs[:1], [])


def _symbol_stream(glyphs, placements, w, h):
    """Embedded-organization stream: page info + symbol dict + text
    region."""
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    out = _segment_header(0, PAGE_INFO, (), 1, len(page_info)) + page_info
    sd = jt.encode_symbol_dict(glyphs)
    out += _segment_header(1, SYMBOL_DICT, (), 1, len(sd)) + sd
    tr = jt.encode_text_region(w, h, glyphs, placements)
    out += _segment_header(2, IMMEDIATE_TEXT, (1,), 1, len(tr)) + tr
    return out


class TestEmbeddedSymbolStream:
    def test_decode_embedded(self):
        rng = np.random.default_rng(4)
        glyphs = _glyphs(rng, 6)
        placements = [(rng.integers(0, 6), 4 + 15 * i, 6 + 10 * (i % 4))
                      for i in range(12)]
        placements = [(int(a), int(b), int(c)) for a, b, c in placements]
        stream = _symbol_stream(glyphs, placements, 200, 60)
        page = decode_embedded(stream)
        expected = np.zeros((60, 200), np.uint8)
        _paint(expected, glyphs, placements)
        np.testing.assert_array_equal(page, expected)

    def test_renders_through_pdf(self, tmp_path):
        from karanta_tpu.pdf.primitives import render_pdf_to_base64png
        from tests.test_jbig2 import _jbig2_pdf

        rng = np.random.default_rng(8)
        glyphs = [np.ones((20, 16), np.uint8)]
        placements = [(0, 30, 40), (0, 90, 40), (0, 60, 100)]
        stream = _symbol_stream(glyphs, placements, 160, 140)

        # reuse the PDF builder but swap in the symbol-coded payload
        base = _jbig2_pdf(np.zeros((140, 160), bool))
        from karanta_tpu.pdf.jbig2 import encode_embedded

        old = encode_embedded(np.zeros((140, 160), np.uint8), tpgdon=True)
        pdf = base.replace(
            b"/Length " + str(len(old)).encode() + b" >>\nstream\n" + old,
            b"/Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream)
        assert pdf != base
        path = str(tmp_path / "sym.pdf")
        with open(path, "wb") as f:
            f.write(pdf)
        png = base64.b64decode(render_pdf_to_base64png(
            path, 1, target_longest_image_dim=160))
        img = np.asarray(Image.open(io.BytesIO(png)).convert("L"))
        h, w = img.shape
        block = img[int(h * 40 / 140):int(h * 60 / 140),
                    int(w * 30 / 160):int(w * 46 / 160)]
        assert block.mean() < 80
        assert img[:int(h * 20 / 140), :].mean() > 200


class TestNativeSymbolPath:
    """native/jbig2core.cpp symbol-dict + text-region decoders must match
    the Python reference bit-for-bit (the same cross-implementation
    validation the generic layer has)."""

    def _skip_if_no_native(self):
        from karanta_tpu.pdf.jbig2_text import _native_mod

        if _native_mod() is None:
            pytest.skip("native jbig2core symbol path not built")

    def test_symbol_dict_parity(self, monkeypatch):
        self._skip_if_no_native()
        rng = np.random.default_rng(21)
        glyphs = _glyphs(rng, 8)
        payload = jt.encode_symbol_dict(glyphs)
        nat = jt.decode_symbol_dict(payload, [], [])
        monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "0")
        py = jt.decode_symbol_dict(payload, [], [])
        assert len(nat) == len(py) == len(glyphs)
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("transposed", [0, 1])
    def test_text_region_parity(self, transposed, monkeypatch):
        self._skip_if_no_native()
        rng = np.random.default_rng(22 + transposed)
        glyphs = _glyphs(rng, 5)
        placements = [(i % 5, 4 + 13 * (i % 3), 3 + 12 * (i % 4))
                      for i in range(10)]
        w, h = (60, 80) if transposed else (80, 60)
        payload = jt.encode_text_region(w, h, glyphs, placements,
                                        transposed=transposed)
        info_n, nat = jt.decode_text_region(payload, glyphs, [])
        monkeypatch.setenv("KARANTA_JBIG2_NATIVE", "0")
        info_p, py = jt.decode_text_region(payload, glyphs, [])
        assert (info_n.width, info_n.height, info_n.x, info_n.y,
                info_n.comb_op) == (info_p.width, info_p.height, info_p.x,
                                    info_p.y, info_p.comb_op)
        np.testing.assert_array_equal(nat, py)

    def test_native_huffman_raises_jbig2error(self):
        self._skip_if_no_native()
        import struct as _s

        with pytest.raises(JBIG2Error, match="Huffman"):
            jt.decode_symbol_dict(_s.pack(">H", 1) + b"\0" * 16, [], [])

    def test_native_garbage_raises_cleanly(self):
        self._skip_if_no_native()
        rng = np.random.default_rng(3)
        glyphs = _glyphs(rng, 2)
        for _ in range(20):
            blob = bytes(rng.integers(0, 256, size=60, dtype=np.uint8))
            try:
                jt.decode_text_region(blob, glyphs, [])
            except (JBIG2Error, Exception):
                pass
