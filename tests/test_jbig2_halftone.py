"""JBIG2 halftone layer: pattern dictionaries, gray-code bitplanes,
halftone regions (T.88 6.6/6.7/Annex C) — round-trip validated (encoder
and decoder written independently from the spec), composed through the
embedded segment layer."""

import struct

import numpy as np
import pytest

from karanta_tpu.pdf import jbig2_halftone as jh
from karanta_tpu.pdf.jbig2 import (IMMEDIATE_HALFTONE, JBIG2Error,
                                   PAGE_INFO, PATTERN_DICT,
                                   _segment_header, decode_embedded)


def _patterns(rng, n=8, hpw=4, hph=4):
    """n distinct cell patterns with increasing ink density."""
    pats = []
    for i in range(n):
        p = (rng.random((hph, hpw)) < (i + 1) / (n + 1)).astype(np.uint8)
        pats.append(p)
    return pats


class TestPatternDict:
    @pytest.mark.parametrize("template", [0, 1, 2, 3])
    def test_round_trip(self, template):
        rng = np.random.default_rng(template)
        pats = _patterns(rng, n=9, hpw=5, hph=6)
        payload = jh.encode_pattern_dict(pats, template)
        out = jh.decode_pattern_dict(payload)
        assert len(out) == len(pats)
        for a, b in zip(out, pats):
            np.testing.assert_array_equal(a, b)

    def test_mmr_raises(self):
        with pytest.raises(JBIG2Error, match="MMR"):
            jh.decode_pattern_dict(bytes([1, 4, 4]) + b"\0" * 8)


class TestGrayscale:
    @pytest.mark.parametrize("bits", [1, 3, 5])
    def test_round_trip(self, bits):
        rng = np.random.default_rng(bits)
        grid = rng.integers(0, 1 << bits, size=(9, 13)).astype(np.int32)
        data = jh.encode_grayscale(grid, bits)
        out = jh.decode_grayscale(data, 13, 9, bits, 0, None)
        np.testing.assert_array_equal(out, grid)

    def test_round_trip_with_skip(self):
        rng = np.random.default_rng(7)
        grid = rng.integers(0, 8, size=(6, 10)).astype(np.int32)
        skip = (rng.random((6, 10)) < 0.3).astype(np.uint8)
        grid_masked = np.where(skip > 0, 0, grid)
        data = jh.encode_grayscale(grid_masked, 3, skip=skip)
        out = jh.decode_grayscale(data, 10, 6, 3, 0, skip)
        np.testing.assert_array_equal(out, grid_masked)


class TestHalftoneRegion:
    def test_round_trip_axis_aligned(self):
        rng = np.random.default_rng(2)
        pats = _patterns(rng, n=8)
        grid = rng.integers(0, 8, size=(12, 16)).astype(np.int32)
        payload = jh.encode_halftone_region(
            64, 48, grid, pats, hrx=4 << 8, hry=0)
        info, region = jh.decode_halftone_region(payload, pats)
        expected = np.zeros((48, 64), np.uint8)
        for mg in range(12):
            for ng in range(16):
                x, y = ng * 4, mg * 4
                expected[y:y + 4, x:x + 4] |= pats[int(grid[mg, ng])]
        np.testing.assert_array_equal(region, expected)

    def test_round_trip_skewed_grid_with_skip(self):
        """Skewed grid vectors push cells off the region edge — the skip
        bitmap path (HENABLESKIP) must agree between encode and decode."""
        rng = np.random.default_rng(3)
        pats = _patterns(rng, n=4)
        grid = rng.integers(0, 4, size=(10, 10)).astype(np.int32)
        payload = jh.encode_halftone_region(
            40, 40, grid, pats, hgx=-2 << 8, hgy=1 << 8,
            hrx=(4 << 8) + 64, hry=96, enable_skip=True)
        info, region = jh.decode_halftone_region(payload, pats)
        assert region.shape == (40, 40)
        assert region.any()  # some cells landed inside

    def test_empty_pattern_dict_raises(self):
        with pytest.raises(JBIG2Error, match="pattern"):
            jh.decode_halftone_region(b"\0" * 40, [])


def test_embedded_halftone_stream():
    rng = np.random.default_rng(5)
    pats = _patterns(rng, n=8)
    grid = rng.integers(0, 8, size=(8, 12)).astype(np.int32)
    page_info = struct.pack(">IIIIBH", 48, 32, 0, 0, 0, 0)
    out = _segment_header(0, PAGE_INFO, (), 1, len(page_info)) + page_info
    pd = jh.encode_pattern_dict(pats)
    out += _segment_header(1, PATTERN_DICT, (), 1, len(pd)) + pd
    ht = jh.encode_halftone_region(48, 32, grid, pats, hrx=4 << 8)
    out += _segment_header(2, IMMEDIATE_HALFTONE, (1,), 1, len(ht)) + ht

    page = decode_embedded(out)
    expected = np.zeros((32, 48), np.uint8)
    for mg in range(8):
        for ng in range(12):
            x, y = ng * 4, mg * 4
            expected[y:y + 4, x:x + 4] |= pats[int(grid[mg, ng])]
    np.testing.assert_array_equal(page, expected)
