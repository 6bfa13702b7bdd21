"""Native PNG decoder (native/fastpng.cpp) vs PIL, plus engine wiring.

The serving host decodes every page image before prefill; fastpng handles
the common 8-bit non-interlaced case ~2x faster than PIL on one core and
reports everything else as unsupported so the engine falls back.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native"))
fastpng = pytest.importorskip("fastpng", reason="run `make native` first")
from PIL import Image  # noqa: E402


def _png_bytes(img: Image.Image, **kw) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format="PNG", **kw)
    return buf.getvalue()


def _decode(raw: bytes) -> np.ndarray:
    buf, h, w = fastpng.decode_rgb(raw)
    return np.frombuffer(buf, np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("mode,shape", [
    ("RGB", (37, 53, 3)),
    ("L", (64, 31)),
    ("RGBA", (29, 41, 4)),
    ("LA", (16, 17, 2)),
])
@pytest.mark.parametrize("optimize", [False, True])
def test_matches_pil(mode, shape, optimize):
    rng = np.random.default_rng(hash(mode) % 2**32)
    img = Image.fromarray(rng.integers(0, 255, shape, dtype=np.uint8), mode)
    raw = _png_bytes(img, optimize=optimize)
    got = _decode(raw)
    np.testing.assert_array_equal(got,
                                  np.asarray(img.convert("RGB"), np.uint8))


def test_palette():
    rng = np.random.default_rng(3)
    img = Image.fromarray(
        rng.integers(0, 255, (23, 19, 3), dtype=np.uint8)).convert(
            "P", palette=Image.ADAPTIVE, colors=250)
    got = _decode(_png_bytes(img))
    np.testing.assert_array_equal(got,
                                  np.asarray(img.convert("RGB"), np.uint8))


def test_textlike_page_all_filters():
    # a text-like page exercises PNG's adaptive per-row filter choices
    rng = np.random.default_rng(0)
    page = np.full((200, 160), 235, np.uint8)
    for y in range(10, 190, 14):
        page[y:y + 8, 10:150] = rng.integers(0, 120, (8, 140), np.uint8)
    img = Image.fromarray(np.stack([page] * 3, -1))
    got = _decode(_png_bytes(img))
    np.testing.assert_array_equal(got, np.asarray(img, np.uint8))


def test_unsupported_raises_value_error():
    with pytest.raises(ValueError):
        fastpng.decode_rgb(b"not a png")
    with pytest.raises(ValueError):
        fastpng.decode_rgb(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    img16 = Image.new("I;16", (8, 8))
    with pytest.raises(ValueError, match="unsupported"):
        fastpng.decode_rgb(_png_bytes(img16))


def test_engine_uses_native_decoder_with_pil_fallback():
    from karanta_tpu.inference import engine as eng_mod

    assert eng_mod._fastpng is not None  # built above via importorskip
    # JPEG input exercises the PIL fallback through the same entry point
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    jbuf = io.BytesIO()
    img.save(jbuf, format="JPEG")

    class _Shim:  # borrow the unbound method: no engine construction needed
        _img_cache_cap = 0

    shim = _Shim()
    png_rgb = eng_mod.Engine._decode_image(shim, _png_bytes(img))
    np.testing.assert_array_equal(png_rgb, np.asarray(img, np.uint8))
    jpg_rgb = eng_mod.Engine._decode_image(shim, jbuf.getvalue())
    assert jpg_rgb.shape == (32, 48, 3)


def test_decompression_bomb_rejected_cheaply():
    """A tiny PNG whose header claims >2^27 pixels must be refused before
    any scanline allocation (PIL's MAX_IMAGE_PIXELS analog)."""
    import struct
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    ihdr = struct.pack(">IIBBBBB", 16384, 16384, 8, 2, 0, 0, 0)  # 268M px
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="too large"):
        fastpng.decode_rgb(bomb)
