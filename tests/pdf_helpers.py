"""Hand-rolled tiny PDF writer for tests (no external PDF packages exist in
this environment, so tests fabricate known inputs byte-by-byte)."""

from __future__ import annotations

import zlib


def make_pdf(pages: list[list[tuple[float, float, str]]],
             compress: bool = False,
             media_box=(0, 0, 612, 792),
             with_image: bool = False,
             image_cm: str = "100 0 0 80 50 600",
             text_render_mode: int = 0) -> bytes:
    """Build a classic-xref PDF. Each page is a list of (x, y, text).
    `image_cm` positions/scales the image XObject; `text_render_mode` sets
    the Tr operator (3 = invisible, i.e. a scanned page's OCR layer)."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    catalog_num = add(b"")  # placeholder, filled later
    pages_num = add(b"")

    font_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    image_num = None
    if with_image:
        img_data = bytes(64 * 64 * 3)
        payload = zlib.compress(img_data)
        image_num = add(
            (b"<< /Type /XObject /Subtype /Image /Width 64 /Height 64 "
             b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode"
             b" /Length " + str(len(payload)).encode() + b" >>\nstream\n"
             + payload + b"\nendstream"))

    page_nums = []
    for page in pages:
        ops = [b"BT /F1 12 Tf"]
        if text_render_mode:
            ops.append(f"{text_render_mode} Tr".encode())
        for x, y, text in page:
            escaped = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            ops.append(f"1 0 0 1 {x} {y} Tm ({escaped}) Tj".encode())
        ops.append(b"ET")
        if with_image:
            ops.append(f"q {image_cm} cm /Im1 Do Q".encode())
        content = b"\n".join(ops)
        if compress:
            payload = zlib.compress(content)
            content_obj = (b"<< /Length " + str(len(payload)).encode()
                           + b" /Filter /FlateDecode >>\nstream\n" + payload
                           + b"\nendstream")
        else:
            content_obj = (b"<< /Length " + str(len(content)).encode()
                           + b" >>\nstream\n" + content + b"\nendstream")
        content_num = add(content_obj)
        resources = b"/Font << /F1 " + str(font_num).encode() + b" 0 R >>"
        if with_image:
            resources += (b" /XObject << /Im1 " + str(image_num).encode()
                          + b" 0 R >>")
        page_nums.append(add(
            b"<< /Type /Page /Parent " + str(pages_num).encode() + b" 0 R "
            b"/MediaBox [" + " ".join(str(v) for v in media_box).encode()
            + b"] /Resources << " + resources + b" >> /Contents "
            + str(content_num).encode() + b" 0 R >>"))

    kids = b" ".join(f"{n} 0 R".encode() for n in page_nums)
    objects[pages_num - 1] = (b"<< /Type /Pages /Kids [" + kids
                              + b"] /Count " + str(len(page_nums)).encode() + b" >>")
    objects[catalog_num - 1] = (b"<< /Type /Catalog /Pages "
                                + str(pages_num).encode() + b" 0 R >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root " + str(catalog_num).encode() + b" 0 R >>\n"
            + f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return bytes(out)
