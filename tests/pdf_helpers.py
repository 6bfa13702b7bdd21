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


# ---------------------------------------------------------------------------
# encrypted-fixture builder (standard security handler, empty user password)
# ---------------------------------------------------------------------------

_FILE_ID = bytes(range(0xA0, 0xB0))  # deterministic 16-byte /ID


def _pad_pw(pw: bytes = b"") -> bytes:
    from karanta_tpu.pdf.crypt import _PAD

    return (pw + _PAD)[:32]


def _rc4_owner_entry(r: int, n: int) -> bytes:
    """Algorithm 3 /O for empty owner+user passwords."""
    import hashlib

    from karanta_tpu.pdf.crypt import rc4

    h = hashlib.md5(_pad_pw()).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    val = _pad_pw()
    if r == 2:
        return rc4(key, val)
    for i in range(20):
        val = rc4(bytes(b ^ i for b in key), val)
    return val


def _rc4_file_key(r: int, n: int, o: bytes, p: int) -> bytes:
    import hashlib
    import struct

    h = hashlib.md5()
    h.update(_pad_pw())
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(_FILE_ID)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _rc4_user_entry(r: int, file_key: bytes) -> bytes:
    import hashlib

    from karanta_tpu.pdf.crypt import rc4

    if r == 2:
        return rc4(file_key, _pad_pw())
    digest = hashlib.md5(_pad_pw() + _FILE_ID).digest()
    val = rc4(file_key, digest)
    for i in range(1, 20):
        val = rc4(bytes(b ^ i for b in file_key), val)
    return val + b"\x00" * 16


def encrypt_pdf(raw: bytes, method: str = "rc4-128") -> bytes:
    """Re-emit a make_pdf() document with its streams encrypted under the
    standard security handler, EMPTY user password. Methods: 'rc4-40',
    'rc4-128' (R=2/3), 'aes-128' (R=4 AESV2), 'aes-256' (R=6 AESV3)."""
    import hashlib
    import re
    import struct

    from karanta_tpu.pdf.crypt import (
        _aes_cbc_encrypt_nopad, _hash_r6, rc4)

    p = -3904  # typical permission bits
    if method == "rc4-40":
        r, v, n = 2, 1, 5
    elif method == "rc4-128":
        r, v, n = 3, 2, 16
    elif method == "aes-128":
        r, v, n = 4, 4, 16
    elif method == "aes-256":
        r, v, n = 6, 5, 32
    else:
        raise ValueError(method)

    if method == "aes-256":
        vsalt, ksalt = b"\x01" * 8, b"\x02" * 8
        u = _hash_r6(b"", vsalt, b"") + vsalt + ksalt
        file_key = bytes(range(32))
        ue = _aes_cbc_encrypt_nopad(_hash_r6(b"", ksalt, b""),
                                    b"\x00" * 16, file_key)
        ovsalt, oksalt = b"\x03" * 8, b"\x04" * 8
        o = _hash_r6(b"", ovsalt, u[:48]) + ovsalt + oksalt
        oe = _aes_cbc_encrypt_nopad(_hash_r6(b"", oksalt, u[:48]),
                                    b"\x00" * 16, file_key)
        perms = b"\x00" * 16  # unchecked by the reader
        enc_dict = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
                    b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                    b" /O <" + o.hex().encode() + b">"
                    b" /U <" + u.hex().encode() + b">"
                    b" /OE <" + oe.hex().encode() + b">"
                    b" /UE <" + ue.hex().encode() + b">"
                    b" /Perms <" + perms.hex().encode() + b">"
                    b" /P " + str(p).encode() + b" >>")
    else:
        o = _rc4_owner_entry(r, n)
        file_key = _rc4_file_key(r, n, o, p)
        u = _rc4_user_entry(r, file_key)
        enc_dict = (b"<< /Filter /Standard /V " + str(v).encode()
                    + b" /R " + str(r).encode()
                    + b" /Length " + str(n * 8).encode())
        if method == "aes-128":
            enc_dict += (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                         b" /StmF /StdCF /StrF /StdCF")
        enc_dict += (b" /O <" + o.hex().encode() + b">"
                     b" /U <" + u.hex().encode() + b">"
                     b" /P " + str(p).encode() + b" >>")

    def obj_key(num: int, aes: bool) -> bytes:
        if v == 5:
            return file_key
        h = hashlib.md5()
        h.update(file_key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", 0)[:2])
        if aes:
            h.update(b"sAlT")
        return h.digest()[: min(n + 5, 16)]

    def encrypt_payload(num: int, data: bytes) -> bytes:
        if method.startswith("rc4"):
            return rc4(obj_key(num, False), data)
        iv = hashlib.md5(str(num).encode()).digest()  # deterministic IV
        pad = 16 - len(data) % 16
        return iv + _aes_cbc_encrypt_nopad(
            obj_key(num, True), iv, data + bytes([pad]) * pad)

    # split make_pdf's regular layout, encrypt stream payloads
    bodies = {}
    for m in re.finditer(rb"(\d+) 0 obj\n(.*?)\nendobj\n", raw, re.S):
        bodies[int(m.group(1))] = m.group(2)
    for num, body in list(bodies.items()):
        if b"stream\n" not in body:
            continue
        head, rest = body.split(b">>\nstream\n", 1)
        payload = rest[: rest.rfind(b"\nendstream")]
        new_payload = encrypt_payload(num, payload)
        head = re.sub(rb"/Length \d+",
                      b"/Length " + str(len(new_payload)).encode(), head)
        bodies[num] = (head + b">>\nstream\n" + new_payload + b"\nendstream")

    enc_num = max(bodies) + 1
    bodies[enc_num] = enc_dict
    root_m = re.search(rb"/Root (\d+) 0 R", raw)
    out = bytearray(b"%PDF-1.6\n" if v == 5 else b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + bodies[num] + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {max(bodies) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max(bodies) + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    idhex = _FILE_ID.hex().encode()
    out += (b"trailer\n<< /Size " + str(max(bodies) + 1).encode()
            + b" /Root " + root_m.group(1) + b" 0 R"
            + b" /Encrypt " + str(enc_num).encode() + b" 0 R"
            + b" /ID [<" + idhex + b"> <" + idhex + b">] >>\n"
            + f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return bytes(out)
