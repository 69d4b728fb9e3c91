"""EXIF metadata (TIFF-IFD-in-JPEG-APP1) writer and parser, from the
public EXIF 2.3 / TIFF 6.0 structure: an APP1 segment tagged
``Exif\\0\\0`` carrying a little- or big-endian TIFF header, IFD0 with
camera fields, and the Exif sub-IFD behind the 0x8769 pointer tag.

Value types implemented: BYTE(1), ASCII(2, NUL-terminated),
SHORT(3), LONG(4), RATIONAL(5, ``(numerator, denominator)``).
``parse_exif`` is strict — out-of-bounds value offsets, truncated
IFDs, a missing TIFF magic or an APP1 without the Exif tag raise
ValueError.  ``insert_jpeg_app1`` / ``extract_jpeg_app1`` splice and
recover the segment through a real JPEG marker walk (APP1 directly
after SOI per the EXIF spec; extraction scans every APPn up to SOS so
files with JFIF-first layouts still resolve).

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); image-metadata extraction is §2.11 surface.
"""

from __future__ import annotations

import struct

_EXIF_MAGIC = b"Exif\x00\x00"
_EXIF_IFD_TAG = 0x8769
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# tag name maps (public EXIF 2.3 tables) — only what we read/write
TAGS_IFD0 = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x011A: "x_resolution",
}
TAGS_EXIF = {
    0x829A: "exposure_time",
    0x8827: "iso",
    0x9003: "datetime_original",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}
_NAME_TO_TAG = {
    **{v: (k, "ifd0") for k, v in TAGS_IFD0.items()},
    **{v: (k, "exif") for k, v in TAGS_EXIF.items()},
}
_TAG_TYPE = {
    "make": 2,
    "model": 2,
    "orientation": 3,
    "x_resolution": 5,
    "exposure_time": 5,
    "iso": 3,
    "datetime_original": 2,
    "pixel_x": 4,
    "pixel_y": 4,
}


def _encode_value(ttype: int, value) -> bytes:
    if ttype == 2:
        return str(value).encode("ascii") + b"\x00"
    if ttype == 3:
        return struct.pack("<H", int(value))
    if ttype == 4:
        return struct.pack("<I", int(value))
    if ttype == 5:
        num, den = value
        return struct.pack("<II", int(num), int(den))
    raise ValueError(f"exif: unsupported write type {ttype}")


def _build_ifd(
    entries: list[tuple[int, int, bytes]], base: int
) -> bytes:
    """Serialize one IFD at absolute TIFF offset ``base``; inline
    values ≤ 4 bytes, external area appended after the entry table."""
    table = struct.pack("<H", len(entries))
    ext = bytearray()
    ext_at = base + 2 + 12 * len(entries) + 4
    for tag, ttype, raw in sorted(entries):
        count = len(raw) // _TYPE_SIZE[ttype]
        if len(raw) <= 4:
            v = raw.ljust(4, b"\x00")
        else:
            v = struct.pack("<I", ext_at + len(ext))
            ext += raw
        table += struct.pack("<HHI", tag, ttype, count) + v
    return table + struct.pack("<I", 0) + bytes(ext)


def write_exif(fields: dict) -> bytes:
    """Serialize ``{name: value}`` (names from TAGS_IFD0/TAGS_EXIF)
    as a full APP1 payload: ``Exif\\0\\0`` + little-endian TIFF."""
    ifd0: list[tuple[int, int, bytes]] = []
    exif: list[tuple[int, int, bytes]] = []
    for name, value in fields.items():
        spec = _NAME_TO_TAG.get(name)
        if spec is None:
            raise ValueError(f"exif: unknown field {name!r}")
        tag, which = spec
        ttype = _TAG_TYPE[name]
        (ifd0 if which == "ifd0" else exif).append(
            (tag, ttype, _encode_value(ttype, value))
        )
    # layout: header(8) | IFD0 | [Exif IFD]
    # IFD0 gets the pointer tag once we know where the Exif IFD lands;
    # its size is stable because the pointer is a fixed 4-byte LONG
    n0 = len(ifd0) + (1 if exif else 0)
    ifd0_at = 8

    def ifd0_size(entries):
        ext = sum(len(r) for _, _, r in entries if len(r) > 4)
        return 2 + 12 * n0 + 4 + ext

    exif_at = ifd0_at + ifd0_size(ifd0)
    if exif:
        ifd0 = ifd0 + [
            (_EXIF_IFD_TAG, 4, struct.pack("<I", exif_at))
        ]
    tiff = b"II\x2a\x00" + struct.pack("<I", ifd0_at)
    tiff += _build_ifd(ifd0, ifd0_at)
    assert len(tiff) == exif_at or not exif
    if exif:
        tiff += _build_ifd(exif, exif_at)
    return _EXIF_MAGIC + tiff


def _read_ifd(
    buf: bytes, at: int, bo: str, names: dict, _seen: frozenset = frozenset()
) -> dict:
    # Crafted sub-IFD pointers can form a cycle (0x8769 pointing back at
    # itself or an ancestor); track visited offsets so corrupt bytes raise
    # ValueError per the fuzz contract instead of RecursionError.
    if at in _seen or len(_seen) > 32:
        raise ValueError("exif: IFD pointer cycle")
    _seen = _seen | {at}
    if at + 2 > len(buf):
        raise ValueError("exif: IFD offset out of bounds")
    (n,) = struct.unpack_from(bo + "H", buf, at)
    if at + 2 + 12 * n + 4 > len(buf):
        raise ValueError("exif: truncated IFD")
    out: dict = {}
    for k in range(n):
        tag, ttype, count = struct.unpack_from(
            bo + "HHI", buf, at + 2 + 12 * k
        )
        vat = at + 2 + 12 * k + 8
        size = _TYPE_SIZE.get(ttype)
        if size is None:
            continue  # unknown type: skip per TIFF reader convention
        total = size * count
        if total > 4:
            (off,) = struct.unpack_from(bo + "I", buf, vat)
            if off + total > len(buf):
                raise ValueError(
                    f"exif: tag 0x{tag:04x} value out of bounds"
                )
            raw = buf[off : off + total]
        else:
            raw = buf[vat : vat + total]
        if tag == _EXIF_IFD_TAG and ttype == 4 and count == 1:
            (sub,) = struct.unpack(bo + "I", raw)
            out.update(_read_ifd(buf, sub, bo, TAGS_EXIF, _seen))
            continue
        name = names.get(tag)
        if name is None:
            continue
        if ttype == 2:
            out[name] = raw.split(b"\x00", 1)[0].decode(
                "ascii", errors="strict"
            )
        elif ttype in (1, 3, 4):
            fmt = {1: "B", 3: "H", 4: "I"}[ttype]
            vals = list(struct.unpack(bo + fmt * count, raw))
            out[name] = vals[0] if count == 1 else vals
        elif ttype == 5:
            pairs = struct.unpack(bo + "II" * count, raw)
            rats = [
                (pairs[2 * i], pairs[2 * i + 1]) for i in range(count)
            ]
            out[name] = rats[0] if count == 1 else rats
    return out


def parse_exif(payload: bytes) -> dict:
    """Parse an APP1 payload into ``{name: value}`` for the known
    IFD0 + Exif-sub-IFD tags."""
    payload = bytes(payload)
    if not payload.startswith(_EXIF_MAGIC):
        raise ValueError("exif: missing Exif\\0\\0 tag")
    buf = payload[len(_EXIF_MAGIC) :]
    if buf[:4] == b"II\x2a\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00\x2a":
        bo = ">"
    else:
        raise ValueError("exif: bad TIFF byte-order magic")
    (ifd0_at,) = struct.unpack_from(bo + "I", buf, 4)
    return _read_ifd(buf, ifd0_at, bo, TAGS_IFD0)


def insert_jpeg_app1(jpeg: bytes, payload: bytes) -> bytes:
    """Splice an APP1 segment directly after SOI (EXIF placement)."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (missing SOI)")
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("exif: APP1 payload too large")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def extract_jpeg_app1(jpeg: bytes) -> bytes | None:
    """Marker-walk the JPEG and return the first Exif APP1 payload,
    or None when the image carries no EXIF."""
    buf = bytes(jpeg)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (missing SOI)")
    pos = 2
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"exif: lost marker sync at byte {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # bare markers
            pos += 2
            continue
        (size,) = struct.unpack_from(">H", buf, pos + 2)
        if size < 2 or pos + 2 + size > n:
            raise ValueError("exif: truncated segment")
        if marker == 0xE1 and buf[pos + 4 : pos + 10] == _EXIF_MAGIC:
            return buf[pos + 4 : pos + 2 + size]
        if marker == 0xDA:  # SOS: entropy data follows, stop scanning
            break
        pos += 2 + size
    return None
