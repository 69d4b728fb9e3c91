"""ICO (Windows icon) container, pure Python from the public layout:
ICONDIR (reserved 0, type 1, count) + ICONDIRENTRY table (8-bit
dims with 0 meaning 256, payload size/offset) + per-image payloads
that are EITHER a complete PNG stream or a DIB — a BITMAPINFOHEADER
with DOUBLED height covering the XOR (color, bottom-up, 4-byte row
padding) and AND (1-bit transparency, 4-byte row padding) masks.

Composes the repo's existing PNG layer (``functions/codecs``) for
PNG-format entries; DIB entries implemented here (24-bit BGR).
Strictness: bad reserved/type fields, entries overrunning the file,
non-doubled DIB heights, unsupported bit depths and truncation all
raise ValueError.

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); §2.11 multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import PNG_MAGIC, parse_png, write_png


def _dib_payload(rgb: np.ndarray) -> bytes:
    """24-bit DIB icon image: doubled-height header, bottom-up BGR XOR
    rows, all-opaque AND mask."""
    h, w, _ = rgb.shape
    xor_row = (w * 3 + 3) // 4 * 4
    and_row = ((w + 31) // 32) * 4
    hdr = struct.pack(
        "<IiiHHIIiiII",
        40, w, 2 * h, 1, 24, 0,
        xor_row * h + and_row * h, 0, 0, 0, 0,
    )
    out = bytearray(hdr)
    for y in range(h - 1, -1, -1):
        row = rgb[y, :, ::-1].tobytes()  # BGR
        out += row + b"\x00" * (xor_row - len(row))
    out += b"\x00" * (and_row * h)  # AND mask: all opaque
    return bytes(out)


def write_ico(images: list[tuple[str, np.ndarray]]) -> bytes:
    """Serialize ``(fmt, pixels)`` entries — fmt 'png' (any shape the
    PNG writer takes) or 'dib' ((h, w, 3) RGB uint8)."""
    if not images:
        raise ValueError("ico: no images")
    payloads = []
    dims = []
    for fmt, px in images:
        px = np.asarray(px, dtype=np.uint8)
        h, w = px.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ico: dimensions out of range")
        if fmt == "png":
            payloads.append(write_png(px))
        elif fmt == "dib":
            if px.ndim != 3 or px.shape[2] != 3:
                raise ValueError("ico: dib entries must be (h, w, 3)")
            payloads.append(_dib_payload(px))
        else:
            raise ValueError(f"ico: unknown entry format {fmt!r}")
        dims.append((w, h))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    offset = 6 + 16 * len(images)
    for (w, h), payload in zip(dims, payloads):
        out += struct.pack(
            "<BBBBHHII",
            w & 0xFF if w < 256 else 0,
            h & 0xFF if h < 256 else 0,
            0, 0, 1, 24, len(payload), offset,
        )
        offset += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)


def parse_ico(data: bytes) -> list[dict]:
    """Parse into ``[{"width", "height", "fmt", "pixels"}]`` with
    pixels ``(h, w, 3)`` RGB uint8 (gray PNG entries replicated)."""
    buf = bytes(data)
    if len(buf) < 6:
        raise ValueError("ico: too short")
    reserved, ico_type, count = struct.unpack_from("<HHH", buf, 0)
    if reserved != 0 or ico_type != 1:
        raise ValueError("ico: bad ICONDIR header")
    if 6 + 16 * count > len(buf):
        raise ValueError("ico: truncated entry table")
    out = []
    for k in range(count):
        w8, h8, _colors, _res, _planes, _bpp, size, offset = (
            struct.unpack_from("<BBBBHHII", buf, 6 + 16 * k)
        )
        if offset + size > len(buf):
            raise ValueError(f"ico: entry {k} overruns the file")
        payload = buf[offset : offset + size]
        if payload[:8] == PNG_MAGIC:
            px = parse_png(payload)
            if px.ndim == 2:
                px = px[:, :, None]
            if px.dtype != np.uint8:
                raise ValueError("ico: 16-bit PNG entries unsupported")
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            elif px.shape[2] == 4:
                px = px[:, :, :3]
            elif px.shape[2] == 2:
                px = np.repeat(px[:, :, :1], 3, axis=2)
            fmt = "png"
        else:
            if len(payload) < 40:
                raise ValueError("ico: truncated DIB header")
            (
                bisize, bw, bh, planes, bpp, comp, _simg,
                _xp, _yp, _cu, _ci,
            ) = struct.unpack_from("<IiiHHIIiiII", payload, 0)
            if bisize != 40 or comp != 0:
                raise ValueError("ico: unsupported DIB header")
            if bh % 2:
                raise ValueError("ico: DIB height must be doubled")
            h = bh // 2
            w = bw
            if bpp != 24:
                raise ValueError(f"ico: {bpp}-bpp DIB unsupported")
            xor_row = (w * 3 + 3) // 4 * 4
            and_row = ((w + 31) // 32) * 4
            need = 40 + xor_row * h + and_row * h
            if len(payload) < need:
                raise ValueError("ico: truncated DIB pixel data")
            px = np.zeros((h, w, 3), dtype=np.uint8)
            at = 40
            for y in range(h - 1, -1, -1):
                row = np.frombuffer(
                    payload, np.uint8, count=w * 3, offset=at
                ).reshape(w, 3)
                px[y] = row[:, ::-1]  # BGR -> RGB
                at += xor_row
            fmt = "dib"
        h, w = px.shape[:2]
        # directory dims (0 = 256) must agree with the payload
        if (w8 or 256) != w or (h8 or 256) != h:
            raise ValueError(
                f"ico: entry {k} directory dims disagree with payload"
            )
        out.append(
            {"width": w, "height": h, "fmt": fmt, "pixels": px}
        )
    return out
