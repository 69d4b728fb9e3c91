"""Legacy raster formats (pure Python, public layouts): Truevision
TGA and the netpbm PGM/PPM pair — the long-tail image formats of
scraped archives, all lossless so their decode oracles are exact.

- **TGA**: the 18-byte header (id length, color-map spec, image type
  2 = uncompressed true-color / 10 = RLE true-color, origin bits),
  24-bit BGR pixels, bottom-up or top-down per the descriptor, RLE
  packets (raw and run) that MUST NOT cross the image boundary.
- **PGM (P5) / PPM (P6)**: ASCII header (magic, whitespace +
  ``#`` comments, width/height/maxval ≤ 255) + raw samples.

Strictness: unknown image types / magics, truncated pixel data, RLE
overruns, maxval > 255 and oversized dims raise ValueError (the r10
fuzz contract).

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); §2.11 multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np


def write_tga(rgb: np.ndarray, rle: bool = False, top_down: bool = True) -> bytes:
    """24-bit true-color TGA (type 2, or type 10 with RLE)."""
    px = np.asarray(rgb, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("tga: pixels must be (h, w, 3)")
    h, w, _ = px.shape
    if not (1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("tga: dimensions out of range")
    descriptor = 0x20 if top_down else 0x00  # bit 5: top-left origin
    hdr = struct.pack(
        "<BBBHHBHHHHBB",
        0,  # id length
        0,  # no color map
        10 if rle else 2,
        0, 0, 0,  # color-map spec
        0, 0,  # origin
        w, h, 24, descriptor,
    )
    rows = px if top_down else px[::-1]
    bgr = rows[:, :, ::-1].reshape(-1, 3)
    if not rle:
        return hdr + bgr.tobytes()
    out = bytearray(hdr)
    # per-row RLE (packets must not cross rows is not required by the
    # spec for TGA2 but not crossing the IMAGE is; we keep rows for
    # simplicity and determinism)
    for y in range(h):
        row = bgr[y * w : (y + 1) * w]
        x = 0
        while x < w:
            run = 1
            while (
                x + run < w
                and run < 128
                and (row[x + run] == row[x]).all()
            ):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += row[x].tobytes()
                x += run
            else:
                lit = 1
                while (
                    x + lit < w
                    and lit < 128
                    and not (
                        x + lit + 1 < w
                        and (row[x + lit + 1] == row[x + lit]).all()
                    )
                ):
                    lit += 1
                out.append(lit - 1)
                out += row[x : x + lit].tobytes()
                x += lit
    return bytes(out)


def parse_tga(data: bytes) -> np.ndarray:
    """Decode 24-bit type-2/type-10 TGA → (h, w, 3) RGB uint8."""
    buf = bytes(data)
    if len(buf) < 18:
        raise ValueError("tga: truncated header")
    (
        id_len, cmap_type, img_type, _cm_first, _cm_len, _cm_bits,
        _ox, _oy, w, h, bpp, descriptor,
    ) = struct.unpack("<BBBHHBHHHHBB", buf[:18])
    if cmap_type != 0:
        raise ValueError("tga: color-mapped images unsupported")
    if img_type not in (2, 10):
        raise ValueError(f"tga: image type {img_type} unsupported")
    if bpp != 24:
        raise ValueError(f"tga: {bpp}-bpp unsupported")
    if w == 0 or h == 0 or w * h > 64 << 20:
        raise ValueError("tga: bad dimensions")
    pos = 18 + id_len
    n = w * h
    if img_type == 2:
        need = pos + 3 * n
        if len(buf) < need:
            raise ValueError("tga: truncated pixel data")
        bgr = np.frombuffer(buf, np.uint8, 3 * n, offset=pos).reshape(
            n, 3
        )
    else:
        out = np.empty((n, 3), dtype=np.uint8)
        at = 0
        while at < n:
            if pos >= len(buf):
                raise ValueError("tga: truncated RLE stream")
            pkt = buf[pos]
            pos += 1
            count = (pkt & 0x7F) + 1
            if at + count > n:
                raise ValueError("tga: RLE packet overruns the image")
            if pkt & 0x80:  # run
                if pos + 3 > len(buf):
                    raise ValueError("tga: truncated RLE run")
                out[at : at + count] = np.frombuffer(
                    buf, np.uint8, 3, offset=pos
                )
                pos += 3
            else:  # literal
                if pos + 3 * count > len(buf):
                    raise ValueError("tga: truncated RLE literals")
                out[at : at + count] = np.frombuffer(
                    buf, np.uint8, 3 * count, offset=pos
                ).reshape(count, 3)
                pos += 3 * count
            at += count
        bgr = out
    img = bgr.reshape(h, w, 3)[:, :, ::-1]
    if not descriptor & 0x20:  # bottom-up origin
        img = img[::-1]
    return np.ascontiguousarray(img)


def write_pnm(px: np.ndarray) -> bytes:
    """PGM (P5) for (h, w) gray, PPM (P6) for (h, w, 3) RGB."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError("pnm: pixels must be (h, w) or (h, w, 3)")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def parse_pnm(data: bytes) -> np.ndarray:
    """Decode binary PGM/PPM (maxval ≤ 255, comments tolerated)."""
    buf = bytes(data)
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("pnm: only binary P5/P6 supported")
    channels = 1 if buf[:2] == b"P5" else 3
    pos = 2
    vals = []
    while len(vals) < 3:
        if pos >= len(buf):
            raise ValueError("pnm: truncated header")
        c = buf[pos : pos + 1]
        if c == b"#":
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("pnm: unterminated comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while end < len(buf) and buf[end : end + 1].isdigit():
                end += 1
            vals.append(int(buf[pos:end]))
            pos = end
        else:
            raise ValueError(f"pnm: bad header byte {c!r}")
    w, h, maxval = vals
    if maxval > 255 or maxval < 1:
        raise ValueError("pnm: maxval out of the 8-bit range")
    if w == 0 or h == 0 or w * h > 64 << 20:
        raise ValueError("pnm: bad dimensions")
    # exactly one whitespace byte separates maxval from the raster
    if pos >= len(buf) or not buf[pos : pos + 1].isspace():
        raise ValueError("pnm: missing raster separator")
    pos += 1
    n = w * h * channels
    if len(buf) - pos < n:
        raise ValueError("pnm: truncated raster")
    if len(buf) - pos > n:
        raise ValueError("pnm: trailing bytes after raster")
    a = np.frombuffer(buf, np.uint8, n, offset=pos)
    return (
        a.reshape(h, w) if channels == 1 else a.reshape(h, w, 3)
    )


def sniff_raster(data: bytes) -> str:
    """Magic dispatch for the legacy-raster funnel: 'pgm' | 'ppm' |
    'tga' (TGA has no magic; netpbm is checked first)."""
    head = bytes(data[:2])
    if head == b"P5":
        return "pgm"
    if head == b"P6":
        return "ppm"
    return "tga"
