"""QOI ("Quite OK Image") codec, pure Python from the public one-page
spec (qoiformat.org/qoi-specification.pdf): 14-byte header (magic
``qoif``, big-endian width/height, channels 3|4, colorspace), then a
byte stream of eight ops — RGB/RGBA literals, the 64-entry
``(r*3+g*5+b*7+a*11) % 64`` index cache, 2-bit DIFF, LUMA, and runs
of 1..62 — closed by the 7×0x00,0x01 end marker.

Encoder is the canonical greedy form (run → index → diff → luma →
literal), so encodes are byte-deterministic.  Decoder is strict: bad
magic/channels, stream overrun, pixel-count overflow or underflow,
and a missing/short end marker all raise ValueError (the r10 fuzz
contract).

QOI is lossless, which makes it the cleanest possible decode oracle:
the decoded bytes ARE the source bytes.

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); §2.11 multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def write_qoi(pixels: np.ndarray, colorspace: int = 0) -> bytes:
    """Encode an (h, w, 3|4) uint8 array."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("qoi: pixels must be (h, w, 3|4)")
    h, w, ch = px.shape
    out = bytearray(
        _MAGIC + struct.pack(">IIBB", w, h, ch, colorspace)
    )
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, ch)
    for p in flat:
        cur = (int(p[0]), int(p[1]), int(p[2]),
               int(p[3]) if ch == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        r, g, b, a = cur
        ih = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[ih] == cur:
            out.append(ih)
        else:
            index[ih] = cur
            if a == prev[3]:
                dr = (r - prev[0] + 128) % 256 - 128
                dg = (g - prev[1] + 128) % 256 - 128
                db = (b - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(0xFE)
                    out += bytes((r, g, b))
            else:
                out.append(0xFF)
                out += bytes((r, g, b, a))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def parse_qoi(data: bytes) -> np.ndarray:
    """Decode to an (h, w, channels) uint8 array."""
    buf = bytes(data)
    if len(buf) < 14 + len(_END):
        raise ValueError("qoi: too short")
    if buf[:4] != _MAGIC:
        raise ValueError("qoi: bad magic")
    w, h, ch, colorspace = struct.unpack(">IIBB", buf[4:14])
    if ch not in (3, 4):
        raise ValueError(f"qoi: bad channel count {ch}")
    if colorspace not in (0, 1):
        raise ValueError(f"qoi: bad colorspace {colorspace}")
    n_px = w * h
    if n_px > 64 << 20:
        raise ValueError("qoi: image too large")  # allocation guard
    out = np.empty((n_px, ch), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(buf) - len(_END)
    if buf[end:] != _END:
        raise ValueError("qoi: missing end marker")
    i = 0
    while i < n_px:
        if pos >= end:
            raise ValueError("qoi: stream underruns the pixel count")
        b0 = buf[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            if pos + 3 > end:
                raise ValueError("qoi: truncated RGB op")
            r, g, b = buf[pos], buf[pos + 1], buf[pos + 2]
            pos += 3
        elif b0 == 0xFF:  # RGBA
            if pos + 4 > end:
                raise ValueError("qoi: truncated RGBA op")
            r, g, b, a = (
                buf[pos], buf[pos + 1], buf[pos + 2], buf[pos + 3]
            )
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            r, g, b, a = index[b0]
        elif b0 >> 6 == 1:  # DIFF
            r = (r + ((b0 >> 4) & 3) - 2) % 256
            g = (g + ((b0 >> 2) & 3) - 2) % 256
            b = (b + (b0 & 3) - 2) % 256
        elif b0 >> 6 == 2:  # LUMA
            if pos + 1 > end:
                raise ValueError("qoi: truncated LUMA op")
            dg = (b0 & 0x3F) - 32
            b1 = buf[pos]
            pos += 1
            r = (r + dg + ((b1 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b1 & 0xF) - 8) % 256
        else:  # RUN
            run = (b0 & 0x3F) + 1
            if run > 62:
                raise ValueError("qoi: reserved run length")
            if i + run > n_px:
                raise ValueError("qoi: run overflows the pixel count")
            px = (r, g, b, a)[:ch]
            out[i : i + run] = px
            i += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)[:ch]
        i += 1
    if pos != end:
        raise ValueError(f"qoi: {end - pos} trailing data bytes")
    return out.reshape(h, w, ch)
