"""Pure-Python multimedia container codecs: WAV/PCM and uncompressed BMP.

Round-5 replacement for the ``DecodeStub`` decode step in
``operators/multimodal.py`` for the formats implementable without codec
libraries — the RIFF/WAVE container (PCM 8/16-bit) and the Windows BMP
container (uncompressed 8-bit palette and 24-bit BGR).  Both are simple
public formats (Microsoft RIFF/WAVEFORMAT and BITMAPINFOHEADER specs);
parsing is struct + NumPy, so executor-side decode stays vectorized.

PNG also decodes for real (8-bit, non-interlaced, all five scanline
filters) — DEFLATE comes from the stdlib ``zlib``.  Codecs needing
libraries outside the stdlib (JPEG/MP3/MP4/…) remain stubbed — see
``operators/multimodal.py::DecodeStub``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM only)
# --------------------------------------------------------------------------


def _build_mulaw_table() -> "np.ndarray":
    """G.711 mu-law decode table (code byte -> linear int16), built from
    the ITU-T definition: invert, split sign/exponent/mantissa, expand
    with the 0x84 bias."""
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        u = ~code & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        x = (((mant << 3) + 0x84) << exp) - 0x84
        out[code] = -x if sign else x
    return out


_MULAW_TABLE = _build_mulaw_table()


def mulaw_encode(samples: "np.ndarray") -> "np.ndarray":
    """Linear int16 -> G.711 mu-law code bytes (the fixture-writer half;
    standard clamp to +/-32635, bias, exponent-segment search)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.clip(np.abs(x), 0, 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def write_wav_mulaw(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Minimal mu-law WAV writer (fixture builder): linear int16 in,
    audio_format=7 / 8-bit container out."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    codes = mulaw_encode(a)
    nch = a.shape[1]
    fmt = struct.pack("<HHIIHH", 7, nch, sample_rate, sample_rate * nch, nch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data = codes.tobytes()
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE container; returns ``(sample_rate, n_channels,
    samples)`` where samples is int16 (16-bit PCM) or uint8 (8-bit PCM)
    shaped ``(n_frames, n_channels)``.  Non-PCM encodings raise
    ``NotImplementedError`` (they need real codec libraries)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format == 7:  # G.711 mu-law: telephony's 8-bit log PCM
        if bits != 8:
            raise NotImplementedError(f"{bits}-bit mu-law not supported")
        arr = _MULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} is not PCM; compressed "
            "audio needs real codec libraries"
        )
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n_frames = arr.size // n_channels
    return sample_rate, n_channels, arr[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


def write_wav(
    samples: np.ndarray, sample_rate: int = 8000
) -> bytes:
    """Minimal PCM WAV writer (fixture builder).  ``samples`` is uint8
    (8-bit) or int16 (16-bit), 1-D mono or ``(frames, channels)``."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.dtype == np.uint8:
        bits, data = 8, a.astype(np.uint8).tobytes()
    elif a.dtype in (np.int16, np.dtype("<i2")):
        bits, data = 16, a.astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    nch = a.shape[1]
    block = nch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 8-bit palette / 24-bit BGR)
# --------------------------------------------------------------------------


def parse_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed BMP; returns uint8 pixels shaped
    ``(height, width, 3)`` in RGB order (palette entries expanded).
    RLE/other compressions raise ``NotImplementedError``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} needs real codec libraries"
        )
    flip = height > 0  # positive height = bottom-up rows
    height = abs(height)
    row_bytes = (width * bits // 8 + 3) // 4 * 4
    if bits == 24:
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        rgb = bgr[:, :, ::-1]
    elif bits == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA entries -> RGB
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)
        rgb = pal[rows[:, :width]]
    else:
        raise NotImplementedError(f"{bits}-bit BMP not supported")
    return np.ascontiguousarray(rgb[::-1] if flip else rgb)


def write_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (fixture builder).
    ``pixels`` is uint8 ``(height, width)`` grayscale or
    ``(height, width, 3)`` RGB; rows stored bottom-up, 4-byte padded."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + dib + data


# --------------------------------------------------------------------------
# PNG (8-bit, non-interlaced; gray / gray+alpha / RGB / RGBA / palette)
# --------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def parse_png(payload: bytes) -> np.ndarray:
    """Parse a PNG (8-bit depth, non-interlaced); returns uint8 pixels
    ``(height, width, channels)`` with palette entries expanded to RGB.
    All five scanline filters (None/Sub/Up/Average/Paeth) are undone.
    Unsupported depths/interlacing raise ``NotImplementedError``."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} not supported"
        )
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    px = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return np.ascontiguousarray(px)


def write_png(
    pixels: np.ndarray, filter_mode: str = "cycle", level: int = 6
) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced).  ``pixels`` is uint8
    ``(h, w)`` gray, or ``(h, w, c)`` with c ∈ {1,2,3,4}.
    ``filter_mode``: ``"none"`` = filter 0 every row; ``"cycle"`` =
    rows cycle through filters 0..4, so a reader must undo all five
    (the fixture-builder's job)."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        ft = 0 if filter_mode == "none" else y % 5
        left = np.zeros(stride, dtype=np.int16)
        left[ch:] = cur[:-ch]
        ul = np.zeros(stride, dtype=np.int16)
        ul[ch:] = prev[:-ch]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            enc = cur.copy()
            for i in range(stride):
                enc[i] = cur[i] - _paeth(int(left[i]), int(prev[i]), int(ul[i]))
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    comp = zlib.compress(b"".join(lines), level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, widths grow to 12 bits, codes packed
    LSB-first.  Handles the KwK case (code == next table slot)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:  # KwK
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        if prev is not None:
            # next assignable code = len(table) + 2 (CLEAR/EOI reserved)
            table[len(table) + 2] = prev + [entry[0]]
            # width grows when the next code to assign would not fit
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def parse_gif(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced GIF87a/89a first frame to uint8 RGB
    (h, w, 3): logical screen + global color table, extensions skipped,
    LZW-decompressed indices mapped through the palette.  Interlaced
    images and local color tables raise ``NotImplementedError``."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF container")
    w0, h0, flags = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        palette = palette.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF is not supported")
            if iflags & 0x80:
                raise NotImplementedError("local color tables are not supported")
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            arr = np.asarray(idx, dtype=np.int32).reshape(ih, iw)
            return palette[arr].astype(np.uint8)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (fixture half): CLEAR first, table resets
    at 4096 entries, codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int):
        nonlocal width
        for i in range(width):
            out_bits.append((code >> i) & 1)

    def fresh():
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    emit(clear)
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        emit(table[buf])
    emit(eoi)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def write_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal non-interlaced GIF89a writer (fixture builder):
    ``indices`` (h, w) uint8 into ``palette`` (n, 3) uint8 with n a
    power of two >= 2."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = pal.shape[0]
    bits = max(1, (n - 1).bit_length())
    if n != (1 << bits):
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode([int(x) for x in idx.ravel()], min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched image decode: BMP, PNG or GIF -> uint8 RGB-ish
    array (PNG alpha/gray channels preserved).  Other formats raise
    ``NotImplementedError`` (JPEG etc. need real codec libraries)."""
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if payload[:8] == PNG_MAGIC:
        return parse_png(payload)
    if payload[:4] == b"GIF8":
        return parse_gif(payload)
    raise NotImplementedError("unsupported image container")
