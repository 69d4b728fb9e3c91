"""Minimal TIFF 6.0 reader/writer — strips, both byte orders, the
baseline compressions (none, PackBits) plus Deflate and the TIFF
variant of LZW, and the horizontal-differencing predictor.

TIFF is the image container of scanned/scientific corpora (document
scans, satellite products, microscopy) — the image-side sibling of the
audio/video containers this engine already demuxes.  Implemented from
the public TIFF 6.0 specification:

- header ``II*\\0`` / ``MM\\0*`` + IFD (ascending tags, SHORT/LONG
  values inline when ≤4 bytes else offset-addressed);
- strip layout (RowsPerStrip / StripOffsets / StripByteCounts);
- PackBits (§9): literal runs ``0..127`` = n+1 bytes, replicate runs
  ``-1..-127`` = 257−n copies, ``-128`` noop;
- TIFF-LZW (§13): MSB-first codes, 9→12-bit widths with EARLY change
  (width bumps when the next code would be 2^w − 1, one code earlier
  than GIF's LSB-first variant in ``codecs.py``), Clear=256, EOI=257;
- Deflate (compression 8, the zlib stream form);
- predictor 2 (§14): per-row per-channel byte differencing before
  compression, cumulative sum after decompression.

The reference pipeline's rasters live in NetCDF
(``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Fuzz contract (SCALE.md round 10): ``parse_tiff`` raises
``ValueError`` (or ``NotImplementedError`` for disclosed boundaries:
tiles, bit depths ≠ 8, palettes, other compressions) — never
``IndexError``/``struct.error`` escapes, never unbounded allocation
(every count is validated against the remaining bytes first).
"""

from __future__ import annotations

import zlib

import numpy as np


# --- PackBits -------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:  # run of (j - i + 1) >= 2
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal: until next run of >= 3 or 128 bytes
        j = i
        while (
            j + 2 < n
            and not (data[j + 1] == data[j + 2] == data[j])
            and j - i < 127
        ):
            j += 1
        j = min(j, i + 127, n - 1)
        out.append(j - i)
        out += data[i : j + 1]
        i = j + 1
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("tiff: truncated PackBits stream")
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:
            continue
        else:
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise ValueError("tiff: PackBits output overruns strip size")
    return bytes(out)


# --- TIFF-LZW (MSB-first, early change) ------------------------------------------

_CLEAR, _EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(_CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EARLY change: width bumps when the NEXT code to be written
        # could be 2^width - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([ch])
    if w:
        put(table[w], width)
    put(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0  # bit position
    total = 8 * len(data)
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def get() -> int:
        nonlocal pos
        if pos + width > total:
            raise ValueError("tiff: truncated LZW stream")
        byte0 = pos >> 3
        nbytes = (pos % 8 + width + 7) // 8
        chunk = int.from_bytes(data[byte0 : byte0 + nbytes], "big")
        shift = nbytes * 8 - (pos % 8) - width
        pos += width
        return (chunk >> shift) & ((1 << width) - 1)

    while True:
        code = get()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("tiff: LZW stream starts mid-table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: LZW code beyond table")
        out += entry
        if len(out) > expected:
            raise ValueError("tiff: LZW output overruns strip size")
        # the spec decoder's width change points (510/1022/2046): ONE
        # entry earlier than the encoder's next_code == 2^w - 1 check,
        # because the decoder's table additions lag the encoder's by
        # exactly one code
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) != expected:
        raise ValueError("tiff: LZW output short of strip size")
    return bytes(out)


# --- container --------------------------------------------------------------------

_COMP = {"none": 1, "packbits": 32773, "deflate": 8, "lzw": 5}


def write_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int = 4,
    predictor: bool = False,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    strip-based TIFF.  Deterministic output (no timestamps)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("tiff: pixels must be (h,w) or (h,w,3)")
    if compression not in _COMP:
        raise ValueError(f"tiff: unknown compression {compression!r}")
    h, w, spp = px.shape
    bo = ">" if big_endian else "<"

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "big" if big_endian else "little")

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "big" if big_endian else "little")

    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = px[y0 : y0 + rows_per_strip]
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:, :] -= rows[:, :-1, :].astype(np.int16)
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(packbits_encode(raw))
        elif compression == "deflate":
            strips.append(zlib.compress(raw, 6))
        else:
            strips.append(lzw_encode(raw))

    # layout: header(8) | strip data | external value areas | IFD
    data_at = 8
    offsets = []
    blob = bytearray()
    for s in strips:
        offsets.append(data_at + len(blob))
        blob += s

    tags: list[tuple[int, int, int, bytes | int]] = []

    def tag(tid: int, ttype: int, count: int, value) -> None:
        tags.append((tid, ttype, count, value))

    ext = bytearray()
    ext_base = data_at + len(blob)

    def arr(values: list[int], ttype: int) -> tuple[int, bytes | int]:
        size = 2 if ttype == 3 else 4
        pack = u16 if ttype == 3 else u32
        raw = b"".join(pack(v) for v in values)
        if len(raw) <= 4:
            return len(values), raw.ljust(4, b"\x00")
        off = ext_base + len(ext)
        ext.extend(raw)
        return len(values), u32(off)

    tag(256, 4, *arr([w], 4))
    tag(257, 4, *arr([h], 4))
    tag(258, 3, *arr([8] * spp, 3))
    tag(259, 3, *arr([_COMP[compression]], 3))
    tag(262, 3, *arr([1 if spp == 1 else 2], 3))
    tag(273, 4, *arr(offsets, 4))
    tag(277, 3, *arr([spp], 3))
    tag(278, 4, *arr([rows_per_strip], 4))
    tag(279, 4, *arr([len(s) for s in strips], 4))
    if predictor:
        tag(317, 3, *arr([2], 3))

    ifd_at = ext_base + len(ext)
    ifd = u16(len(tags))
    for tid, ttype, count, value in sorted(tags):
        v = value if isinstance(value, bytes) else u32(value)
        ifd += u16(tid) + u16(ttype) + u32(count) + v
    ifd += u32(0)  # no next IFD
    head = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + u32(ifd_at)
    return head + bytes(blob) + bytes(ext) + ifd


_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def parse_tiff(data: bytes) -> np.ndarray:
    """Decode a strip-based 8-bit TIFF → (h, w) or (h, w, 3) uint8.
    Disclosed boundaries raise ``NotImplementedError``: tiles, bit
    depths ≠ 8, palette color, compressions beyond
    none/PackBits/Deflate/LZW."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("tiff: payload must be bytes")
    data = bytes(data)
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    if data[:4] == b"II\x2a\x00":
        end = "little"
    elif data[:4] == b"MM\x00\x2a":
        end = "big"
    else:
        raise ValueError("tiff: bad magic")

    def num(at: int, size: int) -> int:
        if at + size > len(data):
            raise ValueError("tiff: out-of-bounds read")
        return int.from_bytes(data[at : at + size], end)

    ifd_at = num(4, 4)
    n_tags = num(ifd_at, 2)
    if ifd_at + 2 + 12 * n_tags + 4 > len(data):
        raise ValueError("tiff: IFD exceeds file")
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        at = ifd_at + 2 + 12 * i
        tid = num(at, 2)
        ttype = num(at + 2, 2)
        count = num(at + 4, 4)
        size = _TYPE_SIZE.get(ttype)
        if size is None:  # RATIONAL etc. — skip (resolution tags)
            continue
        if count > len(data):
            raise ValueError("tiff: implausible tag count")
        total = size * count
        vat = at + 8 if total <= 4 else num(at + 8, 4)
        if vat + total > len(data):
            raise ValueError("tiff: tag value exceeds file")
        tags[tid] = [num(vat + k * size, size) for k in range(count)]

    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiff: tiled layout")
    for req in (256, 257, 273, 279):
        if req not in tags:
            raise ValueError(f"tiff: missing required tag {req}")
    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError("tiff: only 8-bit gray/RGB")
    photo = tags.get(262, [1])[0]
    if photo == 3:
        raise NotImplementedError("tiff: palette color")
    comp = tags.get(259, [1])[0]
    rps = tags.get(278, [h])[0]
    if rps < 1:
        raise ValueError("tiff: bad RowsPerStrip")
    offsets = tags[273]
    counts = tags[279]
    if len(offsets) != len(counts):
        raise ValueError("tiff: strip offset/count mismatch")
    if h < 1 or w < 1 or h * w > 1 << 28:
        raise ValueError("tiff: implausible dimensions")
    if len(offsets) != -(-h // rps):
        raise ValueError("tiff: strip count mismatch")
    pred = tags.get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"tiff: predictor {pred}")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("tiff: strip exceeds file")
        nrows = min(rps, h - si * rps)
        expected = nrows * w * spp
        raw = data[off : off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("tiff: short uncompressed strip")
            out = raw[:expected]
        elif comp == 32773:
            out = packbits_decode(raw, expected)
        elif comp == 8:
            try:
                out = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"tiff: corrupt deflate strip: {e}") from e
            if len(out) != expected:
                raise ValueError("tiff: deflate strip size mismatch")
        elif comp == 5:
            out = lzw_decode(raw, expected)
        else:
            raise NotImplementedError(f"tiff: compression {comp}")
        strip = np.frombuffer(out, np.uint8).reshape(nrows, w, spp)
        if pred == 2:
            strip = np.cumsum(strip.astype(np.int64), axis=1).astype(
                np.uint8
            )
        rows.append(strip)
    px = np.concatenate(rows, axis=0)
    return px[:, :, 0] if spp == 1 else px
