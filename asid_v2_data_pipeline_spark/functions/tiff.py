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
bit depths ≠ 8, compressions beyond none/PackBits/Deflate/LZW;
r11 closed the tiled-layout and palette-color boundaries) — never
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
    # End-of-stream width sync (r11, found by the tiled round-trip
    # matrix): the decoder appends a table entry for the FINAL data
    # code too, so its table can land exactly on a width-change point
    # (510/1022/2046) after it — in which case it reads EOI at the
    # bumped width.  The encoder adds no entry after its last emit
    # (next_code == decoder size here), so mirror the decoder's rule:
    if next_code == (1 << width) - 2 and width < 12:
        width += 1
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
    tiles: tuple[int, int] | None = None,
    palette: np.ndarray | None = None,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    strip-based TIFF — or TILED when ``tiles=(tw, tl)`` is given
    (r11: TileWidth/TileLength/TileOffsets/TileByteCounts, edge tiles
    zero-padded to full size per spec; tw/tl must be multiples of
    16).  ``palette`` (a (256, 3) uint8 colormap; pixels must be
    grayscale indices) writes a palette-color file (photometric 3 +
    ColorMap with 16-bit entries).  Deterministic output (no
    timestamps)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("tiff: pixels must be (h,w) or (h,w,3)")
    if compression not in _COMP:
        raise ValueError(f"tiff: unknown compression {compression!r}")
    h, w, spp = px.shape
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.shape != (256, 3):
            raise ValueError("tiff: palette must be (256, 3) uint8")
        if spp != 1:
            raise ValueError("tiff: palette requires index pixels")

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "big" if big_endian else "little")

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "big" if big_endian else "little")

    def compress_block(rows: np.ndarray) -> bytes:
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:, :] -= rows[:, :-1, :].astype(np.int16)
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        if compression == "none":
            return raw
        if compression == "packbits":
            return packbits_encode(raw)
        if compression == "deflate":
            return zlib.compress(raw, 6)
        return lzw_encode(raw)

    strips = []
    if tiles is not None:
        tw, tl = tiles
        if tw < 16 or tl < 16 or tw % 16 or tl % 16:
            raise ValueError("tiff: tile dims must be multiples of 16")
        # edge tiles are padded to FULL tile size (TIFF 6.0 §15)
        ta, td = -(-w // tw), -(-h // tl)
        canvas = np.zeros((td * tl, ta * tw, spp), np.uint8)
        canvas[:h, :w] = px
        for ty in range(td):
            for tx in range(ta):
                strips.append(
                    compress_block(
                        canvas[
                            ty * tl : (ty + 1) * tl,
                            tx * tw : (tx + 1) * tw,
                        ]
                    )
                )
    else:
        for y0 in range(0, h, rows_per_strip):
            strips.append(compress_block(px[y0 : y0 + rows_per_strip]))

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
    if palette is not None:
        tag(262, 3, *arr([3], 3))
        # ColorMap: all R then all G then all B, 16-bit entries
        cmap = [int(v) << 8 for v in palette.T.reshape(-1)]
        tag(320, 3, *arr(cmap, 3))
    else:
        tag(262, 3, *arr([1 if spp == 1 else 2], 3))
    tag(277, 3, *arr([spp], 3))
    if tiles is not None:
        tag(322, 4, *arr([tiles[0]], 4))
        tag(323, 4, *arr([tiles[1]], 4))
        tag(324, 4, *arr(offsets, 4))
        tag(325, 4, *arr([len(s) for s in strips], 4))
    else:
        tag(273, 4, *arr(offsets, 4))
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
    """Decode a strip-based or TILED 8-bit TIFF → (h, w) or
    (h, w, 3) uint8 (r11: tiles per TIFF 6.0 §15 — full-size
    zero-padded edge tiles, dims multiple of 16 — and palette color
    via the 16-bit ColorMap LUT).  Disclosed boundaries raise
    ``NotImplementedError``: bit depths ≠ 8, compressions beyond
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

    tiled = 322 in tags or 323 in tags
    for req in (256, 257) + ((322, 323, 324, 325) if tiled else (273, 279)):
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
        if spp != 1:
            raise ValueError("tiff: palette with SamplesPerPixel != 1")
        cmap = tags.get(320)
        if cmap is None or len(cmap) != 768:
            raise ValueError("tiff: palette file without 256-entry ColorMap")
    comp = tags.get(259, [1])[0]
    if h < 1 or w < 1 or h * w > 1 << 28:
        raise ValueError("tiff: implausible dimensions")
    pred = tags.get(317, [1])[0]
    if pred not in (1, 2):
        raise NotImplementedError(f"tiff: predictor {pred}")

    def decode_block(off: int, cnt: int, nrows: int, ncols: int) -> np.ndarray:
        if off + cnt > len(data):
            raise ValueError("tiff: block exceeds file")
        expected = nrows * ncols * spp
        raw = data[off : off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("tiff: short uncompressed block")
            out = raw[:expected]
        elif comp == 32773:
            out = packbits_decode(raw, expected)
        elif comp == 8:
            try:
                out = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"tiff: corrupt deflate block: {e}") from e
            if len(out) != expected:
                raise ValueError("tiff: deflate block size mismatch")
        elif comp == 5:
            out = lzw_decode(raw, expected)
        else:
            raise NotImplementedError(f"tiff: compression {comp}")
        block = np.frombuffer(out, np.uint8).reshape(nrows, ncols, spp)
        if pred == 2:
            block = np.cumsum(block.astype(np.int64), axis=1).astype(
                np.uint8
            )
        return block

    if tiled:
        # TIFF 6.0 §15: every tile is FULL TileWidth x TileLength
        # (edge tiles padded); tile dims must be multiples of 16
        tw, tl = tags[322][0], tags[323][0]
        if tw < 16 or tl < 16 or tw % 16 or tl % 16:
            raise ValueError("tiff: tile dims must be multiples of 16")
        if tw * tl > 1 << 26:
            raise ValueError("tiff: implausible tile size")
        offsets, counts = tags[324], tags[325]
        ta, td = -(-w // tw), -(-h // tl)
        if len(offsets) != len(counts) or len(offsets) != ta * td:
            raise ValueError("tiff: tile offset/count mismatch")
        px = np.zeros((td * tl, ta * tw, spp), np.uint8)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(ti, ta)
            px[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = (
                decode_block(off, cnt, tl, tw)
            )
        px = px[:h, :w]
    else:
        rps = tags.get(278, [h])[0]
        if rps < 1:
            raise ValueError("tiff: bad RowsPerStrip")
        offsets, counts = tags[273], tags[279]
        if len(offsets) != len(counts):
            raise ValueError("tiff: strip offset/count mismatch")
        if len(offsets) != -(-h // rps):
            raise ValueError("tiff: strip count mismatch")
        rows = [
            decode_block(off, cnt, min(rps, h - si * rps), w)
            for si, (off, cnt) in enumerate(zip(offsets, counts))
        ]
        px = np.concatenate(rows, axis=0)
    if photo == 3:
        # ColorMap: all R then all G then all B, 16-bit entries
        lut = (
            np.array(tags[320], np.uint16)
            .reshape(3, 256)
            .T
            >> 8
        ).astype(np.uint8)
        return lut[px[:, :, 0]]
    return px[:, :, 0] if spp == 1 else px
