"""LZ4 block + frame codec (pure Python, from the public spec).

LZ4 is the fast-path compression of the data ecosystem — Kafka
message sets, Parquet/ORC pages, Arrow IPC buffers, stream shards —
so an ingestion engine meets ``0x184D2204`` frames constantly.
Implemented from the public block format (token byte = literal-length
nibble + matchlength-4 nibble, 255-extension bytes, 2-byte
little-endian match offsets within a 64 KiB window) and frame format
(FLG/BD descriptor with an xxHash32 header checksum, 4-byte block
sizes with the high bit flagging stored blocks, end mark, optional
content checksum).  xxHash32 itself is implemented from its public
reference description — the frame format requires it.

The encoder is a deterministic greedy hash-table matcher honoring the
spec's end-of-block restrictions (last 5 bytes literal, no match
starting within the last 12 bytes), so fixtures are byte-stable.  The
reference pipeline has no compression surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

r11 closed the LINKED-BLOCKS boundary: when B.Indep is unset,
every block's matches may reach up to 64 KiB back into the
PREVIOUSLY DECODED frame output (the spec's prefix window) — both
sides implement it (``compress_frame(linked=True)`` carries the
history window; the decoder seeds each block with the prior 64 KiB),
which is the layout lz4's own CLI emits by default.  Disclosed
boundaries (``NotImplementedError``): dictionaries (DictID),
skippable frames beyond a bounded skip, legacy frame magic.

Fuzz contract (SCALE.md round 10): ``decompress_frame`` /
``decompress_block`` raise ``ValueError`` on malformed input — bad
magic, header-checksum mismatch, offsets before the window start,
truncated sequences, size overruns — never ``IndexError`` escapes,
never unbounded allocation (output is bounded by the declared block
maximum / an explicit cap).
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_SKIP_MAGIC_LO = 0x184D2A50  # ..0x184D2A5F: skippable frames

# xxHash32 primes (public reference constants)
_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of ``data`` — the checksum the LZ4 frame format
    mandates for its header byte and content checksum."""
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        lim = n - 16
        while pos <= lim:
            a, b, c, d = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl32((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# --- block format ---------------------------------------------------------------

_MIN_MATCH = 4
# spec end-of-block restrictions: the last 5 bytes are always
# literals; the last match must not start within the last 12 bytes
_LAST_LITERALS = 5
_MF_LIMIT = 12


def compress_block(src: bytes, prefix: bytes = b"") -> bytes:
    """LZ4 block compression: deterministic greedy matcher, 4-byte
    hash table, 64 KiB offsets.  ``prefix`` is the linked-blocks
    history window (r11): matches may start in it, mirroring the
    decoder's prefix seeding — pass the last 64 KiB of previously
    emitted frame output."""
    prefix = bytes(prefix)
    src = prefix + bytes(src)
    base = len(prefix)
    n = len(src)
    out = bytearray()
    if n == base:
        return b""

    def _write_seq(lit_start: int, lit_len: int, m_len: int, off: int):
        tok_lit = 15 if lit_len >= 15 else lit_len
        tok_mat = 0
        if m_len:
            m = m_len - _MIN_MATCH
            tok_mat = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_mat)
        if lit_len >= 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start : lit_start + lit_len])
        if m_len:
            out.extend(struct.pack("<H", off))
            m = m_len - _MIN_MATCH
            if m >= 15:
                rem = m - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n - base < _MF_LIMIT + 1:
        _write_seq(base, n - base, 0, 0)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = base
    pos = 0
    limit = n - _MF_LIMIT  # no match may start at/after here
    # index the prefix window so linked blocks can match into it
    while pos < min(base, limit):
        table[int.from_bytes(src[pos : pos + 4], "little")] = pos
        pos += 1
    pos = base
    while pos < limit:
        # the 4-byte group itself keys the table (exact, and — unlike
        # hash(bytes) — independent of PYTHONHASHSEED, so fixture
        # bytes are stable across processes)
        key = int.from_bytes(src[pos : pos + 4], "little")
        cand = table.get(key, -1)
        table[key] = pos
        if cand >= 0 and pos - cand <= 0xFFFF and pos >= base:
            # extend the match forward, but never into the last-5 zone
            m_end = pos + 4
            c_end = cand + 4
            stop = n - _LAST_LITERALS
            while m_end < stop and src[m_end] == src[c_end]:
                m_end += 1
                c_end += 1
            _write_seq(anchor, pos - anchor, m_end - pos, pos - cand)
            pos = m_end
            anchor = pos
        else:
            pos += 1
    _write_seq(anchor, n - anchor, 0, 0)
    return bytes(out)


def decompress_block(src: bytes, max_out: int, prefix: bytes = b"") -> bytes:
    """LZ4 block decompression with an explicit output bound (the
    frame's declared block maximum — the allocation cap).  ``prefix``
    seeds the match window for linked-blocks frames (r11): offsets
    may reach into it; only the newly produced bytes are returned
    and counted against ``max_out``."""
    src = bytes(src)
    n = len(src)
    out = bytearray(prefix)
    base = len(out)
    max_out += base
    pos = 0
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: literals exceed block")
        if len(out) + lit > max_out:
            raise ValueError("lz4: output exceeds declared maximum")
        out += src[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence carries no match
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        (off,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if off == 0:
            raise ValueError("lz4: zero match offset")
        if off > len(out):
            raise ValueError("lz4: match offset before window start")
        mlen = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_out:
            raise ValueError("lz4: output exceeds declared maximum")
        start = len(out) - off
        if off >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping copy: replicate the period
            pat = out[start:]
            reps = -(-mlen // off)
            out += (pat * reps)[:mlen]
    return bytes(out[base:])


# --- frame format ---------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_frame(
    data: bytes,
    block_max: int = 4,
    content_checksum: bool = True,
    block_checksum: bool = False,
    content_size: bool = False,
    store_incompressible: bool = True,
    linked: bool = False,
) -> bytes:
    """An LZ4 frame.  ``block_max`` is the BD code (4=64 KiB …
    7=4 MiB).  A block that doesn't shrink is stored raw with the
    high size bit set (``store_incompressible``), the standard writer
    behavior.  ``linked=True`` clears B.Indep and lets each block
    match up to 64 KiB into the previously emitted output — the lz4
    CLI's default layout (r11)."""
    data = bytes(data)
    if block_max not in _BD_SIZES:
        raise ValueError(f"lz4: bad block-max code {block_max}")
    flg = (1 << 6) | (0 if linked else 1 << 5)  # version 01, B.Indep
    if block_checksum:
        flg |= 1 << 4
    if content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    bd = block_max << 4
    head = bytearray(struct.pack("<I", _MAGIC))
    desc = bytearray([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(data))
    desc.append((xxh32(bytes(desc)) >> 8) & 0xFF)
    head += desc
    bsz = _BD_SIZES[block_max]
    out = bytearray(head)
    for at in range(0, len(data), bsz):
        chunk = data[at : at + bsz]
        # linked: the window is the previously EMITTED output, which
        # for this writer is exactly the bytes before this chunk
        window = data[max(0, at - 0xFFFF) : at] if linked else b""
        comp = compress_block(chunk, prefix=window)
        if store_incompressible and len(comp) >= len(chunk):
            out += struct.pack("<I", len(chunk) | 0x80000000)
            body = chunk
        else:
            out += struct.pack("<I", len(comp))
            body = comp
        out += body
        if block_checksum:
            out += struct.pack("<I", xxh32(body))
    out += struct.pack("<I", 0)  # end mark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_frame(data: bytes) -> bytes:
    """Decode one LZ4 frame (skippable frames before it are skipped),
    verifying the header byte and any block/content checksums."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("lz4: payload must be bytes")
    data = bytes(data)
    pos = 0
    # bounded skip over leading skippable frames
    for _ in range(16):
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_LO:
            if pos + 8 > len(data):
                raise ValueError("lz4: truncated skippable frame")
            (sk,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + sk
            continue
        break
    else:
        raise NotImplementedError("lz4: too many skippable frames")
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad frame magic 0x{magic:08x}")
    pos += 4
    if pos + 3 > len(data):
        raise ValueError("lz4: truncated frame descriptor")
    flg = data[pos]
    bd = data[pos + 1]
    if (flg >> 6) != 0b01:
        raise ValueError("lz4: unsupported frame version")
    linked = not (flg >> 5) & 1
    if flg & 0x2:
        raise ValueError("lz4: reserved FLG bit set")
    if flg & 0x1:
        raise NotImplementedError("lz4: dictionary frames")
    b_checksum = bool((flg >> 4) & 1)
    has_csize = bool((flg >> 3) & 1)
    c_checksum = bool((flg >> 2) & 1)
    desc_len = 2 + (8 if has_csize else 0)
    if pos + desc_len + 1 > len(data):
        raise ValueError("lz4: truncated frame descriptor")
    desc = data[pos : pos + desc_len]
    hc = data[pos + desc_len]
    if ((xxh32(desc) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: header checksum mismatch")
    declared = (
        struct.unpack_from("<Q", data, pos + 2)[0] if has_csize else None
    )
    bcode = bd >> 4
    if bd & 0x8F:
        raise ValueError("lz4: reserved BD bits set")
    if bcode not in _BD_SIZES:
        raise ValueError(f"lz4: bad block-max code {bcode}")
    bmax = _BD_SIZES[bcode]
    pos += desc_len + 1

    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # end mark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax + (0 if stored else bmax):
            raise ValueError("lz4: block size exceeds declared maximum")
        if pos + bsize > len(data):
            raise ValueError("lz4: truncated block")
        body = data[pos : pos + bsize]
        pos += bsize
        if b_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(body) != want:
                raise ValueError("lz4: block checksum mismatch")
        if stored:
            if len(body) > bmax:
                raise ValueError("lz4: stored block exceeds maximum")
            out += body
        else:
            # linked blocks: matches may reach 64 KiB into the frame
            # output decoded so far (the spec's prefix window)
            window = bytes(out[-0xFFFF:]) if linked else b""
            out += decompress_block(body, bmax, prefix=window)
    if c_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != want:
            raise ValueError("lz4: content checksum mismatch")
    if declared is not None and declared != len(out):
        raise ValueError("lz4: content size mismatch")
    return bytes(out)
