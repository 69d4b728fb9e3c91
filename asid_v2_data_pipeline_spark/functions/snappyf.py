"""Snappy block + stream codec (pure Python, from the public spec).

Snappy is the Hadoop-lineage fast codec: Parquet pages, Avro blocks,
Kafka batches, SequenceFiles.  Implemented from the public format
description: a varint uncompressed-length preamble, then tagged
elements — literals (tag ``00``, 6-bit length with 1-4 extension
bytes), 1-byte-offset copies (tag ``01``, lengths 4-11, 11-bit
offsets), 2-byte-offset copies (tag ``10``) and 4-byte-offset copies
(tag ``11``).  The stream ("framing") format wraps blocks in chunks:
a ``sNaPpY`` stream identifier, compressed/uncompressed data chunks
of at most 65536 source bytes, each guarded by a masked CRC-32C
(Castagnoli polynomial, the mask rotation ``(crc>>15|crc<<17) +
0xa282ead8`` from the public spec).

The encoder is a deterministic greedy matcher; cross-validated in
both directions against the C implementation reachable through
``pyarrow.Codec("snappy")`` in ``tests/test_compressf.py``.  The
reference pipeline has no compression surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Fuzz contract (SCALE.md round 10): ``decompress_block`` /
``decompress_stream`` raise ``ValueError`` on malformed input —
preamble/element truncation, zero or out-of-window offsets, output
overruns, bad chunk CRCs, oversized chunks, unknown unskippable chunk
types — never ``IndexError`` escapes, never unbounded allocation
(output is bounded by the declared length / the 65536 chunk cap).
"""

from __future__ import annotations

import struct

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536  # max source bytes per stream chunk
_MASK_DELTA = 0xA282EAD8
_M32 = 0xFFFFFFFF

# CRC-32C (Castagnoli), reflected polynomial 0x82F63B78
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = _M32
    for b in bytes(data):
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ _M32


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & _M32


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def compress_block(src: bytes) -> bytes:
    """Snappy block compression: deterministic greedy matcher over
    4-byte groups."""
    src = bytes(src)
    n = len(src)
    out = bytearray(_write_varint(n))

    def _emit_literal(start: int, length: int):
        while length > 0:
            take = min(length, 1 << 32)
            if take <= 60:
                out.append((take - 1) << 2)
            elif take <= 0xFF:
                out.append(60 << 2)
                out.append(take - 1)
            elif take <= 0xFFFF:
                out.append(61 << 2)
                out.extend(struct.pack("<H", take - 1))
            elif take <= 0xFFFFFF:
                out.append(62 << 2)
                out.extend((take - 1).to_bytes(3, "little"))
            else:
                out.append(63 << 2)
                out.extend(struct.pack("<I", take - 1))
            out.extend(src[start : start + take])
            start += take
            length -= take

    def _emit_copy(off: int, length: int):
        # long matches: 64-byte pieces with 2-byte offsets (spec's
        # standard emission); a 1-byte-offset form when it fits
        while length > 0:
            if length > 64:
                take = 64 if length - 64 >= 4 else length - 4
            else:
                take = length
            if 4 <= take <= 11 and off < 2048:
                out.append(
                    0b01 | ((take - 4) << 2) | ((off >> 8) << 5)
                )
                out.append(off & 0xFF)
            elif off <= 0xFFFF:
                out.append(0b10 | ((take - 1) << 2))
                out.extend(struct.pack("<H", off))
            else:
                out.append(0b11 | ((take - 1) << 2))
                out.extend(struct.pack("<I", off))
            length -= take

    if n < 4:
        if n:
            _emit_literal(0, n)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    pos = 0
    limit = n - 3
    while pos < limit:
        key = int.from_bytes(src[pos : pos + 4], "little")
        cand = table.get(key, -1)
        table[key] = pos
        if cand >= 0:
            m_end = pos + 4
            c_end = cand + 4
            while m_end < n and src[m_end] == src[c_end]:
                m_end += 1
                c_end += 1
            if pos > anchor:
                _emit_literal(anchor, pos - anchor)
            _emit_copy(pos - cand, m_end - pos)
            pos = m_end
            anchor = pos
        else:
            pos += 1
    if anchor < n:
        _emit_literal(anchor, n - anchor)
    return bytes(out)


def decompress_block(src: bytes) -> bytes:
    """Snappy block decompression; the varint preamble bounds the
    allocation and must match exactly."""
    src = bytes(src)
    n = len(src)
    want, pos = _read_varint(src, 0)
    if want > (1 << 32):
        raise ValueError("snappy: implausible declared length")
    out = bytearray()
    while pos < n:
        tag = src[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                ext = length - 60
                if pos + ext > n:
                    raise ValueError("snappy: truncated literal length")
                length = (
                    int.from_bytes(src[pos : pos + ext], "little") + 1
                )
                pos += ext
            if pos + length > n:
                raise ValueError("snappy: literal exceeds input")
            if len(out) + length > want:
                raise ValueError("snappy: output exceeds declared length")
            out += src[pos : pos + length]
            pos += length
            continue
        if kind == 0b01:
            length = ((tag >> 2) & 0x7) + 4
            if pos + 1 > n:
                raise ValueError("snappy: truncated copy offset")
            off = ((tag >> 5) << 8) | src[pos]
            pos += 1
        elif kind == 0b10:
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy offset")
            (off,) = struct.unpack_from("<H", src, pos)
            pos += 2
        else:
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy offset")
            (off,) = struct.unpack_from("<I", src, pos)
            pos += 4
        if off == 0:
            raise ValueError("snappy: zero copy offset")
        if off > len(out):
            raise ValueError("snappy: copy offset before output start")
        if len(out) + length > want:
            raise ValueError("snappy: output exceeds declared length")
        start = len(out) - off
        if off >= length:
            out += out[start : start + length]
        else:
            pat = out[start:]
            reps = -(-length // off)
            out += (pat * reps)[:length]
    if len(out) != want:
        raise ValueError("snappy: declared length mismatch")
    return bytes(out)


def compress_stream(data: bytes) -> bytes:
    """Snappy framing-format stream: identifier then ≤64 KiB chunks,
    each compressed unless that doesn't shrink it, with masked
    CRC-32C of the UNCOMPRESSED bytes."""
    data = bytes(data)
    out = bytearray(_STREAM_ID)
    for at in range(0, len(data), _MAX_CHUNK):
        chunk = data[at : at + _MAX_CHUNK]
        crc = _masked_crc(chunk)
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            body = struct.pack("<I", crc) + comp
            out.append(0x00)
        else:
            body = struct.pack("<I", crc) + chunk
            out.append(0x01)
        out += len(body).to_bytes(3, "little") + body
    return bytes(out)


def decompress_stream(data: bytes) -> bytes:
    """Decode a snappy framing-format stream, verifying chunk CRCs;
    skippable chunk types (0x80-0xFE) are skipped, reserved
    unskippable ones raise."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("snappy: payload must be bytes")
    data = bytes(data)
    if not data.startswith(_STREAM_ID):
        raise ValueError("snappy: missing stream identifier")
    pos = len(_STREAM_ID)
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("snappy: truncated chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + clen > len(data):
            raise ValueError("snappy: truncated chunk body")
        body = data[pos : pos + clen]
        pos += clen
        if ctype == 0xFF:  # repeated stream identifier
            if body != _STREAM_ID[4:]:
                raise ValueError("snappy: bad repeated stream identifier")
            continue
        if 0x80 <= ctype <= 0xFE:
            continue  # skippable
        if ctype in (0x00, 0x01):
            if clen < 4:
                raise ValueError("snappy: chunk too short for CRC")
            (crc,) = struct.unpack_from("<I", body, 0)
            payload = body[4:]
            if ctype == 0x00:
                if len(payload) > _MAX_CHUNK + (_MAX_CHUNK // 6) + 32:
                    raise ValueError("snappy: compressed chunk too large")
                payload = decompress_block(payload)
            if len(payload) > _MAX_CHUNK:
                raise ValueError("snappy: chunk exceeds 64 KiB limit")
            if _masked_crc(payload) != crc:
                raise ValueError("snappy: chunk CRC mismatch")
            out += payload
            continue
        raise ValueError(f"snappy: reserved chunk type 0x{ctype:02x}")
    return bytes(out)
