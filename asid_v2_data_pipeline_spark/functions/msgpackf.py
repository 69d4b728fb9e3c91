"""MessagePack codec (pure Python, from the public spec at
github.com/msgpack/msgpack/blob/master/spec.md).

Full format coverage: nil/bool, the five int families (positive /
negative fixint, uint8-64, int8-64), float32/float64, fixstr/str8-32,
bin8-32, fixarray/array16-32, fixmap/map16-32, and ext (fixext1-16,
ext8-32) surfaced as ``("__ext__", type, bytes)`` tuples — including
the reserved timestamp type -1, kept raw so no timezone semantics are
invented.  The encoder always emits the SMALLEST representation
(canonical form), so encodes are byte-deterministic; dict insertion
order is preserved on the wire.

Decode is strict: 0xc1 (never-used byte), trailing garbage inside an
object, truncation anywhere, non-UTF-8 str payloads, and depth bombs
(>``_MAX_DEPTH`` nesting) all raise ValueError — the r10 fuzz
contract for untrusted shard bytes.

Reference comparison: the reference pipeline has no record-shard
formats at all (netCDF scenes only, ``asip_v2/archive.py``); §2.11
training-data surface.
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 64


def pack(obj) -> bytes:
    """Encode one object in canonical (smallest-form) MessagePack."""
    out = bytearray()
    _pack_into(out, obj, 0)
    return bytes(out)


def _pack_into(out: bytearray, obj, depth: int) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack: nesting too deep")
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(out, obj)
    elif isinstance(obj, float):
        # float64 always: float32 would silently lose precision and
        # the spec does not require the narrow form
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        data = obj.encode("utf-8")
        n = len(data)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 1 << 8:
            out += bytes((0xD9, n))
        elif n < 1 << 16:
            out.append(0xDA)
            out += struct.pack(">H", n)
        elif n < 1 << 32:
            out.append(0xDB)
            out += struct.pack(">I", n)
        else:
            raise ValueError("msgpack: str too long")
        out += data
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        data = bytes(obj)
        n = len(data)
        if n < 1 << 8:
            out += bytes((0xC4, n))
        elif n < 1 << 16:
            out.append(0xC5)
            out += struct.pack(">H", n)
        elif n < 1 << 32:
            out.append(0xC6)
            out += struct.pack(">I", n)
        else:
            raise ValueError("msgpack: bin too long")
        out += data
    elif isinstance(obj, tuple) and len(obj) == 3 and obj[0] == "__ext__":
        _pack_ext(out, int(obj[1]), bytes(obj[2]))
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 1 << 16:
            out.append(0xDC)
            out += struct.pack(">H", n)
        elif n < 1 << 32:
            out.append(0xDD)
            out += struct.pack(">I", n)
        else:
            raise ValueError("msgpack: array too long")
        for v in obj:
            _pack_into(out, v, depth + 1)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 1 << 16:
            out.append(0xDE)
            out += struct.pack(">H", n)
        elif n < 1 << 32:
            out.append(0xDF)
            out += struct.pack(">I", n)
        else:
            raise ValueError("msgpack: map too long")
        for k, v in obj.items():
            _pack_into(out, k, depth + 1)
            _pack_into(out, v, depth + 1)
    else:
        raise ValueError(f"msgpack: cannot encode {type(obj).__name__}")


def _pack_int(out: bytearray, n: int) -> None:
    if 0 <= n < 0x80:
        out.append(n)
    elif -32 <= n < 0:
        out.append(n & 0xFF)
    elif 0 <= n < 1 << 8:
        out += bytes((0xCC, n))
    elif 0 <= n < 1 << 16:
        out.append(0xCD)
        out += struct.pack(">H", n)
    elif 0 <= n < 1 << 32:
        out.append(0xCE)
        out += struct.pack(">I", n)
    elif 0 <= n < 1 << 64:
        out.append(0xCF)
        out += struct.pack(">Q", n)
    elif -(1 << 7) <= n < 0:
        out.append(0xD0)
        out += struct.pack(">b", n)
    elif -(1 << 15) <= n < 0:
        out.append(0xD1)
        out += struct.pack(">h", n)
    elif -(1 << 31) <= n < 0:
        out.append(0xD2)
        out += struct.pack(">i", n)
    elif -(1 << 63) <= n < 0:
        out.append(0xD3)
        out += struct.pack(">q", n)
    else:
        raise ValueError("msgpack: int out of 64-bit range")


def _pack_ext(out: bytearray, etype: int, data: bytes) -> None:
    if not -128 <= etype <= 127:
        raise ValueError("msgpack: ext type out of int8 range")
    n = len(data)
    fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
    if fix is not None:
        out.append(fix)
    elif n < 1 << 8:
        out += bytes((0xC7, n))
    elif n < 1 << 16:
        out.append(0xC8)
        out += struct.pack(">H", n)
    elif n < 1 << 32:
        out.append(0xC9)
        out += struct.pack(">I", n)
    else:
        raise ValueError("msgpack: ext too long")
    out += struct.pack(">b", etype)
    out += data


def unpack(buf: bytes):
    """Decode exactly ONE object; trailing bytes raise ValueError."""
    obj, pos = _unpack_one(buf, 0, 0)
    if pos != len(buf):
        raise ValueError(f"msgpack: {len(buf) - pos} trailing bytes")
    return obj


def unpack_stream(buf: bytes) -> list:
    """Decode a concatenated stream of objects (the shard layout)."""
    out = []
    pos = 0
    while pos < len(buf):
        obj, pos = _unpack_one(buf, pos, 0)
        out.append(obj)
    return out


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("msgpack: truncated")


def _unpack_one(buf: bytes, pos: int, depth: int):
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack: nesting too deep")
    _need(buf, pos, 1)
    b = buf[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 256, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(buf, pos, b & 0xF, depth)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(buf, pos, b & 0xF, depth)
    if 0xA0 <= b <= 0xBF:
        return _unpack_str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC1:
        raise ValueError("msgpack: reserved byte 0xc1")
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin
        n, pos = _unpack_len(buf, pos, b - 0xC4)
        _need(buf, pos, n)
        return buf[pos : pos + n], pos + n
    if b in (0xC7, 0xC8, 0xC9):  # ext
        n, pos = _unpack_len(buf, pos, b - 0xC7)
        return _unpack_ext(buf, pos, n)
    if b == 0xCA:
        _need(buf, pos, 4)
        return struct.unpack(">f", buf[pos : pos + 4])[0], pos + 4
    if b == 0xCB:
        _need(buf, pos, 8)
        return struct.unpack(">d", buf[pos : pos + 8])[0], pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        _need(buf, pos, n)
        return int.from_bytes(buf[pos : pos + n], "big"), pos + n
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        _need(buf, pos, n)
        return (
            int.from_bytes(buf[pos : pos + n], "big", signed=True),
            pos + n,
        )
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        return _unpack_ext(buf, pos, 1 << (b - 0xD4))
    if b == 0xD9:
        n, pos = _unpack_len(buf, pos, 0)
        return _unpack_str(buf, pos, n)
    if b == 0xDA:
        n, pos = _unpack_len(buf, pos, 1)
        return _unpack_str(buf, pos, n)
    if b == 0xDB:
        n, pos = _unpack_len(buf, pos, 2)
        return _unpack_str(buf, pos, n)
    if b in (0xDC, 0xDD):
        n, pos = _unpack_len(buf, pos, b - 0xDC + 1)
        return _unpack_array(buf, pos, n, depth)
    # 0xDE / 0xDF
    n, pos = _unpack_len(buf, pos, b - 0xDE + 1)
    return _unpack_map(buf, pos, n, depth)


def _unpack_len(buf: bytes, pos: int, size_log2: int) -> tuple[int, int]:
    n = 1 << size_log2
    _need(buf, pos, n)
    return int.from_bytes(buf[pos : pos + n], "big"), pos + n


def _unpack_str(buf: bytes, pos: int, n: int):
    _need(buf, pos, n)
    try:
        s = buf[pos : pos + n].decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"msgpack: invalid UTF-8 in str: {e}") from None
    return s, pos + n


def _unpack_ext(buf: bytes, pos: int, n: int):
    _need(buf, pos, 1 + n)
    etype = struct.unpack(">b", buf[pos : pos + 1])[0]
    return ("__ext__", etype, buf[pos + 1 : pos + 1 + n]), pos + 1 + n


def _unpack_array(buf: bytes, pos: int, n: int, depth: int):
    out = []
    for _ in range(n):
        v, pos = _unpack_one(buf, pos, depth + 1)
        out.append(v)
    return out, pos


def _unpack_map(buf: bytes, pos: int, n: int, depth: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack_one(buf, pos, depth + 1)
        if isinstance(k, (dict, list)):
            raise ValueError("msgpack: container map keys unsupported")
        v, pos = _unpack_one(buf, pos, depth + 1)
        out[k] = v
    return out, pos
