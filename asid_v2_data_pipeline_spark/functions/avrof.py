"""Avro object-container reader/writer (pure Python, from the public
spec).

Avro is the row-interchange format of the Hadoop/Kafka ecosystem —
CDC feeds, event logs, warehouse exports all arrive as ``.avro``
container files.  Implemented from the public specification: the
``Obj\\x01`` magic, a file-metadata map carrying ``avro.schema``
(JSON) and ``avro.codec``, a 16-byte sync marker, then data blocks of
``(record count, byte size, payload, sync)``.  Binary encoding:
zigzag-varint ints/longs, little-endian IEEE float/double, length-
prefixed bytes/strings, fields in declared order for records,
``(branch index, value)`` for unions, block-run encoding for arrays
and maps, bare bytes for fixed, varint ordinal for enums.

Codecs: ``null``, ``deflate`` (raw zlib, RFC 1951), and ``snappy``
(block format + the spec's 4-byte big-endian CRC-32 of the
UNCOMPRESSED payload) via ``functions/snappyf.py`` — the snappy
decoder is cross-validated against the C implementation in
``tests/test_compressf.py``, so the Avro arm inherits that pin.

Schema subset (the container-shipping core): records of primitives,
nullable unions, arrays, maps, enums and fixed; nested records.  The
writer emits deterministic bytes (caller-supplied sync marker,
canonical field order) for fixture synthesis.  The reference pipeline
has no interchange surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Disclosed boundaries (``NotImplementedError``): schema resolution
(reader≠writer schema), aliases, logical types beyond passthrough,
bzip2/xz/zstandard codecs, recursive schemas.

Fuzz contract (SCALE.md round 10): ``read_avro`` raises ``ValueError``
on malformed input — bad magic, sync mismatch, varint/length overruns,
unknown union branches, negative or absurd counts, codec CRC
mismatches — never ``IndexError``/``KeyError`` escapes, never
unbounded allocation (counts and lengths are bounded by the remaining
input size).
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# --- zigzag varints --------------------------------------------------------------


def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while u >= 0x80:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)
    return bytes(out)


def _zz_decode(data: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("avro: truncated varint")
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), pos


# --- schema handling --------------------------------------------------------------


def _norm_schema(s, depth: int = 0):
    """Validate + normalize a schema node (dict/list/str forms)."""
    if depth > 16:
        raise NotImplementedError("avro: schema nesting too deep")
    if isinstance(s, str):
        if s not in _PRIMITIVES:
            raise NotImplementedError(f"avro: named-type reference {s!r}")
        return s
    if isinstance(s, list):
        return [_norm_schema(b, depth + 1) for b in s]
    if isinstance(s, dict):
        t = s.get("type")
        if t == "record":
            fields = s.get("fields")
            if not isinstance(fields, list):
                raise ValueError("avro: record without fields")
            norm_fields = []
            for f in fields:
                if (
                    not isinstance(f, dict)
                    or "name" not in f
                    or "type" not in f
                ):
                    raise ValueError("avro: malformed record field")
                norm_fields.append(
                    {
                        "name": f["name"],
                        "type": _norm_schema(f["type"], depth + 1),
                    }
                )
            return {
                "type": "record",
                "name": s.get("name", "rec"),
                "fields": norm_fields,
            }
        if t == "array":
            if "items" not in s:
                raise ValueError("avro: array without items")
            return {
                "type": "array",
                "items": _norm_schema(s["items"], depth + 1),
            }
        if t == "map":
            if "values" not in s:
                raise ValueError("avro: map without values")
            return {
                "type": "map",
                "values": _norm_schema(s["values"], depth + 1),
            }
        if t == "enum":
            syms = s.get("symbols")
            if not isinstance(syms, list) or not syms:
                raise ValueError("avro: enum without symbols")
            return {
                "type": "enum",
                "name": s.get("name", "en"),
                "symbols": list(syms),
            }
        if t == "fixed":
            size = s.get("size")
            if not isinstance(size, int) or size < 0:
                raise ValueError("avro: fixed without size")
            return {
                "type": "fixed",
                "name": s.get("name", "fx"),
                "size": size,
            }
        if isinstance(t, (str, dict, list)):
            return _norm_schema(t, depth + 1)
    raise ValueError(f"avro: unsupported schema node {s!r}")


# --- datum encode/decode -----------------------------------------------------------


def _encode_datum(schema, v, out: bytearray):
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if v is None and bt == "null":
                out += _zz_encode(i)
                return
            if v is not None and bt != "null":
                out += _zz_encode(i)
                _encode_datum(branch, v, out)
                return
        raise ValueError("avro: no union branch matches datum")
    if schema == "null":
        if v is not None:
            raise ValueError("avro: non-null datum for null schema")
        return
    if schema == "boolean":
        out.append(1 if v else 0)
        return
    if schema in ("int", "long"):
        out += _zz_encode(int(v))
        return
    if schema == "float":
        out += struct.pack("<f", float(v))
        return
    if schema == "double":
        out += struct.pack("<d", float(v))
        return
    if schema == "bytes":
        b = bytes(v)
        out += _zz_encode(len(b)) + b
        return
    if schema == "string":
        b = str(v).encode("utf-8")
        out += _zz_encode(len(b)) + b
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_datum(f["type"], v[f["name"]], out)
        return
    if t == "array":
        items = list(v)
        if items:
            out += _zz_encode(len(items))
            for it in items:
                _encode_datum(schema["items"], it, out)
        out += _zz_encode(0)
        return
    if t == "map":
        kv = dict(v)
        if kv:
            out += _zz_encode(len(kv))
            for k in kv:  # caller-ordered: dicts preserve insertion
                b = str(k).encode("utf-8")
                out += _zz_encode(len(b)) + b
                _encode_datum(schema["values"], kv[k], out)
        out += _zz_encode(0)
        return
    if t == "enum":
        out += _zz_encode(schema["symbols"].index(v))
        return
    if t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += b
        return
    raise ValueError(f"avro: cannot encode type {t!r}")


def _decode_datum(schema, data: bytes, pos: int):
    if isinstance(schema, list):  # union
        idx, pos = _zz_decode(data, pos)
        if idx < 0 or idx >= len(schema):
            raise ValueError("avro: union branch out of range")
        return _decode_datum(schema[idx], data, pos)
    if schema == "null":
        return None, pos
    if schema == "boolean":
        if pos >= len(data):
            raise ValueError("avro: truncated boolean")
        return bool(data[pos]), pos + 1
    if schema in ("int", "long"):
        return _zz_decode(data, pos)
    if schema == "float":
        if pos + 4 > len(data):
            raise ValueError("avro: truncated float")
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if schema == "double":
        if pos + 8 > len(data):
            raise ValueError("avro: truncated double")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema in ("bytes", "string"):
        n, pos = _zz_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("avro: bytes length exceeds input")
        raw = data[pos : pos + n]
        return (
            raw.decode("utf-8") if schema == "string" else raw
        ), pos + n
    t = schema["type"]
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode_datum(f["type"], data, pos)
        return rec, pos
    if t in ("array", "map"):
        items = [] if t == "array" else {}
        while True:
            cnt, pos = _zz_decode(data, pos)
            if cnt == 0:
                break
            if cnt < 0:  # block with explicit byte size
                cnt = -cnt
                _sz, pos = _zz_decode(data, pos)
            if cnt > len(data) - pos + 1:
                raise ValueError("avro: block count exceeds input")
            for _ in range(cnt):
                if t == "array":
                    it, pos = _decode_datum(schema["items"], data, pos)
                    items.append(it)
                else:
                    kn, pos = _zz_decode(data, pos)
                    if kn < 0 or pos + kn > len(data):
                        raise ValueError("avro: map key exceeds input")
                    k = data[pos : pos + kn].decode("utf-8")
                    pos += kn
                    items[k], pos = _decode_datum(
                        schema["values"], data, pos
                    )
        return items, pos
    if t == "enum":
        idx, pos = _zz_decode(data, pos)
        syms = schema["symbols"]
        if idx < 0 or idx >= len(syms):
            raise ValueError("avro: enum ordinal out of range")
        return syms[idx], pos
    if t == "fixed":
        n = schema["size"]
        if pos + n > len(data):
            raise ValueError("avro: truncated fixed")
        return data[pos : pos + n], pos + n
    raise ValueError(f"avro: cannot decode type {t!r}")


# --- container --------------------------------------------------------------------


def write_avro(
    records: list[dict],
    schema: dict,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    block_records: int = 1000,
) -> bytes:
    """An Avro object-container file.  ``sync`` is caller-supplied so
    fixture bytes are deterministic."""
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    norm = _norm_schema(schema)
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zz_encode(len(meta))
    for k in sorted(meta):
        kb = k.encode()
        out += _zz_encode(len(kb)) + kb
        out += _zz_encode(len(meta[k])) + meta[k]
    out += _zz_encode(0)
    out += sync
    for at in range(0, len(records), block_records):
        chunk = records[at : at + block_records]
        body = bytearray()
        for rec in chunk:
            _encode_datum(norm, rec, body)
        body = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        elif codec == "snappy":
            from .snappyf import compress_block, crc32c as _  # noqa: F401

            crc = zlib.crc32(body) & 0xFFFFFFFF
            body = compress_block(body) + struct.pack(">I", crc)
        out += _zz_encode(len(chunk))
        out += _zz_encode(len(body))
        out += body
        out += sync
    return bytes(out)


def read_avro(data: bytes) -> tuple[dict, str, list[dict]]:
    """Parse an Avro object container into ``(schema, codec,
    records)``, verifying magic, per-block sync markers and the snappy
    codec's CRC-32."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("avro: payload must be bytes")
    data = bytes(data)
    if data[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = _zz_decode(data, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _sz, pos = _zz_decode(data, pos)
        if cnt > len(data) - pos + 1:
            raise ValueError("avro: metadata count exceeds input")
        for _ in range(cnt):
            kn, pos = _zz_decode(data, pos)
            if kn < 0 or pos + kn > len(data):
                raise ValueError("avro: metadata key exceeds input")
            k = data[pos : pos + kn].decode("utf-8")
            pos += kn
            vn, pos = _zz_decode(data, pos)
            if vn < 0 or pos + vn > len(data):
                raise ValueError("avro: metadata value exceeds input")
            meta[k] = data[pos : pos + vn]
            pos += vn
    if "avro.schema" not in meta:
        raise ValueError("avro: missing schema metadata")
    try:
        schema = json.loads(meta["avro.schema"])
    except json.JSONDecodeError as e:
        raise ValueError(f"avro: bad schema JSON: {e}") from e
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    norm = _norm_schema(schema)
    if pos + 16 > len(data):
        raise ValueError("avro: truncated sync marker")
    sync = data[pos : pos + 16]
    pos += 16

    records: list[dict] = []
    while pos < len(data):
        cnt, pos = _zz_decode(data, pos)
        if cnt < 0 or cnt > (1 << 40):
            raise ValueError("avro: implausible block record count")
        size, pos = _zz_decode(data, pos)
        if size < 0 or pos + size > len(data):
            raise ValueError("avro: block size exceeds input")
        body = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            try:
                body = zlib.decompressobj(-15).decompress(body)
            except zlib.error as e:
                raise ValueError(f"avro: corrupt deflate block: {e}") from e
        elif codec == "snappy":
            from .snappyf import decompress_block

            if len(body) < 4:
                raise ValueError("avro: snappy block too short for CRC")
            (want,) = struct.unpack(">I", body[-4:])
            body = decompress_block(body[:-4])
            if (zlib.crc32(body) & 0xFFFFFFFF) != want:
                raise ValueError("avro: snappy block CRC mismatch")
        bpos = 0
        for _ in range(cnt):
            rec, bpos = _decode_datum(norm, body, bpos)
            records.append(rec)
        if bpos != len(body):
            raise ValueError("avro: trailing bytes in block")
        if pos + 16 > len(data):
            raise ValueError("avro: truncated block sync marker")
        if data[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
    return schema, codec, records
