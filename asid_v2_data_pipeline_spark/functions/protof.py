"""Protocol-buffers wire format + ``tf.train.Example`` codec (pure
Python, from the public encoding spec at protobuf.dev/programming-guides/
encoding and the public ``tensorflow/core/example/example.proto`` /
``feature.proto`` schemas).

Scope: the wire format itself (varint, zigzag, 32/64-bit fixed,
length-delimited; groups rejected as deprecated) plus the concrete
message schema every TFRecord training shard carries::

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature  { oneof kind { BytesList bytes_list = 1;
                            FloatList float_list = 2;
                            Int64List int64_list = 3; } }
    BytesList { repeated bytes value = 1; }
    FloatList { repeated float value = 1 [packed = true]; }
    Int64List { repeated int64 value = 1 [packed = true]; }

The decoder accepts both packed and unpacked repeated scalars (proto2
writers emit unpacked; proto3 writers emit packed) and tolerates
unknown fields by skipping them — the documented wire-format contract.
All truncation / malformed-varint / bad-wire-type paths raise
ValueError (the r10 fuzz contract: corrupt bytes fail loudly, never
decode silently wrong).

Reference comparison: the reference pipeline has no record-shard
ingestion at all (its only inputs are netCDF scenes,
``asip_v2/archive.py``); this is §2.11 training-data surface.
"""

from __future__ import annotations

import struct

_MAX_VARINT_BYTES = 10  # 64-bit two's-complement worst case

# wire types (encoding spec §"Message Structure")
WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_SGROUP = 3  # deprecated, rejected
WT_EGROUP = 4  # deprecated, rejected
WT_I32 = 5


def write_varint(n: int) -> bytes:
    """Unsigned LEB128 of ``n`` (0 <= n < 2**64).  int64 values are
    encoded via their unsigned two's-complement view per the spec."""
    if not 0 <= n < 1 << 64:
        raise ValueError("proto: varint out of 64-bit range")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one varint at ``pos``; returns (value, new_pos).  Raises
    on truncation and on encodings longer than 10 bytes."""
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(buf):
            raise ValueError("proto: truncated varint")
        if pos - start >= _MAX_VARINT_BYTES:
            raise ValueError("proto: varint longer than 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result >= 1 << 64:
                raise ValueError("proto: varint overflows 64 bits")
            return result, pos
        shift += 7


def zigzag_encode(n: int) -> int:
    """sint64 zigzag: maps signed to unsigned (0,-1,1,-2 -> 0,1,2,3)."""
    if not -(1 << 63) <= n < 1 << 63:
        raise ValueError("proto: sint64 out of range")
    return ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _int64_to_u64(n: int) -> int:
    if not -(1 << 63) <= n < 1 << 63:
        raise ValueError("proto: int64 out of range")
    return n & ((1 << 64) - 1)


def _u64_to_int64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def write_key(field_no: int, wire_type: int) -> bytes:
    if field_no < 1:
        raise ValueError("proto: field number must be >= 1")
    return write_varint((field_no << 3) | wire_type)


def write_len_field(field_no: int, payload: bytes) -> bytes:
    return write_key(field_no, WT_LEN) + write_varint(len(payload)) + payload


def iter_fields(buf: bytes):
    """Yield ``(field_no, wire_type, value)`` for each field in a
    message.  Values: int (varint, as unsigned), bytes (LEN), 8-byte
    bytes (I64), 4-byte bytes (I32).  Groups and unknown wire types
    raise — a shard with group encoding is pre-2008 and malformed for
    our schemas."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field_no, wt = key >> 3, key & 0x7
        if field_no == 0:
            raise ValueError("proto: field number 0 is reserved")
        if wt == WT_VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == WT_I64:
            if pos + 8 > n:
                raise ValueError("proto: truncated fixed64")
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == WT_LEN:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("proto: truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == WT_I32:
            if pos + 4 > n:
                raise ValueError("proto: truncated fixed32")
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"proto: unsupported wire type {wt}")
        yield field_no, wt, val


# --- tf.train.Example ----------------------------------------------------------


def _encode_bytes_list(values: list[bytes]) -> bytes:
    out = bytearray()
    for v in values:
        out += write_len_field(1, bytes(v))
    return bytes(out)


def _encode_float_list(values: list[float]) -> bytes:
    # packed per the public feature.proto ([packed = true])
    payload = b"".join(struct.pack("<f", float(v)) for v in values)
    return write_len_field(1, payload) if values else b""


def _encode_int64_list(values: list[int]) -> bytes:
    payload = b"".join(write_varint(_int64_to_u64(int(v))) for v in values)
    return write_len_field(1, payload) if values else b""


def encode_feature(kind: str, values: list) -> bytes:
    """One ``Feature`` message.  ``kind``: 'bytes' | 'float' | 'int64'."""
    if kind == "bytes":
        return write_len_field(1, _encode_bytes_list(values))
    if kind == "float":
        return write_len_field(2, _encode_float_list(values))
    if kind == "int64":
        return write_len_field(3, _encode_int64_list(values))
    raise ValueError(f"tf.Example: unknown feature kind {kind!r}")


def encode_example(features: dict[str, tuple[str, list]]) -> bytes:
    """Serialize ``{name: (kind, values)}`` as a ``tf.train.Example``.
    Map entries are emitted in sorted-name order so encodes are
    byte-deterministic (map order is unspecified on the wire; sorting
    pins ours)."""
    entries = bytearray()
    for name in sorted(features):
        kind, values = features[name]
        entry = write_len_field(1, name.encode("utf-8")) + write_len_field(
            2, encode_feature(kind, values)
        )
        entries += write_len_field(1, entry)
    # Example.features is field 1; Features.feature entries already in
    # `entries`
    return write_len_field(1, bytes(entries))


def _decode_bytes_list(buf: bytes) -> list[bytes]:
    out = []
    for fno, wt, val in iter_fields(buf):
        if fno == 1:
            if wt != WT_LEN:
                raise ValueError("tf.Example: BytesList.value must be LEN")
            out.append(val)
    return out


def _decode_float_list(buf: bytes) -> list[float]:
    out: list[float] = []
    for fno, wt, val in iter_fields(buf):
        if fno != 1:
            continue
        if wt == WT_LEN:  # packed
            if len(val) % 4:
                raise ValueError("tf.Example: packed float list ragged")
            out.extend(
                struct.unpack(f"<{len(val) // 4}f", val)
            )
        elif wt == WT_I32:  # unpacked
            out.append(struct.unpack("<f", val)[0])
        else:
            raise ValueError("tf.Example: FloatList.value bad wire type")
    return out


def _decode_int64_list(buf: bytes) -> list[int]:
    out: list[int] = []
    for fno, wt, val in iter_fields(buf):
        if fno != 1:
            continue
        if wt == WT_LEN:  # packed
            pos = 0
            while pos < len(val):
                u, pos = read_varint(val, pos)
                out.append(_u64_to_int64(u))
        elif wt == WT_VARINT:  # unpacked
            out.append(_u64_to_int64(val))
        else:
            raise ValueError("tf.Example: Int64List.value bad wire type")
    return out


def decode_feature(buf: bytes) -> tuple[str, list]:
    """Decode one ``Feature``; returns ``(kind, values)``.  An empty
    Feature (no kind set) decodes as ``('bytes', [])`` — the proto3
    default-oneof convention."""
    kind, values = "bytes", []
    seen = False
    for fno, wt, val in iter_fields(buf):
        if fno not in (1, 2, 3):
            continue  # unknown field: skip per wire contract
        if wt != WT_LEN:
            raise ValueError("tf.Example: Feature kind must be LEN")
        if seen:
            # oneof on the wire: last one wins per spec; we keep that
            # semantics rather than raising
            pass
        seen = True
        if fno == 1:
            kind, values = "bytes", _decode_bytes_list(val)
        elif fno == 2:
            kind, values = "float", _decode_float_list(val)
        else:
            kind, values = "int64", _decode_int64_list(val)
    return kind, values


def decode_example(buf: bytes) -> dict[str, tuple[str, list]]:
    """Parse a serialized ``tf.train.Example`` into
    ``{name: (kind, values)}``.  Duplicate map keys: last wins (map
    wire semantics).  Unknown fields at any level are skipped."""
    features: dict[str, tuple[str, list]] = {}
    for fno, wt, val in iter_fields(buf):
        if fno != 1:
            continue
        if wt != WT_LEN:
            raise ValueError("tf.Example: Example.features must be LEN")
        for efno, ewt, entry in iter_fields(val):
            if efno != 1:
                continue
            if ewt != WT_LEN:
                raise ValueError("tf.Example: map entry must be LEN")
            name: str | None = None
            feat: tuple[str, list] | None = None
            for mfno, mwt, mval in iter_fields(entry):
                if mfno == 1:
                    if mwt != WT_LEN:
                        raise ValueError("tf.Example: map key must be LEN")
                    name = mval.decode("utf-8")
                elif mfno == 2:
                    if mwt != WT_LEN:
                        raise ValueError("tf.Example: map value must be LEN")
                    feat = decode_feature(mval)
            if name is None:
                raise ValueError("tf.Example: map entry missing key")
            features[name] = feat if feat is not None else ("bytes", [])
    return features
