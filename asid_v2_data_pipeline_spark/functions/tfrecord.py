"""TFRecord shard framing (pure Python, from the public format note in
``tensorflow/core/lib/io/record_writer.h``)::

    uint64 length          (little-endian)
    uint32 masked_crc32c(length bytes)
    bytes  data[length]
    uint32 masked_crc32c(data)

with ``masked_crc = rotr15(crc32c(x)) + 0xa282ead8`` (the public
"masked CRC" used by TFRecord and LevelDB logs).  CRC-32C is the
Castagnoli polynomial (reflected 0x82F63B78, init/xorout 0xFFFFFFFF),
table-driven, pinned by the published iSCSI/RFC-3720 test vectors in
``tests/test_tfrecord.py``.

This is the de-facto sharded training-data container for TensorFlow /
tf.data corpora; payloads are usually serialized ``tf.train.Example``
messages (``functions/protof.py``).  Both CRCs are verified on read —
a flipped bit anywhere in a 100 TB shard scan surfaces as a loud
ValueError on exactly that record, never as silently wrong training
data.

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); record-shard ingestion is §2.11
training-data surface.
"""

from __future__ import annotations

import struct


def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli).  ``crc`` chains partial computations."""
    c = crc ^ 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's masked CRC: rotate right 15, add the mask delta."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(records: list[bytes]) -> bytes:
    """Serialize ``records`` as one TFRecord shard."""
    out = bytearray()
    for rec in records:
        rec = bytes(rec)
        hdr = struct.pack("<Q", len(rec))
        out += hdr
        out += struct.pack("<I", masked_crc32c(hdr))
        out += rec
        out += struct.pack("<I", masked_crc32c(rec))
    return bytes(out)


def read_tfrecord(buf: bytes) -> list[bytes]:
    """Parse a TFRecord shard; verifies BOTH the length CRC and the
    data CRC of every record and requires the shard to end exactly on
    a record boundary.  Raises ValueError on any corruption."""
    records: list[bytes] = []
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("TFRecord: truncated record header")
        hdr = buf[pos : pos + 8]
        (length,) = struct.unpack("<Q", hdr)
        (hcrc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
        if masked_crc32c(hdr) != hcrc:
            raise ValueError(f"TFRecord: bad length CRC at byte {pos}")
        pos += 12
        if length > n - pos:
            raise ValueError("TFRecord: truncated record data")
        data = buf[pos : pos + length]
        pos += length
        if pos + 4 > n:
            raise ValueError("TFRecord: truncated data CRC")
        (dcrc,) = struct.unpack("<I", buf[pos : pos + 4])
        if masked_crc32c(data) != dcrc:
            raise ValueError(
                f"TFRecord: bad data CRC for record {len(records)}"
            )
        pos += 4
        records.append(data)
    return records
