"""Avro object containers (§2.11 interchange family).  Round trips
over the full supported schema surface, codec coverage, zigzag
extremes, a seeded randomized matrix, disclosed boundaries, and the
r10 fuzz contract.  No Avro library exists in this offline sandbox to
cross-validate against; the snappy codec arm is pinned by the C
cross-validation in test_compressf.py and the container layout by the
from-documents oracle of ``src_avro_scan``."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.avrof import (
    read_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "seq", "type": "long"},
        {"name": "txt", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "comment", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "k", "symbols": ["a", "b", "c"]},
        },
        {"name": "fp", "type": {"type": "fixed", "name": "f8", "size": 8}},
    ],
}


def _rec(i: int) -> dict:
    return {
        "seq": i,
        "txt": f"text {i} é中\n",
        "score": i / 4.0,
        "flag": bool(i % 2),
        "blob": bytes((i * 3 + j) % 256 for j in range(i % 17)),
        "comment": None if i % 2 else f"c{i}",
        "tags": [f"t{j}" for j in range(i % 4)],
        "attrs": {f"k{j}": j * i for j in range(i % 3)},
        "kind": "abc"[i % 3],
        "fp": bytes(range(i % 8, i % 8 + 8)),
    }


def test_avro_roundtrip_all_codecs_and_blocking():
    recs = [_rec(i) for i in range(41)]
    for codec in ("null", "deflate", "snappy"):
        for bs in (1, 7, 1000):
            blob = write_avro(
                recs, SCHEMA, codec, b"0123456789abcdef", block_records=bs
            )
            schema, c2, r2 = read_avro(blob)
            assert c2 == codec and r2 == recs
            assert schema == SCHEMA
    # empty container
    assert read_avro(write_avro([], SCHEMA, "null"))[2] == []


def test_avro_zigzag_extremes():
    schema = {
        "type": "record",
        "name": "n",
        "fields": [{"name": "v", "type": "long"}],
    }
    recs = [{"v": v} for v in (0, -1, 1, 63, -64, 2**62, -(2**62), 2**63 - 1)]
    assert read_avro(write_avro(recs, schema, "deflate"))[2] == recs


def test_avro_randomized_matrix():
    rng = np.random.default_rng(81)
    for trial in range(30):
        n = int(rng.integers(0, 60))
        recs = [_rec(int(rng.integers(0, 1000))) for _ in range(n)]
        codec = ("null", "deflate", "snappy")[int(rng.integers(0, 3))]
        sync = bytes(rng.integers(0, 256, 16).astype(np.uint8))
        bs = int(rng.integers(1, 20))
        blob = write_avro(recs, SCHEMA, codec, sync, block_records=bs)
        assert read_avro(blob)[2] == recs, trial


def test_avro_disclosed_boundaries():
    with pytest.raises(NotImplementedError, match="codec"):
        write_avro([], SCHEMA, "zstandard")
    # named-type references are a disclosed boundary
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "SomeNamedType"}],
    }
    with pytest.raises(NotImplementedError, match="named-type"):
        write_avro([{"x": 1}], bad)
    # unknown codec in metadata raises on read
    blob = bytearray(write_avro([_rec(1)], SCHEMA, "null"))
    at = bytes(blob).find(b"null", 4)
    blob[at : at + 4] = b"zstd"
    with pytest.raises((NotImplementedError, ValueError)):
        read_avro(bytes(blob))


def test_avro_validation_is_loud():
    blob = write_avro([_rec(i) for i in range(9)], SCHEMA, "deflate")
    # sync-marker corruption
    b = bytearray(blob)
    b[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        read_avro(bytes(b))
    with pytest.raises(ValueError, match="magic"):
        read_avro(b"NotAvro" + blob)
    # snappy CRC
    sb = bytearray(write_avro([_rec(3)], SCHEMA, "snappy"))
    sb[-18] ^= 0x01  # a CRC byte (4-byte BE CRC sits before the sync)
    with pytest.raises(ValueError):
        read_avro(bytes(sb))


def test_avro_fuzz_fail_loudly():
    rng = np.random.default_rng(82)
    blob = write_avro([_rec(i) for i in range(12)], SCHEMA, "deflate")
    for cut in range(0, len(blob), max(1, len(blob) // 80)):
        try:
            read_avro(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            read_avro(bytes(b))
        except (ValueError, NotImplementedError):
            pass
