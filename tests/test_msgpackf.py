"""MessagePack codec: spec-pinned encodings for every format family,
a seeded randomized nested round-trip matrix, canonical
smallest-form assertions, and the r10 fuzz contract (reserved byte,
truncation, trailing garbage, bad UTF-8, depth bombs -> ValueError)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.msgpackf import (
    pack,
    unpack,
    unpack_stream,
)


def test_spec_pinned_encodings():
    # spot encodings straight from the public spec's format table
    assert pack(None) == b"\xc0"
    assert pack(False) == b"\xc2"
    assert pack(True) == b"\xc3"
    assert pack(0) == b"\x00"
    assert pack(127) == b"\x7f"
    assert pack(-1) == b"\xff"
    assert pack(-32) == b"\xe0"
    assert pack(128) == b"\xcc\x80"
    assert pack(256) == b"\xcd\x01\x00"
    assert pack(1 << 16) == b"\xce\x00\x01\x00\x00"
    assert pack(1 << 32) == b"\xcf" + (1 << 32).to_bytes(8, "big")
    assert pack(-33) == b"\xd0\xdf"
    assert pack(-129) == b"\xd1\xff\x7f"
    assert pack(-(1 << 15) - 1) == b"\xd2" + struct.pack(">i", -(1 << 15) - 1)
    assert pack(-(1 << 31) - 1) == b"\xd3" + struct.pack(">q", -(1 << 31) - 1)
    assert pack(1.5) == b"\xcb" + struct.pack(">d", 1.5)
    assert pack("abc") == b"\xa3abc"
    assert pack("x" * 32) == b"\xd9\x20" + b"x" * 32
    assert pack(b"\x01\x02") == b"\xc4\x02\x01\x02"
    assert pack([1, "a"]) == b"\x92\x01\xa1a"
    assert pack({"k": 1}) == b"\x81\xa1k\x01"
    # ext: fixext4 for a 4-byte timestamp-ish payload, type -1
    assert pack(("__ext__", -1, b"\x00\x01\x02\x03")) == b"\xd6\xff\x00\x01\x02\x03"
    assert pack(("__ext__", 5, b"abc")) == b"\xc7\x03\x05abc"


def test_wide_containers():
    arr = list(range(20))
    assert pack(arr)[0] == 0xDC
    assert unpack(pack(arr)) == arr
    m = {f"k{i}": i for i in range(20)}
    assert pack(m)[0] == 0xDE
    assert unpack(pack(m)) == m


def test_float32_decodes():
    buf = b"\xca" + struct.pack(">f", 2.5)
    assert unpack(buf) == 2.5


def _rand_obj(rng, depth=0):
    kind = int(rng.integers(0, 9 if depth < 4 else 7))
    if kind == 0:
        return None
    if kind == 1:
        return bool(rng.integers(0, 2))
    if kind == 2:
        return int(rng.integers(-(2**63), 2**63))
    if kind == 3:
        return float(np.round(rng.normal() * 1e6, 6))
    if kind == 4:
        n = int(rng.integers(0, 40))
        return "".join(chr(int(c)) for c in rng.integers(32, 0x300, n))
    if kind == 5:
        return bytes(rng.integers(0, 256, int(rng.integers(0, 40))).astype(np.uint8))
    if kind == 6:
        return (
            "__ext__",
            int(rng.integers(-128, 128)),
            bytes(rng.integers(0, 256, int(rng.integers(0, 20))).astype(np.uint8)),
        )
    if kind == 7:
        return [_rand_obj(rng, depth + 1) for _ in range(int(rng.integers(0, 6)))]
    return {
        f"k{i}": _rand_obj(rng, depth + 1)
        for i in range(int(rng.integers(0, 6)))
    }


def test_randomized_roundtrip_matrix():
    rng = np.random.default_rng(17)
    for trial in range(200):
        obj = _rand_obj(rng)
        out = unpack(pack(obj))
        assert out == obj, (trial, obj, out)


def test_stream_concatenation():
    objs = [{"a": 1}, [1, 2, 3], "x", None, -7, b"bin"]
    assert unpack_stream(b"".join(pack(o) for o in objs)) == objs
    assert unpack_stream(b"") == []


def test_strictness():
    with pytest.raises(ValueError):
        unpack(b"\xc1")  # reserved
    with pytest.raises(ValueError):
        unpack(pack(1) + b"\x00")  # trailing bytes
    with pytest.raises(ValueError):
        unpack(b"\xa3ab")  # truncated str
    with pytest.raises(ValueError):
        unpack(b"\xd9")  # truncated length
    with pytest.raises(ValueError):
        unpack(b"\xa2\xff\xfe")  # invalid UTF-8
    with pytest.raises(ValueError):
        unpack(b"\x91" * 100)  # depth bomb (and truncation)
    with pytest.raises(ValueError):
        unpack(b"\x81\x91\x90\x01")  # array as map key
    with pytest.raises(ValueError):
        pack(object())
    with pytest.raises(ValueError):
        pack(1 << 64)


def test_fuzz_never_hangs_or_crashes():
    rng = np.random.default_rng(23)
    base = pack(
        {"key": "000001-002", "sno": 2, "neg": -601, "frac": 2.25,
         "ok": True, "tags": ["en", "1"], "blob": b"abcd", "txt": "hello"}
    )
    for _ in range(1000):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            unpack_stream(bytes(mutated))
        except ValueError:
            pass
    for cut in range(len(base)):
        try:
            unpack_stream(base[:cut])
        except ValueError:
            pass
