"""ZIP archives (§2.11 archive family).  Round trips, stdlib
cross-validation both directions, central-directory semantics, a
seeded randomized matrix, disclosed boundaries, and the r10 fuzz
contract."""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.zipf import (
    parse_zip,
    write_zip,
)

ENTRIES = [
    ("a.txt", b"hello world" * 20),
    ("dir/b.bin", bytes(range(256))),
    ("empty", b""),
    ("s.txt", b"x"),
]


def test_zip_roundtrip_and_stdlib_cross_validation():
    for method in ("store", "deflate", "auto"):
        blob = write_zip(ENTRIES, method)
        got = parse_zip(blob)
        assert [(n, d) for n, d, _ in got] == ENTRIES
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert [
            (i.filename, zf.read(i)) for i in zf.infolist()
        ] == ENTRIES
        assert zf.testzip() is None  # stdlib CRC pass
    # and we read the stdlib's output
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in ENTRIES:
            zf.writestr(n, d)
    got = parse_zip(buf.getvalue())
    assert [(n, d) for n, d, _ in got] == ENTRIES
    # auto picks store for incompressible, deflate for repetitive
    methods = {n: m for n, _, m in parse_zip(write_zip(ENTRIES, "auto"))}
    assert methods["a.txt"] == "deflate"
    assert methods["dir/b.bin"] == "store"


def test_zip_validation_is_loud():
    # corrupt a data byte: deflate/CRC verification must catch it
    blob = bytearray(write_zip(ENTRIES))
    blob[40] ^= 0xFF
    with pytest.raises(ValueError):
        parse_zip(bytes(blob))
    good = write_zip(ENTRIES)
    # truncating the EOCD loses the directory
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(good[:-10])
    # a directory offset past EOF
    bad = bytearray(write_zip([("x", b"data")]))
    at = bytes(bad).rfind(b"PK\x05\x06")
    bad[at + 16 : at + 20] = (1 << 30).to_bytes(4, "little")
    with pytest.raises(ValueError, match="exceeds"):
        parse_zip(bytes(bad))


def test_zip_empty_archive_and_comment_window():
    blob = write_zip([])
    assert parse_zip(blob) == []
    # an EOCD preceded by trailing junk within the comment window still
    # resolves (rfind in the bounded tail)
    assert parse_zip(blob + b"") == []


def test_zip_disclosed_boundaries():
    blob = bytearray(write_zip([("x", b"data")]))
    # flip the method field in the central directory to 99
    at = bytes(blob).find(b"PK\x01\x02")
    blob[at + 10 : at + 12] = (99).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="method"):
        parse_zip(bytes(blob))
    # encryption flag
    blob = bytearray(write_zip([("x", b"data")]))
    at = bytes(blob).find(b"PK\x01\x02")
    blob[at + 8] |= 0x01
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_zip(bytes(blob))


def test_zip_randomized_matrix():
    rng = np.random.default_rng(59)
    for trial in range(40):
        n = int(rng.integers(0, 15))
        entries = []
        for i in range(n):
            if rng.integers(0, 2):
                data = bytes(
                    rng.integers(0, 256, int(rng.integers(0, 1500))).astype(
                        np.uint8
                    )
                )
            else:
                data = bytes([int(rng.integers(0, 8))]) * int(
                    rng.integers(0, 3000)
                )
            entries.append((f"t{trial}/m{i}.bin", data))
        method = ("store", "deflate", "auto")[int(rng.integers(0, 3))]
        got = parse_zip(write_zip(entries, method))
        assert [(n_, d) for n_, d, _ in got] == entries, f"trial {trial}"


def test_zip_fuzz_fail_loudly():
    rng = np.random.default_rng(67)
    blob = write_zip(ENTRIES, "deflate")
    for cut in range(0, len(blob), max(1, len(blob) // 90)):
        try:
            parse_zip(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_zip(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_zip64_roundtrip_and_stdlib_cross():
    """r11 (boundary closed): ZIP64 layout — 0x0001 extra fields,
    EOCD64 + locator, sentinel resolution — round-trips and
    cross-validates against stdlib zipfile in BOTH directions."""
    import io
    import zipfile

    members = [
        ("a/big.bin", bytes(range(256)) * 40),
        ("b.txt", b"small member"),
        ("empty", b""),
    ]
    blob = write_zip(members, method="auto", force_zip64=True)
    got = parse_zip(blob)
    assert [(n, d) for n, d, _m in got] == members
    # stdlib reads ours
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
    # ours reads stdlib's forced-zip64 output
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in members:
            with zf.open(n, "w", force_zip64=True) as fh:
                fh.write(d)
    got = parse_zip(buf.getvalue())
    assert [(n, d) for n, d, _m in got] == members


def test_streamed_data_descriptor():
    """r11 (boundary closed): flag-bit-3 members (zeroed local sizes,
    descriptor after payload — the streaming-producer shape; stdlib
    zipfile emits it through the write-stream API above) parse via
    the central directory."""
    import io
    import zipfile

    members = [("s.bin", b"streamed body bytes"), ("t", b"x" * 999)]
    for z64 in (False, True):
        blob = write_zip(members, streamed=True, force_zip64=z64)
        got = parse_zip(blob)
        assert [(n, d) for n, d, _m in got] == members, z64
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert zf.testzip() is None, z64
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
    # corrupt ZIP64: sentinel without a locator
    blob = bytearray(write_zip(members, force_zip64=True))
    at = blob.rfind(b"PK\x06\x07")
    blob[at] ^= 0xFF
    with pytest.raises(ValueError, match="locator"):
        parse_zip(bytes(blob))
