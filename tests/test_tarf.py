"""ustar TAR + WebDataset shards (§2.11 archive family).  Round trips,
stdlib cross-validation, adjacency/grouping semantics, a seeded
randomized matrix, and the r10 fuzz contract."""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.tarf import (
    parse_tar,
    parse_webdataset_shard,
    write_tar,
    write_webdataset_shard,
)


def test_tar_roundtrip_and_stdlib_cross_validation():
    entries = [
        ("a.txt", b"hello"),
        ("dir-less/long.name.bin", bytes(range(256)) * 3),
        ("empty.dat", b""),
        ("pad511.bin", bytes(511)),
        ("pad512.bin", bytes(512)),
    ]
    blob = write_tar(entries)
    assert parse_tar(blob) == entries
    # the stdlib reads our archives (independent implementation)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
        ]
    assert got == entries
    # and we read the stdlib's (ustar format)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in entries:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    assert parse_tar(buf.getvalue()) == entries


def test_tar_validation_is_loud():
    blob = bytearray(write_tar([("x.txt", b"payload")]))
    blob[0] ^= 0xFF  # name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(blob))
    good = write_tar([("x.txt", b"payload")])
    with pytest.raises(ValueError):
        parse_tar(good[:-600])  # missing terminator
    with pytest.raises(ValueError, match="magic"):
        parse_tar(b"\x01" * 1024)


def test_webdataset_grouping_semantics():
    shard = write_webdataset_shard(
        [
            ("s0", [("txt", b"alpha"), ("cls", b"en")]),
            ("s1", [("txt", b"beta"), ("cls", b"de"), ("id", b"1")]),
        ],
        gzip=True,
    )
    got = parse_webdataset_shard(shard)
    assert got == [
        ("s0", {"txt": b"alpha", "cls": b"en"}),
        ("s1", {"txt": b"beta", "cls": b"de", "id": b"1"}),
    ]
    # non-adjacent members of one sample are a layout violation
    bad = write_tar(
        [("s0.txt", b"a"), ("s1.txt", b"b"), ("s0.cls", b"en")]
    )
    with pytest.raises(ValueError, match="adjacent"):
        parse_webdataset_shard(bad)
    with pytest.raises(ValueError, match="duplicate"):
        parse_webdataset_shard(
            write_tar([("s0.txt", b"a"), ("s0.txt", b"b")])
        )


def test_tar_randomized_matrix():
    rng = np.random.default_rng(41)
    for trial in range(40):
        n = int(rng.integers(1, 20))
        entries = [
            (
                f"m{trial}-{i}.bin",
                bytes(
                    rng.integers(
                        0, 256, int(rng.integers(0, 2000))
                    ).astype(np.uint8)
                ),
            )
            for i in range(n)
        ]
        assert parse_tar(write_tar(entries)) == entries


def test_tar_fuzz_fail_loudly():
    rng = np.random.default_rng(43)
    shard = write_webdataset_shard(
        [
            (f"k{i}", [("txt", bytes([i]) * (i * 53 % 700)),
                       ("cls", b"en")])
            for i in range(5)
        ],
        gzip=True,
    )
    for cut in range(0, len(shard), max(1, len(shard) // 90)):
        try:
            parse_webdataset_shard(shard[:cut])
        except ValueError:
            pass
    for _ in range(500):
        b = bytearray(shard)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_webdataset_shard(bytes(b))
        except ValueError:
            pass
    # ungzipped shard fuzz exercises the tar layer directly
    plain = write_tar([("a.txt", b"x" * 700), ("a.cls", b"en")])
    for _ in range(400):
        b = bytearray(plain)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_webdataset_shard(bytes(b))
        except ValueError:
            pass
