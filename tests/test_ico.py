"""ICO container: mixed PNG/DIB round-trips, odd-width row padding,
directory-vs-payload dimension cross-check, a seeded randomized
matrix, strictness, and the r10 fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.ico import parse_ico, write_ico


def test_mixed_roundtrip():
    rng = np.random.default_rng(89)
    gray = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    rgb = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    out = parse_ico(write_ico([("png", gray), ("dib", rgb)]))
    assert [e["fmt"] for e in out] == ["png", "dib"]
    assert (out[0]["pixels"][..., 0] == gray).all()
    assert (out[1]["pixels"] == rgb).all()


def test_randomized_matrix():
    rng = np.random.default_rng(97)
    for trial in range(25):
        entries = []
        for _ in range(int(rng.integers(1, 5))):
            h = int(rng.integers(1, 33))
            w = int(rng.integers(1, 33))
            if rng.integers(0, 2):
                entries.append(
                    ("png", rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
                )
            else:
                entries.append(
                    ("dib", rng.integers(0, 256, (h, w, 3)).astype(np.uint8))
                )
        out = parse_ico(write_ico(entries))
        assert len(out) == len(entries), trial
        for (fmt, px), got in zip(entries, out):
            assert got["fmt"] == fmt
            assert (got["pixels"] == px).all(), trial


def test_directory_dims_cross_check():
    b = bytearray(write_ico([("dib", np.zeros((4, 4, 3), np.uint8))]))
    b[6] = 5  # directory width lies
    with pytest.raises(ValueError, match="disagree"):
        parse_ico(bytes(b))


def test_strictness():
    with pytest.raises(ValueError):
        write_ico([])
    with pytest.raises(ValueError):
        parse_ico(b"\x00\x00\x02\x00\x01\x00")  # type 2 = cursor
    good = write_ico([("dib", np.zeros((4, 4, 3), np.uint8))])
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            parse_ico(good[:cut])
    # 300px too large
    with pytest.raises(ValueError):
        write_ico([("dib", np.zeros((300, 4, 3), np.uint8))])


def test_fuzz_never_hangs():
    rng = np.random.default_rng(101)
    base = write_ico(
        [
            ("png", rng.integers(0, 256, (8, 8)).astype(np.uint8)),
            ("dib", rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)),
        ]
    )
    for _ in range(600):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_ico(bytes(mutated))
            assert all(e["pixels"].ndim == 3 for e in out)
        except (ValueError, NotImplementedError):
            pass
