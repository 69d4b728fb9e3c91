"""TIFF 6.0 reader/writer (§2.11 image-container family).  Round trips
across compressions × byte orders × predictor × shapes, PackBits and
TIFF-LZW codec edges, a seeded randomized matrix, disclosed
boundaries, and the r10 fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.tiff import (
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    parse_tiff,
    write_tiff,
)

COMPS = ("none", "packbits", "deflate", "lzw")


def test_tiff_roundtrip_grid():
    rng = np.random.default_rng(5)
    for comp in COMPS:
        for be in (False, True):
            for pred in (False, True):
                for shape in ((8, 8), (13, 9, 3), (5, 17), (1, 1)):
                    px = rng.integers(0, 256, shape, dtype=np.uint8)
                    blob = write_tiff(
                        px, comp, big_endian=be, rows_per_strip=3,
                        predictor=pred,
                    )
                    got = parse_tiff(blob)
                    assert got.shape == px.shape
                    assert (got == px).all(), (comp, be, pred, shape)


def test_packbits_edges():
    cases = [
        b"",
        b"a",
        b"a" * 300,  # long replicate runs (split at 128)
        bytes(range(200)),  # pure literal (split at 128)
        b"ab" * 100,  # worst case: no runs of >= 3
        b"aaabccc" + bytes(130) + b"xy",
    ]
    for raw in cases:
        enc = packbits_encode(raw)
        assert packbits_decode(enc, len(raw)) == raw
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab", 6)  # truncated literal


def test_lzw_edges():
    rng = np.random.default_rng(9)
    cases = [
        b"",
        b"a",
        b"TOBEORNOTTOBEORTOBEORNOT" * 3,  # the classic KwK exerciser
        bytes(rng.integers(0, 4, 9000).astype(np.uint8)),  # deep table
        bytes(rng.integers(0, 256, 20000).astype(np.uint8)),  # clears
    ]
    for raw in cases:
        assert lzw_decode(lzw_encode(raw), len(raw)) == raw
    with pytest.raises(ValueError):
        lzw_decode(lzw_encode(b"abcabc")[:-2], 6)


def test_tiff_disclosed_boundaries():
    px = np.zeros((4, 4), np.uint8)
    blob = bytearray(write_tiff(px))
    # patch BitsPerSample (258) value to 16 in the little-endian IFD
    idx = bytes(blob).find(b"\x02\x01\x03\x00")  # tag 258, type SHORT
    assert idx > 0
    blob[idx + 8 : idx + 10] = (16).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="8-bit"):
        parse_tiff(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        parse_tiff(b"ZZZZ" + bytes(blob)[4:])


def test_tiff_randomized_matrix():
    rng = np.random.default_rng(47)
    for trial in range(40):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        ch = (1, 3)[int(rng.integers(0, 2))]
        shape = (h, w) if ch == 1 else (h, w, 3)
        # mix entropy levels so runs/strings actually occur
        if rng.integers(0, 2):
            px = rng.integers(0, 256, shape, dtype=np.uint8)
        else:
            px = rng.integers(0, 4, shape, dtype=np.uint8) * 60
        blob = write_tiff(
            px,
            COMPS[int(rng.integers(0, 4))],
            big_endian=bool(rng.integers(0, 2)),
            rows_per_strip=int(rng.integers(1, h + 3)),
            predictor=bool(rng.integers(0, 2)),
        )
        got = parse_tiff(blob)
        assert got.shape == px.shape and (got == px).all(), f"trial {trial}"


def test_tiff_fuzz_fail_loudly():
    rng = np.random.default_rng(53)
    px = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    blobs = [
        write_tiff(px, c, big_endian=bool(i % 2), predictor=True)
        for i, c in enumerate(COMPS)
    ]
    for blob in blobs:
        for cut in range(0, len(blob), max(1, len(blob) // 80)):
            try:
                parse_tiff(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(500):
            b = bytearray(blob)
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            try:
                parse_tiff(bytes(b))
            except (ValueError, NotImplementedError):
                pass
