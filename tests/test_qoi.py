"""QOI codec: spec-pinned op encodings, a seeded randomized
round-trip matrix across shapes/channels/content kinds, strictness
(magic, end marker, underrun/overflow, trailing bytes), and the r10
fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.qoi import parse_qoi, write_qoi


def test_header_and_end_marker():
    px = np.zeros((2, 3, 3), np.uint8)
    b = write_qoi(px)
    assert b[:4] == b"qoif"
    w, h, ch, cs = struct.unpack(">IIBB", b[4:14])
    assert (w, h, ch, cs) == (3, 2, 3, 0)
    assert b.endswith(b"\x00" * 7 + b"\x01")


def test_op_selection():
    # a run of zeros (which differ from the implicit prev (0,0,0,255)
    # only in alpha for RGBA... use RGB where prev alpha matches)
    px = np.zeros((1, 5, 3), np.uint8)
    b = write_qoi(px)
    body = b[14:-8]
    # first pixel (0,0,0) vs prev (0,0,0,255): equal in RGB terms?
    # prev is (0,0,0,255) and cur (0,0,0,255) -> pure run of 5
    assert body == bytes([0xC0 | 4])
    # single +1 red step -> DIFF op
    px2 = np.array([[[1, 0, 0]]], np.uint8)
    body2 = write_qoi(px2)[14:-8]
    assert body2 == bytes([0x40 | (3 << 4) | (2 << 2) | 2])


def test_randomized_matrix():
    rng = np.random.default_rng(59)
    for trial in range(60):
        ch = int(rng.integers(0, 2)) + 3
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        kind = trial % 5
        if kind == 0:
            px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        elif kind == 1:
            px = np.full((h, w, ch), int(rng.integers(0, 256)), np.uint8)
        elif kind == 2:  # small deltas: DIFF/LUMA heavy
            px = (
                rng.integers(-2, 3, (h, w, ch)).cumsum(axis=1) % 256
            ).astype(np.uint8)
        elif kind == 3:  # few distinct colors: INDEX heavy
            palette = rng.integers(0, 256, (4, ch)).astype(np.uint8)
            px = palette[rng.integers(0, 4, (h, w))]
        else:  # alpha edges
            px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            if ch == 4:
                px[..., 3] = rng.integers(0, 2, (h, w)) * 255
        got = parse_qoi(write_qoi(px))
        assert got.shape == px.shape and (got == px).all(), (trial, kind)


def test_strictness():
    good = write_qoi(np.arange(48, dtype=np.uint8).reshape(2, 8, 3))
    with pytest.raises(ValueError):
        parse_qoi(b"qoix" + good[4:])
    with pytest.raises(ValueError):
        parse_qoi(good[:-1])  # broken end marker
    with pytest.raises(ValueError):
        parse_qoi(good[:10])
    # declare more pixels than the stream encodes
    hdr = good[:4] + struct.pack(">IIBB", 8, 3, 3, 0)
    with pytest.raises(ValueError):
        parse_qoi(hdr + good[14:])
    # trailing garbage between data and end marker
    with pytest.raises(ValueError):
        parse_qoi(good[:-8] + b"\x00" + good[-8:])
    with pytest.raises(ValueError):
        write_qoi(np.zeros((2, 2), np.uint8))  # missing channel dim


def test_fuzz_never_hangs():
    rng = np.random.default_rng(61)
    base = write_qoi(
        rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    )
    want = parse_qoi(base)
    for _ in range(800):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_qoi(bytes(mutated))
        except ValueError:
            continue
        # no-hang/no-crash contract; surviving decodes must still be
        # well-formed arrays with the 3|4 channel invariant
        assert out.ndim == 3 and out.shape[2] in (3, 4)


def test_decode_stats_high_bytes(spark):
    """r11 ADVICE: decode_qoi_stats must handle component bytes >= 128
    (half the valid QOI value range) — the txt column is the latin1
    codepoint string of the raster bytes, not ascii."""
    import pandas as pd

    from asid_v2_data_pipeline_spark.operators.multimodal import (
        decode_qoi_stats,
    )

    px = np.arange(128, 128 + 4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [write_qoi(px)]})
    )
    row = decode_qoi_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (4, 3, 3)
    flat = px.reshape(-1)
    assert row.byte_sum == int(flat.sum(dtype="int64"))
    assert row.txt == "".join(chr(int(v)) for v in flat)
