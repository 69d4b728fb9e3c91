"""EXIF (TIFF-IFD-in-APP1): field round-trips across all implemented
value types, big-endian parsing, JPEG splice/extract marker walk,
decode-neutrality of the splice, a seeded randomized matrix, and loud
failure on structural corruption."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.codecs import (
    parse_jpeg,
    write_jpeg,
    write_jpeg_progressive,
)
from asid_v2_data_pipeline_spark.functions.exif import (
    extract_jpeg_app1,
    insert_jpeg_app1,
    parse_exif,
    write_exif,
)

_FIELDS = {
    "make": "Fixture",
    "model": "Cam 3",
    "orientation": 5,
    "x_resolution": (72, 1),
    "exposure_time": (1, 125),
    "iso": 400,
    "datetime_original": "2026:01:15 10:30:45",
    "pixel_x": 8,
    "pixel_y": 8,
}


def test_roundtrip_all_types():
    assert parse_exif(write_exif(_FIELDS)) == _FIELDS


def test_partial_fields_and_no_subifd():
    f = {"make": "X", "orientation": 1}
    assert parse_exif(write_exif(f)) == f
    f2 = {"iso": 100}  # sub-IFD only
    assert parse_exif(write_exif(f2)) == f2


def test_big_endian_parse():
    # hand-build a minimal MM (big-endian) EXIF: IFD0 with orientation
    tiff = b"MM\x00\x2a" + struct.pack(">I", 8)
    tiff += struct.pack(">H", 1)
    tiff += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 7) + b"\x00\x00"
    tiff += struct.pack(">I", 0)
    out = parse_exif(b"Exif\x00\x00" + tiff)
    assert out == {"orientation": 7}


def test_jpeg_splice_and_neutrality():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    for writer in (write_jpeg, write_jpeg_progressive):
        img = writer(px, quality=75)
        app1 = write_exif(_FIELDS)
        j2 = insert_jpeg_app1(img, app1)
        assert extract_jpeg_app1(j2) == app1
        assert extract_jpeg_app1(img) is None
        assert (parse_jpeg(j2) == parse_jpeg(img)).all()


def test_randomized_matrix():
    rng = np.random.default_rng(47)
    for trial in range(40):
        f = {}
        if rng.integers(0, 2):
            f["make"] = "".join(
                chr(int(c)) for c in rng.integers(0x20, 0x7F, int(rng.integers(0, 30)))
            )
        if rng.integers(0, 2):
            f["model"] = f"M{int(rng.integers(0, 1000))}"
        if rng.integers(0, 2):
            f["orientation"] = int(rng.integers(0, 1 << 16))
        if rng.integers(0, 2):
            f["iso"] = int(rng.integers(0, 1 << 16))
        if rng.integers(0, 2):
            f["x_resolution"] = (
                int(rng.integers(0, 1 << 32)), int(rng.integers(0, 1 << 32))
            )
        if rng.integers(0, 2):
            f["exposure_time"] = (
                int(rng.integers(0, 1 << 32)), int(rng.integers(0, 1 << 32))
            )
        if rng.integers(0, 2):
            f["pixel_x"] = int(rng.integers(0, 1 << 32))
        assert parse_exif(write_exif(f)) == f, (trial, f)


def test_malformed_raise():
    with pytest.raises(ValueError):
        parse_exif(b"JFIF\x00\x00" + b"II\x2a\x00")
    with pytest.raises(ValueError):
        parse_exif(b"Exif\x00\x00" + b"XX\x2a\x00" + b"\x00" * 8)
    # value offset past the end
    good = bytearray(write_exif({"make": "a longer than four name"}))
    # find the external-offset field and point it out of bounds
    with pytest.raises(ValueError):
        bad = bytes(good[:-8])  # chop the external value area
        parse_exif(bad)
    with pytest.raises(ValueError):
        insert_jpeg_app1(b"\x00\x00", b"x")
    with pytest.raises(ValueError):
        extract_jpeg_app1(b"\xff\xd8\x00\xff\x00\x00")


def test_fuzz_never_hangs():
    rng = np.random.default_rng(53)
    img = insert_jpeg_app1(
        write_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8)),
        write_exif(_FIELDS),
    )
    for _ in range(600):
        mutated = bytearray(img)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            app1 = extract_jpeg_app1(bytes(mutated))
            if app1 is not None:
                parse_exif(app1)
        except (ValueError, UnicodeDecodeError):
            pass


def test_sub_ifd_cycle_raises_valueerror():
    """r11 ADVICE: a crafted 0x8769 sub-IFD pointer that points back at
    IFD0 must raise ValueError (quarantinable), not RecursionError."""
    ifd0 = (
        struct.pack("<H", 1)
        + struct.pack("<HHI", 0x8769, 4, 1)
        + struct.pack("<I", 8)  # sub-IFD offset -> IFD0 itself
        + struct.pack("<I", 0)
    )
    payload = b"Exif\x00\x00" + b"II\x2a\x00" + struct.pack("<I", 8) + ifd0
    with pytest.raises(ValueError, match="cycle"):
        parse_exif(payload)
    # two IFDs pointing at each other (cycle length 2) also raise
    ifd_a = (
        struct.pack("<H", 1)
        + struct.pack("<HHI", 0x8769, 4, 1)
        + struct.pack("<I", 26)
        + struct.pack("<I", 0)
    )
    ifd_b = (
        struct.pack("<H", 1)
        + struct.pack("<HHI", 0x8769, 4, 1)
        + struct.pack("<I", 8)
        + struct.pack("<I", 0)
    )
    payload = (
        b"Exif\x00\x00" + b"II\x2a\x00" + struct.pack("<I", 8) + ifd_a + ifd_b
    )
    with pytest.raises(ValueError, match="cycle"):
        parse_exif(payload)
