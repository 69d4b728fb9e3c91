"""Legacy rasters (TGA / PGM / PPM): randomized round-trip matrix
across RLE/origin/content kinds, header tolerances, the funnel
sniff, strictness, and the r10 fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.rasters import (
    parse_pnm,
    parse_tga,
    sniff_raster,
    write_pnm,
    write_tga,
)


def test_randomized_matrix():
    rng = np.random.default_rng(107)
    for trial in range(40):
        h = int(rng.integers(1, 33))
        w = int(rng.integers(1, 33))
        kind = trial % 3
        if kind == 0:
            rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:  # runs-heavy: RLE run packets dominate
            pal = rng.integers(0, 256, (3, 3)).astype(np.uint8)
            rgb = pal[rng.integers(0, 3, (h, w))]
        else:  # constant
            rgb = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        for rle in (False, True):
            for td in (False, True):
                got = parse_tga(write_tga(rgb, rle=rle, top_down=td))
                assert (got == rgb).all(), (trial, rle, td)
        gray = rgb[..., 0]
        assert (parse_pnm(write_pnm(gray)) == gray).all()
        assert (parse_pnm(write_pnm(rgb)) == rgb).all()


def test_sniff():
    px = np.zeros((2, 2, 3), np.uint8)
    assert sniff_raster(write_tga(px)) == "tga"
    assert sniff_raster(write_pnm(px)) == "ppm"
    assert sniff_raster(write_pnm(px[..., 0])) == "pgm"


def test_pnm_header_tolerances():
    assert (
        parse_pnm(b"P5  # c1\n # c2\n 3\t1 \n255\n\x01\x02\x03")
        == np.array([[1, 2, 3]], np.uint8)
    ).all()
    with pytest.raises(ValueError):
        parse_pnm(b"P5\n2 1\n65535\n\x00\x00")  # 16-bit maxval
    with pytest.raises(ValueError):
        parse_pnm(b"P4\n2 1\n")  # bitmap
    with pytest.raises(ValueError):
        parse_pnm(b"P5\n2 1\n255\n\x00")  # truncated raster
    with pytest.raises(ValueError):
        parse_pnm(b"P5\n2 1\n255\n\x00\x01\x02")  # trailing bytes


def test_tga_strictness():
    good = write_tga(np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            parse_tga(good[:cut])
    rle = bytearray(
        write_tga(np.zeros((2, 2, 3), np.uint8), rle=True)
    )
    rle[18] = 0x87  # run of 8 overruns the 4-pixel image
    with pytest.raises(ValueError, match="overruns"):
        parse_tga(bytes(rle))
    with pytest.raises(ValueError):
        parse_tga(b"\x00\x01" + good[2:])  # color-mapped
    with pytest.raises(ValueError):
        write_tga(np.zeros((2, 2), np.uint8))  # missing channels


def test_fuzz_never_hangs():
    rng = np.random.default_rng(109)
    bases = [
        write_tga(rng.integers(0, 256, (6, 7, 3)).astype(np.uint8), rle=True),
        write_pnm(rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)),
    ]
    for base in bases:
        for _ in range(400):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] ^= 1 << int(rng.integers(0, 8))
            try:
                fmt = sniff_raster(bytes(mutated))
                (parse_tga if fmt == "tga" else parse_pnm)(bytes(mutated))
            except ValueError:
                pass
