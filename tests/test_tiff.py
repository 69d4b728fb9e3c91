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


def test_tiled_layout_roundtrip_matrix():
    """r11 (boundary closed): tiled TIFFs (TileWidth/TileLength/
    TileOffsets/TileByteCounts, zero-padded edge tiles per TIFF 6.0
    §15) across compressions, byte orders and the predictor."""
    rng = np.random.default_rng(83)
    for trial in range(25):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
        rgb = bool(rng.integers(0, 2))
        px = rng.integers(
            0, 256, (h, w, 3) if rgb else (h, w)
        ).astype(np.uint8)
        comp = ["none", "packbits", "deflate", "lzw"][
            int(rng.integers(0, 4))
        ]
        blob = write_tiff(
            px,
            comp,
            big_endian=bool(rng.integers(0, 2)),
            predictor=bool(rng.integers(0, 2)),
            tiles=(
                16 * int(rng.integers(1, 4)),
                16 * int(rng.integers(1, 4)),
            ),
        )
        out = parse_tiff(blob)
        assert out.shape == px.shape and (out == px).all(), (trial, comp)
    # bad tile dims rejected on both sides
    with pytest.raises(ValueError, match="multiples of 16"):
        write_tiff(np.zeros((8, 8), np.uint8), tiles=(8, 16))


def test_palette_roundtrip():
    """r11 (boundary closed): photometric-3 palette files decode
    through the 16-bit ColorMap LUT to RGB."""
    rng = np.random.default_rng(89)
    for trial in range(10):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        comp = ["none", "deflate", "lzw"][int(rng.integers(0, 3))]
        tiles = (16, 16) if rng.integers(0, 2) else None
        out = parse_tiff(
            write_tiff(idx, comp, palette=pal, tiles=tiles)
        )
        assert out.shape == (h, w, 3)
        assert (out == pal[idx]).all(), trial
    with pytest.raises(ValueError, match="palette"):
        write_tiff(np.zeros((4, 4, 3), np.uint8), palette=pal)


def test_lzw_eoi_width_boundary():
    """r11 regression (found by the tiled matrix): when the decoder's
    table lands exactly on a width-change point (510/1022/2046) after
    the FINAL data code, EOI must be written at the bumped width —
    brute-forced across sizes spanning all three boundaries."""
    from asid_v2_data_pipeline_spark.functions.tiff import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.default_rng(97)
    for _ in range(800):
        n = int(rng.integers(200, 1400))
        raw = bytes(rng.integers(0, 256, n).astype(np.uint8))
        assert lzw_decode(lzw_encode(raw), n) == raw
