"""VP9 uncompressed frame header (r13): randomized round-trip matrix,
strictness, and the loud-failure fuzz contract.  Payload decode is the
disclosed boundary (SCALE.md r13) — these tests cover exactly the
plain-bit header layer."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.vp9 import (
    parse_vp9_frame_header,
    write_vp9_inter_stub,
    write_vp9_key_stub,
)


def test_key_roundtrip_matrix():
    rng = np.random.default_rng(151)
    for trial in range(80):
        profile = int(rng.integers(0, 4))
        cs = int(rng.integers(0, 7))  # 0..6; RGB=7 covered separately
        kw = dict(
            profile=profile,
            bit_depth=8 if profile < 2 else int(rng.choice([10, 12])),
            color_space=cs,
            color_range=bool(rng.integers(0, 2)),
            show_frame=bool(rng.integers(0, 2)),
            error_resilient=bool(rng.integers(0, 2)),
        )
        if profile in (1, 3):
            kw["subsampling_x"] = int(rng.integers(0, 2))
            kw["subsampling_y"] = int(rng.integers(0, 2))
        w, h = int(rng.integers(1, 1 << 16)), int(rng.integers(1, 1 << 16))
        rnd = (
            (int(rng.integers(1, 1 << 16)), int(rng.integers(1, 1 << 16)))
            if rng.integers(0, 2)
            else None
        )
        got = parse_vp9_frame_header(
            write_vp9_key_stub(w, h, render_size=rnd, trailing=b"zz", **kw)
        )
        assert got["key_frame"] and not got["show_existing_frame"]
        assert (got["width"], got["height"]) == (w, h), trial
        assert (got["render_width"], got["render_height"]) == (rnd or (w, h))
        assert got["profile"] == profile
        assert got["bit_depth"] == kw["bit_depth"]
        assert got["color_space"] == cs
        assert got["color_range"] == kw["color_range"]
        assert got["show_frame"] == kw["show_frame"]
        assert got["error_resilient"] == kw["error_resilient"]
        if profile in (1, 3):
            assert got["subsampling_x"] == kw["subsampling_x"]
            assert got["subsampling_y"] == kw["subsampling_y"]
        else:
            assert (got["subsampling_x"], got["subsampling_y"]) == (1, 1)


def test_rgb_profiles():
    got = parse_vp9_frame_header(
        write_vp9_key_stub(
            8, 8, profile=1, color_space=7, subsampling_x=0, subsampling_y=0
        )
    )
    assert got["color_space"] == 7 and got["color_range"] is True
    assert (got["subsampling_x"], got["subsampling_y"]) == (0, 0)
    with pytest.raises(ValueError, match="RGB"):
        write_vp9_key_stub(8, 8, profile=0, color_space=7)


def test_inter_prefix():
    for profile in range(4):
        got = parse_vp9_frame_header(
            write_vp9_inter_stub(profile=profile, show_frame=False)
        )
        assert got == {
            "profile": profile,
            "show_existing_frame": False,
            "key_frame": False,
            "show_frame": False,
            "error_resilient": False,
        }


def test_show_existing():
    # hand-built: marker 10, profile 0 (bits 0,0), show_existing 1, idx 5
    b = bytes([0b10_0_0_1_101])
    got = parse_vp9_frame_header(b)
    assert got == {
        "profile": 0,
        "show_existing_frame": True,
        "frame_to_show": 5,
    }


def test_strictness():
    good = write_vp9_key_stub(640, 480, profile=2, bit_depth=10)
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            parse_vp9_frame_header(good[:cut])
    # bad marker
    b = bytearray(good)
    b[0] ^= 0x80
    with pytest.raises(ValueError, match="marker"):
        parse_vp9_frame_header(bytes(b))
    # sync code flip
    b = bytearray(good)
    b[1] ^= 0x10  # inside the sync code for this profile layout
    with pytest.raises(ValueError, match="sync"):
        parse_vp9_frame_header(bytes(b))
    # writer guards
    with pytest.raises(ValueError, match="8-bit"):
        write_vp9_key_stub(8, 8, profile=0, bit_depth=10)
    with pytest.raises(ValueError, match="10/12"):
        write_vp9_key_stub(8, 8, profile=2, bit_depth=8)
    with pytest.raises(ValueError, match="profile"):
        write_vp9_inter_stub(profile=4)
    with pytest.raises(ValueError, match="dimensions"):
        write_vp9_key_stub(0, 8)


def test_fuzz_never_hangs():
    rng = np.random.default_rng(157)
    base = write_vp9_key_stub(
        1280, 720, profile=3, bit_depth=12, color_space=2,
        subsampling_x=1, subsampling_y=0, render_size=(640, 360),
    )
    for _ in range(1000):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = parse_vp9_frame_header(bytes(mutated))
            assert out["profile"] in (0, 1, 2, 3)
        except ValueError:
            pass


def test_superframe_roundtrip_matrix():
    from asid_v2_data_pipeline_spark.functions.vp9 import (
        split_vp9_superframe,
        write_vp9_superframe,
    )

    rng = np.random.default_rng(163)
    for trial in range(60):
        frames = [
            bytes(rng.integers(0, 256, int(rng.integers(1, 700))).astype(np.uint8))
            for _ in range(int(rng.integers(1, 9)))
        ]
        got = split_vp9_superframe(write_vp9_superframe(frames))
        assert got == frames, trial


def test_superframe_single_frame_passthrough():
    from asid_v2_data_pipeline_spark.functions.vp9 import (
        split_vp9_superframe,
        write_vp9_key_stub,
    )

    f = write_vp9_key_stub(64, 32)
    assert split_vp9_superframe(f) == [f]
    # a frame whose last byte merely LOOKS like a marker stays single
    fake = f + bytes([0xC0])
    assert split_vp9_superframe(fake) == [fake]


def test_superframe_corrupt_index_raises():
    from asid_v2_data_pipeline_spark.functions.vp9 import (
        split_vp9_superframe,
        write_vp9_superframe,
    )

    good = bytearray(write_vp9_superframe([b"aaaa", b"bbbbbbb"]))
    # flip the first SIZE byte: both markers still match, sum now wrong
    # (mag=1 index layout from the end: marker, s0, s1, marker)
    good[-3] ^= 0x01
    with pytest.raises(ValueError, match="sum"):
        split_vp9_superframe(bytes(good))
    # a broken FIRST marker means "not an index" — passthrough, no raise
    good[-3] ^= 0x01
    good[-4] ^= 0x01
    assert split_vp9_superframe(bytes(good)) == [bytes(good)]
    with pytest.raises(ValueError, match="empty"):
        split_vp9_superframe(b"")
    with pytest.raises(ValueError, match="1..8"):
        write_vp9_superframe([])
    with pytest.raises(ValueError, match="zero-length"):
        write_vp9_superframe([b"a", b""])


def test_superframe_demux_rows(spark):
    """A WebM block carrying a (hidden alt-ref keyframe + shown inter)
    superframe yields TWO rows sharing the block timestamp, and the
    container keyframe flag is checked against the MEMBERS."""
    import pandas as pd

    from asid_v2_data_pipeline_spark.functions.ebml import (
        MkvTrack,
        write_mkv,
    )
    from asid_v2_data_pipeline_spark.functions.vp9 import (
        write_vp9_inter_stub,
        write_vp9_key_stub,
        write_vp9_superframe,
    )
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        demux_vp9_headers,
    )

    sup = write_vp9_superframe(
        [
            write_vp9_key_stub(320, 240, show_frame=False),
            write_vp9_inter_stub(show_frame=True),
        ]
    )
    tracks = [MkvTrack(1, "video", "V_VP9", width=320, height=240)]
    blob = write_mkv([(1, 0, True, sup)], tracks)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "payload": [blob]}),
        "media_id long, payload binary",
    )
    rows = sorted(
        (r["is_key"], r["show_frame"], r["width"])
        for r in demux_vp9_headers(media).collect()
    )
    assert rows == [(False, True, None), (True, False, 320)]
    # container flag False while a member is a keyframe -> raises
    bad = write_mkv([(1, 0, False, sup)], tracks)
    media_bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [8], "payload": [bad]}),
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="keyframe flag disagrees"):
        demux_vp9_headers(media_bad).collect()
