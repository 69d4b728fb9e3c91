"""Ogg-Opus (RFC 7845) headers + RFC 6716 TOC duration arithmetic:
round trips, the full config→samples-per-frame table, frame-count
codes, granule/pre-skip semantics, mapping-family validation, and
the fuzz contract.  Payload decode stays behind the float-codec
boundary (SCALE.md §Vorbis)."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.opus import (
    opus_packet,
    packet_samples,
    parse_ogg_opus,
    parse_opus_head,
    parse_opus_tags,
    samples_per_frame,
    write_ogg_opus,
    write_opus_head,
    write_opus_tags,
)


def test_toc_duration_table():
    # RFC 6716 §3.1: SILK 10/20/40/60 ms, hybrid 10/20, CELT
    # 2.5/5/10/20 — at 48 kHz
    assert [samples_per_frame(c) for c in (0, 1, 2, 3)] == [
        480, 960, 1920, 2880,
    ]
    assert samples_per_frame(11) == 2880
    assert [samples_per_frame(c) for c in (12, 13, 14, 15)] == [
        480, 960, 480, 960,
    ]
    assert [samples_per_frame(c) for c in (16, 17, 18, 19)] == [
        120, 240, 480, 960,
    ]
    assert samples_per_frame(31) == 960
    with pytest.raises(ValueError):
        samples_per_frame(32)


def test_packet_samples_codes():
    assert packet_samples(opus_packet(0, 0)) == 480
    assert packet_samples(opus_packet(0, 1)) == 960
    assert packet_samples(opus_packet(16, 2)) == 240
    assert packet_samples(opus_packet(16, 3, 48)) == 48 * 120
    # 120 ms cap: 3 x 2880 = 8640 > 5760
    with pytest.raises(ValueError, match="120 ms"):
        packet_samples(opus_packet(3, 3, 3))
    with pytest.raises(ValueError, match="zero frames"):
        packet_samples(bytes([3, 0]))
    with pytest.raises(ValueError, match="empty"):
        packet_samples(b"")


def test_head_and_tags_roundtrip():
    h = parse_opus_head(write_opus_head(2, pre_skip=312,
                                        input_rate=44100, gain_q8=-256))
    assert h["channels"] == 2 and h["pre_skip"] == 312
    assert h["input_sample_rate"] == 44100
    assert h["output_gain_q8"] == -256
    assert h["mapping_family"] == 0
    t = parse_opus_tags(write_opus_tags({"TITLE": "x=y", "R128_TRACK_GAIN": "-1"}))
    assert t["tags"] == {"TITLE": "x=y", "R128_TRACK_GAIN": "-1"}


def test_mapping_family_validation():
    import struct

    # family 1 with a valid mapping table
    head = (
        b"OpusHead" + bytes([1, 3]) + struct.pack("<HIh", 0, 48000, 0)
        + bytes([1, 2, 1, 0, 1, 2])
    )
    h = parse_opus_head(head)
    assert h["stream_count"] == 2 and h["coupled_count"] == 1
    assert h["mapping"] == [0, 1, 2]
    # mapping index out of range
    bad = head[:-1] + bytes([9])
    with pytest.raises(ValueError, match="mapping index"):
        parse_opus_head(bad)
    # family 0 with >2 channels
    with pytest.raises(ValueError, match="at most 2"):
        parse_opus_head(
            b"OpusHead" + bytes([1, 3])
            + struct.pack("<HIh", 0, 48000, 0) + bytes([0])
        )


def test_ogg_roundtrip_matrix():
    rng = np.random.default_rng(71)
    for trial in range(20):
        ch = int(rng.integers(1, 3))
        pre = int(rng.integers(0, 1000))
        pkts = []
        total = 0
        for _ in range(int(rng.integers(0, 10))):
            c = int(rng.integers(0, 32))
            code = int(rng.integers(0, 3))
            p = opus_packet(c, code)
            pkts.append(p)
            total += packet_samples(p)
        blob = write_ogg_opus(ch, {"TITLE": f"t{trial}"}, pkts, pre_skip=pre)
        info = parse_ogg_opus(blob)
        assert info["channels"] == ch, trial
        assert info["pre_skip"] == pre
        assert info["n_audio_packets"] == len(pkts)
        assert info["total_samples48"] == total
        assert info["last_granule"] == total


def test_fuzz_never_hangs():
    rng = np.random.default_rng(73)
    blob = write_ogg_opus(
        2, {"TITLE": "fuzz"}, [opus_packet(c % 32, c % 3) for c in range(6)]
    )
    for cut in range(0, len(blob), max(1, len(blob) // 100)):
        try:
            parse_ogg_opus(blob[:cut])
        except (ValueError, UnicodeDecodeError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_ogg_opus(bytes(b))
        except (ValueError, UnicodeDecodeError):
            pass
