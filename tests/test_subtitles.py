"""SRT/WebVTT codecs: timestamp round-trips across the hour boundary,
verbatim text preservation, WebVTT block/setting handling, the format
funnel, a seeded randomized matrix, and loud failure on malformed
timing/structure."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.subtitles import (
    parse_srt,
    parse_webvtt,
    subtitle_cues,
    write_srt,
    write_webvtt,
)


def test_srt_roundtrip():
    cues = [
        (0, 1900, "hello"),
        (3_599_999, 3_600_000, "line a\nline b"),
        (7_265_432, 7_300_000, " leading space kept"),
    ]
    got = parse_srt(write_srt(cues))
    assert [(s, e, t) for _, s, e, t in got] == cues
    assert [i for i, *_ in got] == [1, 2, 3]


def test_webvtt_roundtrip_with_ids():
    cues = [(500, 2500, "a"), (2500, 4000, "b\nc")]
    got = parse_webvtt(write_webvtt(cues, ids=["x", "y"]))
    assert got == [("x", 500, 2500, "a"), ("y", 2500, 4000, "b\nc")]
    got2 = parse_webvtt(write_webvtt(cues))
    assert [(s, e, t) for _, s, e, t in got2] == cues


def test_webvtt_tolerances():
    data = (
        "WEBVTT - a header comment\n\n"
        "NOTE\nthis block is skipped\nentirely\n\n"
        "00:05.000 --> 00:06.500 align:start position:10%\n"
        "short form hours\n\n"
    ).encode()
    got = parse_webvtt(data)
    assert got == [(None, 5000, 6500, "short form hours")]
    # CRLF + BOM
    data2 = b"\xef\xbb\xbfWEBVTT\r\n\r\n00:00:01.000 --> 00:00:02.000\r\nx\r\n"
    assert parse_webvtt(data2) == [(None, 1000, 2000, "x")]


def test_funnel_sniff():
    srt = write_srt([(0, 1000, "a")])
    vtt = write_webvtt([(0, 1000, "a")])
    assert subtitle_cues(srt) == ("srt", [(0, 1000, "a")])
    assert subtitle_cues(vtt) == ("vtt", [(0, 1000, "a")])


def test_randomized_matrix():
    rng = np.random.default_rng(31)
    for trial in range(50):
        cues = []
        t0 = 0
        for _ in range(int(rng.integers(1, 12))):
            t0 += int(rng.integers(0, 4_000_000))
            dur = int(rng.integers(1, 60_000))
            n_lines = int(rng.integers(1, 4))
            text = "\n".join(
                "".join(
                    chr(int(c))
                    for c in rng.integers(0x21, 0x7F, int(rng.integers(1, 30)))
                )
                for _ in range(n_lines)
            )
            cues.append((t0, t0 + dur, text))
        assert [
            (s, e, t) for _, s, e, t in parse_srt(write_srt(cues))
        ] == cues
        assert [
            (s, e, t) for _, s, e, t in parse_webvtt(write_webvtt(cues))
        ] == cues


def test_malformed_raise():
    with pytest.raises(ValueError):
        parse_srt(b"not a number\n00:00:01,000 --> 00:00:02,000\nx\n")
    with pytest.raises(ValueError):
        parse_srt(b"1\n00:00:01,000 -> 00:00:02,000\nx\n")  # bad arrow
    with pytest.raises(ValueError):
        parse_srt(b"1\n00:00:61,000 --> 00:01:02,000\nx\n")  # secs > 59
    with pytest.raises(ValueError):
        parse_srt(b"1\n00:00:01,00 --> 00:00:02,000\nx\n")  # 2-digit ms
    with pytest.raises(ValueError):
        parse_srt(b"1\n00:00:01.000 --> 00:00:02.000\nx\n")  # dot in SRT
    with pytest.raises(ValueError):
        parse_webvtt(b"no header\n")
    with pytest.raises(ValueError):
        parse_webvtt(b"WEBVTT\n\ncueid\nno timing follows\n")
    with pytest.raises(ValueError):
        write_srt([(-1, 0, "x")])


def test_fuzz_never_hangs():
    rng = np.random.default_rng(37)
    base = write_srt([(10, 20, "ab\ncd"), (30, 40, "ef")])
    for _ in range(500):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            parse_srt(bytes(mutated))
            subtitle_cues(bytes(mutated))
        except ValueError:
            pass
