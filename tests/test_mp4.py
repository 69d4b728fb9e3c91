"""MP4 / ISO-BMFF muxer + demuxer (§2.11 container family).

Round trips across track mixes and chunk shapes, layout variants
(faststart moov-first, 64-bit largesize boxes), the esds codec
registrations (OTI 0x6B = MP3, 0x6C = JPEG), a seeded randomized
matrix (the r10 discipline), and the r10 truncation+flip fuzz
contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.mp4 import (
    Mp4Track,
    parse_mp4,
    write_mp4,
)


def _audio(tid=1, codec="mp3"):
    return Mp4Track(
        tid, "audio", codec, timescale=44100, sample_rate=44100, channels=1
    )


def _video(tid=2, codec="raw", w=4, h=4):
    return Mp4Track(tid, "video", codec, timescale=1000, width=w, height=h)


def _norm(samples):
    return sorted((t, ts, k, bytes(p)) for t, ts, k, p in samples)


def test_mp4_roundtrip_two_tracks():
    samples = [(1, i * 26, True, bytes([i] * 50 + [7])) for i in range(5)]
    samples += [(2, i * 40, i % 3 == 0, bytes([100 + i] * 16)) for i in range(9)]
    blob = write_mp4(samples, [_audio(), _video()], chunk_every=4)
    f = parse_mp4(blob)
    assert f.tracks[1].codec == "mp3"
    assert f.tracks[1].sample_rate == 44100
    assert f.tracks[2].codec == "raw"
    assert (f.tracks[2].width, f.tracks[2].height) == (4, 4)
    assert _norm(f.samples) == _norm(samples)
    # keyframes survive the stss table exactly
    keys = sorted((s[1], s[2]) for s in f.samples if s[0] == 2)
    assert [k for _, k in keys] == [i % 3 == 0 for i in range(9)]


def test_mp4_jpeg_esds_and_empty_track():
    s2 = [(3, i * 40, True, b"JFIF" + bytes([i])) for i in range(3)]
    f = parse_mp4(write_mp4(s2, [_video(3, "jpeg", 8, 8)], chunk_every=2))
    assert f.tracks[3].codec == "jpeg"
    assert len(f.samples) == 3
    # a declared track with zero samples parses to empty tables
    f2 = parse_mp4(write_mp4([], [_audio(9)]))
    assert f2.tracks[9].codec == "mp3" and f2.samples == []


def test_mp4_faststart_layout_parses():
    """moov-first (faststart) ordering: stco offsets are absolute, so
    reordering ftyp+moov+mdat must demux identically."""
    samples = [(1, i * 26, True, bytes([i + 1] * 20)) for i in range(4)]
    blob = write_mp4(samples, [_audio()], chunk_every=3)
    # split the top-level boxes
    boxes = []
    pos = 0
    while pos < len(blob):
        size = int.from_bytes(blob[pos : pos + 4], "big")
        boxes.append((blob[pos + 4 : pos + 8], blob[pos : pos + size]))
        pos += size
    by = dict(boxes)
    # mdat now sits after moov: every stco offset shifts by len(moov)
    shift = len(by[b"moov"])
    moov = bytearray(by[b"moov"])
    idx = bytes(moov).find(b"stco")
    n = int.from_bytes(moov[idx + 8 : idx + 12], "big")
    for i in range(n):
        at = idx + 12 + 4 * i
        off = int.from_bytes(moov[at : at + 4], "big")
        moov[at : at + 4] = (off + shift).to_bytes(4, "big")
    fast = by[b"ftyp"] + bytes(moov) + by[b"mdat"]
    f = parse_mp4(fast)
    assert _norm(f.samples) == _norm(samples)


def test_mp4_largesize_box():
    """A size=1 (64-bit largesize) mdat parses identically."""
    samples = [(1, i * 26, True, bytes([i + 1] * 10)) for i in range(3)]
    blob = write_mp4(samples, [_audio()], chunk_every=2)
    # rewrite the mdat box header to the largesize form (stco offsets
    # shift by 8, so patch them too)
    pos = 0
    out = bytearray()
    mdat_at = None
    while pos < len(blob):
        size = int.from_bytes(blob[pos : pos + 4], "big")
        four = blob[pos + 4 : pos + 8]
        if four == b"mdat":
            mdat_at = pos
            body = blob[pos + 8 : pos + size]
            out += (
                (1).to_bytes(4, "big")
                + b"mdat"
                + (16 + len(body)).to_bytes(8, "big")
                + body
            )
        else:
            out += blob[pos : pos + size]
        pos += size
    assert mdat_at is not None
    # patch stco entries: every offset past mdat_at grows by 8
    idx = bytes(out).find(b"stco")
    n = int.from_bytes(out[idx + 8 : idx + 12], "big")
    for i in range(n):
        at = idx + 12 + 4 * i
        off = int.from_bytes(out[at : at + 4], "big")
        if off > mdat_at:
            out[at : at + 4] = (off + 8).to_bytes(4, "big")
    f = parse_mp4(bytes(out))
    assert _norm(f.samples) == _norm(samples)


def test_mp4_randomized_matrix():
    """Seeded matrix over track counts × chunk sizes × sample-size
    distributions × keyframe patterns × timescales: every sample
    round-trips bit-exactly with its timestamp and sync flag."""
    rng = np.random.default_rng(23)
    for trial in range(40):
        n_tracks = int(rng.integers(1, 4))
        tracks, samples = [], []
        for t in range(n_tracks):
            tid = t + 1
            kind = "audio" if rng.integers(0, 2) else "video"
            if kind == "audio":
                tracks.append(_audio(tid))
            else:
                tracks.append(
                    _video(tid, ("raw", "jpeg")[int(rng.integers(0, 2))])
                )
            n = int(rng.integers(1, 12))
            delta = int(rng.integers(1, 2000))
            for i in range(n):
                payload = bytes(
                    rng.integers(0, 256, int(rng.integers(1, 80))).astype(
                        np.uint8
                    )
                )
                key = kind == "audio" or bool(rng.integers(0, 2))
                samples.append((tid, i * delta, key, payload))
        blob = write_mp4(
            samples, tracks, chunk_every=int(rng.integers(1, 6))
        )
        f = parse_mp4(blob)
        assert _norm(f.samples) == _norm(samples), f"trial {trial}"
        assert set(f.tracks) == {t.track_id for t in tracks}


def test_mp4_fuzz_fail_loudly():
    """r10 contract: truncation + byte flips either parse or raise
    ValueError — no IndexError/KeyError/MemoryError escapes, no
    unbounded allocation, no hang."""
    rng = np.random.default_rng(31)
    samples = [(1, i * 26, True, bytes([i] * 30)) for i in range(4)]
    samples += [(2, i * 40, i % 2 == 0, bytes([i] * 9)) for i in range(5)]
    blob = write_mp4(samples, [_audio(), _video()], chunk_every=3)
    for cut in range(0, len(blob), max(1, len(blob) // 120)):
        try:
            parse_mp4(blob[:cut])
        except ValueError:
            pass
    for _ in range(800):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_mp4(bytes(b))
        except ValueError:
            pass


def test_mp4_rejects_junk():
    with pytest.raises(ValueError):
        parse_mp4(b"not an mp4 file at all........")
    with pytest.raises(ValueError):
        parse_mp4(b"")
    # a file with ftyp but no moov
    from asid_v2_data_pipeline_spark.functions.mp4 import _box

    with pytest.raises(ValueError, match="moov"):
        parse_mp4(_box("ftyp", b"isom\x00\x00\x02\x00isom"))


def test_mp4_fragmented_equals_progressive():
    """r11 (VERDICT r10 task 2): the same content muxed fragmented
    (moof/traf/trun) demuxes to exactly the samples the progressive
    layout yields — across all three base-data-offset conventions and
    with/without tfdt anchoring."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        write_mp4_fragmented,
    )

    samples = [(1, i * 1152, True, bytes([i]) * (20 + i)) for i in range(11)]
    samples += [(2, i * 40, i % 3 == 0, bytes([99 - i]) * (5 + i)) for i in range(7)]
    tracks = [_audio(), _video()]
    base = _norm(parse_mp4(write_mp4(samples, tracks)).samples)
    for mode in ("moof", "explicit", "implicit"):
        for tfdt in (True, False):
            got = parse_mp4(
                write_mp4_fragmented(
                    samples, tracks, frag_samples=3,
                    base_mode=mode, with_tfdt=tfdt,
                )
            )
            assert _norm(got.samples) == base, (mode, tfdt)
            assert got.tracks[1].codec == "mp3"
            assert got.tracks[2].codec == "raw"


def test_mp4_fragmented_randomized_matrix():
    """Seeded matrix over fragment sizes, track mixes and conventions."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        write_mp4_fragmented,
    )

    rng = np.random.default_rng(47)
    for trial in range(25):
        n_tracks = int(rng.integers(1, 4))
        tracks = []
        samples = []
        for t in range(n_tracks):
            tid = t + 1
            is_audio = bool(rng.integers(0, 2))
            if is_audio:
                tracks.append(_audio(tid))
            else:
                tracks.append(_video(tid))
            n = int(rng.integers(0, 12))
            delta = int(rng.integers(1, 200))
            for i in range(n):
                samples.append(
                    (
                        tid,
                        i * delta,
                        # write_mp4 emits stss (and so preserves
                        # non-sync flags) only for video tracks;
                        # audio samples are all-sync, as in practice
                        True if is_audio else bool(rng.integers(0, 2)),
                        bytes(
                            rng.integers(
                                0, 256, int(rng.integers(1, 40))
                            ).astype(np.uint8)
                        ),
                    )
                )
        mode = ("moof", "explicit", "implicit")[int(rng.integers(0, 3))]
        frag = int(rng.integers(1, 6))
        base = _norm(parse_mp4(write_mp4(samples, tracks)).samples)
        got = parse_mp4(
            write_mp4_fragmented(
                samples, tracks, frag_samples=frag, base_mode=mode,
                with_tfdt=bool(rng.integers(0, 2)),
            )
        )
        assert _norm(got.samples) == base, (trial, mode, frag)


def test_mp4_fragmented_fuzz_fail_loudly():
    """The r10 truncation+flip fuzz contract extended to fragment
    boxes (moof/mfhd/traf/tfhd/tfdt/trun)."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        write_mp4_fragmented,
    )

    rng = np.random.default_rng(59)
    samples = [(1, i * 26, True, bytes([i] * 30)) for i in range(6)]
    samples += [(2, i * 40, i % 2 == 0, bytes([i] * 9)) for i in range(5)]
    blob = write_mp4_fragmented(
        samples, [_audio(), _video()], frag_samples=2
    )
    for cut in range(0, len(blob), max(1, len(blob) // 120)):
        try:
            parse_mp4(blob[:cut])
        except ValueError:
            pass
    for _ in range(800):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_mp4(bytes(b))
        except ValueError:
            pass


def test_mp4_fragment_negative_data_offset_raises():
    """r12 (ADVICE): a crafted trun data-offset that lands before the
    file start must raise, not slice from the end of the buffer (the
    advisor's repro: doff=-10000 previously yielded empty samples)."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        write_mp4_fragmented,
    )

    samples = [(1, i * 26, True, bytes([i] * 12)) for i in range(4)]
    blob = write_mp4_fragmented(
        samples, [_audio()], frag_samples=10, base_mode="moof"
    )
    bad = bytearray(blob)
    at = bad.find(b"trun")
    # trun payload: ver/flags(4) count(4) data-offset(i32) — the writer
    # always sets the data-offset flag in "moof" mode
    doff_at = at + 4 + 4 + 4
    bad[doff_at : doff_at + 4] = (-10000).to_bytes(4, "big", signed=True)
    with pytest.raises(ValueError, match="before file start"):
        parse_mp4(bytes(bad))


def test_mp4_fragmented_largesize_moof_header():
    """r12 (ADVICE): moof box addressing now comes from the iterator's
    header start, not a fourcc-lookback heuristic (which misreads a
    largesize moof whose u64 size's low 4 bytes spell 'moof').  Pin the
    mechanism: a largesize-header moof in default-base-is-moof mode
    must demux identically to the normal-header layout."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        _iter_boxes_full,
        write_mp4_fragmented,
    )

    samples = [(1, i * 26, True, bytes([i + 1] * 14)) for i in range(4)]
    blob = write_mp4_fragmented(
        samples, [_audio()], frag_samples=10, base_mode="moof"
    )
    base = _norm(parse_mp4(blob).samples)
    # rewrite the single moof header to the largesize form; the mdat
    # body moves +8 relative to the moof first byte, so the (moof-
    # relative) trun data-offset grows by 8
    at = blob.find(b"moof") - 4
    size = int.from_bytes(blob[at : at + 4], "big")
    widened = bytearray(
        blob[:at]
        + (1).to_bytes(4, "big")
        + b"moof"
        + (size + 8).to_bytes(8, "big")
        + blob[at + 8 :]
    )
    ta = bytes(widened).find(b"trun")
    doff_at = ta + 4 + 4 + 4
    old = int.from_bytes(
        widened[doff_at : doff_at + 4], "big", signed=True
    )
    widened[doff_at : doff_at + 4] = (old + 8).to_bytes(
        4, "big", signed=True
    )
    assert _norm(parse_mp4(bytes(widened)).samples) == base
    # structural: the iterator reports the true header start for both
    # header forms (normal at body-8, largesize at body-16)
    for name, hdr, body, _end in _iter_boxes_full(
        bytes(widened), 0, len(widened)
    ):
        if name == "moof":
            assert body - hdr == 16
        else:
            assert body - hdr == 8


def test_mp4_fragment_malformed_raise():
    """Structural fragment corruption raises with a useful message."""
    from asid_v2_data_pipeline_spark.functions.mp4 import (
        _box,
        _full,
        _u32,
        write_mp4_fragmented,
    )

    samples = [(1, i * 26, True, bytes([i] * 12)) for i in range(4)]
    good = write_mp4_fragmented(samples, [_audio()], frag_samples=2)
    # traf for an unknown track id
    bad = bytearray(good)
    at = bad.find(b"tfhd")
    bad[at + 8 : at + 12] = _u32(77)
    with pytest.raises(ValueError, match="unknown track"):
        parse_mp4(bytes(bad))
    # trun count exceeding the box
    bad = bytearray(good)
    at = bad.find(b"trun")
    bad[at + 8 : at + 12] = _u32(1 << 24)
    with pytest.raises(ValueError, match="trun"):
        parse_mp4(bytes(bad))
    # a moof with no mfhd
    frag = _box("moof", _box("traf", _full("tfhd", 0, 0, _u32(1))))
    head = good[: good.find(b"moof") - 4]
    with pytest.raises(ValueError, match="mfhd"):
        parse_mp4(bytes(head) + frag)
