"""Ogg container (RFC 3533) + FLAC-in-Ogg mapping (§2.11 container
family).  Round trips across lacing edges (empty packets, exact-255
multiples, page-spanning packets), CRC/sequence/continuation
validation, a seeded randomized matrix (the r10 discipline), and the
r10 truncation+flip fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.flac import (
    parse_flac,
    write_flac,
)
from asid_v2_data_pipeline_spark.functions.ogg import (
    ogg_crc,
    parse_ogg,
    parse_ogg_flac,
    write_ogg,
    write_ogg_flac,
)


def test_ogg_crc_known_properties():
    # CRC of empty input is 0; one zero byte is the poly-driven value;
    # determinism and sensitivity
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"a") == ogg_crc(b"a") != ogg_crc(b"b")


def test_ogg_packet_roundtrip_lacing_edges():
    p255 = bytes(range(256)) [:255]
    cases = [
        [(b"", 1)],
        [(b"x", 1)],
        [(p255, 2)],  # exact 255: needs the 0-lace terminator
        [(p255 * 3, 3)],
        [(b"hdr", 0), (bytes(70000), 5), (b"tail", 9)],  # spans pages
        [(bytes([i]) * (i * 37 % 800), i) for i in range(1, 30)],
    ]
    for packets in cases:
        for ppp in (1, 3, 8):
            data = write_ogg(packets, serial=7, packets_per_page=ppp)
            got = parse_ogg(data)[7]
            assert [p for _, p in got] == [p for p, _ in packets]
            # completed packets carry the granule of their final page
            done = [g for g, _ in got]
            assert done[-1] == packets[-1][1]


def test_ogg_validation_is_loud():
    data = write_ogg([(b"alpha", 1), (b"beta", 2)])
    # CRC flip
    bad = bytearray(data)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError):
        parse_ogg(bytes(bad))
    # capture pattern
    with pytest.raises(ValueError, match="capture"):
        parse_ogg(b"NotO" + data[4:])
    # truncation mid-body
    with pytest.raises(ValueError):
        parse_ogg(data[:-3])
    # sequence gap: drop the middle page if multi-page
    pages = []
    pos = 0
    while pos < len(data):
        nseg = data[pos + 26]
        body = sum(data[pos + 27 : pos + 27 + nseg])
        end = pos + 27 + nseg + body
        pages.append(data[pos:end])
        pos = end
    if len(pages) >= 3:
        with pytest.raises(ValueError, match="sequence"):
            parse_ogg(pages[0] + b"".join(pages[2:]))


def test_ogg_flac_roundtrip_and_granules():
    rng = np.random.default_rng(3)
    pcm = rng.integers(-15000, 15000, (300, 2)).astype(np.int64)
    blob = write_flac(pcm, sample_rate=16000, block_size=16)
    ogg = write_ogg_flac(blob)
    native, n_frames = parse_ogg_flac(ogg)
    assert native == blob
    assert n_frames == -(-300 // 16)
    rate, bits, s = parse_flac(native)
    assert rate == 16000 and bits == 16 and (s == pcm).all()
    # the last completed audio packet's granule is the total samples
    packets = parse_ogg(ogg)[1]
    assert packets[-1][0] == 300


def test_ogg_randomized_matrix():
    """Seeded matrix over packet counts × sizes (incl. 255-multiples
    and page-spanners) × packets_per_page × serials: bit-exact packet
    recovery in order."""
    rng = np.random.default_rng(29)
    for trial in range(40):
        n = int(rng.integers(1, 25))
        packets = []
        for i in range(n):
            kind = int(rng.integers(0, 4))
            if kind == 0:
                size = int(rng.integers(0, 40))
            elif kind == 1:
                size = 255 * int(rng.integers(1, 4))
            elif kind == 2:
                size = int(rng.integers(0, 3000))
            else:
                size = int(rng.integers(60000, 80000))  # spans pages
            payload = bytes(
                rng.integers(0, 256, size).astype(np.uint8)
            )
            packets.append((payload, i))
        data = write_ogg(
            packets,
            serial=int(rng.integers(0, 1 << 31)),
            packets_per_page=int(rng.integers(1, 12)),
        )
        streams = parse_ogg(data)
        (got,) = streams.values()
        assert [p for _, p in got] == [p for p, _ in packets], (
            f"trial {trial}"
        )


def test_ogg_fuzz_fail_loudly():
    """r10 contract: truncation + byte flips either parse or raise
    ValueError — CRC catches corruption, bounds-checked lacing catches
    truncation; no IndexError escapes, no hang."""
    rng = np.random.default_rng(37)
    pcm = rng.integers(-8000, 8000, (120, 2)).astype(np.int64)
    blob = write_ogg_flac(write_flac(pcm, block_size=16))

    def run(b: bytes) -> None:
        native, _ = parse_ogg_flac(b)
        parse_flac(native)

    for cut in range(0, len(blob), max(1, len(blob) // 100)):
        try:
            run(blob[:cut])
        except ValueError:
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            run(bytes(b))
        except ValueError:
            pass
