"""Vorbis I header codec (the r11 bounded spike, VERDICT r10 task 5):
identification/comment/setup round trips, full setup-topology
parsing (codebooks ordered/unordered/sparse, VQ lookup lattices,
floor1, residue2, mappings, modes), the Ogg-Vorbis mapping, and the
fuzz contract.  The packet decode (floor/residue/MDCT) is the
adjudicated boundary documented in SCALE.md §Vorbis."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.vorbis import (
    _BitReader,
    _BitWriter,
    float32_pack,
    float32_unpack,
    ilog,
    lookup1_values,
    parse_ogg_vorbis,
    parse_setup,
    parse_vorbis_headers,
    write_ogg_vorbis,
    write_vorbis_headers,
)


def test_spec_primitives():
    # ilog examples straight from the Vorbis I spec §9.2.1
    assert [ilog(0), ilog(1), ilog(2), ilog(3), ilog(4), ilog(7)] == [
        0, 1, 2, 2, 3, 3,
    ]
    assert lookup1_values(6, 2) == 2
    assert lookup1_values(9, 2) == 3
    assert lookup1_values(8, 3) == 2
    assert float32_unpack(float32_pack(1, 788)) == 1.0
    assert float32_unpack(float32_pack(3, 787)) == 1.5
    assert float32_unpack(float32_pack(1, 788, neg=True)) == -1.0


def test_bit_order_lsb_first():
    w = _BitWriter()
    w.write(0b101, 3)
    w.write(0b01, 2)
    b = w.bytes()
    r = _BitReader(b)
    assert r.read(3) == 0b101
    assert r.read(2) == 0b01
    with pytest.raises(ValueError):
        r.read(8)


def test_header_triple_roundtrip():
    hdrs = write_vorbis_headers(
        2, 44100, {"TITLE": "a=b=c", "ARTIST": "x"}, bitrate_nominal=96000
    )
    info = parse_vorbis_headers(hdrs)
    assert info["channels"] == 2
    assert info["sample_rate"] == 44100
    assert info["bitrate_nominal"] == 96000
    assert info["blocksize_0"] == 256 and info["blocksize_1"] == 2048
    assert info["tags"] == {"TITLE": "a=b=c", "ARTIST": "x"}
    setup = info["setup"]
    assert len(setup["codebooks"]) == 3
    cb0, cb1, cb2 = setup["codebooks"]
    # unordered dense with a type-1 VQ lattice
    assert cb0["lookup_type"] == 1
    assert cb0["quantvals"] == lookup1_values(
        cb0["entries"], cb0["dims"]
    )
    assert len(cb0["multiplicands"]) == cb0["quantvals"]
    # sparse book: unused entries have length 0
    assert 0 in cb2["lengths"] and max(cb2["lengths"]) > 0
    fl = setup["floors"][0]
    assert fl["type"] == 1 and fl["x_list"][0] == 0
    rs = setup["residues"][0]
    assert rs["type"] == 2 and rs["books"][0][0] is not None
    assert setup["mappings"][0]["coupling_steps"] == [(0, 1)]
    assert [m["blockflag"] for m in setup["modes"]] == [False, True]


def test_ogg_mapping_roundtrip_matrix():
    rng = np.random.default_rng(61)
    for trial in range(20):
        ch = int(rng.integers(1, 5))
        rate = int(rng.integers(8000, 192001))
        n_pkts = int(rng.integers(0, 9))
        tags = {
            f"K{i}": "v" * int(rng.integers(0, 30))
            for i in range(int(rng.integers(0, 5)))
        }
        blob = write_ogg_vorbis(ch, rate, tags, n_audio_packets=n_pkts)
        info = parse_ogg_vorbis(blob)
        assert info["channels"] == ch, trial
        assert info["sample_rate"] == rate
        assert info["tags"] == tags
        assert info["n_audio_packets"] == n_pkts
        assert info["last_granule"] == n_pkts * 128


def test_malformed_raise():
    good = write_vorbis_headers(1, 8000, {})
    # wrong packet type
    with pytest.raises(ValueError, match="header packet"):
        parse_vorbis_headers([good[1], good[1], good[2]])
    # nonzero version
    bad = bytearray(good[0])
    bad[7] = 1
    with pytest.raises(ValueError, match="version"):
        parse_vorbis_headers([bytes(bad), good[1], good[2]])
    # setup codebook sync corrupted
    bad = bytearray(good[2])
    bad[8] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        parse_setup(bytes(bad), 1)
    # over-subscribed codebook: four length-1 codewords
    from asid_v2_data_pipeline_spark.functions.vorbis import (
        _SYNC_BCV,
        _VORBIS,
    )

    w = _BitWriter()
    w.write(0, 8)  # one codebook
    w.write(_SYNC_BCV, 24)
    w.write(1, 16)  # dims
    w.write(4, 24)  # entries
    w.flag(False)  # unordered
    w.flag(False)  # dense
    for _ in range(4):
        w.write(0, 5)  # length 1 each
    w.write(0, 4)  # lookup 0
    pkt = b"\x05" + _VORBIS + w.bytes()
    with pytest.raises(ValueError, match="over-subscribed"):
        parse_setup(pkt, 1)
    # not an ogg-vorbis stream
    from asid_v2_data_pipeline_spark.functions.ogg import write_ogg

    with pytest.raises(ValueError, match="no Vorbis"):
        parse_ogg_vorbis(write_ogg([(b"\x7fFLACxxxx", 0)]))


def test_fuzz_never_hangs():
    """Truncation + byte flips on the Ogg-Vorbis stream raise
    ValueError (or UnicodeDecodeError from strict tag decoding) or
    parse — never IndexError/MemoryError, never a hang."""
    rng = np.random.default_rng(67)
    blob = write_ogg_vorbis(
        2, 44100, {"TITLE": "fuzz target"}, n_audio_packets=3
    )
    for cut in range(0, len(blob), max(1, len(blob) // 100)):
        try:
            parse_ogg_vorbis(blob[:cut])
        except (ValueError, UnicodeDecodeError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            parse_ogg_vorbis(bytes(b))
        except (ValueError, UnicodeDecodeError):
            pass


def test_vorbis_meta_query_shape(spark):
    """The mm_ogg_vorbis_meta fixture+operator path end-to-end on a
    tiny frame (full parity runs in test_oracle_parity)."""
    import pandas as pd

    from asid_v2_data_pipeline_spark.functions.vorbis import (
        write_ogg_vorbis,
    )
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        extract_vorbis_meta,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [7],
                "payload": [
                    write_ogg_vorbis(
                        2, 22050, {"TITLE": "t"}, n_audio_packets=4
                    )
                ],
            }
        )
    )
    row = extract_vorbis_meta(media).collect()[0]
    assert (row.channels, row.sample_rate) == (2, 22050)
    assert row.n_codebooks == 3 and row.n_modes == 2
    assert row.n_audio_packets == 4 and row.last_granule == 512
