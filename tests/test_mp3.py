"""MP3 Layer III codec: Huffman table validity, bitstream structure
(cross-checked against the independent frame-walk in functions/id3),
exact agreement of the vectorized fixed-point decoder with a scalar
pure-Python model, state carry across frames, ID3 prefixes, and the
disclosed NotImplementedError boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions import mp3
from asid_v2_data_pipeline_spark.functions.id3 import (
    parse_mp3_frames,
    write_id3,
)


def _rand(n_frames: int, seed: int):
    rng = np.random.default_rng(seed)
    q = rng.integers(-1, 2, size=(n_frames, 2, 576))
    sf = rng.integers(0, 8, size=(n_frames, 2, 21))
    return q, sf


def _scalar_requant(q, sf, gg):
    """Scalar requantization: (frames, 2, 576) quantized values +
    (frames, 2, 21) scalefactors -> list of per-granule x vectors."""
    lut = mp3.requant_lut(gg)
    sfb = mp3.SFB_LONG_44100
    out = []
    for f in range(q.shape[0]):
        for g in range(2):
            x = [0] * 576
            for band in range(22):
                s = int(sf[f, g, band]) if band < 21 else 0
                for i in range(sfb[band], sfb[band + 1]):
                    v = int(q[f, g, i])
                    x[i] = (1 if v > 0 else -1) * lut[s] if v else 0
            out.append(x)
    return out


def _scalar_reconstruct(x_vectors):
    """Independent straight-from-the-docstring scalar model of the
    fixed-point reconstruction from requantized granule vectors: same
    tables, no NumPy matmuls, plain Python loops — pins the vectorized
    decoder's every index."""
    rd = lambda a, b: (2 * a + b) // (2 * b)
    overlap = [[0] * 18 for _ in range(32)]
    vfifo = [[0] * 64 for _ in range(16)]
    out = []
    for x in x_vectors:
            # alias butterflies
            xa = [v * 1024 for v in x]
            for b in range(1, 32):
                for i in range(8):
                    u, l = 18 * b - 1 - i, 18 * b + i
                    xa[u] = x[u] * int(mp3._CS[i]) - x[l] * int(mp3._CA[i])
                    xa[l] = x[l] * int(mp3._CS[i]) + x[u] * int(mp3._CA[i])
            # IMDCT + window + overlap + inversion
            ts = [[0] * 18 for _ in range(32)]
            for sb in range(32):
                for n in range(36):
                    acc = sum(
                        xa[18 * sb + i] * int(mp3._CW36[n, i])
                        for i in range(18)
                    )
                    z = rd(acc, 1 << 20)
                    if n < 18:
                        ts[sb][n] = z + overlap[sb][n]
                    else:
                        overlap[sb][n - 18] = z
            for sb in range(1, 32, 2):
                for n in range(1, 18, 2):
                    ts[sb][n] = -ts[sb][n]
            # synthesis
            for n in range(18):
                v = [
                    sum(
                        int(mp3._NMAT[i, j]) * ts[j][n] for j in range(32)
                    )
                    for i in range(64)
                ]
                vfifo = [v] + vfifo[:15]
                for j in range(32):
                    acc = sum(
                        vfifo[i][j + 32 * (i % 2)]
                        * int(mp3._DWIN[j + 32 * i])
                        for i in range(16)
                    )
                    p = rd(acc, 1 << 20)
                    out.append(max(-32768, min(32767, p)))
    return np.asarray(out, dtype=np.int16)


def _scalar_pipeline(q, sf, gg):
    return _scalar_reconstruct(_scalar_requant(q, sf, gg))


def test_huffman_table_prefix_free_and_complete():
    codes = [(c, ln) for c, ln in mp3._HUFF1.values()]
    bits = [format(c, f"0{ln}b") for c, ln in codes]
    assert len(set(bits)) == 4
    for a in bits:
        for b in bits:
            if a != b:
                assert not b.startswith(a)
    assert sum(2.0 ** -ln for _, ln in codes) == 1.0  # Kraft: complete


def test_bitstream_walks_and_has_exact_layout():
    q, sf = _rand(3, 1)
    blob = mp3.write_mp3_l3(q, sf)
    assert len(blob) == 3 * 1044
    meta = parse_mp3_frames(blob)
    assert meta == {
        "n_frames": 3,
        "sample_rate": 44100,
        "kbps_sum": 960,
        "duration_us": 3 * 1152 * 1_000_000 // 44100,
        "version": "1",
        "layer": 3,
    }


@pytest.mark.parametrize("seed", [2, 3])
def test_decode_matches_scalar_model(seed):
    q, sf = _rand(2, seed)
    rate, pcm = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf))
    assert rate == 44100
    want = _scalar_pipeline(q, sf, mp3._GG_DEFAULT)
    np.testing.assert_array_equal(pcm, want)


def test_state_carries_across_frames():
    """Decoding a 2-frame stream must equal the scalar model run over
    both frames — the overlap tails and the V FIFO cross the frame
    boundary (a fresh-state-per-frame bug would match frame 1 only)."""
    q, sf = _rand(2, 11)
    _, pcm = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf))
    _, first = mp3.parse_mp3_l3(mp3.write_mp3_l3(q[:1], sf[:1]))
    np.testing.assert_array_equal(pcm[:1152], first)
    assert not np.array_equal(
        pcm[1152:], mp3.parse_mp3_l3(mp3.write_mp3_l3(q[1:], sf[1:]))[1]
    )


def test_id3_prefixed_stream_decodes():
    q, sf = _rand(1, 5)
    blob = write_id3({"TIT2": "t"}) + mp3.write_mp3_l3(q, sf)
    rate, pcm = mp3.parse_mp3_l3(blob)
    assert rate == 44100 and pcm.shape == (1152,)


def test_clamp_at_high_gain():
    q = np.ones((1, 2, 576), dtype=np.int64)
    sf = np.zeros((1, 2, 21), dtype=np.int64)
    _, pcm = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf, global_gain=230))
    assert pcm.min() == -32768 and pcm.max() == 32767


def test_disclosed_boundaries_raise():
    q, sf = _rand(1, 9)
    # flipping the protection bit on a CRC-less stream: the "word" is
    # two bytes of side info, so verification fails loudly (r9)
    blob = bytearray(mp3.write_mp3_l3(q, sf))
    blob[1] &= 0xFE  # protection bit 0 = CRC present
    with pytest.raises(ValueError, match="CRC mismatch"):
        mp3.parse_mp3_l3(bytes(blob))
    # main_data_begin pointing before the stream start is malformed
    # (the reservoir itself is implemented in r9)
    blob = bytearray(mp3.write_mp3_l3(q, sf))
    blob[4] = 0x80
    with pytest.raises(ValueError, match="reservoir underflow"):
        mp3.parse_mp3_l3(bytes(blob))
    with pytest.raises(ValueError, match="lost sync"):
        mp3.parse_mp3_l3(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="spectra"):
        mp3.write_mp3_l3(np.zeros((1, 2, 10)), np.zeros((1, 2, 21)))
    with pytest.raises(ValueError, match="table-1"):
        mp3.write_mp3_l3(
            np.full((1, 2, 576), 2), np.zeros((1, 2, 21))
        )


def test_stereo_decode_matches_per_channel_scalar_model():
    """Stereo (independent channels): each channel carries its own
    overlap + filterbank state, so the decode must equal the scalar
    model run per channel; the mono path is byte-compatible with the
    channel-0 extraction of a stereo stream built from the same data."""
    rng = np.random.default_rng(21)
    q = rng.integers(-1, 2, size=(2, 2, 2, 576))
    sf = rng.integers(0, 8, size=(2, 2, 2, 21))
    blob = mp3.write_mp3_l3(q, sf)
    assert len(blob) == 2 * 1044
    meta = parse_mp3_frames(blob)
    assert meta["n_frames"] == 2 and meta["sample_rate"] == 44100
    rate, pcm = mp3.parse_mp3_l3(blob)
    assert rate == 44100 and pcm.shape == (2304, 2)
    for ch in range(2):
        want = _scalar_pipeline(q[:, :, ch], sf[:, :, ch], mp3._GG_DEFAULT)
        np.testing.assert_array_equal(pcm[:, ch], want)


def test_joint_stereo_modes_and_dual_channel():
    q = np.zeros((1, 2, 2, 576), np.int64)
    sf = np.zeros((1, 2, 2, 21), np.int64)
    blob = bytearray(mp3.write_mp3_l3(q, sf))
    # dual channel (mode 10): two independent channels, decodes
    blob[3] = (blob[3] & 0x3F) | 0x80
    rate, pcm = mp3.parse_mp3_l3(bytes(blob))
    assert pcm.shape == (1152, 2)
    # joint stereo with mode_ext 00 = no joint coding: plain stereo
    blob[3] = (blob[3] & 0x0F) | 0x40
    assert mp3.parse_mp3_l3(bytes(blob))[1].shape == (1152, 2)
    # intensity (mode_ext bit 0) now decodes (r9) — with full big_values
    # on both channels the bound is 576, so no band is intensity-coded
    blob[3] = (blob[3] & 0x0F) | 0x40 | 0x10
    assert mp3.parse_mp3_l3(bytes(blob))[1].shape == (1152, 2)
    # combined MS + intensity (mode_ext 11) stays a disclosed boundary
    blob[3] = (blob[3] & 0x0F) | 0x40 | 0x30
    with pytest.raises(NotImplementedError, match="MS \\+ intensity"):
        mp3.parse_mp3_l3(bytes(blob))


def test_ms_stereo_matches_scalar_recombination():
    """Mid/side joint stereo: the decoder recombines the requantized
    M/S spectra as L,R = rdiv((M ± S)·724, 2^10) — pinned against the
    scalar requant + explicit recombination + scalar reconstruction
    per channel (independent states)."""
    rng = np.random.default_rng(31)
    q = rng.integers(-1, 2, size=(2, 2, 2, 576))
    sf = rng.integers(0, 8, size=(2, 2, 2, 21))
    blob = mp3.write_mp3_l3(q, sf, stereo_mode="ms")
    rate, pcm = mp3.parse_mp3_l3(blob)
    assert rate == 44100 and pcm.shape == (2304, 2)
    rd = lambda a, b: (2 * a + b) // (2 * b)
    xm = _scalar_requant(q[:, :, 0], sf[:, :, 0], mp3._GG_DEFAULT)
    xs = _scalar_requant(q[:, :, 1], sf[:, :, 1], mp3._GG_DEFAULT)
    left, right = [], []
    for m, s in zip(xm, xs):
        left.append([rd((a + b) * 724, 1 << 10) for a, b in zip(m, s)])
        right.append([rd((a - b) * 724, 1 << 10) for a, b in zip(m, s)])
    np.testing.assert_array_equal(pcm[:, 0], _scalar_reconstruct(left))
    np.testing.assert_array_equal(pcm[:, 1], _scalar_reconstruct(right))

    with pytest.raises(ValueError, match="joint stereo"):
        mp3.write_mp3_l3(
            np.zeros((1, 2, 576)), np.zeros((1, 2, 21)), stereo_mode="ms"
        )


# ------------------------------------------------------- general profile (r9)


def test_table2_and_count1b_codes_are_prefix_free_and_complete():
    for table, width in ((mp3._HUFF2, None), (mp3._C1B, 4),
                         (mp3._C1A, None)):
        codes = sorted(
            (ln, code) for (code, ln) in table.values()
        )
        # Kraft sum exactly 1 = complete; pairwise prefix-freedom
        assert sum(2.0 ** -ln for ln, _ in codes) == 1.0
        bits = [format(c, f"0{ln}b") for ln, c in codes]
        for i, a in enumerate(bits):
            for b in bits[i + 1 :]:
                assert not b.startswith(a), (a, b)
        if width:
            assert all(ln == width for ln, _ in codes)


def _plain_long_granule(q576, sf21, **kw):
    g = {
        "block_type": 0,
        "spectrum": q576,
        "big_values": 288,
        "count1": 0,
        "scalefacs": sf21,
        "preflag": 0,
        "scalefac_scale": 0,
        "table_select": [1, 1, 1],
    }
    g.update(kw)
    return g


def test_general_writer_plain_frames_match_the_fixture_writer():
    """The general writer with plain long granules (table 1, no
    count1, 320 kbps) must decode to EXACTLY the PCM of the
    self-contained fixture writer on the same spectra — this pins the
    reservoir plumbing, byte alignment and side-info layout against
    the already-oracle-pinned path."""
    q, sf = _rand(3, 33)
    want_rate, want = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf))
    frames = [
        {
            "kbps": 320,
            "scfsi": 0,
            "granules": [
                _plain_long_granule(q[f, g], sf[f, g]) for g in range(2)
            ],
        }
        for f in range(3)
    ]
    blob = mp3.write_mp3_l3_general(frames)
    rate, pcm = mp3.parse_mp3_l3(blob)
    assert rate == want_rate
    np.testing.assert_array_equal(pcm, want)


def test_bit_reservoir_and_vbr_decode_identically():
    """Dropping the bitrate (VBR) forces later frames' main data back
    into earlier frames' slack: main_data_begin goes nonzero, yet the
    decoded PCM is bit-identical to the 320 kbps stream — the
    reservoir is pure transport."""
    q, sf = _rand(4, 34)
    want = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf))[1]
    kbps = [320, 128, 112, 128]
    frames = [
        {
            "kbps": kbps[f],
            "granules": [
                _plain_long_granule(q[f, g], sf[f, g]) for g in range(2)
            ],
        }
        for f in range(4)
    ]
    blob = mp3.write_mp3_l3_general(frames)
    # at least one frame must actually point back into the reservoir
    meta = parse_mp3_frames(blob)
    assert meta["n_frames"] == 4
    mdbs = []
    pos = 0
    for f in range(4):
        h = int.from_bytes(blob[pos : pos + 4], "big")
        flen = 144 * mp3._MP3_BR_L3[(h >> 12) & 0xF] * 1000 // 44100
        mdbs.append(blob[pos + 4] >> 7 << 8 | (blob[pos + 4] & 0x7F) << 1
                    | blob[pos + 5] >> 7)
        pos += flen
    assert any(m > 0 for m in mdbs[1:]), mdbs
    got = mp3.parse_mp3_l3(blob)[1]
    np.testing.assert_array_equal(got, want)
    # underflow: a main_data_begin pointing before the stream raises
    bad = bytearray(mp3.write_mp3_l3(q[:1], sf[:1]))
    bad[4] = 0x80  # main_data_begin = 256 with an empty reservoir
    with pytest.raises(ValueError, match="reservoir underflow"):
        mp3.parse_mp3_l3(bytes(bad))


def test_scfsi_shares_granule0_scalefactors():
    q, sf = _rand(1, 35)
    sf[0, 1, 11:21] = sf[0, 0, 11:21]  # groups 2+3 shared
    want = mp3.parse_mp3_l3(mp3.write_mp3_l3(q, sf))[1]
    frames = [{
        "kbps": 320,
        "scfsi": 0b0011,
        "granules": [
            _plain_long_granule(q[0, g], sf[0, g]) for g in range(2)
        ],
    }]
    blob = mp3.write_mp3_l3_general(frames)
    # the shared groups' bits are genuinely absent from the stream
    plain = mp3.write_mp3_l3_general([{
        "kbps": 320, "scfsi": 0,
        "granules": [
            _plain_long_granule(q[0, g], sf[0, g]) for g in range(2)
        ],
    }])
    np.testing.assert_array_equal(mp3.parse_mp3_l3(blob)[1], want)
    np.testing.assert_array_equal(mp3.parse_mp3_l3(plain)[1], want)
    # mismatched shared bands are an encoder error
    sf2 = sf.copy()
    sf2[0, 1, 12] = (sf2[0, 0, 12] + 1) % 8
    with pytest.raises(ValueError, match="scfsi-shared"):
        mp3.write_mp3_l3_general([{
            "kbps": 320, "scfsi": 0b0011,
            "granules": [
                _plain_long_granule(q[0, g], sf2[0, g]) for g in range(2)
            ],
        }])


def test_table2_count1_preflag_roundtrip_matches_direct_requant():
    """A granule carrying table-2 values (|q| up to 2) in region 0,
    table 1 in region 1, a count1 quadruple region under table B and
    preflag: the decoded PCM equals the reconstruction of the directly
    requantized spectrum (sf + pretab, |q|^(4/3) LUT rows)."""
    rng = np.random.default_rng(36)
    bv, nq = 81, 24  # big values to line 162, quads to line 258
    q = np.zeros(576, np.int64)
    q[:36] = rng.integers(-2, 3, size=36)
    q[36 : 2 * bv] = rng.integers(-1, 2, size=2 * bv - 36)
    q[2 * bv : 2 * bv + 4 * nq] = rng.integers(-1, 2, size=4 * nq)
    sf = rng.integers(0, 8, size=21)
    gran = _plain_long_granule(
        q, sf, big_values=bv, count1=nq, preflag=1,
        table_select=[2, 1, 1],
    )
    zero = _plain_long_granule(np.zeros(576, np.int64),
                               np.zeros(21, np.int64))
    blob = mp3.write_mp3_l3_general(
        [{"kbps": 320, "granules": [gran, zero]}]
    )
    rate, pcm = mp3.parse_mp3_l3(blob)
    # expected: direct requant + the module reconstruction
    lutq = np.array(
        [mp3.requant_lut(mp3._GG_DEFAULT, 0, 16 + 3, q=a)
         for a in (0, 1, 2)], dtype=np.int64,
    )
    sfe = np.concatenate([sf, [0]]) + mp3._PRETAB
    line_sf = np.repeat(sfe, np.diff(mp3.SFB_LONG_44100))
    x = np.sign(q) * lutq[np.abs(q), line_sf]
    st = mp3._SynthState()
    want = np.concatenate([
        mp3._reconstruct_granule(x, st),
        mp3._reconstruct_granule(np.zeros(576, np.int64), st),
    ])
    np.testing.assert_array_equal(pcm, np.clip(want, -32768, 32767)
                                  .astype(np.int16))


def test_window_switching_sequence_start_short_stop():
    """A valid window sequence long→start→short→stop→long decodes; the
    short granule's PCM equals the stored-order requant (per-window
    subblock_gain + short scalefactors) fed through the short
    filterbank, with overlap state carried across block types."""
    rng = np.random.default_rng(37)
    qs = rng.integers(-1, 2, size=(6, 576)).astype(np.int64)
    sfl = rng.integers(0, 8, size=(6, 21))
    sfs3 = rng.integers(0, 8, size=(12, 3))
    sbg = [int(v) for v in rng.integers(0, 8, size=3)]
    bts = [0, 0, 1, 2, 3, 0]
    grans = []
    for i, bt in enumerate(bts):
        if bt == 2:
            grans.append({
                "block_type": 2, "spectrum": qs[i], "big_values": 288,
                "count1": 0, "scalefacs_short": sfs3,
                "subblock_gain": sbg, "scalefac_scale": 0,
                "table_select": [1, 1],
            })
        else:
            grans.append(_plain_long_granule(qs[i], sfl[i],
                                             block_type=bt))
    frames = [
        {"kbps": 320, "granules": grans[2 * f : 2 * f + 2]}
        for f in range(3)
    ]
    rate, pcm = mp3.parse_mp3_l3(mp3.write_mp3_l3_general(frames))
    assert pcm.shape == (3 * 1152,)
    # expected: per-granule requant + reconstruction with one state
    lut1 = np.array(
        [mp3.requant_lut(mp3._GG_DEFAULT, 0, 16 + 3, q=a)
         for a in (0, 1, 2)], dtype=np.int64)
    st = mp3._SynthState()
    parts = []
    for i, bt in enumerate(bts):
        if bt == 2:
            lut_w = np.array(
                [[mp3.requant_lut(mp3._GG_DEFAULT - 8 * sbg[w], 0,
                                  16 + 3, q=a) for a in (0, 1, 2)]
                 for w in range(3)], dtype=np.int64)
            sfs3p = np.vstack([sfs3, np.zeros((1, 3), np.int64)])
            sfl_line = sfs3p[mp3._STORED_SFB, mp3._STORED_WIN]
            x = np.sign(qs[i]) * lut_w[
                mp3._STORED_WIN, np.abs(qs[i]), sfl_line]
        else:
            sfe = np.concatenate([sfl[i], [0]])
            line_sf = np.repeat(sfe, np.diff(mp3.SFB_LONG_44100))
            x = np.sign(qs[i]) * lut1[np.abs(qs[i]), line_sf]
        parts.append(mp3._reconstruct_granule(x, st, block_type=bt))
    want = np.concatenate(parts).astype(np.int16)
    np.testing.assert_array_equal(pcm, want)


def test_intensity_stereo_decodes_with_position_factors():
    """mode 01 / mode_ext 01: bands at/above the right channel's
    transmitted bound split the left carrier by the is_pos tan
    factors; below the bound both channels decode independently."""
    rng = np.random.default_rng(38)
    q = np.zeros((1, 2, 2, 576), np.int64)
    sf = np.zeros((1, 2, 2, 21), np.int64)
    q[:, :, 0] = rng.integers(-1, 2, size=(1, 2, 576))
    q[:, :, 1, : 2 * mp3._IS_BV] = rng.integers(
        -1, 2, size=(1, 2, 2 * mp3._IS_BV))
    sf[:, :, 0] = rng.integers(0, 8, size=(1, 2, 21))
    sf[:, :, 1, :15] = rng.integers(0, 8, size=(1, 2, 15))
    sf[:, :, 1, 15:] = rng.integers(0, 7, size=(1, 2, 6))  # is_pos
    blob = mp3.write_mp3_l3(q, sf, stereo_mode="intensity")
    rate, pcm = mp3.parse_mp3_l3(blob)
    assert pcm.shape == (1152, 2)
    # expected via direct per-granule math
    rd = lambda a, b: (2 * a + b) // (2 * b)
    lut = np.array([mp3.requant_lut(mp3._GG_DEFAULT, 0, 8, q=a)
                    for a in (0, 1, 2)], dtype=np.int64)
    sfb = np.asarray(mp3.SFB_LONG_44100)
    widths = np.diff(sfb)
    sts = [mp3._SynthState(), mp3._SynthState()]
    chans = [[], []]
    for g in range(2):
        xs = []
        for ch in range(2):
            sfe = np.concatenate([sf[0, g, ch], [0]])
            line_sf = np.repeat(sfe, widths)
            xs.append(np.sign(q[0, g, ch])
                      * lut[np.abs(q[0, g, ch]), line_sf])
        for band in range(22):
            if int(sfb[band]) < 2 * mp3._IS_BV:
                continue
            p = int(sf[0, g, 1, min(band, 20)])
            a, b = int(sfb[band]), int(sfb[band + 1])
            xl = xs[0][a:b].copy()
            xs[0][a:b] = rd(xl * int(mp3._IS_KL[p]), 1024)
            xs[1][a:b] = rd(xl * int(mp3._IS_KR[p]), 1024)
        for ch in range(2):
            chans[ch].append(mp3._reconstruct_granule(xs[ch], sts[ch]))
    want = np.stack([np.concatenate(c) for c in chans], axis=1)
    np.testing.assert_array_equal(pcm, want.astype(np.int16))


def test_crc_protected_frames_verify_and_reject_corruption():
    """r9: protection bit 0 carries the MPEG CRC-16 (poly 0x8005,
    preset 0xFFFF) over header bytes 2-3 + the side info; the decoder
    verifies it — clean streams decode identically to their
    unprotected twins, a flipped side-info bit is caught."""
    q, sf = _rand(2, 40)
    plain_frames = [
        {
            "kbps": 320,
            "granules": [
                _plain_long_granule(q[f, g], sf[f, g]) for g in range(2)
            ],
        }
        for f in range(2)
    ]
    want = mp3.parse_mp3_l3(mp3.write_mp3_l3_general(plain_frames))[1]
    for fr in plain_frames:
        fr["crc"] = True
    blob = bytearray(mp3.write_mp3_l3_general(plain_frames))
    assert not blob[1] & 0x01  # protection bit cleared
    got = mp3.parse_mp3_l3(bytes(blob))[1]
    np.testing.assert_array_equal(got, want)
    blob[8] ^= 0x40  # flip a side-info bit inside the protected span
    with pytest.raises(ValueError, match="CRC mismatch"):
        mp3.parse_mp3_l3(bytes(blob))


def test_general_writer_randomized_roundtrip_matrix():
    """Randomized general-profile round-trips (seeded): random block
    sequences (valid window transitions), per-region tables 0/1/2,
    random big_values/count1 splits, VBR rows, random scfsi on
    all-long frames, preflag/scalefac_scale — decoded PCM must equal
    the direct requant + reconstruction of what the encoder was given.
    Guards the whole bitstream transport layer in one sweep."""
    sfb = np.asarray(mp3.SFB_LONG_44100)
    widths = np.diff(sfb)

    def expected(grans, st):
        parts = []
        for g in grans:
            bt = g.get("block_type", 0)
            if bt == 2 and g.get("mixed"):
                sbg = g["subblock_gain"]
                lut_w = np.array(
                    [[mp3.requant_lut(mp3._GG_DEFAULT - 8 * sbg[w],
                                      g["scalefac_scale"], 16 + 3, q=a)
                      for a in (0, 1, 2)] for w in range(3)],
                    dtype=np.int64)
                lutq = np.array(
                    [mp3.requant_lut(mp3._GG_DEFAULT,
                                     g["scalefac_scale"], 16 + 3, q=a)
                     for a in (0, 1, 2)], dtype=np.int64)
                q = np.asarray(g["spectrum"])
                sfe = np.concatenate([np.asarray(g["scalefacs_long"]),
                                      np.zeros(14, np.int64)])
                line_sf = np.repeat(sfe, widths)
                x = np.empty(576, np.int64)
                x[:36] = np.sign(q[:36]) * lutq[np.abs(q[:36]),
                                                line_sf[:36]]
                sfs3p = np.vstack([np.asarray(g["scalefacs_short"]),
                                   np.zeros((1, 3), np.int64)])
                sfl = sfs3p[mp3._STORED_SFB_MIX[36:],
                            mp3._STORED_WIN_MIX[36:]]
                x[36:] = (np.sign(q[36:])
                          * lut_w[mp3._STORED_WIN_MIX[36:],
                                  np.abs(q[36:]), sfl])
                parts.append(mp3._reconstruct_granule(
                    x, st, block_type=2, mixed=True))
                continue
            if bt == 2:
                sbg = g["subblock_gain"]
                lut_w = np.array(
                    [[mp3.requant_lut(mp3._GG_DEFAULT - 8 * sbg[w],
                                      g["scalefac_scale"], 16 + 3, q=a)
                      for a in (0, 1, 2)] for w in range(3)],
                    dtype=np.int64)
                sfs3p = np.vstack([np.asarray(g["scalefacs_short"]),
                                   np.zeros((1, 3), np.int64)])
                sfl = sfs3p[mp3._STORED_SFB, mp3._STORED_WIN]
                q = np.asarray(g["spectrum"])
                x = np.sign(q) * lut_w[mp3._STORED_WIN, np.abs(q), sfl]
            else:
                lutq = np.array(
                    [mp3.requant_lut(mp3._GG_DEFAULT,
                                     g["scalefac_scale"], 16 + 3, q=a)
                     for a in (0, 1, 2)], dtype=np.int64)
                sfe = (np.concatenate([np.asarray(g["scalefacs"]), [0]])
                       + g["preflag"] * mp3._PRETAB)
                line_sf = np.repeat(sfe, widths)
                q = np.asarray(g["spectrum"])
                x = np.sign(q) * lutq[np.abs(q), line_sf]
            parts.append(mp3._reconstruct_granule(x, st, block_type=bt))
        return parts

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        # a valid window sequence over 3 frames (6 granules)
        seqs = [
            [0, 0, 0, 0, 0, 0],
            [0, 1, 2, 2, 3, 0],
            [1, 2, 3, 1, 2, 3],
        ]
        bts = seqs[seed % 3]
        frames = []
        st = mp3._SynthState()
        want_parts = []
        for f in range(3):
            grans = []
            for gi in range(2):
                bt = bts[2 * f + gi]
                if bt == 2:
                    q = rng.integers(-1, 2, size=576)
                    mixed = bool(rng.integers(0, 2))
                    sfs3 = rng.integers(0, 8, size=(12, 3))
                    if mixed:
                        sfs3[:3] = 0
                    grans.append({
                        "block_type": 2, "mixed": mixed, "spectrum": q,
                        "big_values": 288, "count1": 0,
                        "scalefacs_short": sfs3,
                        "scalefacs_long": rng.integers(0, 8, size=8),
                        "subblock_gain": [int(v) for v in
                                          rng.integers(0, 8, size=3)],
                        "scalefac_scale": int(rng.integers(0, 2)),
                        "table_select": [1, 1],
                    })
                else:
                    # random region tables; table 2 allows |q|<=2
                    if bt == 0:
                        tsel = [int(t) for t in
                                rng.choice([0, 1, 2], size=3)]
                        bounds = (36, 162)
                    else:
                        tsel = [int(t) for t in
                                rng.choice([0, 1, 2], size=2)] + [0]
                        bounds = (36, 576)
                    bv = int(rng.integers(20, 289))
                    nq = int(rng.integers(0, (576 - 2 * bv) // 4 + 1))
                    q = np.zeros(576, np.int64)
                    run_start = 0
                    for run_end, t in ((min(bounds[0] // 2, bv),
                                        tsel[0]),
                                       (min(bounds[1] // 2, bv),
                                        tsel[1]),
                                       (bv, tsel[2])):
                        n = max(0, run_end - run_start)
                        if n and t:
                            hi = 3 if t == 2 else 2
                            q[2 * run_start : 2 * run_start + 2 * n] = (
                                rng.integers(-hi + 1, hi, size=2 * n))
                        run_start = max(run_start, run_end)
                    q[2 * bv : 2 * bv + 4 * nq] = rng.integers(
                        -1, 2, size=4 * nq)
                    grans.append({
                        "block_type": bt, "spectrum": q,
                        "big_values": bv, "count1": nq,
                        "count1_table": ["A", "B"][int(
                            rng.integers(0, 2))],
                        "scalefacs": rng.integers(0, 8, size=21),
                        "preflag": int(rng.integers(0, 2)),
                        "scalefac_scale": int(rng.integers(0, 2)),
                        "table_select": tsel,
                    })
            scfsi = 0
            if all(g.get("block_type", 0) == 0 for g in grans):
                scfsi = int(rng.integers(0, 16))
                for gi_, (a, b) in enumerate(
                        ((0, 6), (6, 11), (11, 16), (16, 21))):
                    if (scfsi >> (3 - gi_)) & 1:
                        grans[1]["scalefacs"][a:b] = (
                            grans[0]["scalefacs"][a:b])
            frames.append({
                "kbps": int(rng.choice([160, 224, 256, 320])),
                "scfsi": scfsi,
                "crc": bool(rng.integers(0, 2)),
                "granules": grans,
            })
            want_parts += expected(grans, st)
        blob = mp3.write_mp3_l3_general(frames)
        rate, pcm = mp3.parse_mp3_l3(blob)
        want = np.concatenate(want_parts).astype(np.int16)
        np.testing.assert_array_equal(pcm, want, err_msg=f"seed {seed}")


def test_mixed_blocks_roundtrip_matches_direct_requant():
    """r9: mixed blocks (block_type 2, mixed_block_flag 1) — lines
    0..35 are the two lowest LONG subbands (long sfbs 0..7, one alias
    butterfly at their internal boundary, normal window), lines 36+
    are SHORT starting at short sfb 3 (per-window subblock_gain).
    Decode must equal the direct mixed requant + reconstruction; a
    long→start→mixed→stop sequence carries state across the types."""
    rng = np.random.default_rng(50)
    sfb = np.asarray(mp3.SFB_LONG_44100)
    widths = np.diff(sfb)
    qs = rng.integers(-1, 2, size=(4, 576)).astype(np.int64)
    sfl = rng.integers(0, 8, size=(4, 21))
    sfl8 = rng.integers(0, 8, size=8)
    sfs3 = rng.integers(0, 8, size=(12, 3))
    sfs3[:3] = 0
    sbg = [int(v) for v in rng.integers(0, 8, size=3)]
    bts = [0, 1, 2, 3]
    grans = []
    for i, bt in enumerate(bts):
        if bt == 2:
            grans.append({
                "block_type": 2, "mixed": True, "spectrum": qs[i],
                "big_values": 288, "count1": 0,
                "scalefacs_long": sfl8, "scalefacs_short": sfs3,
                "subblock_gain": sbg, "scalefac_scale": 0,
                "table_select": [1, 1],
            })
        else:
            grans.append(_plain_long_granule(qs[i], sfl[i],
                                             block_type=bt))
    frames = [
        {"kbps": 320, "granules": grans[2 * f : 2 * f + 2]}
        for f in range(2)
    ]
    rate, pcm = mp3.parse_mp3_l3(mp3.write_mp3_l3_general(frames))
    # expected
    lut1 = np.array(
        [mp3.requant_lut(mp3._GG_DEFAULT, 0, 16 + 3, q=a)
         for a in (0, 1, 2)], dtype=np.int64)
    st = mp3._SynthState()
    parts = []
    for i, bt in enumerate(bts):
        if bt == 2:
            lut_w = np.array(
                [[mp3.requant_lut(mp3._GG_DEFAULT - 8 * sbg[w], 0,
                                  16 + 3, q=a) for a in (0, 1, 2)]
                 for w in range(3)], dtype=np.int64)
            sfe = np.concatenate([sfl8, np.zeros(14, np.int64)])
            line_sf = np.repeat(sfe, widths)
            x = np.empty(576, np.int64)
            x[:36] = np.sign(qs[i][:36]) * lut1[np.abs(qs[i][:36]),
                                                line_sf[:36]]
            sfs3p = np.vstack([sfs3, np.zeros((1, 3), np.int64)])
            sfl_line = sfs3p[mp3._STORED_SFB_MIX[36:],
                             mp3._STORED_WIN_MIX[36:]]
            x[36:] = (np.sign(qs[i][36:])
                      * lut_w[mp3._STORED_WIN_MIX[36:],
                              np.abs(qs[i][36:]), sfl_line])
            parts.append(mp3._reconstruct_granule(
                x, st, block_type=2, mixed=True))
        else:
            sfe = np.concatenate([sfl[i], [0]])
            line_sf = np.repeat(sfe, widths)
            x = np.sign(qs[i]) * lut1[np.abs(qs[i]), line_sf]
            parts.append(mp3._reconstruct_granule(x, st, block_type=bt))
    want = np.concatenate(parts).astype(np.int16)
    np.testing.assert_array_equal(pcm, want)
    # a mixed granule with a silent short part still differs from a
    # pure-long granule ONLY through the absent butterflies at
    # boundaries 2..31 (sb1's top lines alias against zeros with
    # cs != 1), so no equality check there — the spec's single-
    # butterfly rule for mixed is exactly what the assert above pins


def test_free_format_streams_decode_by_sync_scan():
    """r9: bitrate index 0 (free format) — the decoder measures the
    stream's constant frame length once by scanning for the next
    matching header and verifies the sync at every later boundary;
    PCM must equal the 320 kbps twin built from the same granules."""
    q, sf = _rand(3, 60)
    frames_std = [
        {
            "kbps": 320,
            "granules": [
                _plain_long_granule(q[f, g], sf[f, g]) for g in range(2)
            ],
        }
        for f in range(3)
    ]
    want = mp3.parse_mp3_l3(mp3.write_mp3_l3_general(frames_std))[1]
    frames_free = [
        {
            "kbps": "free",
            "flen": 900,  # not any standard row's length
            "granules": [
                _plain_long_granule(q[f, g], sf[f, g]) for g in range(2)
            ],
        }
        for f in range(3)
    ]
    blob = mp3.write_mp3_l3_general(frames_free)
    assert len(blob) == 3 * 900
    assert (blob[2] >> 4) == 0  # bitrate index 0 on the wire
    got = mp3.parse_mp3_l3(blob)[1]
    np.testing.assert_array_equal(got, want)
    # a free-format stream whose measured length is broken fails
    # loudly at the next boundary
    bad = bytearray(blob)
    bad[900] = 0x00  # destroy frame 1's sync
    with pytest.raises(ValueError, match="lost sync|truncated"):
        mp3.parse_mp3_l3(bytes(bad))
