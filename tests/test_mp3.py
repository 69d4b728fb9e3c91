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
    blob = bytearray(mp3.write_mp3_l3(q, sf))
    # intensity stereo (mode 01, mode_ext bit 0) is a disclosed boundary
    blob[3] = (blob[3] & 0x0F) | 0x40 | 0x10
    with pytest.raises(NotImplementedError, match="intensity"):
        mp3.parse_mp3_l3(bytes(blob))
    # bit reservoir: nonzero main_data_begin
    blob = bytearray(mp3.write_mp3_l3(q, sf))
    blob[4] = 0x80
    with pytest.raises(NotImplementedError, match="reservoir"):
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
    # intensity stereo (mode_ext bit 0) stays a disclosed boundary
    blob[3] = (blob[3] & 0x0F) | 0x40 | 0x10
    with pytest.raises(NotImplementedError, match="intensity"):
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

    with pytest.raises(ValueError, match="mid/side"):
        mp3.write_mp3_l3(
            np.zeros((1, 2, 576)), np.zeros((1, 2, 21)), stereo_mode="ms"
        )
