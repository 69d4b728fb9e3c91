"""FLAC codec unit matrix: lossless round-trips across bit depths,
channel counts, stereo modes, block sizes (incl. ragged final blocks and
>127 frame indexes through the UTF-8-style coded numbers), signal shapes
that steer subframe selection (constant / verbatim / fixed / LPC /
wasted bits), the decoder-only rice paths (escape partitions, rice2),
corruption detection (CRC-8, CRC-16, MD5), and the Matroska A_FLAC
split helpers.  No external audio library exists in this container, so
correctness rests on exact round-trip + the generated-SQL oracle of
``mm_flac_rms`` (pre-encode samples == decoded samples, valid because
the codec is lossless)."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions import flac
from asid_v2_data_pipeline_spark.functions.flac import (
    _BitReader,
    _BitWriter,
    _read_residual,
    flac_codec_private,
    flac_frames,
    parse_flac,
    parse_flac_headers,
    write_flac,
)


def _signal(n, ch, bits, seed=0):
    """Tonal + noise mix: exercises LPC on the tone, rice tails on the
    noise, and stays inside the bit depth."""
    rng = np.random.default_rng(seed)
    hi = (1 << (bits - 1)) - 1
    t = np.arange(n * ch).reshape(n, ch)
    x = (np.sin(t / 23.0) * (hi // 3)).astype(np.int64)
    x += rng.integers(-(hi // 8), hi // 8, size=(n, ch), endpoint=True)
    return np.clip(x, -(hi + 1), hi).astype(np.int64)


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_round_trip_exact(bits, ch):
    x = _signal(4097, ch, bits, seed=bits + ch)  # ragged final block
    blob = write_flac(x, sample_rate=16000, bits_per_sample=bits)
    rate, b2, y = parse_flac(blob)
    assert (rate, b2) == (16000, bits)
    assert np.array_equal(y, x)
    assert len(blob) < x.nbytes  # it actually compresses this signal


@pytest.mark.parametrize("mode", ["independent", "mid_side"])
def test_stereo_modes(mode):
    x = _signal(2048, 2, 16, seed=5)
    blob = write_flac(x, stereo_mode=mode)
    assert np.array_equal(parse_flac(blob)[2], x)


def test_mid_side_wins_on_correlated_channels():
    base = _signal(4096, 1, 16, seed=9)[:, 0]
    x = np.stack([base, base + 3], axis=1)  # nearly identical channels
    ind = write_flac(x, stereo_mode="independent")
    ms = write_flac(x, stereo_mode="mid_side")
    assert len(ms) < len(ind)
    assert np.array_equal(parse_flac(ms)[2], x)


def test_many_small_blocks_coded_frame_numbers():
    # 160 frames of 16 samples: frame index crosses the 1-byte coded-
    # number boundary (127), exercising multi-byte UTF-8-style numbers
    x = _signal(2560, 1, 16, seed=3)
    blob = write_flac(x, block_size=16)
    info, frames = flac_frames(blob)
    assert len(frames) == 160
    assert np.array_equal(parse_flac(blob)[2], x)


def test_constant_subframe_compresses_hard():
    x = np.full((4096, 1), -1234, dtype=np.int64)
    blob = write_flac(x)
    assert np.array_equal(parse_flac(blob)[2], x)
    assert len(blob) < 200  # constant subframe, not 8 KiB of samples


def test_verbatim_on_max_entropy_noise():
    rng = np.random.default_rng(11)
    x = rng.integers(-128, 128, size=(512, 1)).astype(np.int64)
    # full-range 8-bit noise: no predictor helps; must still round-trip
    blob = write_flac(x, bits_per_sample=8)
    assert np.array_equal(parse_flac(blob)[2], x)


def test_wasted_bits_path():
    x = (_signal(1024, 1, 12, seed=7) << 4)  # low 4 bits always zero
    blob = write_flac(x, bits_per_sample=16)
    y = parse_flac(blob)[2]
    assert np.array_equal(y, x)


def test_linear_ramp_fixed_predictor_is_tiny():
    x = np.arange(4096, dtype=np.int64)[:, None] - 2048  # order-1 exact
    blob = write_flac(x)
    assert np.array_equal(parse_flac(blob)[2], x)
    assert len(blob) < 600


def test_empty_and_validation_errors():
    with pytest.raises(ValueError):
        write_flac(np.empty((0, 1), dtype=np.int64))
    with pytest.raises(ValueError):
        write_flac(np.array([[300]]), bits_per_sample=8)  # out of range
    with pytest.raises(ValueError):
        write_flac(np.zeros((16, 1), dtype=np.int64), bits_per_sample=13)
    with pytest.raises(ValueError):
        write_flac(np.zeros((16, 1), dtype=np.int64), stereo_mode="mid_side")
    with pytest.raises(ValueError):
        write_flac(np.zeros((16, 1), dtype=np.int64), block_size=8)
    with pytest.raises(ValueError):
        parse_flac(b"not a flac stream")


def test_frame_crc16_corruption_detected():
    x = _signal(256, 1, 16, seed=1)
    blob = bytearray(write_flac(x))
    _info, pos = parse_flac_headers(bytes(blob))
    blob[pos + 12] ^= 0x40  # flip a bit inside the first frame body
    with pytest.raises(ValueError, match="CRC|header|FLAC"):
        parse_flac(bytes(blob))


def test_streaminfo_md5_mismatch_detected():
    x = _signal(256, 1, 16, seed=2)
    blob = bytearray(write_flac(x))
    # corrupt the stored MD5 (last 16 bytes of the 34-byte STREAMINFO
    # at offset 4 magic + 4 block header)
    blob[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        parse_flac(bytes(blob))
    # ...and verify_md5=False tolerates it (frame CRCs still pass)
    rate, bits, y = parse_flac(bytes(blob), verify_md5=False)
    assert np.array_equal(y, x)


def test_unknown_metadata_blocks_skipped():
    x = _signal(64, 1, 16, seed=4)
    blob = write_flac(x)
    _info, pos = parse_flac_headers(blob)
    si = bytearray(blob[:pos])
    si[4] &= 0x7F  # STREAMINFO no longer last
    extra = bytes([0x84]) + (5).to_bytes(3, "big") + b"APPL!"  # last-bit set
    assert np.array_equal(parse_flac(bytes(si) + extra + blob[pos:])[2], x)


def test_decoder_rice_escape_partition():
    """The encoder never emits escape partitions; decode them anyway
    (param 0b1111 -> 5-bit raw width, verbatim residuals)."""
    res = np.array([5, -3, 0, 7, -8, 2, 1, -1], dtype=np.int64)
    bw = _BitWriter()
    bw.write(0, 2)  # method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0
    bw.write(0xF, 4)  # escape
    bw.write(5, 5)  # raw width 5
    for v in res.tolist():
        bw.write(v & 0x1F, 5)
    bw.align()
    out = _read_residual(_BitReader(bw.getvalue()), order=0, block_size=8)
    assert np.array_equal(out, res)


def test_decoder_rice2_method():
    """Method 1 (rice2, 5-bit params) — emitted by real encoders for
    >14-bit residuals; ours never writes it but must read it."""
    res = np.array([100, -200, 300, -400], dtype=np.int64)
    bw = _BitWriter()
    bw.write(1, 2)  # method 1 -> 5-bit params
    bw.write(0, 4)
    bw.write(6, 5)  # rice param 6
    for v in res.tolist():
        u = (abs(int(v)) << 1) - (v < 0)
        bw.write_unary(u >> 6)
        bw.write(u & 63, 6)
    bw.align()
    out = _read_residual(_BitReader(bw.getvalue()), order=0, block_size=4)
    assert np.array_equal(out, res)


def test_mkv_split_helpers_reassemble():
    x = _signal(1000, 2, 16, seed=6)
    blob = write_flac(x, block_size=64)
    info, frames = flac_frames(blob)
    cp = flac_codec_private(blob)
    assert cp.startswith(b"fLaC")
    assert info["total_samples"] == 1000
    assert len(frames) == (1000 + 63) // 64
    assert np.array_equal(parse_flac(cp + b"".join(frames))[2], x)


def test_eight_channels():
    x = _signal(300, 8, 16, seed=8)
    assert np.array_equal(parse_flac(write_flac(x))[2], x)


def test_flac_module_is_dependency_free():
    import inspect

    src = inspect.getsource(flac)
    for lib in ("soundfile", "librosa", "pydub", "audioop", "scipy"):
        assert lib not in src


def test_property_any_samples_round_trip():
    """Hypothesis: ANY int sample matrix within the bit depth round-
    trips exactly, across channel counts, depths, block sizes and both
    stereo modes — the lossless contract the SQL oracles rest on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 700),
        ch=st.integers(1, 3),
        bits=st.sampled_from([8, 16, 24]),
        block=st.sampled_from([16, 64, 4096]),
        ms=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        shape=st.sampled_from(["noise", "tone", "const", "ramp", "edge"]),
    )
    def check(n, ch, bits, block, ms, seed, shape):
        rng = np.random.default_rng(seed)
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        if shape == "noise":
            x = rng.integers(lo, hi, size=(n, ch), endpoint=True)
        elif shape == "tone":
            t = np.arange(n * ch).reshape(n, ch)
            x = (np.sin(t / 17.0) * (hi // 2)).astype(np.int64)
        elif shape == "const":
            x = np.full((n, ch), int(rng.integers(lo, hi)), dtype=np.int64)
        elif shape == "ramp":
            x = np.tile(
                (np.arange(n)[:, None] % (hi or 1)) + lo // 2, (1, ch)
            )
        else:  # edge: extremes only
            x = rng.choice(np.array([lo, -1, 0, 1, hi]), size=(n, ch))
        x = x.astype(np.int64)
        mode = "mid_side" if (ms and ch == 2) else "independent"
        blob = write_flac(
            x, bits_per_sample=bits, block_size=block, stereo_mode=mode
        )
        rate, b2, y = parse_flac(blob)
        assert b2 == bits
        assert np.array_equal(y, x)

    check()


def test_flac_randomized_full_depth_matrix():
    """Seeded randomized matrix (VERDICT r10 task 2): the Hypothesis
    property above samples bits {8,16,24} and ch 1..3 — this matrix
    forces the REMAINING encoder surface: every supported bit depth
    incl. 12/20/32, channel counts up to 8, odd block sizes that leave
    ragged final partitions, wasted-bits signals (low bits zero), and
    sign-extreme samples.  Exact lossless round trip with MD5 verify
    on, every trial.  Fixed seed: failures reproduce."""
    rng = np.random.default_rng(20251212)
    depths = [8, 12, 16, 20, 24, 32]
    for trial in range(30):
        bits = int(rng.choice(depths))
        ch = int(rng.integers(1, 9))
        n = int(rng.integers(1, 1500))
        block = int(rng.integers(16, 600))
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        kind = int(rng.integers(0, 4))
        if kind == 0:  # full-range noise
            x = rng.integers(lo, hi, size=(n, ch), endpoint=True)
        elif kind == 1:  # wasted bits: low w bits zero
            w = int(rng.integers(1, min(8, bits - 1)))
            x = (rng.integers(lo >> w, hi >> w, size=(n, ch),
                              endpoint=True) << w)
        elif kind == 2:  # smooth per-channel tones (fixed predictors)
            t = np.arange(n)[:, None] + np.arange(ch)[None, :] * 7
            x = (np.sin(t / 13.0) * (hi // 3)).astype(np.int64)
        else:  # extremes + runs of constants
            x = rng.choice(
                np.array([lo, lo + 1, -1, 0, 1, hi - 1, hi]),
                size=(n, ch),
            )
            if n > 10:
                x[n // 3 : n // 3 + 5] = hi  # constant stretch
        x = x.astype(np.int64)
        mode = "mid_side" if ch == 2 and rng.integers(0, 2) else "independent"
        blob = write_flac(
            x, bits_per_sample=bits, block_size=block, stereo_mode=mode
        )
        rate, b2, y = parse_flac(blob)  # verify_md5 defaults on
        assert b2 == bits and np.array_equal(y, x), (
            f"trial {trial}: bits={bits} ch={ch} n={n} block={block} "
            f"kind={kind} mode={mode}"
        )
