"""Zstandard decoder (§2.11 compressed-shard family).  xxHash64
known vectors, an exhaustive cross-validation matrix against the C
implementation reachable through ``pyarrow.Codec("zstd")`` (levels
1-19 × six data shapes × sizes up to 300 KB — every block type,
literals mode, sequence-table mode and the repeat-offset history get
exercised), streaming (window-descriptor) frames, multi-frame +
skippable-frame concatenation, the content-checksum path, disclosed
boundaries, and the r10 fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.zstd import (
    decompress_zstd,
    xxh64,
)

try:
    import pyarrow as pa

    _HAS_ZSTD = pa.Codec.is_available("zstd")
except ImportError:  # pragma: no cover
    _HAS_ZSTD = False

pytestmark = pytest.mark.skipif(
    not _HAS_ZSTD, reason="pyarrow zstd codec missing"
)


def test_xxh64_public_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # >=32-byte path
    assert xxh64(b"a" * 101) == xxh64(b"a" * 101)  # determinism
    assert xxh64(b"a", seed=1) != xxh64(b"a")


def _corpus(rng, kind: int, n: int) -> bytes:
    if kind == 0:  # constant: RLE blocks
        return bytes([int(rng.integers(0, 4))]) * n
    if kind == 1:  # text-ish: huffman literals
        return bytes(rng.integers(97, 123, n).astype(np.uint8))
    if kind == 2:  # random: raw blocks
        return bytes(rng.integers(0, 256, n).astype(np.uint8))
    if kind == 3:  # periodic: long matches + repeat offsets
        base = bytes(rng.integers(97, 105, 97).astype(np.uint8))
        return (base * (n // 97 + 1))[:n]
    if kind == 4:  # zipfy words: mixed literals + matches
        words = [
            bytes(
                rng.integers(97, 123, int(rng.integers(2, 9))).astype(
                    np.uint8
                )
            )
            for _ in range(30)
        ]
        return b" ".join(words[int(i)] for i in rng.integers(0, 30, n // 5))
    return bytes((np.arange(n) % 251).astype(np.uint8))  # ramp


def test_zstd_cross_validation_matrix():
    rng = np.random.default_rng(42)
    for level in (1, 3, 5, 9, 13, 19):
        c = pa.Codec("zstd", compression_level=level)
        for kind in range(6):
            for n in (0, 1, 5, 100, 1000, 66000, 300000):
                d = _corpus(rng, kind, n)
                assert decompress_zstd(bytes(c.compress(d))) == d, (
                    level,
                    kind,
                    n,
                )


def test_zstd_streaming_frames_and_concatenation():
    # CompressedOutputStream writes non-single-segment frames
    # (window descriptor, unknown content size)
    buf = pa.BufferOutputStream()
    want = b"streaming chunk, repetitive repetitive " * 2000
    with pa.CompressedOutputStream(buf, "zstd") as s:
        s.write(want)
    enc = buf.getvalue().to_pybytes()
    assert (enc[4] >> 5) & 1 == 0  # window-descriptor path
    assert decompress_zstd(enc) == want
    # concatenated frames + skippable frames
    c = pa.Codec("zstd")
    one = bytes(c.compress(b"frame one "))
    two = bytes(c.compress(b"frame two"))
    sk = (
        (0x184D2A50).to_bytes(4, "little")
        + (3).to_bytes(4, "little")
        + b"xyz"
    )
    assert decompress_zstd(sk + one + sk + two) == b"frame one frame two"


def test_zstd_content_checksum_path():
    d = b"checksummed content " * 30
    c = pa.Codec("zstd")
    fr = bytearray(c.compress(d))
    fr[4] |= 0x4  # set Content_Checksum_Flag
    fr += (xxh64(d) & 0xFFFFFFFF).to_bytes(4, "little")
    assert decompress_zstd(bytes(fr)) == d
    bad = bytearray(fr)
    bad[-1] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        decompress_zstd(bytes(bad))


def test_zstd_disclosed_boundaries():
    with pytest.raises(ValueError, match="magic"):
        decompress_zstd(b"\x00\x00\x00\x00rest")
    with pytest.raises(NotImplementedError, match="legacy"):
        decompress_zstd((0xFD2FB525).to_bytes(4, "little") + b"x" * 8)
    # dictionary frames: descriptor with dict-id flag + nonzero id
    c = pa.Codec("zstd")
    fr = bytearray(c.compress(b"body"))
    fr[4] |= 0x1  # 1-byte dictionary id follows the descriptor
    fr.insert(5, 7)  # nonzero id
    with pytest.raises(NotImplementedError, match="dictionary"):
        decompress_zstd(bytes(fr))


def test_zstd_fcs_mismatch_is_loud():
    c = pa.Codec("zstd")
    fr = bytearray(c.compress(b"0123456789abcdef"))
    # single-segment frames carry the content size right after the
    # descriptor; nudging it must break the declared-size check
    assert (fr[4] >> 5) & 1 == 1
    fr[5] ^= 0x1
    with pytest.raises(ValueError):
        decompress_zstd(bytes(fr))


def test_zstd_fuzz_fail_loudly():
    rng = np.random.default_rng(7)
    c = pa.Codec("zstd", compression_level=9)
    d = bytes(rng.integers(97, 123, 5000).astype(np.uint8)) + b" repeat me " * 200
    blob = bytes(c.compress(d))
    for cut in range(0, len(blob), max(1, len(blob) // 120)):
        try:
            decompress_zstd(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(1500):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decompress_zstd(bytes(b))
        except (ValueError, NotImplementedError):
            pass
