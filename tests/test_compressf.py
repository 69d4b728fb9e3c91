"""LZ4 + Snappy codecs (§2.11 compressed-shard family).  Known-vector
checks (xxHash32, CRC-32C), bidirectional cross-validation against the
C implementations reachable through ``pyarrow.Codec``, seeded
randomized matrices, stream/frame feature coverage, disclosed
boundaries, and the r10 fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.lz4 import (
    compress_block as lz4_compress_block,
    compress_frame,
    decompress_block as lz4_decompress_block,
    decompress_frame,
    xxh32,
)
from asid_v2_data_pipeline_spark.functions.snappyf import (
    compress_block as sn_compress_block,
    compress_stream,
    crc32c,
    decompress_block as sn_decompress_block,
    decompress_stream,
)

try:
    import pyarrow as pa

    _HAS_LZ4 = pa.Codec.is_available("lz4")
    _HAS_SNAPPY = pa.Codec.is_available("snappy")
except ImportError:  # pragma: no cover
    _HAS_LZ4 = _HAS_SNAPPY = False


def _corpus(rng, n):
    """Mixed-entropy test buffer: runs, text-ish bytes, random."""
    kind = int(rng.integers(0, 3))
    if kind == 0:
        return bytes([int(rng.integers(0, 6))]) * n
    if kind == 1:
        return bytes(rng.integers(97, 123, n).astype(np.uint8))
    return bytes(rng.integers(0, 256, n).astype(np.uint8))


def test_xxh32_public_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Hello World") == 0xB1FD16EE


def test_crc32c_public_vector():
    # the canonical CRC-32C check value
    assert crc32c(b"123456789") == 0xE3069283


def test_lz4_block_and_frame_roundtrip_matrix():
    rng = np.random.default_rng(71)
    for trial in range(50):
        d = _corpus(rng, int(rng.integers(0, 30000)))
        blk = lz4_compress_block(d)
        assert lz4_decompress_block(blk, max(len(d), 1)) == d, trial
        fr = compress_frame(
            d,
            block_max=int(rng.integers(4, 8)),
            content_checksum=bool(trial % 2),
            block_checksum=bool(trial % 3 == 0),
            content_size=bool(trial % 5 == 0),
        )
        assert decompress_frame(fr) == d, trial


@pytest.mark.skipif(not _HAS_LZ4, reason="pyarrow lz4 codec missing")
def test_lz4_cross_validation_against_c_implementation():
    raw = pa.Codec("lz4_raw")
    fr = pa.Codec("lz4")
    rng = np.random.default_rng(72)
    for trial in range(30):
        d = _corpus(rng, int(rng.integers(1, 40000)))
        # ours decodes theirs
        assert lz4_decompress_block(bytes(raw.compress(d)), len(d)) == d
        assert decompress_frame(bytes(fr.compress(d))) == d
        # theirs decodes ours
        assert bytes(raw.decompress(lz4_compress_block(d), len(d))) == d
        assert bytes(fr.decompress(compress_frame(d), len(d))) == d


@pytest.mark.skipif(not _HAS_SNAPPY, reason="pyarrow snappy codec missing")
def test_snappy_cross_validation_against_c_implementation():
    c = pa.Codec("snappy")
    rng = np.random.default_rng(73)
    for trial in range(30):
        d = _corpus(rng, int(rng.integers(0, 200000)))
        assert sn_decompress_block(bytes(c.compress(d))) == d
        assert bytes(c.decompress(sn_compress_block(d), len(d))) == d


def test_snappy_stream_roundtrip_and_chunking():
    rng = np.random.default_rng(74)
    for trial in range(25):
        d = _corpus(rng, int(rng.integers(0, 300000)))
        s = compress_stream(d)
        assert decompress_stream(s) == d, trial
    # multi-chunk: > 64 KiB must split, and a repeated stream id
    # mid-stream is legal
    d = b"chunk boundary " * 9000
    s = compress_stream(d)
    sid = s[:10]
    assert decompress_stream(sid + s) == d  # extra leading identifier ok


def test_lz4_frame_features_and_boundaries():
    d = b"feature coverage " * 500
    # skippable frame before the real one
    sk = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(4, "little") + b"xyz"
    assert decompress_frame(sk + compress_frame(d)) == d
    # stored (incompressible) blocks
    rng = np.random.default_rng(75)
    noise = bytes(rng.integers(0, 256, 70000).astype(np.uint8))
    fr = compress_frame(noise)
    assert decompress_frame(fr) == noise
    # declared content size must match
    fr = bytearray(compress_frame(d, content_size=True))
    fr[6] ^= 0x1  # twiddle the size field
    with pytest.raises(ValueError):
        decompress_frame(bytes(fr))
    # linked blocks / dictionaries are disclosed boundaries
    good = bytearray(compress_frame(d))
    flg = good[4]
    bad = bytearray(good)
    bad[4] = flg & ~(1 << 5)  # clear B.Indep
    with pytest.raises((NotImplementedError, ValueError)):
        decompress_frame(bytes(bad))
    bad = bytearray(good)
    bad[4] = flg | 1  # DictID
    with pytest.raises((NotImplementedError, ValueError)):
        decompress_frame(bytes(bad))


def test_lz4_fuzz_fail_loudly():
    rng = np.random.default_rng(76)
    blob = compress_frame(
        b"fuzz me " * 400, content_checksum=True, block_checksum=True
    )
    for cut in range(0, len(blob), max(1, len(blob) // 80)):
        try:
            decompress_frame(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decompress_frame(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    # block decoder: offset-before-window and overrun must raise
    with pytest.raises(ValueError, match="offset"):
        lz4_decompress_block(b"\x10a\x05\x00", 100)
    with pytest.raises(ValueError, match="exceeds"):
        lz4_decompress_block(lz4_compress_block(b"x" * 100), 10)


def test_snappy_fuzz_fail_loudly():
    rng = np.random.default_rng(77)
    blob = compress_stream(b"fuzz me too " * 3000)
    for cut in range(0, len(blob), max(1, len(blob) // 80)):
        try:
            decompress_stream(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decompress_stream(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    # block: declared-length mismatch both ways
    good = sn_compress_block(b"abcdef" * 10)
    with pytest.raises(ValueError):
        sn_decompress_block(good[:-1])
    b = bytearray(good)
    b[0] += 1  # declared length one high
    with pytest.raises(ValueError):
        sn_decompress_block(bytes(b))


def test_lz4_linked_blocks_roundtrip():
    """r11 (boundary closed): B.Indep-unset frames — each block's
    matches may reach 64 KiB into previously decoded output.  Linked
    framing must round-trip, beat independent framing on cross-block
    redundancy, and reject offsets past the window."""
    import numpy as np

    from asid_v2_data_pipeline_spark.functions.lz4 import (
        compress_frame,
        decompress_frame,
    )

    data = (b"the quick brown fox jumps over the lazy dog. " * 3000)
    linked = compress_frame(data, block_max=4, linked=True)
    indep = compress_frame(data, block_max=4, linked=False)
    assert decompress_frame(linked) == data
    assert decompress_frame(indep) == data
    assert len(linked) < len(indep)  # window reuse across blocks
    rng = np.random.default_rng(19)
    for t in range(25):
        n = int(rng.integers(0, 300_000))
        raw = bytes(
            (rng.integers(0, 5, n) + 97).astype(np.uint8)
            if rng.integers(0, 2)
            else rng.integers(0, 256, n).astype(np.uint8)
        )
        f = compress_frame(
            raw,
            block_max=int(rng.integers(4, 8)),
            linked=True,
            block_checksum=bool(rng.integers(0, 2)),
            content_size=bool(rng.integers(0, 2)),
        )
        assert decompress_frame(f) == raw, t
    # fuzz: flips on a linked frame raise or mismatch, never escape
    blob = bytearray(compress_frame(data[:200_000], block_max=4, linked=True))
    for _ in range(400):
        b = bytearray(blob)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            decompress_frame(bytes(b))
        except (ValueError, NotImplementedError):
            pass
