"""TFRecord framing + protobuf tf.Example codec: published CRC-32C
test vectors (RFC 3720 §B.4), framing round-trips, a seeded randomized
feature-matrix, wire-format edge cases (unpacked scalars, unknown
fields, negative int64 varints, zigzag), and the r10 fuzz contract
(truncation + bit flips fail loudly, never decode silently wrong)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.protof import (
    WT_LEN,
    decode_example,
    encode_example,
    iter_fields,
    read_varint,
    write_key,
    write_len_field,
    write_varint,
    zigzag_decode,
    zigzag_encode,
)
from asid_v2_data_pipeline_spark.functions.tfrecord import (
    crc32c,
    masked_crc32c,
    read_tfrecord,
    write_tfrecord,
)


def test_crc32c_rfc3720_vectors():
    # RFC 3720 appendix B.4 ("CRC Examples") — the public Castagnoli
    # vectors every crc32c implementation pins against
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(bytes(range(31, -1, -1))) == 0x113FDB5C


def test_crc32c_chaining():
    data = bytes(range(256)) * 3
    assert crc32c(data) == crc32c(data[100:], crc32c(data[:100]))


def test_masked_crc_is_rot15_plus_delta():
    c = crc32c(b"hello")
    rot = ((c >> 15) | (c << 17)) & 0xFFFFFFFF
    assert masked_crc32c(b"hello") == (rot + 0xA282EAD8) & 0xFFFFFFFF


def test_tfrecord_roundtrip_shapes():
    for recs in ([], [b""], [b"a"], [b"x" * 70000, b"", b"yz"]):
        assert read_tfrecord(write_tfrecord(recs)) == recs


def test_tfrecord_fuzz_flips_and_truncation():
    rng = np.random.default_rng(7)
    recs = [bytes(rng.integers(0, 256, n).astype(np.uint8)) for n in (0, 17, 300, 4096)]
    shard = write_tfrecord(recs)
    # every truncation point fails loudly (or returns a strict prefix
    # ONLY at an exact record boundary — but any cut strictly inside a
    # record must raise)
    bounds = set()
    pos = 0
    for r in recs:
        pos += 12 + len(r) + 4
        bounds.add(pos)
    for cut in range(len(shard)):
        if cut in bounds or cut == 0:
            continue
        with pytest.raises(ValueError):
            read_tfrecord(shard[:cut])
    # bit flips: either a CRC catches it (ValueError) or — never —
    # silently equal output
    for _ in range(300):
        i = int(rng.integers(0, len(shard)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(shard)
        mutated[i] ^= bit
        try:
            out = read_tfrecord(bytes(mutated))
        except ValueError:
            continue
        assert out != recs  # a surviving decode must differ


def test_varint_edges():
    for v in (0, 1, 127, 128, 300, 2**32, 2**64 - 1):
        assert read_varint(write_varint(v), 0) == (v, len(write_varint(v)))
    with pytest.raises(ValueError):
        write_varint(-1)
    with pytest.raises(ValueError):
        write_varint(1 << 64)
    with pytest.raises(ValueError):
        read_varint(b"\x80" * 11, 0)  # > 10 bytes
    with pytest.raises(ValueError):
        read_varint(b"\x80", 0)  # truncated


def test_zigzag():
    assert [zigzag_encode(v) for v in (0, -1, 1, -2, 2147483647, -2147483648)] == [
        0, 1, 2, 3, 4294967294, 4294967295,
    ]
    for v in (0, -1, 5, -(2**63), 2**63 - 1):
        assert zigzag_decode(zigzag_encode(v)) == v


def test_example_roundtrip_matrix():
    rng = np.random.default_rng(11)
    for trial in range(40):
        feats = {}
        for fi in range(int(rng.integers(0, 6))):
            kind = ("bytes", "float", "int64")[int(rng.integers(0, 3))]
            n = int(rng.integers(0, 5))
            if kind == "bytes":
                vals = [
                    bytes(rng.integers(0, 256, int(rng.integers(0, 50))).astype(np.uint8))
                    for _ in range(n)
                ]
            elif kind == "float":
                # float32-representable values survive the f32 wire
                vals = [
                    float(np.float32(rng.normal() * 100)) for _ in range(n)
                ]
            else:
                vals = [
                    int(rng.integers(-(2**62), 2**62)) for _ in range(n)
                ]
            feats[f"f{fi}"] = (kind, vals)
        out = decode_example(encode_example(feats))
        # the kind wrapper field is always written, so even empty
        # lists round-trip with their kind preserved
        assert out == feats, (trial, feats, out)


def test_unpacked_scalars_accepted():
    # proto2 writers emit repeated scalars unpacked: int64 as one
    # varint field per value, float as one fixed32 per value
    int_list = write_key(1, 0) + write_varint(7) + write_key(1, 0) + write_varint(9)
    float_list = write_key(1, 5) + struct.pack("<f", 1.5) + write_key(1, 5) + struct.pack("<f", -2.0)
    feature_i = write_len_field(3, int_list)
    feature_f = write_len_field(2, float_list)
    entry_i = write_len_field(1, b"ii") + write_len_field(2, feature_i)
    entry_f = write_len_field(1, b"ff") + write_len_field(2, feature_f)
    ex = write_len_field(1, write_len_field(1, entry_i) + write_len_field(1, entry_f))
    out = decode_example(ex)
    assert out["ii"] == ("int64", [7, 9])
    assert out["ff"] == ("float", [1.5, -2.0])


def test_unknown_fields_skipped_and_groups_rejected():
    feats = {"a": ("int64", [1])}
    ex = bytearray(encode_example(feats))
    # append an unknown top-level field (field 9, varint)
    ex += write_key(9, 0) + write_varint(42)
    assert decode_example(bytes(ex)) == feats
    # a group wire type anywhere raises
    with pytest.raises(ValueError):
        list(iter_fields(write_key(1, 3)))


def test_malformed_examples_raise():
    with pytest.raises(ValueError):
        decode_example(b"\x0a\xff")  # truncated LEN
    # Example.features with wrong wire type
    with pytest.raises(ValueError):
        decode_example(write_key(1, 0) + write_varint(1))
    # packed float payload not a multiple of 4
    bad_f = write_len_field(1, b"\x00\x00\x00")
    feature = write_len_field(2, bad_f)
    entry = write_len_field(1, b"x") + write_len_field(2, feature)
    ex = write_len_field(1, write_len_field(1, entry))
    with pytest.raises(ValueError):
        decode_example(ex)


def test_proto_fuzz_never_hangs_or_crashes():
    rng = np.random.default_rng(3)
    base = encode_example(
        {
            "txt": ("bytes", [b"hello world"]),
            "ids": ("int64", [1, -5, 2**40]),
            "sc": ("float", [0.5, 8.25]),
        }
    )
    for _ in range(800):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            i = int(rng.integers(0, len(mutated)))
            mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_example(bytes(mutated))
        except (ValueError, UnicodeDecodeError):
            pass  # loud failure is the contract
    for cut in range(len(base)):
        try:
            decode_example(base[:cut])
        except (ValueError, UnicodeDecodeError):
            pass


def test_admitting_operator_quarantines_one_row(spark):
    """A corrupt shard costs one rejected row; good shards emit their
    examples with error null."""
    from asid_v2_data_pipeline_spark.functions.protof import encode_example
    from asid_v2_data_pipeline_spark.functions.tfrecord import write_tfrecord
    from asid_v2_data_pipeline_spark.operators.multimodal import (
        extract_tfrecord_examples_admitting,
    )

    def shard(did, n):
        return write_tfrecord(
            [
                encode_example(
                    {
                        "key": ("bytes", [f"{did:06d}-{i:03d}".encode()]),
                        "txt": ("bytes", [f"text {did} {i}".encode()]),
                        "sno": ("int64", [i]),
                    }
                )
                for i in range(n)
            ]
        )

    good = shard(1, 3)
    bad = bytearray(shard(2, 2))
    bad[12] ^= 0xFF  # first data byte: data CRC fails
    media = spark.createDataFrame(
        [(1, bytes(good)), (2, bytes(bad))],
        "media_id long, payload binary",
    )
    rows = sorted(
        extract_tfrecord_examples_admitting(media).collect(),
        key=lambda r: (r.media_id, r.key or ""),
    )
    assert [(r.media_id, r.error, r.key) for r in rows] == [
        (1, None, "000001-000"),
        (1, None, "000001-001"),
        (1, None, "000001-002"),
        (2, "ValueError", None),
    ]
    assert rows[0].txt == "text 1 0"
