"""Tensor-shard formats: numpy cross-validation BOTH directions for
.npy/.npz, safetensors round-trips across dtypes/ranks, the
offset-tiling safety property, literal-eval header hardening, and
the r10 fuzz contract."""

from __future__ import annotations

import io
import json
import struct

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.tensors import (
    parse_npy,
    parse_npz,
    parse_safetensors,
    write_npy,
    write_npz,
    write_safetensors,
)


def _arrays(rng):
    return {
        "w": rng.normal(size=(4, 5)).astype("<f4"),
        "b": rng.integers(-9, 9, (7,)).astype("<i8"),
        "h": np.float16([1.5, 2.25, -0.75]),
        "m": rng.integers(0, 2, (3, 2)).astype(bool),
        "s": np.array(7, "<i4"),  # 0-d
        "z": np.zeros((0, 3), "<f4"),  # empty
        "u": rng.integers(0, 255, (6,)).astype("<u1"),
    }


def test_safetensors_roundtrip_all_shapes():
    ts = _arrays(np.random.default_rng(5))
    got, meta = parse_safetensors(
        write_safetensors(ts, {"a": "1", "b": "two"})
    )
    assert meta == {"a": "1", "b": "two"}
    assert set(got) == set(ts)
    for k in ts:
        assert got[k].shape == ts[k].shape and got[k].dtype == ts[k].dtype
        assert (got[k] == ts[k]).all()


def test_safetensors_tiling_safety():
    ts = {"a": np.arange(4, dtype="<f4"), "b": np.arange(2, dtype="<i8")}
    b = bytearray(write_safetensors(ts))
    (hlen,) = struct.unpack("<Q", bytes(b[:8]))
    header = json.loads(bytes(b[8 : 8 + hlen]))
    # overlap: point b at a's bytes
    header["b"]["data_offsets"] = [0, 16]
    hj = json.dumps(header, separators=(",", ":")).encode()
    evil = struct.pack("<Q", len(hj)) + hj + bytes(b[8 + hlen :])
    with pytest.raises(ValueError, match="gap or overlap|trailing"):
        parse_safetensors(evil)
    # size/shape disagreement
    header = json.loads(bytes(b[8 : 8 + hlen]))
    header["a"]["shape"] = [3]
    hj = json.dumps(header, separators=(",", ":")).encode()
    evil = struct.pack("<Q", len(hj)) + hj + bytes(b[8 + hlen :])
    with pytest.raises(ValueError, match="disagrees"):
        parse_safetensors(evil)
    with pytest.raises(ValueError):
        parse_safetensors(b"\x00" * 7)
    with pytest.raises(ValueError):
        parse_safetensors(struct.pack("<Q", 1 << 40) + b"{}")


def test_npy_numpy_cross_validation():
    for arr in _arrays(np.random.default_rng(7)).values():
        enc = write_npy(arr)
        ref = np.load(io.BytesIO(enc))  # numpy reads ours
        assert ref.shape == arr.shape and ref.dtype == arr.dtype
        assert (ref == arr).all()
        bio = io.BytesIO()
        np.save(bio, arr)  # ours reads numpy's
        got = parse_npy(bio.getvalue())
        assert got.shape == arr.shape and (got == arr).all()


def test_npz_numpy_cross_validation():
    ts = {
        k: v
        for k, v in _arrays(np.random.default_rng(9)).items()
        if v.ndim  # savez of 0-d round-trips as 0-d, fine, but keep simple
    }
    enc = write_npz(ts)
    ref = np.load(io.BytesIO(enc))
    for k in ts:
        assert (ref[k] == ts[k]).all()
    got = parse_npz(enc)
    assert set(got) == set(ts)
    bio = io.BytesIO()
    np.savez(bio, **ts)
    got2 = parse_npz(bio.getvalue())
    for k in ts:
        assert (got2[k] == ts[k]).all()


def test_npy_hardening():
    with pytest.raises(ValueError):
        parse_npy(b"\x93NUMPX\x01\x00")
    # header dict goes through literal_eval, so code never executes;
    # a non-literal header raises ValueError
    evil = "{'descr': '<i4', 'fortran_order': False, 'shape': __import__('os').getcwd()}"
    hdr = evil + " " * ((-(10 + len(evil) + 1)) % 16) + "\n"
    payload = (
        b"\x93NUMPY\x01\x00"
        + struct.pack("<H", len(hdr))
        + hdr.encode()
    )
    with pytest.raises(ValueError):
        parse_npy(payload)
    good = write_npy(np.arange(4, dtype="<i4"))
    with pytest.raises(ValueError):
        parse_npy(good[:-1])  # truncated data
    with pytest.raises(ValueError):
        parse_npy(good + b"\x00")  # trailing bytes
    with pytest.raises(NotImplementedError):
        f_hdr = "{'descr': '<i4', 'fortran_order': True, 'shape': (2, 2), }"
        f_hdr += " " * ((-(10 + len(f_hdr) + 1)) % 16) + "\n"
        parse_npy(
            b"\x93NUMPY\x01\x00"
            + struct.pack("<H", len(f_hdr))
            + f_hdr.encode()
            + b"\x00" * 16
        )


def test_fuzz_never_hangs():
    rng = np.random.default_rng(103)
    st = write_safetensors(
        {"a": rng.normal(size=(8,)).astype("<f4"),
         "b": rng.integers(0, 9, (4,)).astype("<i2")}
    )
    nz = write_npz({"a": rng.integers(0, 255, (16,)).astype("<u1")})
    for base, parse in ((st, parse_safetensors), (nz, parse_npz)):
        for _ in range(500):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] ^= 1 << int(rng.integers(0, 8))
            try:
                parse(bytes(mutated))
            except (ValueError, NotImplementedError):
                pass
