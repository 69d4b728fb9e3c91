"""Tensor-shard formats (pure Python, from the public specs): the
checkpoint/feature-dump side of a training-data pipeline.

- **safetensors** (huggingface/safetensors file layout): 8-byte LE
  header length + JSON header ``{name: {"dtype", "shape",
  "data_offsets"}}`` (optional ``__metadata__`` string map) + one
  contiguous little-endian buffer.  Offsets must tile the buffer
  exactly in header order — gaps, overlaps or out-of-bounds ranges
  raise ValueError (the format's safety property IS that check).
- **NumPy .npy v1.0** (the public format spec in
  ``numpy/lib/format.py``'s docstring): magic + version + 16-byte
  aligned header dict ``{'descr', 'fortran_order', 'shape'}`` —
  parsed with ``ast.literal_eval``, never ``eval``; C-order only
  (fortran_order=True raises, disclosed).
- **.npz** = ZIP of ``.npy`` members — composed with the repo's own
  ``functions/zipf``.

Dtypes: little-endian ``f2/f4/f8``, ``i1/i2/i4/i8``, ``u1``, plus
bool.  Everything decodes to numpy arrays; encoders are
byte-deterministic (sorted safetensors names, fixed npy header
padding).

Reference comparison: the reference stores training tensors as ad-hoc
``.npz`` scene dumps (``asip_v2/archive.py``); this makes that layer
a first-class, oracle-checked source family.
"""

from __future__ import annotations

import ast
import json
import struct

import numpy as np

_ST_DTYPES = {
    "F16": np.dtype("<f2"),
    "F32": np.dtype("<f4"),
    "F64": np.dtype("<f8"),
    "I8": np.dtype("<i1"),
    "I16": np.dtype("<i2"),
    "I32": np.dtype("<i4"),
    "I64": np.dtype("<i8"),
    "U8": np.dtype("<u1"),
    "BOOL": np.dtype("bool"),
}
_NP_TO_ST = {v: k for k, v in _ST_DTYPES.items()}


def write_safetensors(
    tensors: dict[str, np.ndarray],
    metadata: dict[str, str] | None = None,
) -> bytes:
    """Serialize ``{name: array}`` (names emitted sorted, so encodes
    are byte-deterministic)."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = {
            str(k): str(v) for k, v in sorted(metadata.items())
        }
    buf = bytearray()
    for name in sorted(tensors):
        arr = np.asarray(tensors[name], order="C")
        dt = arr.dtype.newbyteorder("<") if arr.dtype.byteorder == ">" else arr.dtype
        arr = arr.astype(dt, copy=False)
        st = _NP_TO_ST.get(np.dtype(dt))
        if st is None:
            raise ValueError(f"safetensors: unsupported dtype {arr.dtype}")
        start = len(buf)
        buf += arr.tobytes()
        header[name] = {
            "dtype": st,
            "shape": list(arr.shape),
            "data_offsets": [start, len(buf)],
        }
    hj = json.dumps(header, sort_keys=True, separators=(",", ":")).encode()
    return struct.pack("<Q", len(hj)) + hj + bytes(buf)


def parse_safetensors(data: bytes) -> tuple[dict[str, np.ndarray], dict]:
    """Returns ``(tensors, metadata)``.  Offsets must tile the buffer
    exactly; overlaps/gaps/out-of-bounds raise."""
    buf = bytes(data)
    if len(buf) < 8:
        raise ValueError("safetensors: too short")
    (hlen,) = struct.unpack("<Q", buf[:8])
    if 8 + hlen > len(buf):
        raise ValueError("safetensors: header overruns the payload")
    try:
        header = json.loads(buf[8 : 8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"safetensors: bad header JSON: {e}") from None
    if not isinstance(header, dict):
        raise ValueError("safetensors: header is not an object")
    metadata = header.pop("__metadata__", {})
    body = buf[8 + hlen :]
    tensors: dict[str, np.ndarray] = {}
    spans = []
    for name, spec in header.items():
        if not isinstance(spec, dict):
            raise ValueError(f"safetensors: bad entry {name!r}")
        dt = _ST_DTYPES.get(spec.get("dtype"))
        if dt is None:
            raise ValueError(
                f"safetensors: unsupported dtype {spec.get('dtype')!r}"
            )
        shape = spec.get("shape")
        offs = spec.get("data_offsets")
        if (
            not isinstance(shape, list)
            or not all(isinstance(d, int) and d >= 0 for d in shape)
            or not isinstance(offs, list)
            or len(offs) != 2
        ):
            raise ValueError(f"safetensors: bad entry {name!r}")
        start, end = offs
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if end - start != n * dt.itemsize:
            raise ValueError(
                f"safetensors: {name!r} size disagrees with shape"
            )
        if not 0 <= start <= end <= len(body):
            raise ValueError(f"safetensors: {name!r} offsets out of bounds")
        spans.append((start, end))
        tensors[name] = np.frombuffer(
            body, dt, count=n, offset=start
        ).reshape(shape)
    # the safety property: spans tile the buffer exactly, no gaps or
    # overlaps (header order = buffer order for compliant writers;
    # we sort to accept any order)
    spans.sort()
    pos = 0
    for start, end in spans:
        if start != pos:
            raise ValueError("safetensors: buffer gap or overlap")
        pos = end
    if pos != len(body):
        raise ValueError("safetensors: trailing bytes after tensors")
    return tensors, metadata


_NPY_MAGIC = b"\x93NUMPY"


def write_npy(arr: np.ndarray) -> bytes:
    """NumPy .npy v1.0, C-order, 16-byte aligned header."""
    # asarray(order='C') keeps 0-d shape; ascontiguousarray would
    # promote it to (1,)
    arr = np.asarray(arr, order="C")
    dt = arr.dtype
    if dt.byteorder == ">":
        arr = arr.astype(dt.newbyteorder("<"))
        dt = arr.dtype
    descr = dt.str if dt.kind != "b" else "|b1"
    header = (
        "{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
        % (descr, repr(arr.shape))
    )
    base = len(_NPY_MAGIC) + 2 + 2
    pad = (-(base + len(header) + 1)) % 16
    header = header + " " * pad + "\n"
    return (
        _NPY_MAGIC
        + b"\x01\x00"
        + struct.pack("<H", len(header))
        + header.encode("latin1")
        + arr.tobytes()
    )


def parse_npy(data: bytes) -> np.ndarray:
    buf = bytes(data)
    if buf[:6] != _NPY_MAGIC:
        raise ValueError("npy: bad magic")
    if len(buf) < 10:
        raise ValueError("npy: truncated header")
    major = buf[6]
    if major == 1:
        (hlen,) = struct.unpack("<H", buf[8:10])
        at = 10
    elif major == 2:
        if len(buf) < 12:
            raise ValueError("npy: truncated v2 header")
        (hlen,) = struct.unpack("<I", buf[8:12])
        at = 12
    else:
        raise ValueError(f"npy: unsupported version {major}")
    if at + hlen > len(buf):
        raise ValueError("npy: header overruns the payload")
    try:
        spec = ast.literal_eval(buf[at : at + hlen].decode("latin1"))
    except (ValueError, SyntaxError) as e:
        raise ValueError(f"npy: bad header dict: {e}") from None
    if not isinstance(spec, dict):
        raise ValueError("npy: header is not a dict")
    if spec.get("fortran_order"):
        raise NotImplementedError("npy: fortran_order is a disclosed boundary")
    try:
        dt = np.dtype(spec["descr"])
    except (KeyError, TypeError) as e:
        raise ValueError(f"npy: bad descr: {e}") from None
    if dt.byteorder == ">":
        raise ValueError("npy: big-endian payloads unsupported")
    shape = spec.get("shape")
    if not isinstance(shape, tuple) or not all(
        isinstance(d, int) and d >= 0 for d in shape
    ):
        raise ValueError("npy: bad shape")
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    body = buf[at + hlen :]
    if len(body) < n * dt.itemsize:
        raise ValueError("npy: truncated array data")
    if len(body) > n * dt.itemsize:
        raise ValueError("npy: trailing bytes after array data")
    return np.frombuffer(body, dt, count=n).reshape(shape)


def write_npz(arrays: dict[str, np.ndarray]) -> bytes:
    """.npz = ZIP of .npy members (stored; names emitted sorted)."""
    from .zipf import write_zip

    return write_zip(
        [
            (f"{name}.npy", write_npy(arr))
            for name, arr in sorted(arrays.items())
        ],
        method="store",
    )


def parse_npz(data: bytes) -> dict[str, np.ndarray]:
    from .zipf import parse_zip

    out = {}
    for name, payload, _method in parse_zip(data):
        if not name.endswith(".npy"):
            raise ValueError(f"npz: non-npy member {name!r}")
        out[name[:-4]] = parse_npy(payload)
    return out
