"""Pure-Python classic NetCDF (CDF-1 / CDF-2) reader + minimal writer.

The reference ingests scenes with ``netCDF4.Dataset`` and reads each
variable as a masked array (``fil[name][:] ... .filled(np.nan)``,
/root/reference/asip_v2/archive.py:19-20).  That library is not in this
environment, but the *classic* NetCDF container is a simple, publicly
specified big-endian format (the NetCDF classic format spec), so the
fixture-sized files the tests need are parsed here directly — no
third-party dependency, NumPy does the bulk decode.

Scope (documented, asserted): classic CDF-1 (32-bit offsets) and CDF-2
(64-bit offsets); all six classic types; fixed and record variables;
dimension / attribute / variable headers.  NOT handled: CDF-5, HDF5-based
netCDF-4 files (magic ``\\x89HDF``) — those raise with a clear message.

Masking follows netCDF4's auto-mask default: values equal to the
variable's ``_FillValue`` (or ``missing_value``) attribute are masked;
without either attribute, the type's default fill value is used.  Masked
elements surface as NaN (floats) / None — the engine's NULL convention
(schemas.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}

# default fill values from the public netcdf.h
DEFAULT_FILL = {
    NC_BYTE: -127,
    NC_CHAR: b"\x00",
    NC_SHORT: -32767,
    NC_INT: -2147483647,
    NC_FLOAT: 9.9692099683868690e36,
    NC_DOUBLE: 9.9692099683868690e36,
}

_ABSENT, NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0, 0x0A, 0x0B, 0x0C


@dataclass
class _Var:
    name: str
    dimids: tuple[int, ...]
    nc_type: int
    vsize: int
    begin: int
    attrs: dict = field(default_factory=dict)


class ClassicNetCDF:
    """Parsed classic-format NetCDF file (read-only, from bytes)."""

    def __init__(self, payload: bytes):
        if payload[:4] == b"\x89HDF":
            raise ValueError(
                "netCDF-4/HDF5 file: this class is classic-only — use "
                "hdf5_min.HDF5NetCDF (decode_netcdf_scene dispatches "
                "automatically)"
            )
        if len(payload) < 4 or payload[:3] != b"CDF" or payload[3] not in (1, 2):
            raise ValueError(f"not a classic NetCDF file (magic {payload[:4]!r})")
        self._buf = payload
        self._offsets64 = payload[3] == 2
        self._pos = 4
        self.numrecs = self._i4()
        self.dim_names, self.dim_sizes = self._read_dims()
        self.attrs = self._read_attrs()
        self.variables = self._read_vars()

    # --- primitive readers -------------------------------------------------
    def _i4(self) -> int:
        v = struct.unpack_from(">i", self._buf, self._pos)[0]
        self._pos += 4
        return v

    def _i8(self) -> int:
        v = struct.unpack_from(">q", self._buf, self._pos)[0]
        self._pos += 8
        return v

    def _name(self) -> str:
        n = self._i4()
        s = self._buf[self._pos : self._pos + n].decode("utf-8")
        self._pos += (n + 3) // 4 * 4  # padded to 4-byte boundary
        return s

    # --- header sections ---------------------------------------------------
    def _read_dims(self):
        tag, nelems = self._i4(), self._i4()
        if tag not in (NC_DIMENSION, _ABSENT):
            raise ValueError(f"bad dim_list tag {tag}")
        names, sizes = [], []
        for _ in range(nelems):
            names.append(self._name())
            sizes.append(self._i4())  # 0 = record dimension
        return names, sizes

    def _read_attrs(self) -> dict:
        tag, nelems = self._i4(), self._i4()
        if tag not in (NC_ATTRIBUTE, _ABSENT):
            raise ValueError(f"bad att_list tag {tag}")
        out = {}
        for _ in range(nelems):
            name = self._name()
            nc_type = self._i4()
            n = self._i4()
            dt = _DTYPES[nc_type]
            nbytes = dt.itemsize * n
            raw = self._buf[self._pos : self._pos + nbytes]
            self._pos += (nbytes + 3) // 4 * 4
            if nc_type == NC_CHAR:
                out[name] = raw.decode("utf-8")
            else:
                vals = np.frombuffer(raw, dtype=dt)
                out[name] = vals[0] if n == 1 else vals
        return out

    def _read_vars(self) -> dict[str, _Var]:
        tag, nelems = self._i4(), self._i4()
        if tag not in (NC_VARIABLE, _ABSENT):
            raise ValueError(f"bad var_list tag {tag}")
        out = {}
        for _ in range(nelems):
            name = self._name()
            ndims = self._i4()
            dimids = tuple(self._i4() for _ in range(ndims))
            attrs = self._read_attrs()
            nc_type = self._i4()
            vsize = self._i4()
            begin = self._i8() if self._offsets64 else self._i4()
            out[name] = _Var(name, dimids, nc_type, vsize, begin, attrs)
        return out

    # --- data --------------------------------------------------------------
    def _is_record(self, v: _Var) -> bool:
        return bool(v.dimids) and self.dim_sizes[v.dimids[0]] == 0

    def shape(self, name: str) -> tuple[int, ...]:
        v = self.variables[name]
        return tuple(
            self.numrecs if self.dim_sizes[d] == 0 else self.dim_sizes[d]
            for d in v.dimids
        )

    def raw(self, name: str) -> np.ndarray:
        """Variable data with no mask applied (native dtype, host order)."""
        v = self.variables[name]
        dt = _DTYPES[v.nc_type]
        shape = self.shape(name)
        if not self._is_record(v):
            n = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(self._buf, dtype=dt, count=n, offset=v.begin)
            return arr.reshape(shape)
        # record variable: one slab per record, interleaved across all
        # record variables at stride recsize
        rec_vars = [u for u in self.variables.values() if self._is_record(u)]
        recsize = sum(u.vsize for u in rec_vars)
        per_rec = shape[1:]
        n_slab = int(np.prod(per_rec)) if per_rec else 1
        slabs = []
        for r in range(self.numrecs):
            off = v.begin + r * recsize
            slabs.append(np.frombuffer(self._buf, dtype=dt, count=n_slab, offset=off))
        return np.stack(slabs).reshape(shape) if slabs else np.empty(shape, dt)

    def masked(self, name: str) -> np.ndarray:
        """Variable as float64 with fill values -> NaN (the ``.filled(nan)``
        read the reference does, archive.py:19-20)."""
        v = self.variables[name]
        arr = self.raw(name)
        if v.nc_type == NC_CHAR:
            raise TypeError("masked() is for numeric variables")
        fill = v.attrs.get("_FillValue", v.attrs.get("missing_value"))
        if fill is None:
            fill = DEFAULT_FILL[v.nc_type]
        fill_arr = np.asarray(fill).astype(arr.dtype.newbyteorder("="))
        out = arr.astype(np.float64)
        mask = arr == fill_arr
        if v.nc_type in (NC_FLOAT, NC_DOUBLE):
            mask |= np.isnan(out)
        out[mask] = np.nan
        return out


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name_bytes(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_bytes(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", _ABSENT, 0)
    out = [struct.pack(">ii", NC_ATTRIBUTE, len(attrs))]
    for k, v in attrs.items():
        out.append(_name_bytes(k))
        if isinstance(v, str):
            raw = v.encode("utf-8")
            out.append(struct.pack(">ii", NC_CHAR, len(raw)))
            out.append(_pad4(raw))
        else:
            a = np.atleast_1d(np.asarray(v))
            nc_type = {
                "i1": NC_BYTE, "i2": NC_SHORT, "i4": NC_INT,
                "f4": NC_FLOAT, "f8": NC_DOUBLE,
            }[a.dtype.newbyteorder("=").str[1:]]
            out.append(struct.pack(">ii", nc_type, a.size))
            out.append(_pad4(a.astype(_DTYPES[nc_type]).tobytes()))
    return b"".join(out)


def write_classic(
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
    gatts: dict | None = None,
    version: int = 1,
) -> bytes:
    """Minimal classic CDF-1/CDF-2 writer (fixed-size variables only) —
    enough to build test fixtures without the netCDF4 library.
    ``variables`` maps name -> (dim names, array, attrs)."""
    dim_ids = {name: i for i, name in enumerate(dims)}
    begin_fmt = ">q" if version == 2 else ">i"
    header = [b"CDF" + bytes([version]), struct.pack(">i", 0)]  # no record vars
    header.append(struct.pack(">ii", NC_DIMENSION, len(dims)))
    for name, size in dims.items():
        header.append(_name_bytes(name) + struct.pack(">i", size))
    header.append(_attr_bytes(gatts or {}))

    # first pass with placeholder begins to measure the header
    def var_bytes(begins: dict[str, int]) -> bytes:
        out = [struct.pack(">ii", NC_VARIABLE, len(variables))]
        for name, (vdims, arr, attrs) in variables.items():
            out.append(_name_bytes(name))
            out.append(struct.pack(">i", len(vdims)))
            for d in vdims:
                out.append(struct.pack(">i", dim_ids[d]))
            out.append(_attr_bytes(attrs))
            dt_map = {
                "i1": NC_BYTE, "i2": NC_SHORT, "i4": NC_INT,
                "f4": NC_FLOAT, "f8": NC_DOUBLE,
            }
            nc_type = dt_map[np.asarray(arr).dtype.newbyteorder("=").str[1:]]
            data = np.asarray(arr).astype(_DTYPES[nc_type]).tobytes()
            vsize = len(_pad4(data))
            out.append(struct.pack(">ii", nc_type, vsize))
            out.append(struct.pack(begin_fmt, begins.get(name, 0)))
        return b"".join(out)

    head = b"".join(header)
    hdr_len = len(head) + len(var_bytes({}))
    begins, off = {}, hdr_len
    payloads = {}
    for name, (vdims, arr, attrs) in variables.items():
        data = _pad4(
            np.asarray(arr)
            .astype(_DTYPES[{
                "i1": NC_BYTE, "i2": NC_SHORT, "i4": NC_INT,
                "f4": NC_FLOAT, "f8": NC_DOUBLE,
            }[np.asarray(arr).dtype.newbyteorder("=").str[1:]]])
            .tobytes()
        )
        begins[name] = off
        payloads[name] = data
        off += len(data)
    return head + var_bytes(begins) + b"".join(payloads.values())
