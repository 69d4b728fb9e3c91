"""Minimal ZIP archive reader/writer (PKWARE APPNOTE subset).

ZIP is how datasets ship: code corpora, Kaggle dumps, document
collections — an ingestion engine that can't open a zip can't read
half the public data ecosystem.  Implemented from the public APPNOTE
layout: local file headers (``PK\\x03\\x04``), central directory
(``PK\\x01\\x02``) and end-of-central-directory (``PK\\x05\\x06``),
with STORE (0) and DEFLATE (8) methods, CRC-32 verification per
member, and the central directory — not a linear scan — as the source
of truth (the APPNOTE contract, and what makes a zip randomly
accessible: at 100 TB a reader fetches the directory then ranges the
members it wants).

The writer emits deterministic bytes (DOS timestamp fixed to the
1980-01-01 epoch) for fixture synthesis and round trips.  The
reference pipeline has no archive surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Disclosed boundaries (``NotImplementedError``): ZIP64, encryption,
compression methods beyond store/deflate, multi-disk archives.

Fuzz contract (SCALE.md round 10): ``parse_zip`` raises ``ValueError``
on malformed input — missing/ambiguous EOCD, signature mismatches,
out-of-bounds offsets, CRC or size mismatches — never ``IndexError``/
``struct.error``/``zlib.error`` escapes, never unbounded allocation.
"""

from __future__ import annotations

import struct
import zlib

_LFH = b"PK\x03\x04"
_CDH = b"PK\x01\x02"
_EOCD = b"PK\x05\x06"

# deterministic DOS date/time: 1980-01-01 00:00:00
_DOS_TIME = 0
_DOS_DATE = 0x0021


def write_zip(
    entries: list[tuple[str, bytes]],
    method: str = "deflate",
    level: int = 6,
) -> bytes:
    """A complete ZIP archive from ``(name, data)`` members.
    ``method`` is ``"store"``, ``"deflate"``, or ``"auto"`` (deflate
    unless it doesn't shrink the member — the standard writer
    heuristic)."""
    if method not in ("store", "deflate", "auto"):
        raise ValueError(f"zip: unknown method {method!r}")
    blob = bytearray()
    central = bytearray()
    count = 0
    for name, data in entries:
        data = bytes(data)
        nb = name.encode("utf-8")
        if len(nb) > 0xFFFF:
            raise ValueError("zip: name too long")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        m = 8
        if method == "store":
            m = 0
        packed = data
        if m == 8 or method == "auto":
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            cand = co.compress(data) + co.flush()
            if method == "auto" and len(cand) >= len(data):
                m = 0
            else:
                m, packed = 8, cand
        if len(data) > 0xFFFFFFFF or len(packed) > 0xFFFFFFFF:
            raise NotImplementedError("zip: ZIP64 sizes")
        offset = len(blob)
        lfh = (
            _LFH
            + struct.pack("<HHH", 20, 0, m)
            + struct.pack("<HH", _DOS_TIME, _DOS_DATE)
            + struct.pack("<III", crc, len(packed), len(data))
            + struct.pack("<HH", len(nb), 0)
            + nb
        )
        blob += lfh + packed
        central += (
            _CDH
            + struct.pack("<HH", 20, 20)  # made-by, needed
            + struct.pack("<HH", 0, m)
            + struct.pack("<HH", _DOS_TIME, _DOS_DATE)
            + struct.pack("<III", crc, len(packed), len(data))
            + struct.pack("<HHH", len(nb), 0, 0)  # name/extra/comment
            + struct.pack("<HHII", 0, 0, 0, offset)  # disk/attrs/off
            + nb
        )
        count += 1
    cd_at = len(blob)
    if count > 0xFFFF or cd_at > 0xFFFFFFFF:
        raise NotImplementedError("zip: ZIP64 directory")
    eocd = _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, count, count, len(central), cd_at, 0
    )
    return bytes(blob) + bytes(central) + eocd


def parse_zip(data: bytes) -> list[tuple[str, bytes, str]]:
    """Parse a ZIP archive via its central directory into
    ``(name, data, method)`` members in directory order, with CRC-32
    and size verification per member."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("zip: payload must be bytes")
    data = bytes(data)
    # EOCD: scan backward through the trailing comment window
    lo = max(0, len(data) - 0xFFFF - 22)
    at = data.rfind(_EOCD, lo)
    if at < 0:
        raise ValueError("zip: missing end-of-central-directory")
    if at + 22 > len(data):
        raise ValueError("zip: truncated end-of-central-directory")
    (
        disk,
        cd_disk,
        n_here,
        n_total,
        cd_size,
        cd_at,
        _comment,
    ) = struct.unpack("<HHHHIIH", data[at + 4 : at + 22])
    if disk or cd_disk:
        raise NotImplementedError("zip: multi-disk archive")
    if n_here != n_total:
        raise ValueError("zip: inconsistent entry counts")
    if n_total == 0xFFFF or cd_at == 0xFFFFFFFF:
        raise NotImplementedError("zip: ZIP64 directory")
    if cd_at + cd_size > len(data):
        raise ValueError("zip: central directory exceeds file")

    out: list[tuple[str, bytes, str]] = []
    pos = cd_at
    for _ in range(n_total):
        if data[pos : pos + 4] != _CDH:
            raise ValueError("zip: bad central-directory signature")
        if pos + 46 > len(data):
            raise ValueError("zip: truncated central-directory entry")
        (
            _vm, _vn, flags, m, _t, _d, crc, csize, usize,
            nlen, elen, clen, _dk, _ia, _ea, off,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", data[pos + 4 : pos + 46])
        name_at = pos + 46
        if name_at + nlen + elen + clen > len(data):
            raise ValueError("zip: central entry fields exceed file")
        if flags & 0x1:
            raise NotImplementedError("zip: encrypted member")
        if flags & 0x8:
            raise NotImplementedError("zip: streamed data descriptor")
        name = data[name_at : name_at + nlen].decode("utf-8", "replace")
        pos = name_at + nlen + elen + clen
        # local header: re-derive the data offset (its name/extra
        # lengths may legitimately differ from the central copy)
        if off + 30 > len(data) or data[off : off + 4] != _LFH:
            raise ValueError(f"zip: bad local header for {name!r}")
        lnlen, lelen = struct.unpack("<HH", data[off + 26 : off + 30])
        data_at = off + 30 + lnlen + lelen
        if data_at + csize > len(data):
            raise ValueError(f"zip: member data exceeds file ({name!r})")
        packed = data[data_at : data_at + csize]
        if m == 0:
            if csize != usize:
                raise ValueError("zip: stored sizes disagree")
            body = packed
            method = "store"
        elif m == 8:
            d = zlib.decompressobj(-15)
            try:
                body = d.decompress(packed, usize + 1)
            except zlib.error as e:
                raise ValueError(f"zip: corrupt deflate member: {e}") from e
            method = "deflate"
        else:
            raise NotImplementedError(f"zip: compression method {m}")
        if len(body) != usize:
            raise ValueError(f"zip: size mismatch for {name!r}")
        if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip: CRC mismatch for {name!r}")
        out.append((name, body, method))
    return out
