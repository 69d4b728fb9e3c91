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

r11 closed two boundaries: **ZIP64** (the 0x0001 extra field on
local + central headers, the EOCD64 record + locator, and sentinel
resolution per APPNOTE §4.5.3 — how every >4 GB dataset archive
ships) and **streamed members** (general-purpose flag bit 3: local
sizes zeroed, a data descriptor follows the payload; the central
directory stays the source of truth, which is exactly why this
reader keys off it).  Disclosed boundaries (``NotImplementedError``):
encryption, compression methods beyond store/deflate, multi-disk
archives.

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
_EOCD64 = b"PK\x06\x06"
_EOCD64_LOC = b"PK\x06\x07"
_DD = b"PK\x07\x08"
_Z64_XID = 0x0001

# deterministic DOS date/time: 1980-01-01 00:00:00
_DOS_TIME = 0
_DOS_DATE = 0x0021


def write_zip(
    entries: list[tuple[str, bytes]],
    method: str = "deflate",
    level: int = 6,
    force_zip64: bool = False,
    streamed: bool = False,
) -> bytes:
    """A complete ZIP archive from ``(name, data)`` members.
    ``method`` is ``"store"``, ``"deflate"``, or ``"auto"`` (deflate
    unless it doesn't shrink the member — the standard writer
    heuristic).  ``force_zip64`` writes the ZIP64 layout regardless of
    size (what tests exercise without 4 GB fixtures; real >limit
    archives switch automatically).  ``streamed`` writes
    general-purpose flag bit 3 members: zeroed local sizes + a data
    descriptor after the payload — the shape streaming producers
    (jar/HTTP uploads) emit."""
    if method not in ("store", "deflate", "auto"):
        raise ValueError(f"zip: unknown method {method!r}")
    blob = bytearray()
    central = bytearray()
    count = 0
    sentinel = 0xFFFFFFFF
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
        z64 = (
            force_zip64
            or len(data) > 0xFFFFFFFF
            or len(packed) > 0xFFFFFFFF
        )
        offset = len(blob)
        flags = 0x8 if streamed else 0
        need = 45 if z64 else 20
        if streamed:
            l_crc = l_csize = l_usize = 0
        else:
            l_crc = crc
            l_csize = sentinel if z64 else len(packed)
            l_usize = sentinel if z64 else len(data)
        l_extra = b""
        if z64:
            # streamed ZIP64 members still carry the zip64 extra in
            # the LFH (zero sizes) — readers key the 8-byte data
            # descriptor off its presence (APPNOTE 4.3.9.2)
            l_extra = struct.pack(
                "<HHQQ",
                _Z64_XID,
                16,
                0 if streamed else len(data),
                0 if streamed else len(packed),
            )
        lfh = (
            _LFH
            + struct.pack("<HHH", need, flags, m)
            + struct.pack("<HH", _DOS_TIME, _DOS_DATE)
            + struct.pack("<III", l_crc, l_csize, l_usize)
            + struct.pack("<HH", len(nb), len(l_extra))
            + nb
            + l_extra
        )
        blob += lfh + packed
        if streamed:
            # data descriptor (with the optional-but-universal PK78
            # signature); ZIP64 members carry 8-byte sizes here
            if z64:
                blob += _DD + struct.pack(
                    "<IQQ", crc, len(packed), len(data)
                )
            else:
                blob += _DD + struct.pack(
                    "<III", crc, len(packed), len(data)
                )
        c_extra = bytearray()
        z64_fields = b""
        if z64:
            z64_fields = struct.pack("<QQQ", len(data), len(packed), offset)
            c_extra += struct.pack("<HH", _Z64_XID, 24) + z64_fields
        central += (
            _CDH
            + struct.pack("<HH", need, need)  # made-by, needed
            + struct.pack("<HH", flags, m)
            + struct.pack("<HH", _DOS_TIME, _DOS_DATE)
            + struct.pack(
                "<III",
                crc,
                sentinel if z64 else len(packed),
                sentinel if z64 else len(data),
            )
            + struct.pack("<HHH", len(nb), len(c_extra), 0)
            + struct.pack(
                "<HHII", 0, 0, 0, sentinel if z64 else offset
            )
            + nb
            + c_extra
        )
        count += 1
    cd_at = len(blob)
    dir64 = force_zip64 or count > 0xFFFF or cd_at > 0xFFFFFFFF
    out = bytes(blob) + bytes(central)
    if dir64:
        eocd64_at = len(out)
        eocd64 = _EOCD64 + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0, count, count,
            len(central), cd_at,
        )
        loc = _EOCD64_LOC + struct.pack("<IQI", 0, eocd64_at, 1)
        eocd = _EOCD + struct.pack(
            "<HHHHIIH",
            0, 0,
            min(count, 0xFFFF), min(count, 0xFFFF),
            min(len(central), 0xFFFFFFFF),
            0xFFFFFFFF,
            0,
        )
        return out + eocd64 + loc + eocd
    eocd = _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, count, count, len(central), cd_at, 0
    )
    return out + eocd


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
    if n_total == 0xFFFF or cd_at == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        # ZIP64: the locator sits immediately before the EOCD and
        # points at the EOCD64 record (APPNOTE 4.3.15)
        if at < 20 or data[at - 20 : at - 16] != _EOCD64_LOC:
            raise ValueError("zip: ZIP64 sentinel without locator")
        l_disk, e64_at, n_disks = struct.unpack(
            "<IQI", data[at - 16 : at]
        )
        if l_disk or n_disks > 1:
            raise NotImplementedError("zip: multi-disk archive")
        if e64_at + 56 > len(data) or data[e64_at : e64_at + 4] != _EOCD64:
            raise ValueError("zip: bad EOCD64 record")
        (
            _sz, _vm64, _vn64, d64, cdd64, n_here64, n_total64,
            cd_size64, cd_at64,
        ) = struct.unpack("<QHHIIQQQQ", data[e64_at + 4 : e64_at + 56])
        if d64 or cdd64:
            raise NotImplementedError("zip: multi-disk archive")
        if n_here64 != n_total64:
            raise ValueError("zip: inconsistent ZIP64 entry counts")
        n_total, cd_size, cd_at = n_total64, cd_size64, cd_at64
        if n_total > len(data):
            raise ValueError("zip: implausible ZIP64 entry count")
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
        # flag bit 3 (streamed data descriptor) needs no special
        # handling HERE: this reader takes sizes/CRC from the central
        # directory, which streaming writers fill in at close — the
        # zeroed local header and trailing descriptor never get read
        name = data[name_at : name_at + nlen].decode("utf-8", "replace")
        if usize == 0xFFFFFFFF or csize == 0xFFFFFFFF or off == 0xFFFFFFFF:
            # ZIP64 extra field: u64 replacements appear in fixed
            # order, only for the fields set to the sentinel
            xpos, xend = name_at + nlen, name_at + nlen + elen
            fields: list[int] = []
            while xpos + 4 <= xend:
                xid, xsz = struct.unpack("<HH", data[xpos : xpos + 4])
                if xpos + 4 + xsz > xend:
                    raise ValueError("zip: extra field exceeds entry")
                if xid == _Z64_XID:
                    body = data[xpos + 4 : xpos + 4 + xsz]
                    fields = [
                        int.from_bytes(body[k : k + 8], "little")
                        for k in range(0, (len(body) // 8) * 8, 8)
                    ]
                    break
                xpos += 4 + xsz
            want = (
                (usize == 0xFFFFFFFF)
                + (csize == 0xFFFFFFFF)
                + (off == 0xFFFFFFFF)
            )
            if len(fields) < want:
                raise ValueError(
                    f"zip: missing ZIP64 extra for {name!r}"
                )
            it = iter(fields)
            if usize == 0xFFFFFFFF:
                usize = next(it)
            if csize == 0xFFFFFFFF:
                csize = next(it)
            if off == 0xFFFFFFFF:
                off = next(it)
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
