"""POSIX ustar TAR archives + the WebDataset shard convention.

TAR is the de-facto shard format of large-scale training data:
WebDataset-style pipelines store a corpus as ``.tar`` / ``.tar.gz``
shards where each SAMPLE is a run of adjacent members sharing a
basename (``000123.txt`` + ``000123.cls`` + ``000123.jpg`` …), which
makes a 100 TB corpus sequentially readable, object-store friendly,
and splittable at shard granularity.  This module implements the
ustar subset those shards use, from the public POSIX.1-1988 layout:
512-byte headers (octal size/mtime/checksum fields, ``ustar`` magic),
data padded to block size, two zero blocks as end-of-archive, and the
header checksum computed with the checksum field blanked to spaces.

The writer emits deterministic bytes (fixed mtime/uid/gid/mode) for
fixture synthesis and round trips; gzip framing comes from
``functions/warc.py``'s deterministic member codec (a ``.tar.gz`` is
one gzip member).  The reference pipeline has no archive surface
(NetCDF rasters only, ``/root/reference/asip_v2/archive.py:19-20``);
§2.11 surface.

Fuzz contract (SCALE.md round 10): ``parse_tar`` raises ``ValueError``
on malformed input — bad magic, non-octal fields, checksum mismatch,
truncated data or missing terminator — never ``IndexError`` or
silent truncation.
"""

from __future__ import annotations

_BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated zero-padded octal field (the ustar form)."""
    s = format(value, "o").rjust(width - 1, "0")
    if len(s) >= width:
        raise ValueError(f"tar: value {value} overflows {width}-byte field")
    return s.encode("ascii") + b"\x00"


def _header(name: str, size: int, typeflag: bytes = b"0") -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError(f"tar: name too long ({len(nb)} > 100)")
    h = bytearray(_BLOCK)
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime (deterministic)
    h[148:156] = b" " * 8  # checksum blank during computation
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = format(chk, "o").rjust(6, "0").encode() + b"\x00 "
    return bytes(h)


def write_tar(entries: list[tuple[str, bytes]]) -> bytes:
    """A complete ustar archive from ``(name, data)`` members, in
    order, with deterministic metadata and the two-zero-block
    terminator."""
    parts = []
    for name, data in entries:
        data = bytes(data)
        parts.append(_header(name, len(data)))
        parts.append(data)
        pad = -len(data) % _BLOCK
        if pad:
            parts.append(bytes(pad))
    parts.append(bytes(2 * _BLOCK))
    return b"".join(parts)


def _field_int(h: bytes, at: int, width: int, what: str) -> int:
    raw = h[at : at + width].split(b"\x00", 1)[0].strip()
    if not raw:
        return 0
    try:
        return int(raw, 8)
    except ValueError:
        raise ValueError(f"tar: non-octal {what} field") from None


def parse_tar(data: bytes) -> list[tuple[str, bytes]]:
    """Parse a ustar archive into ``(name, data)`` members (regular
    files only; other typeflags are skipped over but validated).
    Loud ``ValueError`` on bad magic, checksum mismatch, non-octal
    fields, truncated member data or a missing end-of-archive
    terminator."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("tar: payload must be bytes")
    data = bytes(data)
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(data)
    while True:
        if pos + _BLOCK > n:
            raise ValueError("tar: truncated header block")
        h = data[pos : pos + _BLOCK]
        if h == bytes(_BLOCK):
            # first zero block: require the second, then stop
            if data[pos + _BLOCK : pos + 2 * _BLOCK] != bytes(_BLOCK):
                raise ValueError("tar: missing second terminator block")
            return out
        if h[257:262] != b"ustar":
            raise ValueError("tar: bad magic")
        stored = h[148:156].split(b"\x00", 1)[0].strip()
        try:
            want = int(stored, 8)
        except ValueError:
            raise ValueError("tar: non-octal checksum field") from None
        if sum(h[:148]) + 8 * 0x20 + sum(h[156:]) != want:
            raise ValueError("tar: header checksum mismatch")
        size = _field_int(h, 124, 12, "size")
        name = h[:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        body_at = pos + _BLOCK
        if body_at + size > n:
            raise ValueError("tar: truncated member data")
        if h[156:157] in (b"0", b"\x00"):
            out.append((name, data[body_at : body_at + size]))
        pos = body_at + size + (-size % _BLOCK)


def write_webdataset_shard(
    samples: list[tuple[str, list[tuple[str, bytes]]]],
    gzip: bool = True,
) -> bytes:
    """A WebDataset-style shard: per sample, members named
    ``<key>.<ext>`` laid out ADJACENTLY (the convention that lets a
    sequential reader group them without an index), optionally
    gzipped as one deterministic member."""
    entries = [
        (f"{key}.{ext}", payload)
        for key, fields in samples
        for ext, payload in fields
    ]
    blob = write_tar(entries)
    if gzip:
        from .warc import gzip_member

        blob = gzip_member(blob)
    return blob


def parse_webdataset_shard(
    data: bytes,
) -> list[tuple[str, dict[str, bytes]]]:
    """Group a (possibly gzipped) shard's members into samples by
    basename: ``(key, {ext: payload})`` in first-appearance order.
    A basename whose members are not adjacent violates the WebDataset
    layout contract and raises (at corpus scale, non-adjacent members
    silently split one sample into two half-samples)."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        from .warc import split_gzip_members

        members = split_gzip_members(data)
        data = b"".join(members)
    out: list[tuple[str, dict[str, bytes]]] = []
    seen: set[str] = set()
    for name, payload in parse_tar(data):
        key, dot, ext = name.partition(".")
        if not dot:
            raise ValueError(f"tar: member {name!r} has no extension")
        if out and out[-1][0] == key:
            fields = out[-1][1]
        elif key in seen:
            raise ValueError(
                f"tar: sample {key!r} members are not adjacent"
            )
        else:
            out.append((key, {}))
            seen.add(key)
            fields = out[-1][1]
        if ext in fields:
            raise ValueError(f"tar: duplicate field {name!r}")
        fields[ext] = payload
    return out
