"""WARC (Web ARChive) reader/writer + HTTP response parsing.

WARC is THE distribution format of web crawls (Common Crawl publishes
petabytes of ``.warc.gz``), which makes it the entry point of a
large-scale LLM training-data pipeline: object storage holds gzipped
WARC members, each wrapping one HTTP transaction, and the first
pipeline stage splits members → parses records → parses the HTTP
response → decodes the body → extracts text.  This module implements
that stage from the public specs (ISO 28500 / WARC 1.0-1.1, RFC 1952
gzip framing, RFC 9110/9112 HTTP semantics incl. chunked transfer
coding and gzip content coding) with zero non-stdlib dependencies.

The writer side exists for fixture synthesis and round-trip tests
(the ``_cached_media`` discipline: encode is fixture, decode is the
operator) and emits byte-deterministic output — the gzip member header
is hand-framed (fixed mtime 0, XFL 0, OS 255) so cached fixtures never
depend on the Python version's ``gzip`` defaults.

The reference pipeline has no web-crawl surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Fuzz contract (SCALE.md round 10): every parser of untrusted bytes
raises ``ValueError`` on malformed input — never ``IndexError`` /
``struct.error`` / ``zlib.error`` escapes, never a hang — so the
quarantining admission operators can gate on one exception class.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"


# --- deterministic gzip member framing (RFC 1952) ----------------------------


def gzip_member(data: bytes, level: int = 6) -> bytes:
    """One byte-deterministic gzip member: fixed header (mtime 0,
    XFL 0, OS 255 'unknown'), raw DEFLATE body, CRC32 + ISIZE trailer.
    Framed by hand so fixture bytes don't shift across Python/zlib
    default changes."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF
    return (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + body
        + crc.to_bytes(4, "little")
        + (len(data) & 0xFFFFFFFF).to_bytes(4, "little")
    )


def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members (the ``.warc.gz``
    layout: one member per record) into the list of member payloads.
    Validates magic, CRC32 and ISIZE per member; loud ``ValueError``
    on any truncation or corruption."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        pos_hdr = pos
        if n - pos < 18:  # minimal member: 10 hdr + deflate + 8 trailer
            raise ValueError("gzip: truncated member header")
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if data[pos + 2] != 8:
            raise ValueError("gzip: unsupported compression method")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError("gzip: reserved FLG bits set")
        pos += 10
        if flg & 0x04:  # FEXTRA
            if n - pos < 2:
                raise ValueError("gzip: truncated FEXTRA")
            xlen = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2 + xlen
        if flg & 0x08:  # FNAME
            z = data.find(b"\x00", pos)
            if z < 0:
                raise ValueError("gzip: unterminated FNAME")
            pos = z + 1
        if flg & 0x10:  # FCOMMENT
            z = data.find(b"\x00", pos)
            if z < 0:
                raise ValueError("gzip: unterminated FCOMMENT")
            pos = z + 1
        if flg & 0x02:  # FHCRC
            pos += 2
        if pos > n:
            raise ValueError("gzip: truncated member header")
        d = zlib.decompressobj(-15)
        try:
            payload = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"gzip: corrupt deflate stream: {e}") from e
        if not d.eof:
            raise ValueError("gzip: truncated deflate stream")
        trailer_at = n - len(d.unused_data)
        if n - trailer_at < 8:
            raise ValueError("gzip: truncated member trailer")
        crc = int.from_bytes(data[trailer_at : trailer_at + 4], "little")
        isize = int.from_bytes(
            data[trailer_at + 4 : trailer_at + 8], "little"
        )
        if crc != (zlib.crc32(payload) & 0xFFFFFFFF):
            raise ValueError("gzip: CRC mismatch")
        if isize != (len(payload) & 0xFFFFFFFF):
            raise ValueError("gzip: ISIZE mismatch")
        out.append(payload)
        pos = trailer_at + 8
        if pos <= pos_hdr:  # cannot happen, but never loop forever
            raise ValueError("gzip: no forward progress")
    return out


# --- WARC records -------------------------------------------------------------


def write_warc_record(headers: dict[str, str], block: bytes) -> bytes:
    """Serialize one WARC record: version line, named fields,
    Content-Length (computed), blank line, block, two CRLFs."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(block)}".encode())
    return _CRLF.join(lines) + _CRLF * 2 + block + _CRLF * 2


def write_warc(
    records: list[tuple[dict[str, str], bytes]],
    per_record_gzip: bool = True,
    level: int = 6,
) -> bytes:
    """A complete WARC file from ``(headers, block)`` records — one
    gzip member per record when ``per_record_gzip`` (the Common Crawl
    layout, which is what makes a 1 GB ``.warc.gz`` splittable: a
    reader can start at any member boundary), else plain
    concatenation."""
    parts = [write_warc_record(h, b) for h, b in records]
    if per_record_gzip:
        return b"".join(gzip_member(p, level) for p in parts)
    return b"".join(parts)


def _parse_headers(data: bytes, pos: int, what: str) -> tuple[dict, int]:
    """Parse CRLF-terminated header lines until the empty line;
    supports obs-fold continuations; returns (lower-cased dict, pos
    past the blank line)."""
    headers: dict[str, str] = {}
    last: str | None = None
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError(f"{what}: truncated headers")
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError(f"{what}: unterminated header line")
        line = data[pos:eol]
        pos = eol + 2
        if not line:
            return headers, pos
        if line[0] in (0x20, 0x09):  # obs-fold continuation
            if last is None:
                raise ValueError(f"{what}: continuation before any header")
            headers[last] += " " + line.strip().decode(
                "latin-1"
            )
            continue
        sep = line.find(b":")
        if sep <= 0:
            raise ValueError(f"{what}: malformed header line")
        key = line[:sep].decode("latin-1").strip().lower()
        headers[key] = line[sep + 1 :].decode("latin-1").strip()
        last = key


def iter_warc_records(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse a WARC file (gzipped members or plain) into
    ``(headers, block)`` records.  Headers come back lower-cased.
    Loud ``ValueError`` on malformed version lines, missing/invalid
    Content-Length, truncated blocks or missing record separators."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("warc: payload must be bytes")
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        chunks = split_gzip_members(data)
    else:
        chunks = [data]
    out: list[tuple[dict[str, str], bytes]] = []
    for chunk in chunks:
        pos = 0
        n = len(chunk)
        while pos < n:
            eol = chunk.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("warc: unterminated version line")
            version = chunk[pos:eol]
            if version not in (b"WARC/1.0", b"WARC/1.1"):
                raise ValueError(
                    f"warc: bad version line {version[:20]!r}"
                )
            headers, pos = _parse_headers(chunk, eol + 2, "warc")
            cl = headers.get("content-length")
            if cl is None or not cl.isdigit():
                raise ValueError("warc: missing/invalid Content-Length")
            length = int(cl)
            if pos + length > n:
                raise ValueError("warc: truncated record block")
            block = chunk[pos : pos + length]
            pos += length
            if chunk[pos : pos + 4] != b"\r\n\r\n":
                raise ValueError("warc: missing record separator")
            pos += 4
            out.append((headers, block))
    if not out:
        raise ValueError("warc: no records")
    return out


# --- HTTP response blocks (RFC 9112) ------------------------------------------


def write_http_response(
    status: int,
    headers: list[tuple[str, str]],
    body: bytes,
    chunked: bool = False,
    gzip_body: bool = False,
    chunk_size: int = 256,
    reason: str = "OK",
) -> bytes:
    """Serialize an HTTP/1.1 response block.  ``gzip_body`` applies
    Content-Encoding first, ``chunked`` then applies Transfer-Encoding
    on the encoded bytes (the RFC-ordered composition)."""
    payload = gzip_member(body) if gzip_body else body
    lines = [f"HTTP/1.1 {status} {reason}".encode("latin-1")]
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("latin-1"))
    if gzip_body:
        lines.append(b"Content-Encoding: gzip")
    if chunked:
        lines.append(b"Transfer-Encoding: chunked")
        frames = []
        for i in range(0, len(payload), chunk_size):
            part = payload[i : i + chunk_size]
            frames.append(f"{len(part):x}".encode() + _CRLF + part + _CRLF)
        frames.append(b"0" + _CRLF + _CRLF)
        tail = b"".join(frames)
    else:
        lines.append(f"Content-Length: {len(payload)}".encode())
        tail = payload
    return _CRLF.join(lines) + _CRLF * 2 + tail


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse an HTTP response block into ``(status, headers, body)``
    with transfer coding (chunked) and content coding (gzip/identity)
    removed.  Loud ``ValueError`` on malformed status lines, chunk
    framing, truncated bodies or unsupported codings."""
    eol = block.find(b"\r\n")
    if eol < 0:
        raise ValueError("http: unterminated status line")
    status_line = block[:eol]
    parts = status_line.split(b" ", 2)
    if (
        len(parts) < 2
        or not parts[0].startswith(b"HTTP/1.")
        or len(parts[1]) != 3
        or not parts[1].isdigit()
    ):
        raise ValueError(f"http: bad status line {status_line[:30]!r}")
    status = int(parts[1])
    headers, pos = _parse_headers(block, eol + 2, "http")
    te = headers.get("transfer-encoding", "").lower()
    if te and te != "chunked":
        raise ValueError(f"http: unsupported transfer-encoding {te!r}")
    if te == "chunked":
        body_parts = []
        n = len(block)
        while True:
            eol = block.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("http: unterminated chunk-size line")
            size_tok = block[pos:eol].split(b";", 1)[0].strip()
            try:
                size = int(size_tok, 16)
            except ValueError:
                raise ValueError(
                    f"http: bad chunk size {size_tok[:16]!r}"
                ) from None
            if size < 0:
                raise ValueError("http: negative chunk size")
            pos = eol + 2
            if size == 0:
                # trailer section: permit none, require final CRLF
                if block[pos : pos + 2] != _CRLF:
                    raise ValueError("http: missing last-chunk CRLF")
                break
            if pos + size + 2 > n:
                raise ValueError("http: truncated chunk")
            body_parts.append(block[pos : pos + size])
            if block[pos + size : pos + size + 2] != _CRLF:
                raise ValueError("http: missing chunk CRLF")
            pos += size + 2
        body = b"".join(body_parts)
    else:
        cl = headers.get("content-length")
        if cl is not None:
            if not cl.isdigit():
                raise ValueError("http: invalid Content-Length")
            length = int(cl)
            if pos + length > len(block):
                raise ValueError("http: truncated body")
            body = block[pos : pos + length]
        else:
            body = block[pos:]
    ce = headers.get("content-encoding", "identity").lower()
    if ce == "gzip":
        members = split_gzip_members(body)
        body = b"".join(members)
    elif ce not in ("identity", ""):
        raise ValueError(f"http: unsupported content-encoding {ce!r}")
    return status, headers, body


_CHARSETS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def charset_of(headers: dict[str, str], default: str = "utf-8") -> str:
    """Charset parameter of the Content-Type header (or ``default``)."""
    ct = headers.get("content-type", "")
    for param in ct.split(";")[1:]:
        k, _, v = param.partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip('"').lower()
    return default


def decode_body(headers: dict[str, str], body: bytes) -> str:
    """Decode an HTTP body per its declared charset; loud
    ``ValueError`` on unknown charsets or undecodable bytes."""
    cs = charset_of(headers)
    codec = _CHARSETS.get(cs)
    if codec is None:
        raise ValueError(f"http: unsupported charset {cs!r}")
    try:
        return body.decode(codec)
    except UnicodeDecodeError as e:
        raise ValueError(f"http: undecodable body ({cs}): {e}") from e
