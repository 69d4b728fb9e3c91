"""Minimal Ogg container (RFC 3533) muxer + demuxer, with the
FLAC-in-Ogg mapping.

Ogg completes the repo's open-container family (Matroska, MP4, Ogg —
the three containers a crawled media corpus actually contains).  The
page structure is public and small: a 27-byte header (capture pattern
``OggS``, version 0, header-type flags, 64-bit granule position,
stream serial, page sequence, CRC-32, segment count) followed by a
lacing table (packets as runs of 255-byte segments, a <255 value
terminating each packet; packets may continue across pages via the
``continued`` flag).  The page CRC uses the non-reflected CRC-32 with
polynomial 0x04C11DB7, initial value 0, no final XOR, computed with
the CRC field zeroed.

The FLAC-in-Ogg mapping (published with the FLAC format): the first
packet is ``0x7F 'FLAC' <major> <minor> <n_headers:be16>`` followed by
the native stream's ``fLaC`` magic + STREAMINFO block; any further
metadata blocks ride one-per-packet; every audio packet is exactly one
FLAC frame; the granule position of a page is the index of the last
sample contained in the last completed packet on it.

The writer exists for fixture synthesis and round trips (the
``_cached_media`` discipline) and emits deterministic bytes.  The
reference pipeline has no media containers (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Fuzz contract (SCALE.md round 10): the parser raises ``ValueError`` on
malformed input — CRC mismatches, bad capture patterns, sequence gaps,
continuation orphans, truncated lacing — never ``IndexError``/
``struct.error`` escapes, never unbounded allocation.
"""

from __future__ import annotations

_CRC_TAB: list[int] | None = None


def _crc_table() -> list[int]:
    global _CRC_TAB
    if _CRC_TAB is None:
        tab = []
        for b in range(256):
            r = b << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _CRC_TAB = tab
    return _CRC_TAB


def ogg_crc(data: bytes) -> int:
    """CRC-32/Ogg: poly 0x04C11DB7, init 0, not reflected, no xorout."""
    tab = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


_ALL_ONES = (1 << 64) - 1  # granule of a page where no packet ends


def _page(
    serial: int,
    seq: int,
    granule: int,
    flags: int,
    segments: list[bytes],
    laces: list[int],
) -> bytes:
    hdr = (
        b"OggS\x00"
        + bytes([flags])
        + (granule & _ALL_ONES).to_bytes(8, "little")
        + (serial & 0xFFFFFFFF).to_bytes(4, "little")
        + (seq & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(laces)])
        + bytes(laces)
    )
    body = b"".join(segments)
    crc = ogg_crc(hdr + body)
    return hdr[:22] + crc.to_bytes(4, "little") + hdr[26:] + body


def write_ogg(
    packets: list[tuple[bytes, int]],
    serial: int = 1,
    packets_per_page: int = 8,
) -> bytes:
    """Mux ``(payload, granule)`` packets into one logical Ogg stream.
    ``granule`` is recorded on the page where the packet ends (the
    last completed packet's granule wins, per spec); up to
    ``packets_per_page`` whole packets share a page, and oversized
    packets span pages with the ``continued`` flag (granule −1 on
    pages where no packet completes).  First page carries BOS and only
    the first packet (the header-page convention); the last page
    carries EOS."""
    if not packets:
        raise ValueError("ogg: no packets")
    pages: list[bytes] = []
    seq = 0

    def emit(segs, laces, granule, flags):
        nonlocal seq
        pages.append(_page(serial, seq, granule, flags, segs, laces))
        seq += 1

    # page assembly state
    segs: list[bytes] = []
    laces: list[int] = []
    gran = _ALL_ONES
    n_done = 0  # whole packets on the current page

    def flush(flags=0):
        nonlocal segs, laces, gran, n_done
        if laces:
            emit(segs, laces, gran, flags)
            segs, laces, gran, n_done = [], [], _ALL_ONES, 0

    for pi, (payload, granule) in enumerate(packets):
        payload = bytes(payload)
        # lacing values for this packet
        pl = [255] * (len(payload) // 255) + [len(payload) % 255]
        offs = 0
        first_of_packet = True
        while pl:
            room = 255 - len(laces)
            if room == 0 or (not first_of_packet and laces):
                flush()
                room = 255
            take = pl[:room]
            pl = pl[room:]
            nbytes = sum(take)
            segs.append(payload[offs : offs + nbytes])
            offs += nbytes
            laces.extend(take)
            flags = 0
            if pi == 0 and seq == 0 and not pages:
                flags |= 0x02  # BOS
            if not first_of_packet:
                flags |= 0x01  # continued packet
            if pl:  # packet continues on the next page
                emit(segs, laces, _ALL_ONES, flags)
                segs, laces, gran, n_done = [], [], _ALL_ONES, 0
                first_of_packet = False
            else:
                gran = granule
                n_done += 1
                if flags & 0x03:
                    # BOS/continued pages flush immediately so the
                    # header-page convention holds and flags stay exact
                    emit(segs, laces, gran, flags)
                    segs, laces, gran, n_done = [], [], _ALL_ONES, 0
                elif n_done >= packets_per_page:
                    flush()
        first_of_packet = True
    # final page: EOS.  If everything already flushed, emit an empty
    # EOS page (spec-legal: zero segments).
    if laces:
        emit(segs, laces, gran, 0x04)
    else:
        emit([], [], gran, 0x04)
    return b"".join(pages)


def parse_ogg(data: bytes) -> dict[int, list[tuple[int, bytes]]]:
    """Parse a (possibly multiplexed) Ogg byte stream into
    ``{serial: [(granule_of_completing_page, packet), ...]}``.
    Validates capture pattern, version, CRC, per-stream sequence
    continuity and continuation flags; loud ``ValueError`` on any
    violation or truncation."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("ogg: payload must be bytes")
    data = bytes(data)
    out: dict[int, list[tuple[int, bytes]]] = {}
    pending: dict[int, bytearray] = {}
    next_seq: dict[int, int] = {}
    ended: set[int] = set()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 27 > n:
            raise ValueError("ogg: truncated page header")
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: bad capture pattern")
        if data[pos + 4] != 0:
            raise ValueError("ogg: unsupported version")
        flags = data[pos + 5]
        if flags & 0xF8:
            raise ValueError("ogg: reserved header flags set")
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little")
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(data[pos + 18 : pos + 22], "little")
        crc = int.from_bytes(data[pos + 22 : pos + 26], "little")
        nseg = data[pos + 26]
        lace_at = pos + 27
        if lace_at + nseg > n:
            raise ValueError("ogg: truncated lacing table")
        laces = data[lace_at : lace_at + nseg]
        body_at = lace_at + nseg
        body_len = sum(laces)
        if body_at + body_len > n:
            raise ValueError("ogg: truncated page body")
        page = data[pos : body_at + body_len]
        zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        if ogg_crc(zeroed) != crc:
            raise ValueError("ogg: page CRC mismatch")
        if serial in ended:
            raise ValueError("ogg: page after EOS")
        if flags & 0x02:
            if serial in next_seq:
                raise ValueError("ogg: duplicate BOS")
            if seq != 0:
                raise ValueError("ogg: BOS page with nonzero sequence")
        exp = next_seq.get(serial, 0)
        if seq != exp:
            raise ValueError(
                f"ogg: sequence gap (expected {exp}, got {seq})"
            )
        next_seq[serial] = seq + 1
        buf = pending.setdefault(serial, bytearray())
        if flags & 0x01:
            if not buf:
                raise ValueError("ogg: continuation without pending packet")
        elif buf:
            raise ValueError("ogg: pending packet not continued")
        stream = out.setdefault(serial, [])
        off = body_at
        for i, lace in enumerate(laces):
            buf += data[off : off + lace]
            off += lace
            if lace < 255:
                stream.append((granule, bytes(buf)))
                buf.clear()
        if flags & 0x04:
            if buf:
                raise ValueError("ogg: EOS with unterminated packet")
            ended.add(serial)
        pos = body_at + body_len
    for serial, buf in pending.items():
        if buf:
            raise ValueError("ogg: truncated packet at end of stream")
    if not out:
        raise ValueError("ogg: no pages")
    return out


# --- FLAC-in-Ogg mapping -------------------------------------------------------


def write_ogg_flac(
    native_flac: bytes,
    serial: int = 1,
    packets_per_page: int = 8,
) -> bytes:
    """Wrap a native FLAC stream per the FLAC-in-Ogg mapping: first
    packet = ``0x7F FLAC 1 0 <0 headers>`` + the stream's metadata
    headers; one frame per audio packet; granule = index of the last
    sample of the packet's frame (block size + total samples read from
    the stream's own STREAMINFO)."""
    from .flac import flac_codec_private, flac_frames

    headers = flac_codec_private(native_flac)
    info, frames = flac_frames(native_flac)
    block = info["max_block"]
    total = info["total_samples"]
    first = b"\x7fFLAC\x01\x00" + (0).to_bytes(2, "big") + headers
    packets = [(first, 0)]
    for i, fr in enumerate(frames):
        granule = min((i + 1) * block, total) if total else 0
        packets.append((fr, granule))
    return write_ogg(
        packets, serial=serial, packets_per_page=packets_per_page
    )


def parse_ogg_flac(data: bytes) -> tuple[bytes, int]:
    """Extract ``(native_flac_stream, n_frame_packets)`` from an Ogg
    stream containing one FLAC logical bitstream (the first stream
    whose BOS packet carries the ``0x7F FLAC`` signature)."""
    streams = parse_ogg(data)
    for serial in sorted(streams):
        packets = streams[serial]
        if packets and packets[0][1][:5] == b"\x7fFLAC":
            p0 = packets[0][1]
            if len(p0) < 9:
                raise ValueError("ogg-flac: truncated mapping packet")
            if p0[5] != 1:
                raise ValueError(
                    f"ogg-flac: unsupported mapping version {p0[5]}"
                )
            native = p0[9:] + b"".join(p for _, p in packets[1:])
            return native, len(packets) - 1
    raise ValueError("ogg-flac: no FLAC logical stream")
