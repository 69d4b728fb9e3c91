"""Minimal ISO Base Media File Format (MP4) muxer + demuxer.

MP4 (ISO/IEC 14496-12) is the most widely deployed media container;
a multimodal corpus at crawl scale is full of it.  This module
implements the sample-table subset that makes demux possible with zero
external libraries:

- box tree: ``ftyp`` / ``mdat`` / ``moov`` (``mvhd``, per-track
  ``trak`` → ``tkhd`` / ``mdia`` → ``mdhd`` / ``hdlr`` / ``minf`` →
  ``smhd``|``vmhd`` / ``dinf`` / ``stbl``);
- sample tables: ``stsd`` (sample descriptions incl. the MPEG-4
  ``esds`` elementary-stream descriptor), ``stts`` (decode deltas),
  ``stsc`` (sample-to-chunk runs), ``stsz`` (sizes), ``stco``/``co64``
  (chunk offsets), ``stss`` (sync samples);
- codec identification per the public registrations: ``mp4a`` with
  objectTypeIndication 0x6B = MPEG-1 audio (MP3-in-MP4), ``mp4v``
  with OTI 0x6C = ISO/IEC 10918-1 JPEG video, ``raw `` = uncompressed
  video — each of which feeds a decoder this repo already has.

The writer exists for fixture synthesis and round trips (the
``_cached_media`` discipline: encode is fixture, decode is the
operator) and emits deterministic bytes (all timestamps fixed, no
randomness).  The reference pipeline has no media containers at all
(NetCDF rasters only, ``/root/reference/asip_v2/archive.py:19-20``);
§2.11 surface.

Fuzz contract (SCALE.md round 10): the parser raises ``ValueError``
on malformed input — never ``IndexError``/``struct.error``/
``MemoryError`` escapes, never unbounded allocation (every table
count is validated against the remaining box bytes before use).

Fragmented MP4 (``moof``/``traf``/``trun`` — DASH/CMAF segments and
live captures, a large share of modern crawled video) is supported
(VERDICT r10 task 2): ``mvex``/``trex`` track defaults, ``tfhd``
per-fragment defaults with all three base-data-offset conventions
(explicit u64 offset, ``default-base-is-moof``, and the spec's
implicit first-byte-of-moof / end-of-previous-traf rule), ``tfdt``
decode-time anchoring (absent ⇒ times continue from the previous
fragment / the moov sample table), and ``trun`` sample runs with
optional per-sample duration/size/flags and first-sample-flags.

Out of scope, disclosed: edit lists (``elst``), composition offsets
(``ctts`` — we emit none; a present box is ignored and decode
timestamps are reported), DRM (``sinf``) and codecs whose decoders
need tables this sandbox cannot provide (AAC, H.26x) — their samples
still demux with ``codec=<fourcc>``, only the decode step is gated
downstream.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _u16(v: int) -> bytes:
    return int(v).to_bytes(2, "big")


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "big")


def _box(fourcc: str, payload: bytes) -> bytes:
    return _u32(8 + len(payload)) + fourcc.encode("ascii") + payload


def _full(fourcc: str, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        fourcc, bytes([version]) + int(flags).to_bytes(3, "big") + payload
    )


@dataclass
class Mp4Track:
    """One track's static description (the ``write_mp4`` input and
    ``parse_mp4`` output shape)."""

    track_id: int
    kind: str  # "audio" | "video"
    codec: str  # "mp3" | "jpeg" | "raw" | other fourcc
    timescale: int = 1000
    sample_rate: int = 0  # audio
    channels: int = 0  # audio
    width: int = 0  # video
    height: int = 0  # video


@dataclass
class Mp4File:
    brands: list[str]
    tracks: dict[int, Mp4Track]
    # (track_id, ts, keyframe, payload) in per-track decode order
    samples: list[tuple[int, int, bool, bytes]] = field(
        default_factory=list
    )


# --- descriptor (esds) helpers -------------------------------------------------

_OTI_BY_CODEC = {"mp3": 0x6B, "jpeg": 0x6C}
_CODEC_BY_OTI = {0x6B: "mp3", 0x69: "mp3", 0x6C: "jpeg", 0x40: "aac"}


def _desc(tag: int, payload: bytes) -> bytes:
    """MPEG-4 descriptor: tag + base-128 expandable length."""
    n = len(payload)
    size = bytearray()
    size.append(n & 0x7F)
    n >>= 7
    while n:
        size.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes([tag]) + bytes(reversed(size)) + payload


def _esds(oti: int) -> bytes:
    dcd = _desc(
        0x04,  # DecoderConfigDescriptor
        bytes([oti, 0x15])  # streamType=5 (audio/visual lvl), upStream 0
        + (0).to_bytes(3, "big")  # bufferSizeDB
        + _u32(0)  # maxBitrate
        + _u32(0),  # avgBitrate
    )
    slc = _desc(0x06, b"\x02")  # SLConfigDescriptor, predefined MP4
    es = _desc(0x03, _u16(1) + b"\x00" + dcd + slc)  # ES_ID 1, no flags
    return _full("esds", 0, 0, es)


def _read_desc(buf: bytes, pos: int, end: int) -> tuple[int, int, int]:
    """(tag, payload_start, payload_end) of the descriptor at pos."""
    if pos >= end:
        raise ValueError("mp4: truncated descriptor")
    tag = buf[pos]
    pos += 1
    n = 0
    for i in range(4):
        if pos >= end:
            raise ValueError("mp4: truncated descriptor length")
        b = buf[pos]
        pos += 1
        n = (n << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    else:
        raise ValueError("mp4: descriptor length overlong")
    if pos + n > end:
        raise ValueError("mp4: descriptor exceeds box")
    return tag, pos, pos + n


def _parse_esds(buf: bytes) -> int:
    """objectTypeIndication out of an esds FullBox payload."""
    if len(buf) < 4:
        raise ValueError("mp4: truncated esds")
    tag, pos, end = _read_desc(buf, 4, len(buf))
    if tag != 0x03:
        raise ValueError(f"mp4: expected ES_Descriptor, got {tag:#x}")
    if pos + 3 > end:
        raise ValueError("mp4: truncated ES_Descriptor")
    flags = buf[pos + 2]
    pos += 3
    if flags & 0x80:  # streamDependenceFlag
        pos += 2
    if flags & 0x40:  # URL_Flag
        if pos >= end:
            raise ValueError("mp4: truncated URL descriptor")
        pos += 1 + buf[pos]
    if flags & 0x20:  # OCRstreamFlag
        pos += 2
    while pos < end:
        tag, dstart, dend = _read_desc(buf, pos, end)
        if tag == 0x04:
            if dstart >= dend:
                raise ValueError("mp4: empty DecoderConfigDescriptor")
            return buf[dstart]
        pos = dend
    raise ValueError("mp4: no DecoderConfigDescriptor")


# --- writer --------------------------------------------------------------------


def _sample_entry(tr: Mp4Track) -> bytes:
    common = b"\x00" * 6 + _u16(1)  # reserved + data_reference_index
    if tr.kind == "audio":
        body = (
            common
            + b"\x00" * 8  # version/revision/vendor
            + _u16(tr.channels or 1)
            + _u16(16)  # samplesize
            + _u16(0)  # pre_defined
            + _u16(0)  # reserved
            + _u32((tr.sample_rate or 44100) << 16)
            + _esds(_OTI_BY_CODEC.get(tr.codec, 0x6B))
        )
        return _box("mp4a", body)
    body = (
        common
        + _u16(0)  # pre_defined
        + _u16(0)  # reserved
        + b"\x00" * 12  # pre_defined[3]
        + _u16(tr.width)
        + _u16(tr.height)
        + _u32(0x00480000)  # 72 dpi horiz
        + _u32(0x00480000)  # 72 dpi vert
        + _u32(0)  # reserved
        + _u16(1)  # frame_count
        + b"\x00" * 32  # compressorname (pascal, empty)
        + _u16(24)  # depth
        + _u16(0xFFFF)  # pre_defined
    )
    if tr.codec == "raw":
        return _box("raw ", body)
    return _box("mp4v", body + _esds(_OTI_BY_CODEC.get(tr.codec, 0x6C)))


def _rle_stts(deltas: list[int]) -> bytes:
    runs: list[tuple[int, int]] = []
    for d in deltas:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    return _full(
        "stts", 0, 0,
        _u32(len(runs)) + b"".join(_u32(c) + _u32(d) for c, d in runs),
    )


def write_mp4(
    samples: list[tuple[int, int, bool, bytes]],
    tracks: list[Mp4Track],
    chunk_every: int = 4,
    default_delta: int = 1,
) -> bytes:
    """Mux ``(track_id, ts, keyframe, payload)`` samples into a
    deterministic progressive-layout MP4 (``ftyp`` + ``mdat`` +
    ``moov``).  Per track, samples sort by ``ts`` and group into
    chunks of ``chunk_every``; decode deltas derive from consecutive
    ``ts`` (the last sample reuses the previous delta, or
    ``default_delta`` for singletons)."""
    if chunk_every < 1:
        raise ValueError("mp4: chunk_every must be >= 1")
    by_track: dict[int, list[tuple[int, bool, bytes]]] = {
        t.track_id: [] for t in tracks
    }
    for tid, ts, key, payload in samples:
        if tid not in by_track:
            raise ValueError(f"mp4: sample for unknown track {tid}")
        by_track[tid].append((int(ts), bool(key), bytes(payload)))
    for lst in by_track.values():
        lst.sort(key=lambda s: s[0])

    ftyp = _box("ftyp", b"isom" + _u32(0x200) + b"isomiso2mp41")
    # mdat layout: per track, chunks in order; record chunk offsets
    mdat_payload = bytearray()
    chunk_offsets: dict[int, list[int]] = {}
    base = len(ftyp) + 8  # mdat header
    for t in tracks:
        lst = by_track[t.track_id]
        offs = []
        for c0 in range(0, len(lst), chunk_every):
            offs.append(base + len(mdat_payload))
            for _, _, payload in lst[c0 : c0 + chunk_every]:
                mdat_payload += payload
        chunk_offsets[t.track_id] = offs
    mdat = _box("mdat", bytes(mdat_payload))

    traks = []
    max_dur_movie = 0
    for t in tracks:
        lst = by_track[t.track_id]
        tss = [s[0] for s in lst]
        deltas = [tss[i + 1] - tss[i] for i in range(len(tss) - 1)]
        for d in deltas:
            if d < 0:
                raise ValueError("mp4: negative decode delta")
        if lst:
            deltas.append(deltas[-1] if deltas else default_delta)
        dur = sum(deltas)
        max_dur_movie = max(max_dur_movie, dur * 1000 // max(t.timescale, 1))
        n = len(lst)
        n_chunks = len(chunk_offsets[t.track_id])
        stsc_runs = []
        if n_chunks:
            stsc_runs.append((1, min(chunk_every, n)))
            rem = n - (n_chunks - 1) * chunk_every
            if n_chunks > 1 and rem != chunk_every:
                stsc_runs.append((n_chunks, rem))
        stbl = (
            _full(
                "stsd", 0, 0, _u32(1) + _sample_entry(t)
            )
            + _rle_stts(deltas)
            + _full(
                "stsc", 0, 0,
                _u32(len(stsc_runs))
                + b"".join(
                    _u32(first) + _u32(per) + _u32(1)
                    for first, per in stsc_runs
                ),
            )
            + _full(
                "stsz", 0, 0,
                _u32(0) + _u32(n)
                + b"".join(_u32(len(s[2])) for s in lst),
            )
            + _full(
                "stco", 0, 0,
                _u32(n_chunks)
                + b"".join(_u32(o) for o in chunk_offsets[t.track_id]),
            )
        )
        if t.kind == "video" and not all(s[1] for s in lst):
            sync = [i + 1 for i, s in enumerate(lst) if s[1]]
            stbl += _full(
                "stss", 0, 0,
                _u32(len(sync)) + b"".join(_u32(i) for i in sync),
            )
        mhd = (
            _full("smhd", 0, 0, _u32(0))
            if t.kind == "audio"
            else _full("vmhd", 0, 1, _u32(0) + _u32(0))
        )
        dinf = _box("dinf", _full(
            "dref", 0, 0, _u32(1) + _full("url ", 0, 1, b"")
        ))
        minf = _box("minf", mhd + dinf + _box("stbl", stbl))
        hdlr = _full(
            "hdlr", 0, 0,
            _u32(0)
            + (b"soun" if t.kind == "audio" else b"vide")
            + _u32(0) * 3
            + b"\x00",
        )
        mdhd = _full(
            "mdhd", 0, 0,
            _u32(0) + _u32(0) + _u32(t.timescale) + _u32(dur)
            + _u16(0x55C4)  # 'und'
            + _u16(0),
        )
        tkhd = _full(
            "tkhd", 0, 3,  # enabled | in-movie
            _u32(0) + _u32(0) + _u32(t.track_id) + _u32(0)
            + _u32(dur * 1000 // max(t.timescale, 1))
            + _u32(0) * 2 + _u16(0) * 2
            + _u16(0x0100 if t.kind == "audio" else 0) + _u16(0)
            + _u32(0x00010000) + _u32(0) * 2
            + _u32(0) + _u32(0x00010000) + _u32(0)
            + _u32(0) * 2 + _u32(0x40000000)
            + _u32(t.width << 16) + _u32(t.height << 16),
        )
        traks.append(
            _box("trak", tkhd + _box("mdia", mdhd + hdlr + minf))
        )
    mvhd = _full(
        "mvhd", 0, 0,
        _u32(0) + _u32(0) + _u32(1000) + _u32(max_dur_movie)
        + _u32(0x00010000) + _u16(0x0100) + _u16(0) + _u32(0) * 2
        + _u32(0x00010000) + _u32(0) * 2
        + _u32(0) + _u32(0x00010000) + _u32(0)
        + _u32(0) * 2 + _u32(0x40000000)
        + _u32(0) * 6
        + _u32(max(t.track_id for t in tracks) + 1 if tracks else 1),
    )
    return ftyp + mdat + _box("moov", mvhd + b"".join(traks))


# --- parser --------------------------------------------------------------------


def _iter_boxes_full(buf: bytes, pos: int, end: int):
    """Yield (fourcc, header_start, payload_start, payload_end); strict
    bounds.  The header start is yielded directly (not reconstructed
    from the payload start) so largesize headers whose u64 size bytes
    happen to spell a fourcc can't shift a caller's box addressing."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = int.from_bytes(buf[pos : pos + 4], "big")
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 0:
            box_end = end
        elif size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize")
            size64 = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            if size64 < 16:
                raise ValueError("mp4: bad largesize")
            box_end = pos + size64
            body = pos + 16
        else:
            if size < 8:
                raise ValueError(f"mp4: bad box size {size}")
            box_end = pos + size
        if box_end > end:
            raise ValueError("mp4: box exceeds container")
        try:
            name = fourcc.decode("ascii")
        except UnicodeDecodeError:
            raise ValueError("mp4: non-ascii box type") from None
        yield name, pos, body, box_end
        pos = box_end


def _iter_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end); strict bounds."""
    for name, _hdr, body, box_end in _iter_boxes_full(buf, pos, end):
        yield name, body, box_end


def _find(buf: bytes, pos: int, end: int, name: str) -> tuple[int, int]:
    for n, s, e in _iter_boxes(buf, pos, end):
        if n == name:
            return s, e
    raise ValueError(f"mp4: missing {name} box")


def _full_body(buf: bytes, s: int, e: int, what: str) -> tuple[int, int, int]:
    """(version, flags, payload_start) of a FullBox."""
    if s + 4 > e:
        raise ValueError(f"mp4: truncated {what}")
    return buf[s], int.from_bytes(buf[s + 1 : s + 4], "big"), s + 4


def _table(
    buf: bytes, s: int, e: int, width: int, what: str
) -> tuple[int, int]:
    """(entry_count, table_start) with the count validated against the
    remaining bytes BEFORE any allocation (fuzz contract)."""
    _, _, p = _full_body(buf, s, e, what)
    if p + 4 > e:
        raise ValueError(f"mp4: truncated {what} count")
    n = int.from_bytes(buf[p : p + 4], "big")
    if p + 4 + n * width > e:
        raise ValueError(f"mp4: {what} table exceeds box")
    return n, p + 4


def parse_mp4(data: bytes) -> Mp4File:
    """Parse an MP4 into tracks + samples.  Sample payload bytes are
    resolved through stsc/stsz/stco chunk arithmetic against the whole
    buffer (so progressive ``ftyp``+``mdat``+``moov`` and faststart
    ``moov``-first layouts both work); timestamps are decode
    timestamps from ``stts``; keyframes come from ``stss`` (absent ⇒
    every sample is sync, per spec)."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("mp4: payload must be bytes")
    data = bytes(data)
    brands: list[str] = []
    moov: tuple[int, int] | None = None
    moofs: list[tuple[int, int, int]] = []  # (box_start, body_start, end)
    for name, hdr, s, e in _iter_boxes_full(data, 0, len(data)):
        if name == "ftyp":
            if e - s < 8:
                raise ValueError("mp4: truncated ftyp")
            brands = [
                data[i : i + 4].decode("latin-1")
                for i in range(s, e - 3, 4)
                if i != s + 4
            ]
        elif name == "moov":
            moov = (s, e)
        elif name == "moof":
            moofs.append((hdr, s, e))
    if moov is None:
        raise ValueError("mp4: missing moov box")
    out = Mp4File(brands=brands, tracks={})
    next_ts: dict[int, int] = {}  # track -> next decode timestamp
    for name, ts_, te_ in _iter_boxes(data, moov[0], moov[1]):
        if name != "trak":
            continue
        tr, samples, t_end = _parse_trak(data, ts_, te_)
        if tr.track_id in out.tracks:
            raise ValueError(f"mp4: duplicate track id {tr.track_id}")
        out.tracks[tr.track_id] = tr
        out.samples.extend(samples)
        next_ts[tr.track_id] = t_end
    if moofs:
        trex = _parse_mvex(data, *moov)
        for box_start, body_s, body_e in moofs:
            _parse_moof(
                data, box_start, body_s, body_e, out, trex, next_ts
            )
    return out


def _parse_trak(
    data: bytes, s: int, e: int
) -> tuple[Mp4Track, list[tuple[int, int, bool, bytes]], int]:
    tk_s, tk_e = _find(data, s, e, "tkhd")
    ver, _, p = _full_body(data, tk_s, tk_e, "tkhd")
    need = p + (8 if ver == 0 else 16) + 4
    if need + 4 > tk_e:
        raise ValueError("mp4: truncated tkhd")
    track_id = int.from_bytes(data[need - 4 : need], "big")
    md_s, md_e = _find(data, s, e, "mdia")
    mh_s, mh_e = _find(data, md_s, md_e, "mdhd")
    ver, _, p = _full_body(data, mh_s, mh_e, "mdhd")
    p += 8 if ver == 0 else 16
    if p + 8 > mh_e:
        raise ValueError("mp4: truncated mdhd")
    timescale = int.from_bytes(data[p : p + 4], "big")
    hd_s, hd_e = _find(data, md_s, md_e, "hdlr")
    if hd_s + 12 > hd_e:
        raise ValueError("mp4: truncated hdlr")
    handler = data[hd_s + 8 : hd_s + 12]
    kind = {b"soun": "audio", b"vide": "video"}.get(
        handler, handler.decode("latin-1")
    )
    mi_s, mi_e = _find(data, md_s, md_e, "minf")
    sb_s, sb_e = _find(data, mi_s, mi_e, "stbl")

    boxes = {n: (bs, be) for n, bs, be in _iter_boxes(data, sb_s, sb_e)}
    for req in ("stsd", "stts", "stsc", "stsz"):
        if req not in boxes:
            raise ValueError(f"mp4: missing {req} box")
    if "stco" not in boxes and "co64" not in boxes:
        raise ValueError("mp4: missing stco box")

    tr = _parse_stsd(data, *boxes["stsd"], track_id, kind, timescale)

    # stts -> per-sample decode timestamps
    n, p = _table(data, *boxes["stts"], 8, "stts")
    tss: list[int] = []
    t = 0
    for i in range(n):
        cnt = int.from_bytes(data[p + 8 * i : p + 8 * i + 4], "big")
        delta = int.from_bytes(data[p + 8 * i + 4 : p + 8 * i + 8], "big")
        if cnt > (len(data) + 1152) or len(tss) + cnt > 1 << 26:
            raise ValueError("mp4: implausible stts run")
        for _ in range(cnt):
            tss.append(t)
            t += delta

    # stsz -> sizes
    _, _, p0 = _full_body(data, *boxes["stsz"], "stsz")
    if p0 + 8 > boxes["stsz"][1]:
        raise ValueError("mp4: truncated stsz")
    uniform = int.from_bytes(data[p0 : p0 + 4], "big")
    n_samples = int.from_bytes(data[p0 + 4 : p0 + 8], "big")
    if uniform:
        if n_samples > 1 << 26:
            raise ValueError("mp4: implausible sample count")
        sizes = [uniform] * n_samples
    else:
        if p0 + 8 + 4 * n_samples > boxes["stsz"][1]:
            raise ValueError("mp4: stsz table exceeds box")
        sizes = [
            int.from_bytes(data[p0 + 8 + 4 * i : p0 + 12 + 4 * i], "big")
            for i in range(n_samples)
        ]

    # stco / co64 -> chunk offsets
    if "stco" in boxes:
        n_ch, p = _table(data, *boxes["stco"], 4, "stco")
        offsets = [
            int.from_bytes(data[p + 4 * i : p + 4 * i + 4], "big")
            for i in range(n_ch)
        ]
    else:
        n_ch, p = _table(data, *boxes["co64"], 8, "co64")
        offsets = [
            int.from_bytes(data[p + 8 * i : p + 8 * i + 8], "big")
            for i in range(n_ch)
        ]

    # stsc -> samples per chunk runs
    n_runs, p = _table(data, *boxes["stsc"], 12, "stsc")
    runs = []
    for i in range(n_runs):
        first = int.from_bytes(data[p + 12 * i : p + 12 * i + 4], "big")
        per = int.from_bytes(data[p + 12 * i + 4 : p + 12 * i + 8], "big")
        if first < 1 or (runs and first <= runs[-1][0]) or per < 1:
            raise ValueError("mp4: malformed stsc run")
        runs.append((first, per))

    # stss -> sync table (video)
    sync: set[int] | None = None
    if "stss" in boxes:
        n_sync, p = _table(data, *boxes["stss"], 4, "stss")
        sync = {
            int.from_bytes(data[p + 4 * i : p + 4 * i + 4], "big")
            for i in range(n_sync)
        }

    if len(tss) != n_samples:
        raise ValueError(
            f"mp4: stts covers {len(tss)} samples, stsz has {n_samples}"
        )

    # walk chunks, slice payloads
    samples: list[tuple[int, int, bool, bytes]] = []
    si = 0
    for ci in range(len(offsets)):
        per = 0
        for first, p_ in runs:
            if ci + 1 >= first:
                per = p_
        off = offsets[ci]
        for _ in range(per):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(data):
                raise ValueError("mp4: sample exceeds file")
            key = True if sync is None else (si + 1) in sync
            samples.append((track_id, tss[si], key, data[off : off + size]))
            off += size
            si += 1
    if si != n_samples:
        raise ValueError(
            f"mp4: chunk map covers {si} of {n_samples} samples"
        )
    return tr, samples, t


def _parse_stsd(
    data: bytes, s: int, e: int, track_id: int, kind: str, timescale: int
) -> Mp4Track:
    n, p = _table(data, s, e, 0, "stsd")
    if n < 1:
        raise ValueError("mp4: empty stsd")
    entries = list(_iter_boxes(data, p, e))
    if not entries:
        raise ValueError("mp4: missing sample entry")
    fourcc, es, ee = entries[0]
    tr = Mp4Track(track_id, kind, fourcc.strip(), timescale=timescale)
    if kind == "audio":
        if es + 28 > ee:
            raise ValueError("mp4: truncated audio sample entry")
        tr.channels = int.from_bytes(data[es + 16 : es + 18], "big")
        tr.sample_rate = int.from_bytes(data[es + 24 : es + 26], "big")
        inner_at = es + 28
    elif kind == "video":
        if es + 78 > ee:
            raise ValueError("mp4: truncated video sample entry")
        tr.width = int.from_bytes(data[es + 24 : es + 26], "big")
        tr.height = int.from_bytes(data[es + 26 : es + 28], "big")
        inner_at = es + 78
    else:
        return tr
    if fourcc in ("mp4a", "mp4v"):
        for name, bs, be in _iter_boxes(data, inner_at, ee):
            if name == "esds":
                oti = _parse_esds(data[bs:be])
                tr.codec = _CODEC_BY_OTI.get(oti, f"oti{oti:#04x}")
                break
        else:
            raise ValueError(f"mp4: {fourcc} entry without esds")
    return tr


# --- movie fragments (moof/traf/trun) ------------------------------------------
#
# tfhd optional-field flag bits (ISO/IEC 14496-12 §8.8.7)
_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_SAMPLE_DESC_IDX = 0x000002
_TFHD_DEF_DURATION = 0x000008
_TFHD_DEF_SIZE = 0x000010
_TFHD_DEF_FLAGS = 0x000020
_TFHD_DURATION_EMPTY = 0x010000
_TFHD_BASE_IS_MOOF = 0x020000
# trun optional-field flag bits (§8.8.8)
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800
# bit in a 32-bit sample_flags word: sample_is_non_sync_sample
_FLAG_NON_SYNC = 0x00010000


def _parse_mvex(data: bytes, ms: int, me: int) -> dict:
    """``mvex``/``trex`` track-extends defaults:
    track_id -> (default_duration, default_size, default_flags).
    A fragmented file without mvex still parses (empty defaults —
    every traf must then carry its own via tfhd/trun)."""
    trex: dict[int, tuple[int, int, int]] = {}
    for name, s, e in _iter_boxes(data, ms, me):
        if name != "mvex":
            continue
        for n2, s2, e2 in _iter_boxes(data, s, e):
            if n2 != "trex":
                continue
            _, _, p = _full_body(data, s2, e2, "trex")
            if p + 20 > e2:
                raise ValueError("mp4: truncated trex")
            tid = int.from_bytes(data[p : p + 4], "big")
            dur = int.from_bytes(data[p + 8 : p + 12], "big")
            size = int.from_bytes(data[p + 12 : p + 16], "big")
            flags = int.from_bytes(data[p + 16 : p + 20], "big")
            trex[tid] = (dur, size, flags)
    return trex


def _parse_tfhd(
    data: bytes, s: int, e: int, trex: dict
) -> tuple[int, int, int | None, int, int, int]:
    """(track_id, tf_flags, base_data_offset|None, default_duration,
    default_size, default_flags) with trex fallbacks applied."""
    _, fl, p = _full_body(data, s, e, "tfhd")
    if p + 4 > e:
        raise ValueError("mp4: truncated tfhd")
    tid = int.from_bytes(data[p : p + 4], "big")
    p += 4
    t_dur, t_size, t_flags = trex.get(tid, (0, 0, 0))
    base = None
    if fl & _TFHD_BASE_DATA_OFFSET:
        if p + 8 > e:
            raise ValueError("mp4: truncated tfhd base-data-offset")
        base = int.from_bytes(data[p : p + 8], "big")
        p += 8
    if fl & _TFHD_SAMPLE_DESC_IDX:
        if p + 4 > e:
            raise ValueError("mp4: truncated tfhd sample-desc-index")
        p += 4
    if fl & _TFHD_DEF_DURATION:
        if p + 4 > e:
            raise ValueError("mp4: truncated tfhd default-duration")
        t_dur = int.from_bytes(data[p : p + 4], "big")
        p += 4
    if fl & _TFHD_DEF_SIZE:
        if p + 4 > e:
            raise ValueError("mp4: truncated tfhd default-size")
        t_size = int.from_bytes(data[p : p + 4], "big")
        p += 4
    if fl & _TFHD_DEF_FLAGS:
        if p + 4 > e:
            raise ValueError("mp4: truncated tfhd default-flags")
        t_flags = int.from_bytes(data[p : p + 4], "big")
        p += 4
    return tid, fl, base, t_dur, t_size, t_flags


def _parse_moof(
    data: bytes,
    box_start: int,
    s: int,
    e: int,
    out: Mp4File,
    trex: dict,
    next_ts: dict,
) -> None:
    """Demux one movie fragment, appending samples to ``out`` and
    advancing each track's running decode time in ``next_ts``.

    Base-data-offset resolution (all three spec conventions):
    explicit tfhd offset > ``default-base-is-moof`` (moof first byte)
    > implicit (moof first byte for the first traf, end of the
    previous traf's data for subsequent trafs)."""
    _find(data, s, e, "mfhd")  # presence-validated; sequence unused
    prev_traf_end: int | None = None
    for name, ts_, te_ in _iter_boxes(data, s, e):
        if name != "traf":
            continue
        th_s, th_e = _find(data, ts_, te_, "tfhd")
        tid, tf_fl, base, d_dur, d_size, d_flags = _parse_tfhd(
            data, th_s, th_e, trex
        )
        if tid not in out.tracks:
            raise ValueError(f"mp4: traf for unknown track {tid}")
        if base is None:
            if tf_fl & _TFHD_BASE_IS_MOOF or prev_traf_end is None:
                base = box_start
            else:
                base = prev_traf_end
        t = next_ts.get(tid, 0)
        for n2, s2, e2 in _iter_boxes(data, ts_, te_):
            if n2 == "tfdt":
                ver, _, p = _full_body(data, s2, e2, "tfdt")
                w = 4 if ver == 0 else 8
                if p + w > e2:
                    raise ValueError("mp4: truncated tfdt")
                t = int.from_bytes(data[p : p + w], "big")
        if tf_fl & _TFHD_DURATION_EMPTY:
            next_ts[tid] = t
            prev_traf_end = prev_traf_end if prev_traf_end is not None else base
            continue
        pos = base  # running data cursor across this traf's truns
        for n2, s2, e2 in _iter_boxes(data, ts_, te_):
            if n2 != "trun":
                continue
            _, fl, p = _full_body(data, s2, e2, "trun")
            if p + 4 > e2:
                raise ValueError("mp4: truncated trun count")
            count = int.from_bytes(data[p : p + 4], "big")
            p += 4
            per = sum(
                4
                for bit in (
                    _TRUN_SAMPLE_DURATION,
                    _TRUN_SAMPLE_SIZE,
                    _TRUN_SAMPLE_FLAGS,
                    _TRUN_SAMPLE_CTS,
                )
                if fl & bit
            )
            head = (4 if fl & _TRUN_DATA_OFFSET else 0) + (
                4 if fl & _TRUN_FIRST_FLAGS else 0
            )
            if p + head + count * per > e2:
                raise ValueError("mp4: trun table exceeds box")
            if fl & _TRUN_DATA_OFFSET:
                doff = int.from_bytes(data[p : p + 4], "big", signed=True)
                pos = base + doff
                if pos < 0:
                    raise ValueError(
                        "mp4: trun data-offset before file start"
                    )
                p += 4
            first_flags = None
            if fl & _TRUN_FIRST_FLAGS:
                first_flags = int.from_bytes(data[p : p + 4], "big")
                p += 4
            for i in range(count):
                dur, size, sfl = d_dur, d_size, d_flags
                if fl & _TRUN_SAMPLE_DURATION:
                    dur = int.from_bytes(data[p : p + 4], "big")
                    p += 4
                if fl & _TRUN_SAMPLE_SIZE:
                    size = int.from_bytes(data[p : p + 4], "big")
                    p += 4
                if fl & _TRUN_SAMPLE_FLAGS:
                    sfl = int.from_bytes(data[p : p + 4], "big")
                    p += 4
                if fl & _TRUN_SAMPLE_CTS:
                    p += 4  # composition offsets disclosed-ignored
                if i == 0 and first_flags is not None:
                    sfl = first_flags
                if size == 0 and d_size == 0:
                    raise ValueError(
                        "mp4: trun sample without size or default"
                    )
                if pos < 0 or pos + size > len(data):
                    raise ValueError("mp4: fragment sample exceeds file")
                key = not (sfl & _FLAG_NON_SYNC)
                out.samples.append(
                    (tid, t, key, data[pos : pos + size])
                )
                pos += size
                t += dur
        next_ts[tid] = t
        prev_traf_end = pos


def write_mp4_fragmented(
    samples: list[tuple[int, int, bool, bytes]],
    tracks: list[Mp4Track],
    frag_samples: int = 4,
    default_delta: int = 1,
    base_mode: str = "moof",
    with_tfdt: bool = True,
) -> bytes:
    """Mux samples into a deterministic FRAGMENTED MP4 (CMAF-shaped):
    ``ftyp`` + ``moov`` (empty sample tables + ``mvex``/``trex``) +
    per-fragment ``moof``+``mdat`` with ``frag_samples`` samples per
    track per fragment.  ``base_mode`` selects the data-addressing
    convention the fixture exercises: ``"moof"`` (default-base-is-moof
    + trun data-offset), ``"explicit"`` (tfhd base-data-offset), or
    ``"implicit"`` (neither flag: first traf addresses from the moof
    first byte, later trafs from the previous traf's data end — the
    spec's fallback rule).  ``with_tfdt=False`` exercises the
    continue-from-previous-fragment decode-time path."""
    if frag_samples < 1:
        raise ValueError("mp4: frag_samples must be >= 1")
    if base_mode not in ("moof", "explicit", "implicit"):
        raise ValueError(f"mp4: unknown base_mode {base_mode!r}")
    by_track: dict[int, list[tuple[int, bool, bytes]]] = {
        t.track_id: [] for t in tracks
    }
    for tid, ts, key, payload in samples:
        if tid not in by_track:
            raise ValueError(f"mp4: sample for unknown track {tid}")
        by_track[tid].append((int(ts), bool(key), bytes(payload)))
    durs: dict[int, list[int]] = {}
    for tid, lst in by_track.items():
        lst.sort(key=lambda s: s[0])
        tss = [s[0] for s in lst]
        deltas = [tss[i + 1] - tss[i] for i in range(len(tss) - 1)]
        for d in deltas:
            if d < 0:
                raise ValueError("mp4: negative decode delta")
        if lst:
            deltas.append(deltas[-1] if deltas else default_delta)
        durs[tid] = deltas

    ftyp = _box(
        "ftyp", b"iso5" + _u32(0x200) + b"iso5iso6mp41"
    )
    # moov: same track headers as write_mp4 but EMPTY sample tables,
    # plus mvex/trex (fragment defaults: duration=default_delta)
    empty_tables = (
        _full("stts", 0, 0, _u32(0))
        + _full("stsc", 0, 0, _u32(0))
        + _full("stsz", 0, 0, _u32(0) + _u32(0))
        + _full("stco", 0, 0, _u32(0))
    )
    traks = []
    trexes = []
    for t in tracks:
        stbl = _full("stsd", 0, 0, _u32(1) + _sample_entry(t)) + empty_tables
        mhd = (
            _full("smhd", 0, 0, _u32(0))
            if t.kind == "audio"
            else _full("vmhd", 0, 1, _u32(0) + _u32(0))
        )
        dinf = _box(
            "dinf", _full("dref", 0, 0, _u32(1) + _full("url ", 0, 1, b""))
        )
        minf = _box("minf", mhd + dinf + _box("stbl", stbl))
        hdlr = _full(
            "hdlr", 0, 0,
            _u32(0)
            + (b"soun" if t.kind == "audio" else b"vide")
            + _u32(0) * 3
            + b"\x00",
        )
        mdhd = _full(
            "mdhd", 0, 0,
            _u32(0) + _u32(0) + _u32(t.timescale) + _u32(0)
            + _u16(0x55C4)
            + _u16(0),
        )
        tkhd = _full(
            "tkhd", 0, 3,
            _u32(0) + _u32(0) + _u32(t.track_id) + _u32(0) + _u32(0)
            + _u32(0) * 2 + _u16(0) * 2
            + _u16(0x0100 if t.kind == "audio" else 0) + _u16(0)
            + _u32(0x00010000) + _u32(0) * 2
            + _u32(0) + _u32(0x00010000) + _u32(0)
            + _u32(0) * 2 + _u32(0x40000000)
            + _u32(t.width << 16) + _u32(t.height << 16),
        )
        traks.append(_box("trak", tkhd + _box("mdia", mdhd + hdlr + minf)))
        trexes.append(
            _full(
                "trex", 0, 0,
                _u32(t.track_id) + _u32(1)  # sample-description index
                + _u32(default_delta) + _u32(0) + _u32(_FLAG_NON_SYNC),
            )
        )
    mvhd = _full(
        "mvhd", 0, 0,
        _u32(0) + _u32(0) + _u32(1000) + _u32(0)
        + _u32(0x00010000) + _u16(0x0100) + _u16(0) + _u32(0) * 2
        + _u32(0x00010000) + _u32(0) * 2
        + _u32(0) + _u32(0x00010000) + _u32(0)
        + _u32(0) * 2 + _u32(0x40000000)
        + _u32(0) * 6
        + _u32(max(t.track_id for t in tracks) + 1 if tracks else 1),
    )
    mehd = _full("mehd", 0, 0, _u32(0))
    moov = _box(
        "moov", mvhd + b"".join(traks) + _box("mvex", mehd + b"".join(trexes))
    )

    out = bytearray(ftyp + moov)
    n_frags = max(
        (-(-len(lst) // frag_samples) for lst in by_track.values() if lst),
        default=0,
    )
    for fi in range(n_frags):
        moof_start = len(out)
        # assemble trafs with placeholder offsets, then fix up: the
        # mdat body starts at moof_start + len(moof) + 8
        trafs = []
        frag_payloads: list[bytes] = []
        traf_specs = []  # (tid, tfdt_t, runs of (dur, size, flags))
        for t in tracks:
            lst = by_track[t.track_id]
            lo, hi = fi * frag_samples, min((fi + 1) * frag_samples, len(lst))
            if lo >= hi:
                continue
            rows = []
            for i in range(lo, hi):
                _, key, payload = lst[i]
                rows.append(
                    (
                        durs[t.track_id][i],
                        len(payload),
                        0 if key else _FLAG_NON_SYNC,
                    )
                )
                frag_payloads.append(lst[i][2])
            traf_specs.append((t.track_id, lst[lo][0], rows))

        def build(moof_len: int) -> bytes:
            mdat_body = moof_start + moof_len + 8
            cursor = mdat_body
            trafs.clear()
            for tid, t0, rows in traf_specs:
                tf_flags = 0
                body = _u32(tid)
                if base_mode == "explicit":
                    tf_flags |= _TFHD_BASE_DATA_OFFSET
                    body += int(cursor).to_bytes(8, "big")
                elif base_mode == "moof":
                    tf_flags |= _TFHD_BASE_IS_MOOF
                tfhd = _full("tfhd", 0, tf_flags, body)
                tfdt = (
                    _full("tfdt", 1, 0, int(t0).to_bytes(8, "big"))
                    if with_tfdt
                    else b""
                )
                tr_flags = (
                    _TRUN_SAMPLE_DURATION
                    | _TRUN_SAMPLE_SIZE
                    | _TRUN_SAMPLE_FLAGS
                )
                if base_mode == "explicit":
                    # base-data-offset already points at this traf's
                    # data; the offset is present but zero
                    tr_flags |= _TRUN_DATA_OFFSET
                    doff = (0).to_bytes(4, "big", signed=True)
                elif base_mode == "moof" or not trafs:
                    # moof-relative addressing; implicit mode's FIRST
                    # traf also bases at the moof first byte, so it
                    # needs the offset to reach past the moof into mdat
                    tr_flags |= _TRUN_DATA_OFFSET
                    doff = int(cursor - moof_start).to_bytes(
                        4, "big", signed=True
                    )
                else:
                    # implicit mode, later trafs: no offset — exercise
                    # the end-of-previous-traf's-data spec fallback
                    doff = b""
                trun = _full(
                    "trun",
                    0,
                    tr_flags,
                    _u32(len(rows))
                    + doff
                    + b"".join(
                        _u32(d) + _u32(sz) + _u32(fl) for d, sz, fl in rows
                    ),
                )
                trafs.append(_box("traf", tfhd + tfdt + trun))
                cursor += sum(sz for _d, sz, _f in rows)
            mfhd = _full("mfhd", 0, 0, _u32(fi + 1))
            return _box("moof", mfhd + b"".join(trafs))

        # two-pass fixup: build once to learn the length, rebuild with
        # the real offsets (length is offset-independent)
        moof = build(len(build(0)))
        out += moof + _box("mdat", b"".join(frag_payloads))
    return bytes(out)
