"""Pure-Python Matroska/WebM container DEMUXER (+ fixture muxer).

The multimodal surface treats video as opaque ``binary`` payloads; real
pipelines still need the CONTAINER level — which track is video, its
codec id and dimensions, where the frames are and their timestamps — to
shard, sample and route work before any codec runs.  This module parses
exactly that from the public EBML/Matroska specification (RFC 8794 for
EBML; the Matroska element registry): varint element IDs/sizes, the
Segment → Info/Tracks/Cluster tree, and SimpleBlock frame extraction
with cluster-relative timestamps.  Codec DECODE of the frame payloads
stays out of scope (VP8/VP9/AV1 need real codec libraries — the
``DecodeStub`` boundary in operators/multimodal.py); the demux step is
real and octet-exactly testable because the muxer below stores raw
frame bytes.

Scope (raises clearly outside it): EBML varints up to 8 bytes; unknown-
size elements only for Segment (streamed files end them at EOF); one
Segment; SimpleBlock frames (lacing mode 0 = no lacing); BlockGroup/
Block, laced blocks, chapters/cues/attachments are skipped structurally
(unknown elements are skipped by size, never mis-parsed).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

# Matroska/WebM element IDs (public registry), with the ID's leading
# length-descriptor bits INCLUDED (the on-disk form)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
CODEC_PRIVATE = 0x63A2
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
DOC_TYPE = 0x4282

_MASTER_IDS = {
    EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO, CLUSTER
}


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML varint at ``pos`` -> (value, new_pos).  ``keep_marker``
    keeps the length-descriptor bit (element IDs are compared with it;
    sizes strip it)."""
    if pos >= len(buf):
        raise ValueError("EBML: truncated varint")
    first = buf[pos]
    if first == 0:
        raise ValueError("EBML: varint longer than 8 bytes")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise ValueError("EBML: truncated varint body")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    return v, pos + length


def _is_unknown_size(size: int, nbytes: int) -> bool:
    # all-ones payload = "unknown size" (streamed)
    return size == (1 << (7 * nbytes)) - 1


@dataclass
class MkvTrack:
    number: int
    kind: str  # "video" | "audio" | "other"
    codec_id: str
    width: int | None = None
    height: int | None = None
    sampling_hz: float | None = None
    channels: int | None = None
    codec_private: bytes | None = None


@dataclass
class MkvFile:
    doc_type: str
    timestamp_scale_ns: int
    tracks: dict[int, MkvTrack]
    # (track_number, timestamp_ticks, keyframe, payload)
    frames: list[tuple[int, int, bool, bytes]] = field(default_factory=list)


def _walk(buf: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for the children of the
    region [pos, end); skips by size so unknown elements never
    desynchronize the parse."""
    while pos < end:
        eid, p2 = _read_vint(buf, pos, keep_marker=True)
        size_start = p2
        size, p3 = _read_vint(buf, p2, keep_marker=False)
        nbytes = p3 - size_start
        if _is_unknown_size(size, nbytes):
            if eid != SEGMENT:
                raise ValueError(
                    f"EBML: unknown-size element 0x{eid:X} unsupported"
                )
            body_end = end
        else:
            body_end = p3 + size
        if body_end > end:
            raise ValueError("EBML: element overruns its parent")
        yield eid, p3, body_end
        pos = body_end


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError("EBML: float must be 4 or 8 bytes")


def parse_mkv(payload: bytes) -> MkvFile:
    """Demux a Matroska/WebM payload: doc type, timestamp scale, track
    table, and every SimpleBlock frame with its absolute timestamp (in
    timestamp-scale ticks) and keyframe flag."""
    if payload[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska file")
    doc_type = "matroska"
    ts_scale = 1_000_000  # Matroska default: 1 ms
    tracks: dict[int, MkvTrack] = {}
    frames: list[tuple[int, int, bool, bytes]] = []

    for eid, s, e in _walk(payload, 0, len(payload)):
        if eid == EBML_HEADER:
            for cid, cs, ce in _walk(payload, s, e):
                if cid == DOC_TYPE:
                    doc_type = payload[cs:ce].split(b"\x00")[0].decode()
        elif eid == SEGMENT:
            for cid, cs, ce in _walk(payload, s, e):
                if cid == INFO:
                    for iid, i_s, i_e in _walk(payload, cs, ce):
                        if iid == TIMESTAMP_SCALE:
                            ts_scale = _uint(payload, i_s, i_e)
                elif cid == TRACKS:
                    for tid, t_s, t_e in _walk(payload, cs, ce):
                        if tid == TRACK_ENTRY:
                            tr = _parse_track(payload, t_s, t_e)
                            tracks[tr.number] = tr
                elif cid == CLUSTER:
                    cluster_ts = 0
                    for kid, k_s, k_e in _walk(payload, cs, ce):
                        if kid == CLUSTER_TIMESTAMP:
                            cluster_ts = _uint(payload, k_s, k_e)
                        elif kid == SIMPLE_BLOCK:
                            frames.append(
                                _parse_simple_block(
                                    payload, k_s, k_e, cluster_ts
                                )
                            )
    return MkvFile(doc_type, ts_scale, tracks, frames)


def _parse_track(buf: bytes, s: int, e: int) -> MkvTrack:
    num, kind, codec = 0, "other", ""
    width = height = channels = None
    hz = None
    priv = None
    for cid, cs, ce in _walk(buf, s, e):
        if cid == TRACK_NUMBER:
            num = _uint(buf, cs, ce)
        elif cid == TRACK_TYPE:
            t = _uint(buf, cs, ce)
            kind = {1: "video", 2: "audio"}.get(t, "other")
        elif cid == CODEC_ID:
            codec = buf[cs:ce].split(b"\x00")[0].decode()
        elif cid == CODEC_PRIVATE:
            priv = bytes(buf[cs:ce])
        elif cid == VIDEO:
            for vid, vs, ve in _walk(buf, cs, ce):
                if vid == PIXEL_WIDTH:
                    width = _uint(buf, vs, ve)
                elif vid == PIXEL_HEIGHT:
                    height = _uint(buf, vs, ve)
        elif cid == AUDIO:
            for aid, as_, ae in _walk(buf, cs, ce):
                if aid == SAMPLING_FREQUENCY:
                    hz = _float(buf, as_, ae)
                elif aid == CHANNELS:
                    channels = _uint(buf, as_, ae)
    return MkvTrack(num, kind, codec, width, height, hz, channels, priv)


def _parse_simple_block(
    buf: bytes, s: int, e: int, cluster_ts: int
) -> tuple[int, int, bool, bytes]:
    track, p = _read_vint(buf, s, keep_marker=False)
    rel = struct.unpack(">h", buf[p : p + 2])[0]  # signed 16-bit
    flags = buf[p + 2]
    lacing = (flags >> 1) & 0x03
    if lacing != 0:
        raise NotImplementedError("EBML: laced SimpleBlocks not supported")
    keyframe = bool(flags & 0x80)
    return (track, cluster_ts + rel, keyframe, bytes(buf[p + 3 : e]))


# --------------------------------------------------------------------------
# fixture muxer
# --------------------------------------------------------------------------


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    # shortest varint with room for the marker bit
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("EBML: size too large")


def _elem(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def write_mkv(
    frames: list[tuple[int, int, bool, bytes]],
    tracks: list[MkvTrack],
    doc_type: str = "matroska",
    timestamp_scale_ns: int = 1_000_000,
    cluster_every: int = 4,
) -> bytes:
    """Minimal Matroska muxer (fixture builder): raw frame payloads as
    un-laced SimpleBlocks, grouped into a Cluster every
    ``cluster_every`` frames with the cluster timestamp rebased to the
    first frame — so the parser's cluster-relative timestamp math is
    exercised by real bytes.  Frames must be (track, ts_ticks,
    keyframe, payload) in ascending ts order."""
    head = _elem(
        EBML_HEADER,
        _elem(0x4286, _uint_body(1))  # EBMLVersion
        + _elem(0x42F7, _uint_body(1))  # EBMLReadVersion
        + _elem(0x42F2, _uint_body(4))  # EBMLMaxIDLength
        + _elem(0x42F3, _uint_body(8))  # EBMLMaxSizeLength
        + _elem(DOC_TYPE, doc_type.encode())
        + _elem(0x4287, _uint_body(2))  # DocTypeVersion
        + _elem(0x4285, _uint_body(2)),  # DocTypeReadVersion
    )
    info = _elem(
        INFO, _elem(TIMESTAMP_SCALE, _uint_body(timestamp_scale_ns))
    )
    tr_bodies = []
    for t in tracks:
        body = (
            _elem(TRACK_NUMBER, _uint_body(t.number))
            + _elem(0x73C5, _uint_body(t.number))  # TrackUID
            + _elem(
                TRACK_TYPE,
                _uint_body({"video": 1, "audio": 2}.get(t.kind, 0x10)),
            )
            + _elem(CODEC_ID, t.codec_id.encode())
        )
        if t.codec_private is not None:
            body += _elem(CODEC_PRIVATE, t.codec_private)
        if t.kind == "video":
            body += _elem(
                VIDEO,
                _elem(PIXEL_WIDTH, _uint_body(t.width or 0))
                + _elem(PIXEL_HEIGHT, _uint_body(t.height or 0)),
            )
        if t.kind == "audio":
            body += _elem(
                AUDIO,
                _elem(
                    SAMPLING_FREQUENCY,
                    struct.pack(">d", t.sampling_hz or 0.0),
                )
                + _elem(CHANNELS, _uint_body(t.channels or 1)),
            )
        tr_bodies.append(_elem(TRACK_ENTRY, body))
    tracks_el = _elem(TRACKS, b"".join(tr_bodies))

    clusters = []
    for i in range(0, len(frames), cluster_every):
        chunk = frames[i : i + cluster_every]
        base = chunk[0][1]
        body = _elem(CLUSTER_TIMESTAMP, _uint_body(base))
        for track, ts, key, payload in chunk:
            rel = ts - base
            if not -32768 <= rel <= 32767:
                raise ValueError("frame timestamp too far from cluster base")
            blk = (
                _enc_size(track)  # track number as varint
                + struct.pack(">h", rel)
                + bytes([0x80 if key else 0x00])
                + payload
            )
            body += _elem(SIMPLE_BLOCK, blk)
        clusters.append(_elem(CLUSTER, body))

    segment = _elem(SEGMENT, info + tracks_el + b"".join(clusters))
    return head + segment
