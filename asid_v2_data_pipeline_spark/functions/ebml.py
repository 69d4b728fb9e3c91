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
Segment; SimpleBlock frames in ALL FOUR lacing modes (none, Xiph,
fixed-size, EBML — laced frames share the block timestamp, per spec;
per-frame offsets come from the track's default duration, which this
metadata layer does not model); BlockGroup/Block, chapters/cues/
attachments are skipped structurally (unknown elements are skipped by
size, never mis-parsed).
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
                            frames.extend(
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
) -> list[tuple[int, int, bool, bytes]]:
    """One SimpleBlock -> its frames.  Lacing (Matroska §Block
    Structure): 0 = none, 1 = Xiph (255-run size coding), 2 = fixed
    (equal split), 3 = EBML (first size a vint, then signed-vint
    deltas).  Sizes cover frames 0..n-2; the last frame is the
    remainder.  Laced frames share the block timestamp."""
    track, p = _read_vint(buf, s, keep_marker=False)
    rel = struct.unpack(">h", buf[p : p + 2])[0]  # signed 16-bit
    flags = buf[p + 2]
    lacing = (flags >> 1) & 0x03
    keyframe = bool(flags & 0x80)
    ts = cluster_ts + rel
    q = p + 3
    if lacing == 0:
        return [(track, ts, keyframe, bytes(buf[q:e]))]
    n = buf[q] + 1
    q += 1
    sizes: list[int] = []
    if lacing == 1:  # Xiph
        for _ in range(n - 1):
            sz = 0
            while True:
                if q >= len(buf):
                    raise ValueError("EBML: truncated Xiph lace sizes")
                b0 = buf[q]
                q += 1
                sz += b0
                if b0 < 255:
                    break
            sizes.append(sz)
    elif lacing == 2:  # fixed-size
        total = e - q
        if total % n:
            raise ValueError("EBML: fixed lacing does not divide evenly")
        sizes = [total // n] * (n - 1)
    else:  # EBML lacing
        if n > 1:
            sz, q = _read_vint(buf, q, keep_marker=False)
            sizes.append(sz)
            prev = sz
            for _ in range(n - 2):
                start = q
                v, q = _read_vint(buf, q, keep_marker=False)
                length = q - start
                prev += v - ((1 << (7 * length - 1)) - 1)  # signed delta
                if prev < 0:
                    raise ValueError("EBML: negative laced frame size")
                sizes.append(prev)
    out = []
    for sz in sizes:
        if q + sz > e:
            raise ValueError("EBML: laced frame overruns the block")
        out.append((track, ts, keyframe, bytes(buf[q : q + sz])))
        q += sz
    if q > e:
        raise ValueError("EBML: laced frame overruns the block")
    out.append((track, ts, keyframe, bytes(buf[q:e])))
    return out


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


def _enc_svint(d: int) -> bytes:
    """Signed EBML-lacing delta: biased into the unsigned vint range
    for the shortest length (value = unsigned − (2^(7L−1) − 1))."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= d <= bias:
            return ((d + bias) | (1 << (7 * length))).to_bytes(
                length, "big"
            )
    raise ValueError("EBML: lacing delta out of range")


def _lace_block(
    track: int, rel: int, keyframe: bool,
    payloads: list[bytes], mode: str,
) -> bytes:
    """A laced SimpleBlock body for ``payloads`` (all one track, one
    timestamp): Xiph 255-run sizes, fixed equal split, or EBML
    first-size + signed deltas — sizes for all but the last frame."""
    mode_bits = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}[mode]
    head = (
        _enc_size(track)
        + struct.pack(">h", rel)
        + bytes([(0x80 if keyframe else 0x00) | mode_bits])
        + bytes([len(payloads) - 1])
    )
    sizes = [len(p) for p in payloads]
    if mode == "xiph":
        for sz in sizes[:-1]:
            head += b"\xff" * (sz // 255) + bytes([sz % 255])
    elif mode == "fixed":
        if len(set(sizes)) != 1:
            raise ValueError("fixed lacing requires equal frame sizes")
    else:
        if len(payloads) > 1:
            head += _enc_size(sizes[0])
            for prev, cur in zip(sizes, sizes[1:-1]):
                head += _enc_svint(cur - prev)
    return head + b"".join(payloads)


def write_mkv(
    frames: list[tuple[int, int, bool, bytes]],
    tracks: list[MkvTrack],
    doc_type: str = "matroska",
    timestamp_scale_ns: int = 1_000_000,
    cluster_every: int = 4,
    lace_mode: str | None = None,
) -> bytes:
    """Minimal Matroska muxer (fixture builder): raw frame payloads as
    SimpleBlocks, grouped into a Cluster every ``cluster_every`` frames
    with the cluster timestamp rebased to the first frame — so the
    parser's cluster-relative timestamp math is exercised by real
    bytes.  Frames must be (track, ts_ticks, keyframe, payload) in
    ascending ts order.

    ``lace_mode`` in {"xiph", "fixed", "ebml"} packs each cluster's
    frames into ONE laced SimpleBlock (all frames must then share one
    track, one timestamp and one keyframe flag — the lacing contract;
    "fixed" additionally needs equal payload sizes)."""
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
        if lace_mode is not None:
            if len({(t, ts, k) for t, ts, k, _p in chunk}) != 1:
                raise ValueError(
                    "lacing requires one track/timestamp/keyframe per "
                    "cluster of frames"
                )
            track, ts, key, _ = chunk[0]
            body += _elem(
                SIMPLE_BLOCK,
                _lace_block(
                    track, ts - base, key,
                    [p for _t, _ts, _k, p in chunk], lace_mode,
                ),
            )
        else:
            for track, ts, key, payload in chunk:
                rel = ts - base
                if not -32768 <= rel <= 32767:
                    raise ValueError(
                        "frame timestamp too far from cluster base"
                    )
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
