"""Pure-Python ID3v2 tag reader + fixture writer (MP3 metadata).

MP3 AUDIO decode needs codec libraries and stays behind the
``DecodeStub`` boundary, but the METADATA a curation pipeline routes on
(title/artist/album/track, the ID3v2 tag block preceding the audio
frames) is a simple public container: the informal standard at id3.org
(ID3v2.3, ID3v2.4).  Parsing it is the audio twin of the EBML demuxer —
real container, opaque codec payload.

Scope: ID3v2.2, v2.3 and v2.4 headers (syncsafe tag size; v2.4
syncsafe frame sizes vs v2.2/v2.3 plain; v2.2's 6-byte frame headers
with 3-char ids mapped onto their v2.3 names), text frames ``T***`` in
Latin-1 (0), UTF-16 with BOM (1), UTF-16BE (2) and UTF-8 (3)
encodings; other frame types are skipped by size.  UNSYNCHRONIZATION
is decoded for real — the whole-tag scheme of v2.2/v2.3 (flag 0x80)
and v2.4's per-frame flag (format bit 0x02) — common in older
real-world MP3 corpora.  Extended headers and v2.4 compressed/
encrypted frames raise loudly rather than desynchronize.
"""

from __future__ import annotations

import zlib


def _unsync_decode(data: bytes) -> bytes:
    """Reverse the unsynchronization scheme: every 0x00 immediately
    following 0xFF was inserted by the writer — drop it."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        out.append(data[i])
        if data[i] == 0xFF and i + 1 < n and data[i + 1] == 0:
            i += 2
        else:
            i += 1
    return bytes(out)


def _unsync_encode(data: bytes) -> bytes:
    """Apply unsynchronization: insert 0x00 after every 0xFF that is
    followed by 0x00 or a sync-pattern byte (>= 0xE0), or that ends the
    data — so no false MPEG sync word survives in the tag."""
    out = bytearray()
    n = len(data)
    for i, b in enumerate(data):
        out.append(b)
        if b == 0xFF and (
            i + 1 == n or data[i + 1] == 0 or data[i + 1] >= 0xE0
        ):
            out.append(0)
    return bytes(out)


# v2.2's 3-char frame ids for the text frames this reader surfaces,
# mapped onto their v2.3/v2.4 names (id3.org: ID3v2.2 §4 vs ID3v2.3 §4)
_V22_TO_V23 = {
    "TT2": "TIT2",
    "TP1": "TPE1",
    "TAL": "TALB",
    "TRK": "TRCK",
    "TYE": "TYER",
    "TCO": "TCON",
}
_V23_TO_V22 = {v: k for k, v in _V22_TO_V23.items()}


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("ID3: non-syncsafe byte in syncsafe integer")
    v = 0
    for x in b:
        v = (v << 7) | x
    return v


def _enc_syncsafe(v: int) -> bytes:
    if v >= 1 << 28:
        raise ValueError("ID3: size too large for syncsafe encoding")
    return bytes((v >> s) & 0x7F for s in (21, 14, 7, 0))


_DECODERS = {
    0: "latin-1",
    1: "utf-16",  # BOM-carrying
    2: "utf-16-be",
    3: "utf-8",
}


def parse_id3(payload: bytes) -> dict:
    """The tag block's text frames as ``{frame_id: text}`` plus
    ``{"_version": (major, rev), "_tag_bytes": n}``.  ``n`` is where the
    audio stream begins — the split point a pipeline shards on."""
    if payload[:3] != b"ID3":
        raise ValueError("not an ID3v2 tag")
    if len(payload) < 10:
        raise ValueError("ID3: truncated tag header")
    major, rev = payload[3], payload[4]
    if major not in (2, 3, 4):
        raise NotImplementedError(
            f"ID3v2.{major} not supported (2.2/2.3/2.4)"
        )
    flags = payload[5]
    if flags & 0x40 and major == 2:
        # v2.2 bit 6 = compression; the spec says such tags are
        # unreadable without the (never-standardized) scheme
        raise NotImplementedError("ID3v2.2 compressed tag not supported")
    size = _syncsafe(payload[6:10])
    out: dict = {"_version": (major, rev), "_tag_bytes": 10 + size}
    tag = payload[10 : 10 + size]
    if flags & 0x80 and major in (2, 3):
        # v2.2/v2.3: unsynchronization applies to the WHOLE tag body;
        # the header's size counts the stored (unsynchronized) bytes
        tag = _unsync_decode(tag)
    if flags & 0x40 and major in (3, 4):
        # extended header: skippable by size.  v2.3 stores a 4-byte
        # plain size EXCLUDING itself (and is counted after unsync);
        # v2.4 a syncsafe size INCLUDING the 6-byte fixed part
        if len(tag) < 4:
            raise ValueError("ID3: truncated extended header")
        if major == 3:
            ext = 4 + int.from_bytes(tag[:4], "big")
        else:
            ext = _syncsafe(tag[:4])
            if ext < 6:
                raise ValueError("ID3: bad extended header size")
        if ext > len(tag):
            raise ValueError("ID3: extended header overruns tag")
        tag = tag[ext:]
    id_len = 3 if major == 2 else 4
    hdr_len = 6 if major == 2 else 10
    pos, end = 0, len(tag)
    while pos + hdr_len <= end:
        fid = tag[pos : pos + id_len]
        if fid == b"\x00" * id_len:
            break  # padding
        raw_size = tag[pos + id_len : pos + 2 * id_len]
        fsize = _syncsafe(raw_size) if major == 4 else int.from_bytes(
            raw_size, "big"
        )
        if pos + hdr_len + fsize > end:
            raise ValueError(
                f"ID3: frame {fid!r} overruns the tag "
                f"({fsize} bytes at {pos}, tag ends at {end})"
            )
        body = tag[pos + hdr_len : pos + hdr_len + fsize]
        if major == 4:
            fmt = tag[pos + 9]
            if fmt & 0x04:
                raise NotImplementedError(
                    "ID3: encrypted v2.4 frame not supported"
                )
            if fmt & 0x40:  # v2.4: grouping identity byte leads the
                # frame data, BEFORE the (possibly unsynced) body
                # (ADVICE r8: was silently left prepended)
                body = body[1:]
            if fmt & 0x02:  # v2.4: unsynchronization is PER FRAME
                body = _unsync_decode(body)
            if fmt & 0x08:  # v2.4: zlib-compressed frame body
                # the spec mandates the data-length indicator (4
                # syncsafe bytes = decompressed size) with compression
                if not fmt & 0x01 or len(body) < 4:
                    raise ValueError(
                        "ID3: compressed v2.4 frame without data length"
                    )
                want = _syncsafe(body[:4])
                try:
                    body = zlib.decompress(body[4:])
                except zlib.error as e:
                    raise ValueError(
                        f"ID3: corrupt compressed frame ({e})"
                    ) from e
                if len(body) != want:
                    raise ValueError(
                        "ID3: decompressed frame size mismatch"
                    )
            elif fmt & 0x01:  # bare data-length indicator: skip it
                body = body[4:]
        elif major == 3:
            fmt = tag[pos + 9]
            if fmt & 0x40:
                raise NotImplementedError(
                    "ID3: encrypted v2.3 frame not supported"
                )
            # ID3v2.3 appends the flag-derived fields in FLAG order:
            # 4-byte decompressed size (0x80) first, THEN the grouping
            # identity byte (0x20) — so the size must be read before
            # the group byte is stripped (ADVICE r8).
            want = None
            if fmt & 0x80:  # v2.3: 4-byte plain decompressed size
                if len(body) < 4:
                    raise ValueError(
                        "ID3: compressed v2.3 frame truncated"
                    )
                want = int.from_bytes(body[:4], "big")
                body = body[4:]
            if fmt & 0x20:  # grouping identity byte precedes the body
                body = body[1:]
            if fmt & 0x80:
                try:
                    body = zlib.decompress(body)
                except zlib.error as e:
                    raise ValueError(
                        f"ID3: corrupt compressed frame ({e})"
                    ) from e
                if len(body) != want:
                    raise ValueError(
                        "ID3: decompressed frame size mismatch"
                    )
        pos += hdr_len + fsize
        name = fid.decode("latin-1")
        if major == 2:
            name = _V22_TO_V23.get(name, name)
        if name.startswith("T") and body:
            enc = body[0]
            codec = _DECODERS.get(enc)
            if codec is None:
                raise ValueError(f"ID3: unknown text encoding {enc}")
            out[name] = (
                body[1:].decode(codec, "replace").split("\x00")[0]
            )
    return out


# --------------------------------------------------------------------------
# MPEG audio frame headers (MP3 stream metadata)
# --------------------------------------------------------------------------
#
# The frame-header layout is public (ISO/IEC 11172-3; reproduced in
# every MP3 header reference): 11 sync bits, version, layer, bitrate
# and sample-rate indexes, padding.  Walking the headers yields the
# stream metadata a pipeline shards and filters on — frame count,
# duration, bitrate census — without decoding any audio (the Huffman/
# IMDCT payload stays behind the codec-library boundary).

# version field (header bits 19-20) -> label; 1 is reserved
_MP3_VERSIONS = {3: "1", 2: "2", 0: "2.5"}
# layer field (header bits 17-18) -> layer number; 0 is reserved
_MP3_LAYERS = {3: 1, 2: 2, 1: 3}
# bitrate tables, kbps, indexes 1..14 (0 = free, 15 = bad); keyed by
# (version group, layer) — MPEG-2 and 2.5 share tables (ISO 11172-3
# table B.1 / ISO 13818-3)
_MP3_BITRATE_TABLES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
               416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160),
}
# sample-rate tables by version label, indexes 0..2 (3 = reserved)
_MP3_RATE_TABLES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
# kept for backward compatibility with existing fixtures/tests
_MP3_BITRATES = (None,) + _MP3_BITRATE_TABLES[("1", 3)]
_MP3_RATES = _MP3_RATE_TABLES["1"]
_MP3_SAMPLES_PER_FRAME = 1152  # Layer III, MPEG-1


def _mp3_group(version: str) -> str:
    return "1" if version == "1" else "2"


def _mp3_spf(version: str, layer: int) -> int:
    """Samples per frame: Layer I 384; Layer II 1152; Layer III 1152
    (MPEG-1) or 576 (MPEG-2/2.5)."""
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def _mp3_frame_len(version: str, layer: int, kbps: int, sr: int,
                   padding: int) -> int:
    """Frame length in bytes: Layer I counts 4-byte slots."""
    if layer == 1:
        return (12 * kbps * 1000 // sr + padding) * 4
    if layer == 2 or version == "1":
        return 144 * kbps * 1000 // sr + padding
    return 72 * kbps * 1000 // sr + padding  # Layer III, MPEG-2/2.5


def parse_mp3_frames(payload: bytes) -> dict:
    """Walk an MPEG audio stream (optionally ID3v2-prefixed) — MPEG-1,
    MPEG-2 and MPEG-2.5, Layers I/II/III: returns frame count, sample
    rate, exact per-frame bitrate sum (for VBR census), exact duration
    in microseconds, and the stream's version/layer.  The walk only
    succeeds if every computed frame length lands exactly on the next
    sync word — any drift in the per-layer length formula surfaces as a
    raise, not a wrong count.  Version/layer/rate changes mid-stream
    raise (real streams are homogeneous)."""
    pos = 0
    if payload[:3] == b"ID3":
        pos = parse_id3(payload)["_tag_bytes"]
    n = 0
    kbps_sum = 0
    rate = None
    ver_layer: tuple[str, int] | None = None
    end = len(payload)
    while pos + 4 <= end:
        if payload[pos : pos + 3] == b"TAG":  # ID3v1 trailer
            break
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        vbits = (h >> 19) & 0x3
        lbits = (h >> 17) & 0x3
        if vbits not in _MP3_VERSIONS or lbits not in _MP3_LAYERS:
            raise ValueError("MP3: reserved version or layer")
        version = _MP3_VERSIONS[vbits]
        layer = _MP3_LAYERS[lbits]
        if ver_layer is None:
            ver_layer = (version, layer)
        elif ver_layer != (version, layer):
            raise ValueError("MP3: version/layer changed mid-stream")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("MP3: free/invalid bitrate or sample rate")
        kbps = _MP3_BITRATE_TABLES[(_mp3_group(version), layer)][br_idx - 1]
        sr = _MP3_RATE_TABLES[version][sr_idx]
        if rate is None:
            rate = sr
        elif rate != sr:
            raise ValueError("MP3: sample rate changed mid-stream")
        flen = _mp3_frame_len(version, layer, kbps, sr, padding)
        if pos + flen > end:
            raise ValueError("MP3: truncated final frame")
        n += 1
        kbps_sum += kbps
        pos += flen
    if n == 0 or ver_layer is None:
        raise ValueError("MP3: no audio frames")
    version, layer = ver_layer
    spf = _mp3_spf(version, layer)
    duration_us = n * spf * 1_000_000 // rate
    return {
        "n_frames": n,
        "sample_rate": rate,
        "kbps_sum": kbps_sum,
        "duration_us": duration_us,
        "version": version,
        "layer": layer,
    }


def write_mp3(
    frame_kbps: list[int],
    sample_rate: int = 44100,
    paddings: list[int] | None = None,
    id3_frames: dict[str, str] | None = None,
    version: str = "1",
    layer: int = 3,
) -> bytes:
    """Fixture writer: one MPEG audio frame per entry (header + filler
    payload of the exact computed length), optionally ID3v2-prefixed —
    real sync-walkable bytes, opaque audio payload.  ``version`` in
    {"1", "2", "2.5"}, ``layer`` in {1, 2, 3}; the per-layer frame
    length formula matches the parser's."""
    sr_idx = _MP3_RATE_TABLES[version].index(sample_rate)
    vbits = {v: k for k, v in _MP3_VERSIONS.items()}[version]
    lbits = {v: k for k, v in _MP3_LAYERS.items()}[layer]
    table = _MP3_BITRATE_TABLES[(_mp3_group(version), layer)]
    out = bytearray()
    if id3_frames:
        out += write_id3(id3_frames)
    for i, kbps in enumerate(frame_kbps):
        pad = paddings[i] if paddings else 0
        br_idx = table.index(kbps) + 1
        h = (
            (0x7FF << 21)
            | (vbits << 19)
            | (lbits << 17)
            | (0x1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
        )
        flen = _mp3_frame_len(version, layer, kbps, sample_rate, pad)
        frame = bytearray(h.to_bytes(4, "big"))
        frame += bytes((i + j) % 256 for j in range(flen - 4))
        out += frame
    return bytes(out)


def write_id3(
    frames: dict[str, str],
    major: int = 4,
    audio: bytes = b"",
    encoding: int = 3,
    padding: int = 16,
    unsync: bool = False,
    compress: bool = False,
    group: int | None = None,
) -> bytes:
    """Fixture writer: text frames (UTF-8 by default; pass
    ``encoding=0/1/3`` to exercise the decoders) + padding, followed by
    ``audio`` (opaque bytes standing in for the MPEG frames).

    ``major=2`` writes ID3v2.2 (6-byte frame headers, 3-char ids via
    the reverse name map).  ``unsync=True`` applies real
    unsynchronization — whole-tag for v2.2/v2.3 (flag 0x80, header size
    counts the expanded bytes), per-frame for v2.4 (format bit 0x02,
    syncsafe size of the expanded body).  ``compress=True`` (v2.3/v2.4
    only) zlib-compresses every frame body — v2.4 sets format bits
    0x08|0x01 with the syncsafe data-length indicator, v2.3 sets 0x80
    with the 4-byte plain decompressed size; per the spec, compression
    happens before (per-frame) unsynchronization on write.
    ``group`` (v2.3/v2.4 only) tags every frame with a grouping
    identity byte — v2.3 stores it AFTER the decompressed-size field
    (flag 0x20, flag-order layout), v2.4 stores it FIRST, before the
    unsynced body (format bit 0x40)."""
    codec = _DECODERS[encoding]
    if compress and major == 2:
        raise ValueError("ID3v2.2 has no standard frame compression")
    if group is not None and major == 2:
        raise ValueError("ID3v2.2 has no frame grouping")
    body = b""
    for fid, text in frames.items():
        if major == 2:
            fid = _V23_TO_V22.get(fid, fid)
            if len(fid) != 3:
                raise ValueError(f"ID3v2.2: no 3-char id for {fid!r}")
        fb = bytes([encoding]) + text.encode(codec)
        if major == 4:
            fmt = 0
            if compress:
                fb = _enc_syncsafe(len(fb)) + zlib.compress(fb, 6)
                fmt |= 0x08 | 0x01
            if unsync:
                fb = _unsync_encode(fb)
                fmt |= 0x02
            if group is not None:  # group byte leads the stored data
                fb = bytes([group]) + fb
                fmt |= 0x40
            body += (
                fid.encode("latin-1")
                + _enc_syncsafe(len(fb))
                + bytes([0, fmt])
                + fb
            )
        elif major == 3:
            fmt = 0
            if compress:
                size4 = len(fb).to_bytes(4, "big")
                fb = zlib.compress(fb, 6)
                fmt |= 0x80
            else:
                size4 = b""
            if group is not None:
                fb = bytes([group]) + fb
                fmt |= 0x20
            # flag-order layout: decompressed size, then group byte
            fb = size4 + fb
            body += (
                fid.encode("latin-1")
                + len(fb).to_bytes(4, "big")
                + bytes([0, fmt])
                + fb
            )
        else:
            body += fid.encode("latin-1") + len(fb).to_bytes(3, "big") + fb
    body += b"\x00" * padding
    tag_flags = 0
    if unsync:
        tag_flags |= 0x80  # v2.4: informational (all frames unsynced)
        if major in (2, 3):
            body = _unsync_encode(body)
    head = b"ID3" + bytes([major, 0, tag_flags]) + _enc_syncsafe(len(body))
    return head + body + audio
