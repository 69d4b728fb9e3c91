"""Pure-Python ID3v2 tag reader + fixture writer (MP3 metadata).

MP3 AUDIO decode needs codec libraries and stays behind the
``DecodeStub`` boundary, but the METADATA a curation pipeline routes on
(title/artist/album/track, the ID3v2 tag block preceding the audio
frames) is a simple public container: the informal standard at id3.org
(ID3v2.3, ID3v2.4).  Parsing it is the audio twin of the EBML demuxer —
real container, opaque codec payload.

Scope: ID3v2.3 and v2.4 headers (syncsafe tag size; v2.4 syncsafe frame
sizes vs v2.3 plain), text frames ``T***`` in Latin-1 (0), UTF-16 with
BOM (1), UTF-16BE (2) and UTF-8 (3) encodings; other frame types are
skipped by size.  Unsynchronization and extended headers raise loudly
rather than desynchronize.
"""

from __future__ import annotations


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
    major, rev = payload[3], payload[4]
    if major not in (3, 4):
        raise NotImplementedError(f"ID3v2.{major} not supported (2.3/2.4)")
    flags = payload[5]
    if flags & 0x80:
        raise NotImplementedError("ID3: unsynchronized tags not supported")
    if flags & 0x40:
        raise NotImplementedError("ID3: extended header not supported")
    size = _syncsafe(payload[6:10])
    out: dict = {"_version": (major, rev), "_tag_bytes": 10 + size}
    pos, end = 10, 10 + size
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_size = payload[pos + 4 : pos + 8]
        fsize = _syncsafe(raw_size) if major == 4 else int.from_bytes(
            raw_size, "big"
        )
        if pos + 10 + fsize > end:
            raise ValueError(
                f"ID3: frame {fid!r} overruns the tag "
                f"({fsize} bytes at {pos}, tag ends at {end})"
            )
        body = payload[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize
        name = fid.decode("latin-1")
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

_MP3_BITRATES = (  # MPEG-1 Layer III, kbps; index 0 = free, 15 = bad
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)  # MPEG-1
_MP3_SAMPLES_PER_FRAME = 1152  # Layer III, MPEG-1


def parse_mp3_frames(payload: bytes) -> dict:
    """Walk an MPEG-1 Layer III stream (optionally ID3v2-prefixed):
    returns frame count, sample rate, exact per-frame bitrate sum (for
    VBR census) and exact duration in microseconds.  The walk only
    succeeds if every computed frame length lands exactly on the next
    sync word — any drift in the length formula surfaces as a raise,
    not a wrong count.  Other MPEG versions/layers raise."""
    pos = 0
    if payload[:3] == b"ID3":
        pos = parse_id3(payload)["_tag_bytes"]
    n = 0
    kbps_sum = 0
    rate = None
    end = len(payload)
    while pos + 4 <= end:
        if payload[pos : pos + 3] == b"TAG":  # ID3v1 trailer
            break
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0x3 or layer != 0x1:
            raise NotImplementedError(
                "MP3: only MPEG-1 Layer III streams supported"
            )
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("MP3: free/invalid bitrate or sample rate")
        kbps = _MP3_BITRATES[br_idx]
        sr = _MP3_RATES[sr_idx]
        if rate is None:
            rate = sr
        elif rate != sr:
            raise ValueError("MP3: sample rate changed mid-stream")
        flen = 144 * kbps * 1000 // sr + padding
        if pos + flen > end:
            raise ValueError("MP3: truncated final frame")
        n += 1
        kbps_sum += kbps
        pos += flen
    if n == 0:
        raise ValueError("MP3: no audio frames")
    duration_us = n * _MP3_SAMPLES_PER_FRAME * 1_000_000 // rate
    return {
        "n_frames": n,
        "sample_rate": rate,
        "kbps_sum": kbps_sum,
        "duration_us": duration_us,
    }


def write_mp3(
    frame_kbps: list[int],
    sample_rate: int = 44100,
    paddings: list[int] | None = None,
    id3_frames: dict[str, str] | None = None,
) -> bytes:
    """Fixture writer: one MPEG-1 Layer III frame per entry (header +
    filler payload of the exact computed length), optionally ID3v2-
    prefixed — real sync-walkable bytes, opaque audio payload."""
    sr_idx = _MP3_RATES.index(sample_rate)
    out = bytearray()
    if id3_frames:
        out += write_id3(id3_frames)
    for i, kbps in enumerate(frame_kbps):
        pad = paddings[i] if paddings else 0
        br_idx = _MP3_BITRATES.index(kbps)
        h = (
            (0x7FF << 21)
            | (0x3 << 19)  # MPEG-1
            | (0x1 << 17)  # Layer III
            | (0x1 << 16)  # no CRC
            | (br_idx << 12)
            | (sr_idx << 10)
            | (pad << 9)
        )
        flen = 144 * kbps * 1000 // sample_rate + pad
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
) -> bytes:
    """Fixture writer: text frames (UTF-8 by default; pass
    ``encoding=0/1/3`` to exercise the decoders) + padding, followed by
    ``audio`` (opaque bytes standing in for the MPEG frames)."""
    codec = _DECODERS[encoding]
    body = b""
    for fid, text in frames.items():
        fb = bytes([encoding]) + text.encode(codec)
        size = _enc_syncsafe(len(fb)) if major == 4 else len(fb).to_bytes(
            4, "big"
        )
        body += fid.encode("latin-1") + size + b"\x00\x00" + fb
    body += b"\x00" * padding
    head = b"ID3" + bytes([major, 0, 0]) + _enc_syncsafe(len(body))
    return head + body + audio
