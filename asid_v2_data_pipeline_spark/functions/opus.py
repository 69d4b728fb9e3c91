"""Ogg-Opus (RFC 7845) header parsing + TOC-based packet duration.

Opus is the growing share of crawled web audio (WebRTC captures,
YouTube-adjacent rips, podcast feeds); its Ogg encapsulation is
public and small:

- ``OpusHead`` ID header: version, channel count, pre-skip, input
  sample rate, output gain (Q7.8 dB), channel mapping family (+ the
  stream/coupled counts and mapping table for family > 0);
- ``OpusTags`` comment header: vendor + ``KEY=value`` tags (the
  Vorbis-comment layout, little-endian, no framing bit);
- audio packets: the TOC byte (RFC 6716 §3.1) gives every packet's
  exact duration in 48 kHz samples WITHOUT decoding — config 0..31
  selects the frame duration (SILK 10/20/40/60 ms, hybrid 10/20 ms,
  CELT 2.5/5/10/20 ms), the frame-count code selects 1, 2, or N
  frames (code 3: count byte with VBR/padding flags), and a packet
  over 120 ms is invalid per spec.

That TOC arithmetic is how real tools (opusinfo, ffprobe) report
duration without decode, and it is pure integer — so the oracle can
replay it.  The SILK/CELT payload decode itself needs the full Opus
reference machinery (range coder, LPC, MDCT) and sits behind the
same reasoned float-codec boundary as Vorbis PCM (SCALE.md §Vorbis);
the metadata + duration layer a curation pipeline routes on is real.

Fuzz contract (SCALE.md round 10): malformed input raises
``ValueError``; all counts validated before allocation.  Reference
has no media containers (``/root/reference/asip_v2/archive.py:19-20``);
§2.11 surface.
"""

from __future__ import annotations

import struct

_MAX_TAGS = 4096

# samples per frame at 48 kHz by TOC config (RFC 6716 §3.1):
# 0..11 SILK 10/20/40/60 ms; 12..15 hybrid 10/20 ms; 16..31 CELT
# 2.5/5/10/20 ms
_SILK = (480, 960, 1920, 2880)
_HYBRID = (480, 960)
_CELT = (120, 240, 480, 960)
_MAX_PACKET_SAMPLES = 5760  # 120 ms


def samples_per_frame(config: int) -> int:
    if not 0 <= config <= 31:
        raise ValueError(f"opus: config {config} out of range")
    if config < 12:
        return _SILK[config % 4]
    if config < 16:
        return _HYBRID[config % 2]
    return _CELT[config % 4]


def packet_samples(packet: bytes) -> int:
    """Exact 48 kHz sample count of one Opus packet from its TOC byte
    (+ the code-3 frame-count byte), per RFC 6716 §3.1 — no decode."""
    if not packet:
        raise ValueError("opus: empty packet")
    toc = packet[0]
    config = toc >> 3
    code = toc & 0x03
    spf = samples_per_frame(config)
    if code == 0:
        frames = 1
    elif code in (1, 2):
        frames = 2
        if code == 2 and len(packet) < 2:
            raise ValueError("opus: code-2 packet without size byte")
    else:
        if len(packet) < 2:
            raise ValueError("opus: code-3 packet without count byte")
        frames = packet[1] & 0x3F
        if frames == 0:
            raise ValueError("opus: code-3 packet with zero frames")
    total = frames * spf
    if total > _MAX_PACKET_SAMPLES:
        raise ValueError(
            f"opus: packet duration {total} exceeds 120 ms"
        )
    return total


def parse_opus_head(packet: bytes) -> dict:
    if len(packet) < 19 or packet[:8] != b"OpusHead":
        raise ValueError("opus: bad OpusHead packet")
    version = packet[8]
    if version >> 4 != 0:  # RFC 7845: major version must be 0
        raise ValueError(f"opus: unsupported version {version}")
    channels = packet[9]
    if channels == 0:
        raise ValueError("opus: zero channels")
    pre_skip, rate = struct.unpack_from("<HI", packet, 10)
    (gain,) = struct.unpack_from("<h", packet, 16)
    family = packet[18]
    out = {
        "version": version,
        "channels": channels,
        "pre_skip": pre_skip,
        "input_sample_rate": rate,
        "output_gain_q8": gain,
        "mapping_family": family,
    }
    if family == 0:
        if channels > 2:
            raise ValueError("opus: family 0 allows at most 2 channels")
        if len(packet) != 19:
            raise ValueError("opus: trailing bytes after family-0 head")
    else:
        if len(packet) != 21 + channels:
            raise ValueError("opus: bad mapping table length")
        streams, coupled = packet[19], packet[20]
        mapping = list(packet[21 : 21 + channels])
        if streams == 0 or coupled > streams:
            raise ValueError("opus: bad stream/coupled counts")
        if any(m != 255 and m >= streams + coupled for m in mapping):
            raise ValueError("opus: mapping index out of range")
        out.update(
            stream_count=streams,
            coupled_count=coupled,
            mapping=mapping,
        )
    return out


def parse_opus_tags(packet: bytes) -> dict:
    if len(packet) < 12 or packet[:8] != b"OpusTags":
        raise ValueError("opus: bad OpusTags packet")
    pos = 8
    (vlen,) = struct.unpack_from("<I", packet, pos)
    pos += 4
    if pos + vlen > len(packet):
        raise ValueError("opus: vendor length exceeds packet")
    vendor = packet[pos : pos + vlen].decode("utf-8", errors="strict")
    pos += vlen
    if pos + 4 > len(packet):
        raise ValueError("opus: truncated tag count")
    (n,) = struct.unpack_from("<I", packet, pos)
    pos += 4
    if n > _MAX_TAGS:
        raise ValueError("opus: implausible tag count")
    tags: dict[str, str] = {}
    for _ in range(n):
        if pos + 4 > len(packet):
            raise ValueError("opus: truncated tag length")
        (ln,) = struct.unpack_from("<I", packet, pos)
        pos += 4
        if pos + ln > len(packet):
            raise ValueError("opus: tag exceeds packet")
        s = packet[pos : pos + ln].decode("utf-8", errors="strict")
        pos += ln
        if "=" not in s:
            raise ValueError("opus: tag without '='")
        k, v = s.split("=", 1)
        tags[k.upper()] = v
    return {"vendor": vendor, "tags": tags}


# --- writer (fixture synthesis) -----------------------------------------------


def write_opus_head(
    channels: int,
    pre_skip: int = 312,
    input_rate: int = 48000,
    gain_q8: int = 0,
) -> bytes:
    if not 1 <= channels <= 2:
        raise ValueError("opus: family-0 writer supports 1-2 channels")
    return (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<HIh", pre_skip, input_rate, gain_q8)
        + bytes([0])
    )


def write_opus_tags(
    tags: dict[str, str], vendor: str = "asid-v2-spark fixture"
) -> bytes:
    vb = vendor.encode("utf-8")
    out = b"OpusTags" + struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(tags))
    for k in sorted(tags):
        s = f"{k}={tags[k]}".encode("utf-8")
        out += struct.pack("<I", len(s)) + s
    return out


def opus_packet(config: int, code: int, n_frames: int = 1) -> bytes:
    """A structurally-valid Opus packet skeleton: TOC byte (+ code-3
    count byte); the compressed frame payload stays opaque behind the
    float-codec boundary."""
    if code in (0, 1):
        return bytes([(config << 3) | code])
    if code == 2:
        return bytes([(config << 3) | 2, 0])
    if code == 3:
        if not 1 <= n_frames <= 63:
            raise ValueError("opus: code-3 frame count out of range")
        return bytes([(config << 3) | 3, n_frames])
    raise ValueError(f"opus: bad frame-count code {code}")


def write_ogg_opus(
    channels: int,
    tags: dict[str, str],
    packets: list[bytes],
    pre_skip: int = 312,
    input_rate: int = 48000,
    gain_q8: int = 0,
    serial: int = 1,
) -> bytes:
    """Mux OpusHead + OpusTags + audio packets into an Ogg stream per
    RFC 7845: a page's granule position is the count of 48 kHz
    samples decoded up to and including its last completed packet —
    the pre-skip samples are part of that count (players trim them),
    so playable duration = last_granule - pre_skip."""
    from .ogg import write_ogg

    head = write_opus_head(channels, pre_skip, input_rate, gain_q8)
    pkts = [(head, 0), (write_opus_tags(tags), 0)]
    total = 0
    for p in packets:
        total += packet_samples(p)
        pkts.append((p, total))
    return write_ogg(pkts, serial=serial)


def parse_ogg_opus(data: bytes) -> dict:
    """Extract Opus stream info from an Ogg container: head + tags +
    the TOC-derived total duration in 48 kHz samples."""
    from .ogg import parse_ogg

    streams = parse_ogg(data)
    for serial in sorted(streams):
        packets = streams[serial]
        if packets and packets[0][1][:8] == b"OpusHead":
            if len(packets) < 2:
                raise ValueError("opus: missing OpusTags packet")
            info = parse_opus_head(packets[0][1])
            info.update(parse_opus_tags(packets[1][1]))
            samples = 0
            for _g, p in packets[2:]:
                samples += packet_samples(p)
            info["n_audio_packets"] = len(packets) - 2
            info["total_samples48"] = samples
            info["last_granule"] = max(
                (g for g, _ in packets), default=0
            )
            return info
    raise ValueError("ogg-opus: no Opus logical stream")
