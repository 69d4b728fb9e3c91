"""VP9 UNCOMPRESSED frame header, pure Python from the public "VP9
Bitstream & Decoding Process Specification" (§6.2 uncompressed_header).

r13 (SCALE.md round-13 VP8/VP9 adjudication): payload decode is a
PERMANENT disclosed boundary (the compressed header and tile data are
driven by literal normative probability tables not retrievable
in-sandbox), but the *uncompressed* header is plain MSB-first bits —
frame marker, profile, show_existing/frame type/show_frame flags,
keyframe sync code, color config (bit depth, color space, range,
subsampling) and frame/render dimensions — everything a WebM curation
pipeline routes and filters on.  This module parses exactly that and
writes spec-legal keyframe/inter stubs for fixtures (header + opaque
filler standing in for the boolean-coded payload this engine never
decodes).

Scope per frame type:

- ``show_existing_frame``: marker + profile + map index — the full
  header for such frames, returned completely;
- KEY frames: parsed through render_size (sync code enforced);
- inter frames: marker/profile/show_frame/error_resilient only —
  everything further needs reference-frame state (refresh masks, ref
  indices) that is metadata-free for curation; fields beyond the
  common prefix are absent from the result, not guessed.

Strictness: bad marker, profile-3 reserved bit, bad sync code, RGB
color space with profile 0/2 (spec-illegal), reserved subsampling
bits, zero dimensions and truncation all raise ValueError — the same
loud-failure fuzz contract every parser here carries.

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); §2.11 multimodal surface.
"""

from __future__ import annotations

_SYNC = (0x49, 0x83, 0x42)
_CS_RGB = 7


class _Bits:
    """MSB-first bit reader (the f(n) of the VP9 spec)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def f(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte, bit = self.pos >> 3, 7 - (self.pos & 7)
            if byte >= len(self.buf):
                raise ValueError("vp9: header truncated")
            out = (out << 1) | ((self.buf[byte] >> bit) & 1)
            self.pos += 1
        return out


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def f(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << (7 - j)
            out.append(b)
        return bytes(out)


def parse_vp9_frame_header(data: bytes) -> dict:
    """Parse a VP9 frame's uncompressed header (spec §6.2)."""
    r = _Bits(bytes(data))
    if r.f(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = r.f(1) | (r.f(1) << 1)
    if profile == 3 and r.f(1):
        raise ValueError("vp9: profile-3 reserved bit set")
    if r.f(1):  # show_existing_frame
        return {
            "profile": profile,
            "show_existing_frame": True,
            "frame_to_show": r.f(3),
        }
    key_frame = r.f(1) == 0
    show_frame = bool(r.f(1))
    error_resilient = bool(r.f(1))
    out = {
        "profile": profile,
        "show_existing_frame": False,
        "key_frame": key_frame,
        "show_frame": show_frame,
        "error_resilient": error_resilient,
    }
    if not key_frame:
        return out
    if (r.f(8), r.f(8), r.f(8)) != _SYNC:
        raise ValueError("vp9: bad keyframe sync code")
    # color_config
    bit_depth = (10 + 2 * r.f(1)) if profile >= 2 else 8
    color_space = r.f(3)
    if color_space != _CS_RGB:
        color_range = bool(r.f(1))
        if profile in (1, 3):
            sub_x, sub_y = r.f(1), r.f(1)
            if r.f(1):
                raise ValueError("vp9: color-config reserved bit set")
        else:
            sub_x = sub_y = 1
    else:
        if profile in (0, 2):
            raise ValueError("vp9: RGB requires profile 1 or 3")
        color_range = True
        sub_x = sub_y = 0
        if r.f(1):
            raise ValueError("vp9: color-config reserved bit set")
    width = r.f(16) + 1
    height = r.f(16) + 1
    if r.f(1):  # render_and_frame_size_different
        render_w, render_h = r.f(16) + 1, r.f(16) + 1
    else:
        render_w, render_h = width, height
    out.update(
        bit_depth=bit_depth,
        color_space=color_space,
        color_range=color_range,
        subsampling_x=sub_x,
        subsampling_y=sub_y,
        width=width,
        height=height,
        render_width=render_w,
        render_height=render_h,
    )
    return out


def write_vp9_key_stub(
    width: int,
    height: int,
    profile: int = 0,
    show_frame: bool = True,
    error_resilient: bool = False,
    bit_depth: int = 8,
    color_space: int = 1,
    color_range: bool = False,
    subsampling_x: int = 1,
    subsampling_y: int = 1,
    render_size: "tuple[int, int] | None" = None,
    trailing: bytes = b"",
) -> bytes:
    """Spec-legal VP9 KEYFRAME uncompressed header + opaque filler."""
    if not (1 <= width <= 1 << 16 and 1 <= height <= 1 << 16):
        raise ValueError("vp9: dimensions out of 16-bit range")
    if profile not in (0, 1, 2, 3):
        raise ValueError("vp9: bad profile")
    if profile < 2 and bit_depth != 8:
        raise ValueError("vp9: profiles 0/1 are 8-bit")
    if profile >= 2 and bit_depth not in (10, 12):
        raise ValueError("vp9: profiles 2/3 are 10/12-bit")
    if color_space == _CS_RGB and profile in (0, 2):
        raise ValueError("vp9: RGB requires profile 1 or 3")
    w = _BitsW()
    w.f(2, 2)
    w.f(profile & 1, 1)
    w.f(profile >> 1, 1)
    if profile == 3:
        w.f(0, 1)
    w.f(0, 1)  # show_existing_frame
    w.f(0, 1)  # frame_type = KEY
    w.f(int(show_frame), 1)
    w.f(int(error_resilient), 1)
    for s in _SYNC:
        w.f(s, 8)
    if profile >= 2:
        w.f((bit_depth - 10) // 2, 1)
    w.f(color_space, 3)
    if color_space != _CS_RGB:
        w.f(int(color_range), 1)
        if profile in (1, 3):
            w.f(subsampling_x, 1)
            w.f(subsampling_y, 1)
            w.f(0, 1)
    else:
        w.f(0, 1)
    w.f(width - 1, 16)
    w.f(height - 1, 16)
    if render_size is None:
        w.f(0, 1)
    else:
        w.f(1, 1)
        w.f(render_size[0] - 1, 16)
        w.f(render_size[1] - 1, 16)
    return w.bytes() + trailing


def write_vp9_inter_stub(
    profile: int = 0,
    show_frame: bool = True,
    error_resilient: bool = False,
    trailing: bytes = b"",
) -> bytes:
    """Minimal spec-legal INTER frame prefix (common header fields
    only; everything further is boolean-coded reference state this
    engine never decodes)."""
    if profile not in (0, 1, 2, 3):
        raise ValueError("vp9: bad profile")
    w = _BitsW()
    w.f(2, 2)
    w.f(profile & 1, 1)
    w.f(profile >> 1, 1)
    if profile == 3:
        w.f(0, 1)
    w.f(0, 1)  # show_existing_frame
    w.f(1, 1)  # frame_type = INTER
    w.f(int(show_frame), 1)
    w.f(int(error_resilient), 1)
    return w.bytes() + trailing


# --- superframes --------------------------------------------------------------
#
# Real WebM VP9 blocks frequently carry SUPERFRAMES: up to 8 frames
# (hidden alt-ref frames + the shown frame) concatenated, with a
# trailing index.  The index is plain bits (spec Annex B): a marker
# byte 0b110_MM_FFF at BOTH ends (FFF = frame count - 1, MM = bytes
# per size - 1), with frames_count little-endian sizes between.  A
# demuxer that does not split superframes mis-parses every multi-frame
# block, so the metadata layer handles them transparently.


def split_vp9_superframe(data: bytes) -> "list[bytes]":
    """Split a VP9 packet into its frames.

    Returns ``[data]`` unchanged when no trailing superframe index is
    present.  Detection follows the reference demuxer rule: the last
    byte must be a marker AND the byte ``idx_len`` back must be the
    SAME marker — a frame whose final byte merely looks like a marker
    is a single frame, not an error.  Once both markers match, the
    index is load-bearing: frame sizes must sum to exactly the bytes
    before the index and no member may be empty — a corrupt index
    raises instead of yielding garbage frame boundaries."""
    buf = bytes(data)
    if not buf:
        raise ValueError("vp9: empty packet")
    last = buf[-1]
    if (last & 0xE0) != 0xC0:
        return [buf]
    frames = (last & 0x07) + 1
    mag = ((last >> 3) & 0x03) + 1
    idx_len = 2 + mag * frames
    if len(buf) < idx_len or buf[-idx_len] != last:
        return [buf]  # trailing byte only coincidentally marker-shaped
    sizes = []
    at = len(buf) - idx_len + 1
    for _ in range(frames):
        v = 0
        for k in range(mag):
            v |= buf[at + k] << (8 * k)
        sizes.append(v)
        at += mag
    body = len(buf) - idx_len
    if sum(sizes) != body:
        raise ValueError(
            f"vp9: superframe sizes sum {sum(sizes)} != body {body}"
        )
    out, pos = [], 0
    for s in sizes:
        if s == 0:
            raise ValueError("vp9: zero-length superframe member")
        out.append(buf[pos : pos + s])
        pos += s
    return out


def write_vp9_superframe(frames: "list[bytes]") -> bytes:
    """Pack frames into a superframe with a trailing index (Annex B)."""
    if not (1 <= len(frames) <= 8):
        raise ValueError("vp9: superframe holds 1..8 frames")
    if any(len(f) == 0 for f in frames):
        raise ValueError("vp9: zero-length superframe member")
    mag = 1
    biggest = max(len(f) for f in frames)
    while biggest >= 1 << (8 * mag):
        mag += 1
    if mag > 4:
        raise ValueError("vp9: frame too large for a superframe index")
    marker = 0xC0 | ((mag - 1) << 3) | (len(frames) - 1)
    idx = bytearray([marker])
    for f in frames:
        v = len(f)
        for k in range(mag):
            idx.append((v >> (8 * k)) & 0xFF)
    idx.append(marker)
    return b"".join(frames) + bytes(idx)
