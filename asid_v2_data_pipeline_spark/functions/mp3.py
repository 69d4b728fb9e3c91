"""MPEG-1 Audio Layer III (MP3) — from-spec encoder + SAMPLE decoder
with a fixed-point reconstruction pipeline (VERDICT r7 task 2: the last
DecodeStub raise worth killing).

Scope (each boundary disclosed, every supported path oracle-checked):

- **Bitstream layer — per ISO/IEC 11172-3**: frame header (any
  MPEG-1 Layer III bitrate row incl. the padding bit, so VBR streams
  walk), side info (main_data_begin / scfsi / per-granule
  part2_3_length, big_values, global_gain, scalefac_compress,
  table_select, region0/1_count or window-switching block_type +
  subblock_gain, preflag, scalefac_scale, count1table_select),
  long- and short-block scalefactors under the slen1/slen2 table
  (scfsi shares granule 0's groups), Huffman-coded big_values pairs
  with sign bits, the count1 quadruple region, ancillary padding to
  the exact bitrate-derived frame length (``id3.py``'s frame-walk
  formula).
- **Huffman tables**: tables 0 (all-zero), 1 (xlen=ylen=2) and 2
  (xlen=ylen=3) plus BOTH count1 tables (A — the variable-length
  default real encoders pick — and B, the fixed 4-bit complement
  codes) are transcribed from the spec and verified prefix-free +
  complete (Kraft sum = 1) by test; big-value tables 3..31 are NOT
  transcribed — streams selecting them raise ``NotImplementedError``
  (same disclosed-boundary convention as the szip HDF5 filter).  The
  encoders only select transcribed tables, so every fixture
  round-trips through real Huffman decode.
- **Bit reservoir (r9)**: main-data regions concatenate into a
  rolling buffer capped at the spec's 511-byte window;
  ``main_data_begin`` splices each frame's granules back into it.
  ``write_mp3_l3_general`` packs the reservoir for real (VBR frames
  pull their data into earlier frames' slack, byte-aligned with
  stuffing); ``write_mp3_l3`` keeps writing self-contained frames.
- **Window switching (r9)**: block types 1 (start), 2 (short:
  stored-order spectrum gathered per window, three 12-point IMDCTs
  per subband overlapped at 6/12/18 with ONE shared rounding, no
  alias reduction, per-window subblock_gain) and 3 (stop) — the
  start/stop windows fuse into their own 36-point tables.  MIXED
  blocks decode too: the two lowest subbands run the long path (long
  sfbs 0..7, one alias butterfly at their internal boundary, normal
  window) while subbands 2..31 run the short path from the mixed
  stored layout (short sfbs 3..11).
- **Joint stereo**: mid/side (mode_ext 10) recombines requantized
  spectra at 724/2^10; intensity (mode_ext 01, r9) splits the left
  carrier by tan-position factors KL/KR at 2^10 for bands at/above
  the right channel's transmitted bound (band 21 reuses band 20's
  is_pos; is_pos 7 leaves the band untouched).  Combined
  MS+intensity (mode_ext 11) raises (disclosed).
- **Reconstruction — fixed-point, the JPEG/WAV oracle trick**: after
  Huffman decode the pipeline is integer end-to-end with ONE explicit
  rounding point, so an independent SQL oracle replays it bit-exactly:
  requantize via an integer LUT (round-to-nearest of the spec formula
  ``|q|^(4/3) * 2^((gg-210)/4) * 2^(-(1+scalefac_scale)*sf/2)`` at
  scale 2^-15) -> alias-reduction butterflies (cs/ca from the spec's
  eight ci coefficients, 2^10 fixed point, exact) -> 18->36 IMDCT
  fused with the sine window (one table, accumulate in int64, ONE
  ``_rdiv`` by 2^20 back to scale 2^-15) -> overlap-add (exact) ->
  frequency inversion (sign flips, exact) -> polyphase synthesis
  (64x32 cosine matrixing at 2^10, exact; 512-tap windowed output at
  2^10, exact) -> final ``_rdiv`` by 2^20 + clamp to int16.
- **Synthesis prototype window**: ISO Table B.3 is a numerically
  optimized tabulation with no generating formula; this module uses a
  documented computed prototype (``sin(pi*(i+.5)/512)/4``) instead.
  Encoder, decoder and oracle share the one table, so every check is
  bit-exact; a transcribed B.3 table can be dropped into ``_DWIN``
  without touching any other code.
- **Scalefactor bands**: the 44.1 kHz long- and short-block boundary
  tables (ISO 11172-3 Annex B Table B.8) and the preflag pretab
  (Table B.6); other sample rates raise (their band tables are
  untranscribed).
- **Error check (r9)**: protected frames (protection bit 0) carry the
  CRC-16 word (poly 0x8005, preset 0xFFFF) over the last two header
  bytes + the side information; the decoder verifies it and the
  general encoder can emit it (``"crc": True`` per frame).

Reference parity note: the reference pipeline's only media format is
NetCDF rasters (/root/reference/asip_v2/archive.py) — this is SURVEY
§2.11 large-scale multimodal surface, the audio sibling of the
baseline-JPEG codec in ``codecs.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

_FRAC = 15  # spectrum / time-domain fixed-point scale 2^-15
_TBITS = 10  # trig / window tables at 2^10

# long-block scalefactor band boundaries, 44.1 kHz (22 bands; the last
# runs to 576 and always uses scalefactor 0 — it sits above sfb20)
SFB_LONG_44100 = [
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
    162, 196, 238, 288, 342, 418, 576,
]

# scalefac_compress -> (slen1, slen2): sfb 0..10 use slen1 bits,
# sfb 11..20 use slen2
_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# Huffman table 1 (xlen = ylen = 2): (x, y) -> (code, length).
# Verified prefix-free and complete by test_mp3.
_HUFF1 = {
    (0, 0): (0b1, 1),
    (0, 1): (0b001, 3),
    (1, 0): (0b01, 2),
    (1, 1): (0b000, 3),
}
_HUFF1_DEC = {v: k for k, v in _HUFF1.items()}

# Huffman table 2 (xlen = ylen = 3, no linbits) — transcribed from the
# public ISO 11172-3 Table B.7 tabulation (r9, VERDICT r8 task 2's
# "a table >1").  Verified prefix-free and complete (Kraft sum = 1) by
# test_mp3; encoder, decoder and oracle share this one dict, so the
# round-trip is bit-exact by construction — a corrected transcription
# would drop in without touching any other code (the Table B.3
# convention of the module docstring).
_HUFF2 = {
    (0, 0): (0b1, 1),
    (0, 1): (0b010, 3),
    (0, 2): (0b000001, 6),
    (1, 0): (0b011, 3),
    (1, 1): (0b001, 3),
    (1, 2): (0b00001, 5),
    (2, 0): (0b00011, 5),
    (2, 1): (0b00010, 5),
    (2, 2): (0b000000, 6),
}
_HUFF2_DEC = {v: k for k, v in _HUFF2.items()}

# count1 (quadruple) table B: every (v, w, x, y) in FOUR bits, code =
# the one's complement of the quad bits (ISO 11172-3 Table B.7,
# "count1 table 1") — (0,0,0,0) -> 1111.
_C1B = {q: (0xF ^ q, 4) for q in range(16)}

# count1 table A (ISO Table B.7, "count1 table 0" — the default table
# real encoders select): variable-length codes, transcribed from the
# public tabulation with the same caveat as _HUFF2 — verified
# prefix-free and complete (Kraft sum = 1) by test, shared by encoder,
# decoder and round-trip pins, drop-in replaceable if a transcription
# error surfaces.  Key = the quad bits v<<3 | w<<2 | x<<1 | y.
_C1A = {
    0b0000: (0b1, 1),
    0b0001: (0b0101, 4),
    0b0010: (0b0100, 4),
    0b0011: (0b00101, 5),
    0b0100: (0b0110, 4),
    0b0101: (0b000101, 6),
    0b0110: (0b00100, 5),
    0b0111: (0b000100, 6),
    0b1000: (0b0111, 4),
    0b1001: (0b00011, 5),
    0b1010: (0b00110, 5),
    0b1011: (0b000000, 6),
    0b1100: (0b00111, 5),
    0b1101: (0b000010, 6),
    0b1110: (0b000011, 6),
    0b1111: (0b000001, 6),
}

# pretab (ISO 11172-3 Table B.6): added to the scalefactors of the top
# long bands when preflag is set
_PRETAB = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0],
    dtype=np.int64,
)

# short-block scalefactor band boundaries, 44.1 kHz (ISO Table B.8):
# 13 bands per window; the last (136..192) carries no scalefactor
SFB_SHORT_44100 = [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192]

# alias-reduction coefficients: the spec's eight ci values;
# cs = 1/sqrt(1+ci^2), ca = ci/sqrt(1+ci^2)
_CI = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_CS = np.rint(1.0 / np.sqrt(1.0 + _CI * _CI) * (1 << _TBITS)).astype(
    np.int64
)
_CA = np.rint(_CI / np.sqrt(1.0 + _CI * _CI) * (1 << _TBITS)).astype(
    np.int64
)

# IMDCT (18 -> 36) fused with the long-block sine window: ONE table so
# the stage needs ONE rounding.  CW36[n, i] =
#   cos(pi/72 * (2n + 19) * (2i + 1)) * sin(pi/36 * (n + 0.5))
_n = np.arange(36)[:, None]
_i = np.arange(18)[None, :]
_CW36 = np.rint(
    np.cos(np.pi / 72.0 * (2 * _n + 19) * (2 * _i + 1))
    * np.sin(np.pi / 36.0 * (_n + 0.5))
    * (1 << _TBITS)
).astype(np.int64)

# start (block_type 1) / stop (block_type 3) long windows (ISO
# 2.4.3.4.10.3), fused with the same 36-point IMDCT cosine — the three
# long tables share one rounding point, exactly like _CW36
def _long_window(bt: int) -> np.ndarray:
    n = np.arange(36, dtype=np.float64)
    if bt == 0:
        return np.sin(np.pi / 36.0 * (n + 0.5))
    if bt == 1:  # start: long rise, flat, short fall, zero tail
        return np.where(
            n < 18,
            np.sin(np.pi / 36.0 * (n + 0.5)),
            np.where(
                n < 24,
                1.0,
                np.where(
                    n < 30, np.sin(np.pi / 12.0 * (n - 18 + 0.5)), 0.0
                ),
            ),
        )
    if bt == 3:  # stop: zero head, short rise, flat, long fall
        return np.where(
            n < 6,
            0.0,
            np.where(
                n < 12,
                np.sin(np.pi / 12.0 * (n - 6 + 0.5)),
                np.where(n < 18, 1.0, np.sin(np.pi / 36.0 * (n + 0.5))),
            ),
        )
    raise ValueError(f"no long window for block_type {bt}")


_CW36_BT = {
    bt: np.rint(
        np.cos(np.pi / 72.0 * (2 * _n + 19) * (2 * _i + 1))
        * _long_window(bt)[:, None]
        * (1 << _TBITS)
    ).astype(np.int64)
    for bt in (0, 1, 3)
}

# 12-point IMDCT fused with the short sine window, same 2^10 scale:
# SW12[n, i] = cos(pi/24 (2n+7)(2i+1)) * sin(pi/12 (n+0.5))
_n12 = np.arange(12)[:, None]
_i6 = np.arange(6)[None, :]
_SW12 = np.rint(
    np.cos(np.pi / 24.0 * (2 * _n12 + 7) * (2 * _i6 + 1))
    * np.sin(np.pi / 12.0 * (_n12 + 0.5))
    * (1 << _TBITS)
).astype(np.int64)

# short-block layout maps: the bitstream stores a short granule sfb by
# sfb, window by window within the sfb; window w's own 192-line
# spectrum (what the per-window IMDCT consumes, 6 lines per subband)
# gathers through _STORED_IDX[w]; _STORED_SFB/_STORED_WIN give each
# stored line its (sfb, window) for requantization
_STORED_IDX = np.empty((3, 192), dtype=np.int64)
_STORED_SFB = np.empty(576, dtype=np.int64)
_STORED_WIN = np.empty(576, dtype=np.int64)
for _s in range(13):
    _a, _b2 = SFB_SHORT_44100[_s], SFB_SHORT_44100[_s + 1]
    _w2 = _b2 - _a
    for _w in range(3):
        _STORED_IDX[_w, _a:_b2] = 3 * _a + _w * _w2 + np.arange(_w2)
        _STORED_SFB[3 * _a + _w * _w2 : 3 * _a + (_w + 1) * _w2] = _s
        _STORED_WIN[3 * _a + _w * _w2 : 3 * _a + (_w + 1) * _w2] = _w

# MIXED-block layout (r9): lines 0..35 are LONG (the two lowest
# subbands); the short part starts at short sfb 3 (whose per-window
# line 12 = stored line 36) — stored base of sfb s is
# 36 + 3·(S_s − 12).  _STORED_IDX_MIX[w, l] maps window w's line l
# (12 ≤ l < 192) to its stored position; _STORED_SFB/WIN_MIX give each
# stored line ≥ 36 its (sfb, window).
_STORED_IDX_MIX = np.empty((3, 192), dtype=np.int64)
_STORED_IDX_MIX[:, :12] = -1  # lines 0..11 live in the long part
_STORED_SFB_MIX = np.empty(576, dtype=np.int64)
_STORED_WIN_MIX = np.empty(576, dtype=np.int64)
_STORED_SFB_MIX[:36] = -1
_STORED_WIN_MIX[:36] = -1
for _s in range(3, 13):
    _a, _b2 = SFB_SHORT_44100[_s], SFB_SHORT_44100[_s + 1]
    _w2 = _b2 - _a
    _base = 36 + 3 * (_a - 12)
    for _w in range(3):
        _STORED_IDX_MIX[_w, _a:_b2] = _base + _w * _w2 + np.arange(_w2)
        _STORED_SFB_MIX[_base + _w * _w2 : _base + (_w + 1) * _w2] = _s
        _STORED_WIN_MIX[_base + _w * _w2 : _base + (_w + 1) * _w2] = _w

# intensity-stereo position factors (MPEG-1, is_pos 0..6):
# ratio = tan(is_pos * pi / 12); left = x * ratio/(1+ratio),
# right = x * 1/(1+ratio) — at 2^10 with ONE rounding per line,
# the MS-recombination convention (is_pos 6 -> all left, 0 -> all
# right; is_pos 7 is illegal and leaves the band untouched)
_IS_KL = np.array(
    [
        int(np.rint(np.tan(p * np.pi / 12.0)
                    / (1.0 + np.tan(p * np.pi / 12.0)) * (1 << _TBITS)))
        for p in range(6)
    ] + [1 << _TBITS],
    dtype=np.int64,
)
_IS_KR = np.array(
    [
        int(np.rint(1.0 / (1.0 + np.tan(p * np.pi / 12.0))
                    * (1 << _TBITS)))
        for p in range(6)
    ] + [0],
    dtype=np.int64,
)

# polyphase synthesis matrixing: N[i, j] = cos((16+i)(2j+1) pi/64)
_im = np.arange(64)[:, None]
_jm = np.arange(32)[None, :]
_NMAT = np.rint(
    np.cos((16 + _im) * (2 * _jm + 1) * np.pi / 64.0) * (1 << _TBITS)
).astype(np.int64)

# mid/side recombination constant: round(2^10 / sqrt(2))
_RSQRT2 = 724

# synthesis prototype window (computed stand-in for ISO Table B.3 —
# see module docstring); 512 taps at 2^10
_DWIN = np.rint(
    np.sin(np.pi * (np.arange(512) + 0.5) / 512.0) / 4.0 * (1 << _TBITS)
).astype(np.int64)
del _n, _i, _im, _jm

# windowing tap index maps: pcm[j] = sum_i Vhist[i][_V_COL[i, j]] *
# _D_TAP[i, j] (Vhist[0] = newest V)
_V_COL = np.empty((16, 32), dtype=np.int64)
_D_TAP = np.empty((16, 32), dtype=np.int64)
for _t in range(16):
    for _j in range(32):
        _V_COL[_t, _j] = _j + 32 * (_t % 2)
        _D_TAP[_t, _j] = _DWIN[_j + 32 * _t]
del _t, _j
# chronological-history row index for the vectorized synthesis:
# output block n, tap i -> history row 16 + n - i
_HIST_ROWS = 16 + np.arange(18)[:, None] - np.arange(16)[None, :]


def _rdiv(a, b):
    """Round-half-up integer division, the module's ONE rounding rule
    (identical to ``codecs._rdiv`` and the SQL oracle):
    floor((2a + b) / 2b), b > 0."""
    return (2 * a + b) // (2 * b)


def crc16_protect(data: bytes) -> int:
    """The MPEG audio CRC-16 (ISO 11172-3 2.4.3.1 error check):
    generator polynomial x^16 + x^15 + x^2 + 1 (0x8005), preset
    0xFFFF, applied MSB-first over the protected bits — for Layer III
    the last two header bytes plus the complete side information."""
    crc = 0xFFFF
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            msb = (crc >> 15) & 1
            crc = (crc << 1) & 0xFFFF
            if bit ^ msb:
                crc ^= 0x8005
    return crc


def requant_lut(global_gain: int, scalefac_scale: int = 0,
                max_sf: int = 8, q: int = 1) -> list[int]:
    """Fixed-point requantization LUT: entry sf ->
    round(|q|^(4/3) * 2^((gg-210)/4 - (1+scalefac_scale)*sf/2) * 2^15).
    The decoder applies it per scalefactor band; the oracle embeds the
    same integers — the LUT IS the contract."""
    g = 0.25 * (global_gain - 210)
    m = 0.5 * (1 + scalefac_scale)
    return [
        int(np.rint(q ** (4.0 / 3.0) * 2.0 ** (g - m * sf) * (1 << _FRAC)))
        for sf in range(max_sf)
    ]


# ---------------------------------------------------------------- bit IO


class _BitWriter:
    """MSB-first bit writer (Layer III has no byte stuffing)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bit_length(self) -> int:
        return 8 * len(self._out) + self._nbits

    def getvalue(self) -> bytes:
        return bytes(self._out)


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self._buf = buf
        self._pos = pos
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self._pos >= len(self._buf):
                raise ValueError("MP3: bitstream truncated")
            avail = 8 - self._bit
            take = min(avail, nbits)
            v = (v << take) | (
                (self._buf[self._pos] >> (avail - take)) & ((1 << take) - 1)
            )
            self._bit += take
            nbits -= take
            if self._bit == 8:
                self._bit = 0
                self._pos += 1
        return v

    def bits_read(self) -> int:
        return 8 * self._pos + self._bit


# ---------------------------------------------------------------- encode

# MPEG-1 Layer III bitrate rows, kbps, indexed by the header's 4-bit
# field (0 = free format, 15 = invalid)
_MP3_BR_L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)

_GG_DEFAULT = 190  # global_gain -> 2^-5 overall (keeps PCM off the rails)
_SF_COMPRESS = 13  # slen1 = slen2 = 3 -> scalefacs 0..7
_KBPS = 320
_RATE = 44100
_FRAME_LEN = 144 * _KBPS * 1000 // _RATE  # 1044 bytes, padding 0
_R0_COUNT = 7  # region0 = sfb 0..7  (lines 0..35)
_R1_COUNT = 7  # region1 = sfb 8..15 (lines 36..161)
_IS_BV = 67  # intensity: right channel transmits 134 lines (sfb 15)
_RESERVOIR_MAX = 511  # main_data_begin is a 9-bit field


def write_mp3_l3(
    spectra: np.ndarray,
    scalefacs: np.ndarray,
    global_gain: int = _GG_DEFAULT,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode quantized long-block spectra into real MPEG-1 Layer III
    frames (44.1 kHz, 320 kbps, no CRC).  ``spectra`` is int
    (n_frames, 2, 576) for MONO or (n_frames, 2, 2, 576) for STEREO
    (granule, channel) with values in {-1, 0, 1} (Huffman table 1's
    range); ``scalefacs`` matches with a trailing (..., 21) in 0..7
    (slen 3).  ``stereo_mode="ms"`` (2-channel input interpreted as
    quantized MID/SIDE spectra) writes joint-stereo mode 01 with
    mode_ext MS — the decoder recombines L,R = (M ± S)/sqrt(2).
    ``stereo_mode="intensity"`` (r9, VERDICT r8 task 5) writes
    joint-stereo mode 01 with mode_ext intensity: the LEFT channel
    carries the full spectrum, the RIGHT channel transmits only its
    first 134 lines (big_values 67, rzero from sfb 15) and its
    scalefactors in bands 15..20 are the is_pos positions (0..6; 7 is
    illegal) the decoder uses to split each band back into L and R.
    All transmitted lines ride in big_values, table 1 in all regions,
    count1 = rzero-quads = 0, main_data_begin = 0 (self-contained
    frames)."""
    spectra = np.asarray(spectra, dtype=np.int64)
    scalefacs = np.asarray(scalefacs, dtype=np.int64)
    if spectra.ndim == 3 and spectra.shape[1:] == (2, 576):
        spectra = spectra[:, :, None, :]
        scalefacs = scalefacs[:, :, None, :]
        nch = 1
    elif spectra.ndim == 4 and spectra.shape[1:] == (2, 2, 576):
        nch = 2
    else:
        raise ValueError(
            "MP3: spectra must be (n_frames, 2, 576) or (n_frames, 2, 2, 576)"
        )
    if scalefacs.shape != spectra.shape[:3] + (21,):
        raise ValueError("MP3: scalefacs shape must match spectra + (21,)")
    if np.abs(spectra).max(initial=0) > 1:
        raise ValueError("MP3: table-1 encoder needs values in {-1,0,1}")
    if scalefacs.min(initial=0) < 0 or scalefacs.max(initial=0) > 7:
        raise ValueError("MP3: slen-3 scalefactors must be in 0..7")
    if not 0 <= global_gain <= 255:
        raise ValueError("MP3: global_gain out of range")
    if stereo_mode not in ("independent", "ms", "intensity"):
        raise ValueError(
            "MP3: stereo_mode must be 'independent', 'ms' or 'intensity'"
        )
    if stereo_mode in ("ms", "intensity") and nch != 2:
        raise ValueError("MP3: joint stereo needs exactly 2 channels")
    bvs = [288] * nch
    if stereo_mode == "intensity":
        bvs[1] = _IS_BV
        if np.abs(spectra[:, :, 1, 2 * _IS_BV :]).max(initial=0):
            raise ValueError(
                "MP3: intensity right channel must be zero above the bound"
            )
        if scalefacs[:, :, 1, 15:21].max(initial=0) > 6:
            raise ValueError("MP3: is_pos scalefactors must be 0..6")

    out = bytearray()
    for f in range(spectra.shape[0]):
        # main data first (its bit count goes into the side info)
        md = _BitWriter()
        p23 = []
        for g in range(2):
            for ch in range(nch):
                start = md.bit_length()
                for sf in scalefacs[f, g, ch]:
                    md.write(int(sf), 3)
                q = spectra[f, g, ch]
                for k in range(bvs[ch]):
                    x, y = abs(int(q[2 * k])), abs(int(q[2 * k + 1]))
                    code, ln = _HUFF1[(x, y)]
                    md.write(code, ln)
                    if x:
                        md.write(1 if q[2 * k] < 0 else 0, 1)
                    if y:
                        md.write(1 if q[2 * k + 1] < 0 else 0, 1)
                p23.append(md.bit_length() - start)
        md.align()
        main = md.getvalue()

        si = _BitWriter()
        si.write(0, 9)  # main_data_begin
        si.write(0, 5 if nch == 1 else 3)  # private_bits
        si.write(0, 4 * nch)  # scfsi
        for i_p, p in enumerate(p23):  # (granule, channel) order
            si.write(p, 12)
            si.write(bvs[i_p % nch], 9)  # big_values
            si.write(global_gain, 8)
            si.write(_SF_COMPRESS, 4)
            si.write(0, 1)  # window_switching_flag: long blocks
            for _ in range(3):
                si.write(1, 5)  # table_select: table 1 everywhere
            si.write(_R0_COUNT, 4)
            si.write(_R1_COUNT, 3)
            si.write(0, 1)  # preflag
            si.write(0, 1)  # scalefac_scale
            si.write(0, 1)  # count1table_select
        side = si.getvalue()
        assert len(side) == (17 if nch == 1 else 32)

        header = struct.pack(
            ">I",
            (0x7FF << 21)       # sync
            | (0x3 << 19)       # MPEG-1
            | (0x1 << 17)       # Layer III
            | (0x1 << 16)       # no CRC
            | (0xE << 12)       # 320 kbps
            | (0x0 << 10)       # 44.1 kHz
            | (0x0 << 9)        # padding 0
            | (
                (
                    0x3
                    if nch == 1
                    else (0x1 if stereo_mode != "independent" else 0x0)
                )
                << 6
            )  # mono / joint stereo / stereo
            | (
                (
                    0x2
                    if stereo_mode == "ms"
                    else (0x1 if stereo_mode == "intensity" else 0x0)
                )
                << 4
            ),  # mode_ext
        )
        body = header + side + main
        if len(body) > _FRAME_LEN:
            raise ValueError("MP3: frame data exceeds 320 kbps budget")
        out += body + bytes(_FRAME_LEN - len(body))
    return bytes(out)


def _huff_encode_pair(md: "_BitWriter", x: int, y: int, table: int) -> None:
    """Write one big-value pair with sign bits under the given table."""
    ax, ay = abs(x), abs(y)
    if table == 0:
        if ax or ay:
            raise ValueError("MP3: table 0 region must be all zero")
        return
    if table not in (1, 2):
        # only tables 0/1/2 are transcribed (disclosed boundary); fail
        # at WRITE time rather than emitting table-2 codes under a
        # side-info word that signals a different table
        raise ValueError(f"MP3: unsupported Huffman table {table}")
    tab = _HUFF1 if table == 1 else _HUFF2
    if (ax, ay) not in tab:
        raise ValueError(
            f"MP3: pair ({x},{y}) exceeds table {table} range"
        )
    code, ln = tab[(ax, ay)]
    md.write(code, ln)
    if ax:
        md.write(1 if x < 0 else 0, 1)
    if ay:
        md.write(1 if y < 0 else 0, 1)


def write_mp3_l3_general(frames: list[dict]) -> bytes:
    """GENERAL-profile mono Layer III encoder (r9, VERDICT r8 task 2):
    per-frame bitrate rows (VBR), the bit reservoir (each frame's main
    data starts up to 511 bytes back in earlier frames' regions, with
    byte-alignment + stuffing exactly like a real encoder's ancillary
    bits), scfsi scalefactor sharing, preflag, Huffman tables 0/1/2
    per region, the count1 quadruple region under table B, and window
    switching (start/short/stop block types with subblock_gain and
    short scalefactors).  44.1 kHz, no CRC.

    ``frames`` is a list of dicts::

        {"kbps": 320, "scfsi": 0b0011, "granules": [g0, g1]}

    Each granule dict (mono):

    - long (``block_type`` 0/1/3): ``spectrum`` int[576],
      ``big_values`` (pairs), ``count1`` (quads coded right after the
      big values), ``scalefacs`` int[21], ``preflag``,
      ``scalefac_scale``, ``table_select`` [t0, t1, t2] with the
      region layout the decoder uses (region bounds 36/162 for
      block_type 0 via region0/1_count = 7/7 — region 1 ends at
      sfb[16] = 162 — and 36/576 under window switching);
    - short (``block_type`` 2, non-mixed): ``spectrum`` int[576] in
      STORED order, ``scalefacs_short`` int[12][3],
      ``subblock_gain`` [3], ``scalefac_scale``, ``table_select``
      [t0, t1].

    ``global_gain`` defaults to ``_GG_DEFAULT`` per granule.  scfsi
    groups are scalefactor bands (0-5, 6-10, 11-15, 16-20); a set bit
    requires granule 1's scalefactors to equal granule 0's in that
    group (they are not transmitted)."""
    chunks: list[bytes] = []
    p23s: list[list[int]] = []
    caps: list[int] = []
    flens: list[int] = []
    br_indices: list[int] = []
    for fr in frames:
        kbps = fr.get("kbps", _KBPS)
        if kbps == "free":
            # free format: bitrate index 0, caller-chosen CONSTANT
            # frame length (the decoder measures it from the stream)
            br_indices.append(0)
            flen = int(fr["flen"])
        elif kbps not in _MP3_BR_L3[1:]:
            raise ValueError(f"MP3: no MPEG-1 Layer III {kbps} kbps row")
        else:
            br_indices.append(_MP3_BR_L3.index(kbps))
            flen = 144 * kbps * 1000 // _RATE
        flens.append(flen)
        # the CRC word, when present, takes 2 bytes from the main-data
        # capacity (the frame length formula does not change)
        caps.append(flen - 4 - 17 - (2 if fr.get("crc") else 0))
        scfsi = fr.get("scfsi", 0)
        grans = fr["granules"]
        if len(grans) != 2:
            raise ValueError("MP3: a frame has exactly two granules")
        md = _BitWriter()
        p23 = []
        sf_g0 = None
        for gi, g in enumerate(grans):
            start = md.bit_length()
            bt = g.get("block_type", 0)
            sfc = g.get("scalefac_compress", _SF_COMPRESS)
            slen1, slen2 = _SLEN[sfc]
            q = np.asarray(g["spectrum"], dtype=np.int64)
            if q.shape != (576,):
                raise ValueError("MP3: granule spectrum must be int[576]")
            if bt == 2:
                if scfsi:
                    raise ValueError("MP3: scfsi with short blocks")
                sfs3 = np.asarray(g["scalefacs_short"], dtype=np.int64)
                if sfs3.shape != (12, 3):
                    raise ValueError("MP3: short scalefacs must be (12,3)")
                if g.get("mixed"):
                    # mixed: long sfbs 0..7 then short sfbs 3..11
                    sfl8 = np.asarray(
                        g.get("scalefacs_long", np.zeros(8)),
                        dtype=np.int64,
                    )
                    if sfl8.shape != (8,):
                        raise ValueError(
                            "MP3: mixed long scalefacs must be (8,)"
                        )
                    if sfs3[:3].any():
                        raise ValueError(
                            "MP3: mixed short sfbs 0..2 must be zero"
                        )
                    for b in range(8):
                        md.write(int(sfl8[b]), slen1)
                    for b in range(3, 6):
                        for w in range(3):
                            md.write(int(sfs3[b, w]), slen1)
                    for b in range(6, 12):
                        for w in range(3):
                            md.write(int(sfs3[b, w]), slen2)
                else:
                    for b in range(6):
                        for w in range(3):
                            md.write(int(sfs3[b, w]), slen1)
                    for b in range(6, 12):
                        for w in range(3):
                            md.write(int(sfs3[b, w]), slen2)
                bounds = (36, 576)
                tables = list(g["table_select"][:2]) + [0]
            else:
                sf = np.asarray(g["scalefacs"], dtype=np.int64)
                if sf.shape != (21,):
                    raise ValueError("MP3: long scalefacs must be (21,)")
                if gi == 0:
                    sf_g0 = sf
                for band in range(21):
                    group = (
                        0 if band < 6 else
                        1 if band < 11 else
                        2 if band < 16 else 3
                    )
                    shared = gi == 1 and (scfsi >> (3 - group)) & 1
                    if shared:
                        if sf[band] != sf_g0[band]:
                            raise ValueError(
                                "MP3: scfsi-shared band differs from "
                                "granule 0"
                            )
                        continue
                    md.write(int(sf[band]), slen1 if band < 11 else slen2)
                if bt:  # window switching (start/stop): bounds 36/576
                    bounds = (36, 576)
                    tables = list(g["table_select"][:2]) + [0]
                else:
                    # region0/1_count = 7/7: region boundaries at
                    # sfb[8] = line 36 and sfb[16] = line 162 — the
                    # same bounds the decoder derives
                    bounds = (36, 162)
                    tables = list(g["table_select"][:3])
            bv = int(g.get("big_values", 288))
            nq = int(g.get("count1", 0))
            if bv > 288:
                raise ValueError("MP3: big_values > 288")
            if 2 * bv + 4 * nq > 576:
                raise ValueError("MP3: spectrum overrun")
            if np.abs(q[2 * bv + 4 * nq :]).max(initial=0):
                raise ValueError("MP3: rzero region must be all zero")
            run_start = 0
            for run_end, table in (
                (min(bounds[0] // 2, bv), tables[0]),
                (min(bounds[1] // 2, bv), tables[1]),
                (bv, tables[2]),
            ):
                for k in range(run_start, run_end):
                    _huff_encode_pair(
                        md, int(q[2 * k]), int(q[2 * k + 1]), table
                    )
                run_start = max(run_start, run_end)
            c1tab = _C1B if g.get("count1_table", "B") == "B" else _C1A
            for j in range(nq):  # count1 quads, table A or B
                vals = [int(q[2 * bv + 4 * j + t]) for t in range(4)]
                bits = 0
                for v in vals:
                    if abs(v) > 1:
                        raise ValueError("MP3: count1 values must be ±1/0")
                    bits = (bits << 1) | (1 if v else 0)
                code, ln = c1tab[bits]
                md.write(code, ln)
                for v in vals:
                    if v:
                        md.write(1 if v < 0 else 0, 1)
            p23.append(md.bit_length() - start)
        md.align()
        chunks.append(md.getvalue())
        p23s.append(p23)

    # reservoir packing: each frame's main data begins at the first
    # free byte, pulled forward only by the 511-byte window cap; the
    # gaps are stuffing (ancillary bytes no granule ever reads)
    stream = bytearray()
    mdbs: list[int] = []
    for n, chunk in enumerate(chunks):
        cap_before = sum(caps[:n])
        if len(stream) > cap_before:
            raise ValueError(
                "MP3: reservoir overflow — earlier main data spills past "
                f"frame {n}'s own region start"
            )
        begin = max(len(stream), cap_before - _RESERVOIR_MAX)
        stream.extend(bytes(begin - len(stream)))
        mdbs.append(cap_before - begin)
        stream.extend(chunk)
        if len(stream) > cap_before + caps[n]:
            raise ValueError(
                f"MP3: frame {n} main data exceeds its bitrate budget"
            )
    stream.extend(bytes(sum(caps) - len(stream)))

    out = bytearray()
    offset = 0
    for n, fr in enumerate(frames):
        crc_on = bool(fr.get("crc"))
        header = struct.pack(
            ">I",
            (0x7FF << 21)
            | (0x3 << 19)        # MPEG-1
            | (0x1 << 17)        # Layer III
            | ((0x0 if crc_on else 0x1) << 16)  # protection bit
            | (br_indices[n] << 12)
            | (0x0 << 10)        # 44.1 kHz
            | (0x0 << 9)         # padding 0
            | (0x3 << 6),        # mono
        )
        si = _BitWriter()
        si.write(mdbs[n], 9)
        si.write(0, 5)  # private
        si.write(fr.get("scfsi", 0), 4)
        for gi, g in enumerate(fr["granules"]):
            bt = g.get("block_type", 0)
            si.write(p23s[n][gi], 12)
            si.write(int(g.get("big_values", 288)), 9)
            si.write(int(g.get("global_gain", _GG_DEFAULT)), 8)
            si.write(int(g.get("scalefac_compress", _SF_COMPRESS)), 4)
            if bt:
                si.write(1, 1)  # window_switching_flag
                si.write(bt, 2)
                si.write(1 if g.get("mixed") else 0, 1)
                for t in list(g["table_select"][:2]):
                    si.write(int(t), 5)
                for sb in g.get("subblock_gain", (0, 0, 0)):
                    si.write(int(sb), 3)
            else:
                si.write(0, 1)
                for t in list(g["table_select"][:3]):
                    si.write(int(t), 5)
                si.write(_R0_COUNT, 4)
                si.write(_R1_COUNT, 3)
            si.write(int(g.get("preflag", 0)), 1)
            si.write(int(g.get("scalefac_scale", 0)), 1)
            si.write(
                1 if g.get("count1_table", "B") == "B" else 0, 1
            )
        side = si.getvalue()
        assert len(side) == 17
        if crc_on:
            word = crc16_protect(header[2:4] + side)
            out += header + struct.pack(">H", word) + side
        else:
            out += header + side
        out += stream[offset : offset + caps[n]]
        offset += caps[n]
    return bytes(out)


# ---------------------------------------------------------------- decode


def _huffman_read_pair(br: _BitReader) -> tuple[int, int]:
    """Read one table-1 (x, y) pair with sign bits."""
    code, ln = 0, 0
    while True:
        code = (code << 1) | br.read(1)
        ln += 1
        if (code, ln) in _HUFF1_DEC:
            break
        if ln > 3:
            raise ValueError("MP3: bad table-1 Huffman code")
    x, y = _HUFF1_DEC[(code, ln)]
    if x and br.read(1):
        x = -x
    if y and br.read(1):
        y = -y
    return x, y


def _build_pair_lut(
    table: dict, peek: int
) -> list[tuple[int, int, int] | None]:
    """Peek-``peek`` decode LUT for a big-value pair table (the JPEG
    peek-LUT trick): the longest code plus two sign bits fits in
    ``peek`` bits, so every window resolves one full (x, y,
    consumed-bits) step — one list index instead of up to ``peek`` bit
    reads.  Sign-bit order is x then y (spec: the sign bit follows its
    value immediately, x first)."""
    lut: list[tuple[int, int, int] | None] = [None] * (1 << peek)
    for (ax, ay), (code, ln) in table.items():
        nsign = (1 if ax else 0) + (1 if ay else 0)
        free = peek - ln - nsign
        assert free >= 0, "peek window too small for table"
        for signs in range(1 << nsign):
            for fill in range(1 << free):
                w = (code << (peek - ln)) | (signs << free) | fill
                x, y = ax, ay
                s = signs
                if ay:
                    if s & 1:
                        y = -y
                    s >>= 1
                if ax and s & 1:
                    x = -x
                lut[w] = (x, y, ln + nsign)
    return lut


_HUFF1_LUT = _build_pair_lut(_HUFF1, 5)
_HUFF2_LUT = _build_pair_lut(_HUFF2, 8)


def _build_quad_lut(table: dict, peek: int) -> list:
    """Peek-``peek`` LUT for a count1 quadruple table: each window
    resolves one (v, w, x, y, consumed-bits) step — code + up to four
    sign bits, signs following the values in v,w,x,y order."""
    lut: list = [None] * (1 << peek)
    for q, (code, ln) in table.items():
        vals = [(q >> 3) & 1, (q >> 2) & 1, (q >> 1) & 1, q & 1]
        ns = sum(vals)
        free = peek - ln - ns
        assert free >= 0, "peek window too small for quad table"
        for signs in range(1 << ns):
            for fill in range(1 << free):
                w = (code << (peek - ln)) | (signs << free) | fill
                out = list(vals)
                sgn = signs
                for j in range(3, -1, -1):
                    if out[j]:
                        if sgn & 1:
                            out[j] = -out[j]
                        sgn >>= 1
                lut[w] = (*out, ln + ns)
    return lut


# table B: 4-bit code + up to 4 signs -> peek 8;
# table A: up to 6-bit code + up to 4 signs -> peek 10
_C1B_LUT = _build_quad_lut(_C1B, 8)
_C1A_LUT = _build_quad_lut(_C1A, 10)


def _decode_pair_run(
    buf: bytes,
    bitpos: int,
    out: np.ndarray,
    start: int,
    n_pairs: int,
    lut: list,
    peek: int,
) -> int:
    """Decode ``n_pairs`` big-value pairs from ``buf`` starting at
    absolute ``bitpos`` through a peek-``peek`` LUT, writing into
    ``out[start:]``; returns the new bit position.  Byte-window peek —
    the hot path of the sample decoder (exactness pinned against the
    scalar model and the per-bit reference reader in tests)."""
    mask = (1 << peek) - 1
    shift0 = 32 - peek
    nbits = 8 * len(buf)
    for k in range(n_pairs):
        byte = bitpos >> 3
        chunk = buf[byte : byte + 4]
        if len(chunk) < 4:  # peek window past the tail: zero-extend.
            # Only here can a code overrun the reservoir (a full
            # 4-byte window means bitpos + 32 <= nbits and every step
            # is < 32 bits), so the truncation guard lives off the
            # hot path (r9 ADVICE: a part2_3_length pointing past the
            # buffer must fail loudly, not decode zero-fill)
            chunk = chunk + bytes(4 - len(chunk))
            w = (
                int.from_bytes(chunk, "big") >> (shift0 - (bitpos & 7))
            ) & mask
            step = lut[w]
            if step is None:
                raise ValueError("MP3: bad big-value Huffman code")
            if bitpos + step[2] > nbits:
                raise ValueError("MP3: bitstream truncated")
        else:
            w = (
                int.from_bytes(chunk, "big") >> (shift0 - (bitpos & 7))
            ) & mask
            step = lut[w]
            if step is None:
                raise ValueError("MP3: bad big-value Huffman code")
        i = start + 2 * k
        out[i], out[i + 1] = step[0], step[1]
        bitpos += step[2]
    return bitpos


def _decode_count1_run(
    buf: bytes,
    bitpos: int,
    out: np.ndarray,
    start: int,
    bit_limit: int,
    lut: list,
    peek: int,
) -> tuple[int, int]:
    """Decode count1 quadruples (table A or B) from absolute
    ``bitpos`` until ``bit_limit`` is reached or the spectrum is full;
    returns ``(new_bitpos, lines_written)``.  The spec ends the count1
    region exactly when part2_3_length runs out."""
    line = start
    mask = (1 << peek) - 1
    shift0 = 32 - peek
    nbits = 8 * len(buf)
    while bitpos < bit_limit and line + 4 <= 576:
        byte = bitpos >> 3
        chunk = buf[byte : byte + 4]
        if len(chunk) < 4:  # see _decode_pair_run: the truncation
            # guard is only reachable from the zero-extended window
            chunk = chunk + bytes(4 - len(chunk))
            w = (
                int.from_bytes(chunk, "big") >> (shift0 - (bitpos & 7))
            ) & mask
            step = lut[w]
            if step is None:
                raise ValueError("MP3: bad count1 Huffman code")
            if bitpos + step[4] > nbits:
                raise ValueError("MP3: bitstream truncated")
        else:
            w = (
                int.from_bytes(chunk, "big") >> (shift0 - (bitpos & 7))
            ) & mask
            step = lut[w]
            if step is None:
                raise ValueError("MP3: bad count1 Huffman code")
        v0, v1, v2, v3, used = step
        if bitpos + used > bit_limit:
            raise ValueError("MP3: count1 quad crosses part2_3 boundary")
        out[line : line + 4] = (v0, v1, v2, v3)
        line += 4
        bitpos += used
    return bitpos, line - start


class _SynthState:
    """Per-stream reconstruction state: the 18-sample IMDCT overlap
    tail per subband and the 16-deep V FIFO of the polyphase bank —
    carried across granules AND frames, zeroed per payload."""

    def __init__(self) -> None:
        self.overlap = np.zeros((32, 18), dtype=np.int64)
        self.vfifo = np.zeros((16, 64), dtype=np.int64)


def _reconstruct_granule(
    x: np.ndarray,
    state: _SynthState,
    block_type: int = 0,
    mixed: bool = False,
) -> np.ndarray:
    """Fixed-point reconstruction of one granule: 576 requantized
    lines (int64 at 2^-15) -> 576 int16 PCM samples.  Integer
    end-to-end; the ONLY rounding is the ``_rdiv`` after the fused
    IMDCT+window and the final PCM ``_rdiv`` (see module docstring).

    ``block_type`` selects the filterbank shape (r9): 0/1/3 run the
    36-point IMDCT fused with the normal/start/stop window after alias
    reduction; 2 (short, non-mixed) takes ``x`` in STORED order, skips
    alias reduction per spec, and runs three 12-point IMDCTs per
    subband whose windowed outputs overlap at offsets 6/12/18 inside
    the 36-sample block — accumulated exactly, ONE rounding for the
    whole block (the same single mid-pipeline rounding as long).
    ``mixed`` (with ``block_type=2``, r9): the two lowest subbands run
    the long path (alias butterfly at their one internal boundary,
    normal window), subbands 2..31 the short path — the spec's mixed
    block."""
    if block_type == 2 and mixed:
        acc = np.zeros((32, 36), dtype=np.int64)
        # long part: subbands 0..1 from stored lines 0..35, with the
        # single alias butterfly at the sb0/sb1 boundary
        xl = x[:36]
        xa = xl * (1 << _TBITS)
        u = 17 - np.arange(8)
        l2 = 18 + np.arange(8)
        xu, xlo = xl[u], xl[l2]
        xa[u] = xu * _CS - xlo * _CA
        xa[l2] = xlo * _CS + xu * _CA
        acc[:2] = xa.reshape(2, 18) @ _CW36_BT[0].T
        # short part: subbands 2..31 gather per window from the mixed
        # stored layout (window lines 12..191)
        for w in range(3):
            spec_w = np.zeros(192, dtype=np.int64)
            spec_w[12:] = x[_STORED_IDX_MIX[w, 12:]]
            spec_w *= 1 << _TBITS
            zw = spec_w.reshape(32, 6) @ _SW12.T
            acc[2:, 6 + 6 * w : 18 + 6 * w] += zw[2:]
        z = _rdiv(acc, 1 << (2 * _TBITS))
    elif block_type == 2:
        acc = np.zeros((32, 36), dtype=np.int64)
        for w in range(3):
            spec_w = x[_STORED_IDX[w]] * (1 << _TBITS)  # 2^-25
            acc[:, 6 + 6 * w : 18 + 6 * w] += (
                spec_w.reshape(32, 6) @ _SW12.T
            )
        z = _rdiv(acc, 1 << (2 * _TBITS))
    else:
        # alias reduction (exact; untouched lines scaled by 2^10 so
        # the whole vector leaves at 2^-25)
        xa = x * (1 << _TBITS)
        for b in range(1, 32):
            u = 18 * b - 1 - np.arange(8)
            l = 18 * b + np.arange(8)
            xu, xl = x[u], x[l]
            xa[u] = xu * _CS - xl * _CA
            xa[l] = xl * _CS + xu * _CA
        # fused IMDCT + window, ONE rounding back to 2^-15
        z = _rdiv(
            xa.reshape(32, 18) @ _CW36_BT[block_type].T,
            1 << (2 * _TBITS),
        )
    # overlap-add (exact), save next tail
    ts = z[:, :18] + state.overlap
    state.overlap = z[:, 18:].copy()
    # frequency inversion: odd time samples of odd subbands
    ts[1::2, 1::2] = -ts[1::2, 1::2]
    # polyphase synthesis, whole granule at once: 18 V vectors in one
    # matmul, then one gather over the chronological V history (16 FIFO
    # rows + the 18 new ones) replaces the per-block np.roll loop
    v18 = (_NMAT @ ts).T  # (18, 64), exact, 2^-25
    hist = np.concatenate([state.vfifo[::-1], v18])  # hist[m]=V_{t0-16+m}
    # output block n needs V_{t0+n-i} = hist[16 + n - i]
    g = hist[_HIST_ROWS[:, :, None], _V_COL[None, :, :]]  # (18, 16, 32)
    acc = (g * _D_TAP[None, :, :]).sum(axis=1)  # exact, 2^-35
    state.vfifo = hist[-16:][::-1].copy()
    pcm = _rdiv(acc, 1 << (2 * _TBITS)).reshape(-1)
    return np.clip(pcm, -32768, 32767)


def parse_mp3_l3(payload: bytes) -> tuple[int, np.ndarray]:
    """SAMPLE-decode an MPEG-1 Layer III stream (optionally
    ID3v2-prefixed): sync-walk frames, parse side info, read
    scalefactors, Huffman-decode the spectrum from the real bitstream,
    requantize through the fixed-point LUT and run the reconstruction
    pipeline.  Mono returns ``(rate, int16[n])``; stereo, dual channel
    and joint stereo return ``(rate, int16[n, 2])``.

    General-profile surface (r9, VERDICT r8 tasks 2+5) on top of the
    r8 fixture profile:

    - **any MPEG-1 Layer III bitrate row** (32..320 kbps incl. the
      padding bit), so VBR streams walk correctly;
    - **the bit reservoir**: main-data regions concatenate into a
      rolling buffer (capped at the spec's 511-byte window) and
      ``main_data_begin`` points back into it;
    - **scfsi**: granule 1 reuses granule 0's scalefactors per shared
      band group;
    - **preflag**: the Table B.6 pretab joins the effective
      scalefactor;
    - **Huffman tables 0/1/2** for big values and **both count1
      tables** for the quadruple region (big-value tables 3..31 stay
      disclosed ``NotImplementedError`` boundaries);
    - **window switching**: block types 1 (start), 2 (short AND
      mixed; per-window subblock_gain + short scalefactors, stored ->
      window gather, three 12-point IMDCTs, no alias reduction on the
      short part — mixed runs the two lowest subbands through the
      long path) and 3 (stop);
    - **intensity stereo** (mode 01, mode_ext bit 0, long blocks): for
      scalefactor bands at/above the right channel's transmitted-line
      bound, ``is_pos`` = the right channel's raw scalefactor (band 21
      reuses band 20's), and L,R = rdiv(x*KL/KR[is_pos], 2^10) — the
      MS recombination convention; is_pos 7 leaves the band untouched;
      combined MS+intensity (mode_ext 11) stays disclosed.

    Protected frames (protection bit 0) have their CRC-16 word
    verified against the header/side-info bits (r9).  Free-format
    streams (bitrate index 0) decode: the constant frame length is
    measured once by scanning for the next matching header and
    verified at every later frame boundary.  Still raising by design:
    non-44.1 kHz rows (their band tables are untranscribed) and
    big-value tables 3..31."""
    pos = 0
    if payload[:3] == b"ID3":
        from .id3 import parse_id3

        pos = parse_id3(payload)["_tag_bytes"]
    sfb = np.asarray(SFB_LONG_44100)
    band_width = np.diff(sfb)
    pcm_parts: list[list[np.ndarray]] = []
    states: list[_SynthState] = []
    end = len(payload)
    n_frames = 0
    nch_stream: int | None = None
    # bit reservoir: concatenated main-data regions, trimmed to the
    # 511-byte spec window; md_base counts trimmed-off bytes
    md_stream = bytearray()
    md_base = 0
    free_flen: int | None = None
    while pos + 4 <= end:
        if payload[pos : pos + 3] == b"TAG":
            break
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            raise NotImplementedError("MP3: only MPEG-1 Layer III")
        crc_on = not (h >> 16) & 0x1
        br_idx, sr_idx = (h >> 12) & 0xF, (h >> 10) & 0x3
        if sr_idx != 0:
            raise NotImplementedError("MP3: only the 44.1 kHz band table")
        if br_idx == 15:
            raise ValueError("MP3: invalid bitrate index 15")
        kbps = _MP3_BR_L3[br_idx]
        mode = (h >> 6) & 0x3
        mode_ext = (h >> 4) & 0x3
        ms_on = is_on = False
        if mode == 0x1:  # joint stereo: mode_ext picks the coding
            if mode_ext == 0x3:
                raise NotImplementedError("MP3: combined MS + intensity")
            ms_on = bool(mode_ext & 0x2)
            is_on = bool(mode_ext & 0x1)
        nch = 1 if mode == 0x3 else 2
        if nch_stream is None:
            nch_stream = nch
            states = [_SynthState() for _ in range(nch)]
        elif nch_stream != nch:
            raise ValueError("MP3: channel mode changed mid-stream")
        padding = (h >> 9) & 0x1
        if kbps is None:  # free format (r9): the spec fixes ONE frame
            # length for the whole stream; measure it once by scanning
            # for the next frame header with identical version/layer/
            # samplerate/channel-mode bits, then verify the sync at
            # every later boundary (a false sync inside main data
            # fails that check loudly)
            if free_flen is None:
                # sync+version+layer (not CRC), bitrate(=0), sample
                # rate, channel mode — the fields free format keeps
                # constant across frames
                hdr_mask = 0xFFFEFCC0
                want = h & hdr_mask
                # start past the CRC word (when protected) AND the side
                # info — both are frame-fixed regions where a byte pair
                # could false-sync (r9 ADVICE)
                scan = (
                    pos
                    + 4
                    + (2 if crc_on else 0)
                    + (17 if (h >> 6) & 0x3 == 0x3 else 32)
                )
                while scan + 4 <= end:
                    if (
                        payload[scan] == 0xFF
                        and payload[scan + 1] >= 0xE0
                        and int.from_bytes(
                            payload[scan : scan + 4], "big"
                        ) & hdr_mask == want
                    ):
                        break
                    scan += 1
                else:
                    scan = end  # single-frame stream: runs to the end
                free_flen = scan - pos - padding
            flen = free_flen + padding
        else:
            flen = 144 * kbps * 1000 // _RATE + padding
        if pos + flen > end:
            raise ValueError("MP3: truncated final frame")
        si_len = 17 if nch == 1 else 32
        si_off = pos + 4 + (2 if crc_on else 0)
        if crc_on:  # r9: verify the error-check word over the
            # protected bits (header bytes 2-3 + the side information)
            want = int.from_bytes(payload[pos + 4 : pos + 6], "big")
            got = crc16_protect(
                payload[pos + 2 : pos + 4]
                + payload[si_off : si_off + si_len]
            )
            if want != got:
                raise ValueError(
                    f"MP3: CRC mismatch at byte {pos} "
                    f"(stored {want:#06x}, computed {got:#06x})"
                )

        si = _BitReader(payload, si_off)
        mdb = si.read(9)
        si.read(5 if nch == 1 else 3)  # private
        scfsi = [[si.read(1) for _ in range(4)] for _ in range(nch)]
        gr_info = []
        for _gc in range(2 * nch):  # (granule, channel) order
            info = {
                "part2_3_length": si.read(12),
                "big_values": si.read(9),
                "global_gain": si.read(8),
                "scalefac_compress": si.read(4),
            }
            if si.read(1):  # window_switching_flag
                bt = si.read(2)
                if bt == 0:
                    raise ValueError("MP3: block_type 0 with switching")
                info["mixed"] = si.read(1)
                if info["mixed"] and bt != 2:
                    raise ValueError(
                        "MP3: mixed_block_flag with a long block type"
                    )
                info["table_select"] = [si.read(5) for _ in range(2)] + [0]
                info["subblock_gain"] = [si.read(3) for _ in range(3)]
                info["block_type"] = bt
                # implicit region layout under window switching
                info["bound1"], info["bound2"] = 36, 576
            else:
                info["block_type"] = bt = 0
                info["mixed"] = 0
                info["subblock_gain"] = [0, 0, 0]
                info["table_select"] = [si.read(5) for _ in range(3)]
                r0 = min(si.read(4) + 1, len(sfb) - 1)
                r1 = min(r0 + si.read(3) + 1, len(sfb) - 1)
                info["bound1"], info["bound2"] = int(sfb[r0]), int(sfb[r1])
            info["preflag"] = si.read(1)
            info["scalefac_scale"] = si.read(1)
            info["count1table_select"] = si.read(1)
            gr_info.append(info)

        # splice this frame's main-data region into the reservoir
        region = payload[si_off + si_len : pos + flen]
        start_byte = len(md_stream) - mdb
        if start_byte < 0:
            raise ValueError("MP3: bit reservoir underflow")
        md_stream += region
        mdbuf = bytes(md_stream)
        md = _BitReader(mdbuf, start_byte)

        frame_ch: list[list[np.ndarray]] = [[] for _ in range(nch)]
        gx: list = [None] * nch  # per-granule requantized channels
        gbt: list = [0] * nch
        sfraw: list = [None] * nch  # raw long scalefacs (intensity pos)
        lines_tx: list = [0] * nch  # transmitted-line bound per channel
        sf_gr0: list = [None] * nch  # granule 0 scalefacs (scfsi)
        for gc in range(2 * nch):
            g, ch = gc // nch, gc % nch
            info = gr_info[gc]
            p23 = info["part2_3_length"]
            start_bits = md.bits_read()
            slen1, slen2 = _SLEN[info["scalefac_compress"]]
            bt = info["block_type"]
            if bt == 2:
                if any(scfsi[ch]) and g == 1:
                    raise ValueError("MP3: scfsi with short blocks")
                sfshort = np.zeros((13, 3), dtype=np.int64)
                sfmix = np.zeros(22, dtype=np.int64)
                if info["mixed"]:
                    # long sfbs 0..7 then short sfbs 3..11 per window
                    for b in range(8):
                        sfmix[b] = md.read(slen1)
                    for b in range(3, 6):
                        for w in range(3):
                            sfshort[b, w] = md.read(slen1)
                    for b in range(6, 12):
                        for w in range(3):
                            sfshort[b, w] = md.read(slen2)
                else:
                    for b in range(6):
                        for w in range(3):
                            sfshort[b, w] = md.read(slen1)
                    for b in range(6, 12):
                        for w in range(3):
                            sfshort[b, w] = md.read(slen2)
                sfraw[ch] = None
            else:
                sf = np.zeros(22, dtype=np.int64)
                if g == 1 and any(scfsi[ch]):
                    prev = sf_gr0[ch]
                    if prev is None:
                        raise ValueError("MP3: scfsi without granule 0")
                    for gi, (a, b) in enumerate(
                        ((0, 6), (6, 11), (11, 16), (16, 21))
                    ):
                        if scfsi[ch][gi]:
                            sf[a:b] = prev[a:b]
                        else:
                            for band in range(a, b):
                                sf[band] = md.read(
                                    slen1 if band < 11 else slen2
                                )
                else:
                    for band in range(11):
                        sf[band] = md.read(slen1)
                    for band in range(11, 21):
                        sf[band] = md.read(slen2)
                if g == 0:
                    sf_gr0[ch] = sf.copy()
                sfraw[ch] = sf
            bv = info["big_values"]
            if bv > 288:
                raise ValueError("MP3: big_values > 288")
            q = np.zeros(576, dtype=np.int64)
            # decode per REGION RUN (same table over a contiguous pair
            # range) through the peek LUTs instead of per-bit reads
            bitpos = md.bits_read()
            run_start = 0
            for run_end, table in (
                (min(info["bound1"] // 2, bv), info["table_select"][0]),
                (min(info["bound2"] // 2, bv), info["table_select"][1]),
                (bv, info["table_select"][2]),
            ):
                n_pairs = run_end - run_start
                if n_pairs <= 0:
                    continue
                if table == 1:
                    bitpos = _decode_pair_run(
                        mdbuf, bitpos, q, 2 * run_start, n_pairs,
                        _HUFF1_LUT, 5,
                    )
                elif table == 2:
                    bitpos = _decode_pair_run(
                        mdbuf, bitpos, q, 2 * run_start, n_pairs,
                        _HUFF2_LUT, 8,
                    )
                elif table != 0:  # table 0: no bits, values stay zero
                    raise NotImplementedError(
                        f"MP3: Huffman table {table} not transcribed"
                    )
                run_start = run_end
            md._pos, md._bit = bitpos >> 3, bitpos & 7
            used = md.bits_read() - start_bits
            if used > p23:
                raise ValueError("MP3: part2_3_length overrun")
            c1_lines = 0
            if used < p23:
                if info["count1table_select"]:
                    bitpos, c1_lines = _decode_count1_run(
                        mdbuf, bitpos, q, 2 * bv, start_bits + p23,
                        _C1B_LUT, 8,
                    )
                else:
                    bitpos, c1_lines = _decode_count1_run(
                        mdbuf, bitpos, q, 2 * bv, start_bits + p23,
                        _C1A_LUT, 10,
                    )
            lines_tx[ch] = 2 * bv + c1_lines
            # ancillary/stuffing bits: seek to exactly part2_3_length
            tgt = start_bits + p23
            md._pos, md._bit = tgt >> 3, tgt & 7

            maxsf = (1 << max(slen1, slen2, 1)) + 3  # pretab headroom
            absq = np.abs(q)
            if bt == 2:
                lut_w = np.array(
                    [
                        [
                            requant_lut(
                                info["global_gain"]
                                - 8 * info["subblock_gain"][w],
                                info["scalefac_scale"], maxsf, q=a,
                            )
                            for a in (0, 1, 2)
                        ]
                        for w in range(3)
                    ],
                    dtype=np.int64,
                )
                if info["mixed"]:
                    lutq = np.array(
                        [
                            requant_lut(
                                info["global_gain"],
                                info["scalefac_scale"], maxsf, q=a,
                            )
                            for a in (0, 1, 2)
                        ],
                        dtype=np.int64,
                    )
                    sfe = sfmix + info["preflag"] * _PRETAB
                    line_sf = np.repeat(sfe, band_width)
                    x = np.empty(576, dtype=np.int64)
                    x[:36] = (np.sign(q[:36])
                              * lutq[absq[:36], line_sf[:36]])
                    sfl = sfshort[_STORED_SFB_MIX[36:],
                                  _STORED_WIN_MIX[36:]]
                    x[36:] = (np.sign(q[36:])
                              * lut_w[_STORED_WIN_MIX[36:],
                                      absq[36:], sfl])
                    gx[ch] = x
                else:
                    sfl = sfshort[_STORED_SFB, _STORED_WIN]
                    gx[ch] = np.sign(q) * lut_w[_STORED_WIN, absq, sfl]
            else:
                lutq = np.array(
                    [
                        requant_lut(
                            info["global_gain"],
                            info["scalefac_scale"], maxsf, q=a,
                        )
                        for a in (0, 1, 2)
                    ],
                    dtype=np.int64,
                )
                sfe = sf[:22] + info["preflag"] * _PRETAB
                line_sf = np.repeat(sfe, band_width)
                gx[ch] = np.sign(q) * lutq[absq, line_sf]
            gbt[ch] = bt
            if ch < nch - 1:
                continue
            if ms_on:
                # mid/side recombination on the requantized spectra:
                # L,R = (M +- S)/sqrt(2) — ONE extra fixed-point
                # rounding (x 724 at 2^10), scale stays 2^-15
                m, s_ = gx[0], gx[1]
                gx[0] = _rdiv((m + s_) * _RSQRT2, 1 << _TBITS)
                gx[1] = _rdiv((m - s_) * _RSQRT2, 1 << _TBITS)
            if is_on:
                if gbt[0] == 2 or gbt[1] == 2:
                    raise NotImplementedError(
                        "MP3: intensity stereo on short blocks"
                    )
                bound = lines_tx[1]
                sfr = sfraw[1]
                for band in range(22):
                    if int(sfb[band]) < bound:
                        continue
                    pos_is = int(sfr[min(band, 20)])
                    if pos_is == 7:  # illegal position: band untouched
                        continue
                    a, b = int(sfb[band]), int(sfb[band + 1])
                    xl = gx[0][a:b].copy()  # not a view: L is written
                    gx[0][a:b] = _rdiv(xl * _IS_KL[pos_is], 1 << _TBITS)
                    gx[1][a:b] = _rdiv(xl * _IS_KR[pos_is], 1 << _TBITS)
            for c in range(nch):
                gi2 = gr_info[g * nch + c]
                frame_ch[c].append(
                    _reconstruct_granule(
                        gx[c], states[c],
                        block_type=gi2["block_type"],
                        mixed=bool(gi2.get("mixed")),
                    )
                )
        pcm_parts.append([np.concatenate(c) for c in frame_ch])
        # trim the reservoir to the spec window for the next frame
        if len(md_stream) > 511:
            drop = len(md_stream) - 511
            md_base += drop
            del md_stream[:drop]
        pos += flen
        n_frames += 1
    if n_frames == 0:
        raise ValueError("MP3: no audio frames")
    chans = [
        np.concatenate([fp[c] for fp in pcm_parts])
        for c in range(nch_stream)
    ]
    if nch_stream == 1:
        return _RATE, chans[0].astype(np.int16)
    return _RATE, np.stack(chans, axis=1).astype(np.int16)
