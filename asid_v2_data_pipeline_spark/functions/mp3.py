"""MPEG-1 Audio Layer III (MP3) — from-spec encoder + SAMPLE decoder
with a fixed-point reconstruction pipeline (VERDICT r7 task 2: the last
DecodeStub raise worth killing).

Scope (each boundary disclosed, every supported path oracle-checked):

- **Bitstream layer — per ISO/IEC 11172-3**: frame header, mono side
  info (main_data_begin / scfsi / per-granule part2_3_length,
  big_values, global_gain, scalefac_compress, table_select,
  region0/1_count, preflag, scalefac_scale, count1table_select),
  long-block scalefactors under the slen1/slen2 table, Huffman-coded
  big_values pairs with sign bits, ancillary padding to the exact
  bitrate-derived frame length (``id3.py``'s frame-walk formula).
- **Huffman tables**: table 0 (all-zero, zero bits) and table 1
  (xlen=ylen=2) are transcribed from the spec and verified prefix-free
  + complete by test; the remaining big-value tables and the count1
  quadruple tables are NOT transcribed — streams selecting them raise
  ``NotImplementedError`` (same disclosed-boundary convention as the
  szip HDF5 filter).  The encoder only ever selects tables 0/1, so
  every fixture round-trips through real Huffman decode.
- **Bit reservoir**: ``main_data_begin != 0`` raises (disclosed); the
  encoder always writes self-contained frames.
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
- **Scalefactor bands**: the 44.1 kHz long-block boundary table
  (ISO 11172-3 Annex B Table B.8); other sample rates raise.

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

_GG_DEFAULT = 190  # global_gain -> 2^-5 overall (keeps PCM off the rails)
_SF_COMPRESS = 13  # slen1 = slen2 = 3 -> scalefacs 0..7
_KBPS = 320
_RATE = 44100
_FRAME_LEN = 144 * _KBPS * 1000 // _RATE  # 1044 bytes, padding 0
_R0_COUNT = 7  # region0 = sfb 0..7  (lines 0..35)
_R1_COUNT = 7  # region1 = sfb 8..15 (lines 36..161)


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
    mode_ext MS — the decoder recombines L,R = (M ± S)/sqrt(2).  All
    576 lines ride in big_values (288 pairs, the spec maximum), table 1
    in all three regions, count1 = rzero = 0, main_data_begin = 0
    (self-contained frames)."""
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
    if stereo_mode not in ("independent", "ms"):
        raise ValueError("MP3: stereo_mode must be 'independent' or 'ms'")
    if stereo_mode == "ms" and nch != 2:
        raise ValueError("MP3: mid/side needs exactly 2 channels")

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
                for k in range(288):
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
        for p in p23:  # (granule, channel) order
            si.write(p, 12)
            si.write(288, 9)  # big_values
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
                (0x3 if nch == 1 else (0x1 if stereo_mode == "ms" else 0x0))
                << 6
            )  # mono / joint stereo / stereo
            | ((0x2 if stereo_mode == "ms" else 0x0) << 4),  # mode_ext
        )
        body = header + side + main
        if len(body) > _FRAME_LEN:
            raise ValueError("MP3: frame data exceeds 320 kbps budget")
        out += body + bytes(_FRAME_LEN - len(body))
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


def _build_huff1_lut() -> list[tuple[int, int, int] | None]:
    """Peek-5 decode LUT for table 1 (the JPEG peek-LUT trick): the
    longest code (3) plus two sign bits is 5 bits, so every 5-bit
    window resolves one full (x, y, consumed-bits) step — one list
    index instead of up to five bit reads."""
    lut: list[tuple[int, int, int] | None] = [None] * 32
    for (ax, ay), (code, ln) in _HUFF1.items():
        nsign = (1 if ax else 0) + (1 if ay else 0)
        free = 5 - ln - nsign
        for signs in range(1 << nsign):
            for fill in range(1 << free):
                w = (code << (5 - ln)) | (signs << free) | fill
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


_HUFF1_LUT = _build_huff1_lut()


def _decode_table1_run(
    buf: bytes, bitpos: int, out: np.ndarray, start: int, n_pairs: int
) -> int:
    """Decode ``n_pairs`` table-1 pairs from ``buf`` starting at
    absolute ``bitpos``, writing into ``out[start:]``; returns the new
    bit position.  Byte-window peek + the 5-bit LUT — the hot path of
    the sample decoder (exactness pinned against the scalar model and
    the per-bit reference reader in tests)."""
    lut = _HUFF1_LUT
    for k in range(n_pairs):
        byte = bitpos >> 3
        chunk = buf[byte : byte + 3]
        if len(chunk) < 3:  # stream tail: zero-extend
            chunk = chunk + bytes(3 - len(chunk))
        w = (int.from_bytes(chunk, "big") >> (19 - (bitpos & 7))) & 31
        step = lut[w]
        i = start + 2 * k
        out[i], out[i + 1] = step[0], step[1]
        bitpos += step[2]
    return bitpos


class _SynthState:
    """Per-stream reconstruction state: the 18-sample IMDCT overlap
    tail per subband and the 16-deep V FIFO of the polyphase bank —
    carried across granules AND frames, zeroed per payload."""

    def __init__(self) -> None:
        self.overlap = np.zeros((32, 18), dtype=np.int64)
        self.vfifo = np.zeros((16, 64), dtype=np.int64)


def _reconstruct_granule(
    x: np.ndarray, state: _SynthState
) -> np.ndarray:
    """Fixed-point reconstruction of one granule: 576 requantized
    lines (int64 at 2^-15) -> 576 int16 PCM samples.  Integer
    end-to-end; the ONLY rounding is the ``_rdiv`` after the fused
    IMDCT+window and the final PCM ``_rdiv`` (see module docstring)."""
    # alias reduction (exact; untouched lines scaled by 2^10 so the
    # whole vector leaves at 2^-25)
    xa = x * (1 << _TBITS)
    for b in range(1, 32):
        u = 18 * b - 1 - np.arange(8)
        l = 18 * b + np.arange(8)
        xu, xl = x[u], x[l]
        xa[u] = xu * _CS - xl * _CA
        xa[l] = xl * _CS + xu * _CA
    # fused IMDCT + window, ONE rounding back to 2^-15
    z = _rdiv(xa.reshape(32, 18) @ _CW36.T, 1 << (2 * _TBITS))
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
    and joint stereo return ``(rate, int16[n, 2])`` — independent
    channels each keep their own overlap/filterbank state, and
    MID/SIDE joint stereo (mode 01, mode_ext MS) recombines the
    requantized spectra ``L,R = rdiv((M ± S)·724, 2^10)`` before
    reconstruction (r8).  Intensity stereo and the other unsupported
    spec surface raise ``NotImplementedError`` with the feature named
    (bit reservoir, non-transcribed Huffman tables, count1 quads,
    window switching, non-44.1 kHz)."""
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
    while pos + 4 <= end:
        if payload[pos : pos + 3] == b"TAG":
            break
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"MP3: lost sync at byte {pos}")
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            raise NotImplementedError("MP3: only MPEG-1 Layer III")
        if not (h >> 16) & 0x1:
            raise NotImplementedError("MP3: CRC frames not supported")
        br_idx, sr_idx = (h >> 12) & 0xF, (h >> 10) & 0x3
        if sr_idx != 0:
            raise NotImplementedError("MP3: only the 44.1 kHz band table")
        if br_idx != 0xE:
            raise NotImplementedError("MP3: fixture decoder expects 320 kbps")
        mode = (h >> 6) & 0x3
        mode_ext = (h >> 4) & 0x3
        ms_on = False
        if mode == 0x1:  # joint stereo: mode_ext picks the coding
            if mode_ext & 0x1:
                raise NotImplementedError("MP3: intensity stereo")
            # mode_ext 00 = no joint coding this frame (plain stereo);
            # bit 1 = mid/side over the whole spectrum
            ms_on = bool(mode_ext & 0x2)
        nch = 1 if mode == 0x3 else 2
        if nch_stream is None:
            nch_stream = nch
            states = [_SynthState() for _ in range(nch)]
        elif nch_stream != nch:
            raise ValueError("MP3: channel mode changed mid-stream")
        padding = (h >> 9) & 0x1
        flen = _FRAME_LEN + padding
        if pos + flen > end:
            raise ValueError("MP3: truncated final frame")

        br = _BitReader(payload, pos + 4)
        if br.read(9):
            raise NotImplementedError("MP3: bit reservoir not supported")
        br.read(5 if nch == 1 else 3)  # private
        if br.read(4 * nch):
            raise NotImplementedError("MP3: scfsi sharing not supported")
        gr_info = []
        for _ in range(2 * nch):  # (granule, channel) order
            info = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
            }
            if br.read(1):
                raise NotImplementedError("MP3: window switching")
            info["table_select"] = [br.read(5) for _ in range(3)]
            info["region0_count"] = br.read(4)
            info["region1_count"] = br.read(3)
            info["preflag"] = br.read(1)
            info["scalefac_scale"] = br.read(1)
            info["count1table_select"] = br.read(1)
            gr_info.append(info)

        md = _BitReader(payload, pos + 4 + (17 if nch == 1 else 32))
        frame_ch: list[list[np.ndarray]] = [[] for _ in range(nch)]
        gx: list = [None] * nch  # per-granule requantized channels
        for gc in range(2 * nch):
            g, ch = gc // nch, gc % nch
            info = gr_info[gc]
            start_bits = md.bits_read()
            slen1, slen2 = _SLEN[info["scalefac_compress"]]
            sf = np.zeros(22, dtype=np.int64)  # band 21 (>418) stays 0
            for b in range(11):
                sf[b] = md.read(slen1)
            for b in range(11, 21):
                sf[b] = md.read(slen2)
            if info["preflag"]:
                raise NotImplementedError("MP3: preflag pretab")
            bv = info["big_values"]
            if bv > 288:
                raise ValueError("MP3: big_values > 288")
            r0 = min(info["region0_count"] + 1, len(sfb) - 1)
            r1 = min(r0 + info["region1_count"] + 1, len(sfb) - 1)
            bound1, bound2 = int(sfb[r0]), int(sfb[r1])
            q = np.zeros(576, dtype=np.int64)
            # decode per REGION RUN (same table over a contiguous pair
            # range) through the peek-5 LUT instead of per-bit reads
            bitpos = md.bits_read()
            run_start = 0
            for run_end, table in (
                (min(bound1 // 2, bv), info["table_select"][0]),
                (min(bound2 // 2, bv), info["table_select"][1]),
                (bv, info["table_select"][2]),
            ):
                n_pairs = run_end - run_start
                if n_pairs <= 0:
                    continue
                if table == 1:
                    bitpos = _decode_table1_run(
                        payload, bitpos, q, 2 * run_start, n_pairs
                    )
                elif table != 0:  # table 0: no bits, values stay zero
                    raise NotImplementedError(
                        f"MP3: Huffman table {table} not transcribed"
                    )
                run_start = run_end
            md._pos, md._bit = bitpos >> 3, bitpos & 7
            used = md.bits_read() - start_bits
            if used > info["part2_3_length"]:
                raise ValueError("MP3: part2_3_length overrun")
            if md.bits_read() - start_bits < info["part2_3_length"]:
                # count1 region would start here
                raise NotImplementedError(
                    "MP3: count1 quadruples not transcribed"
                )
            lut = np.asarray(
                requant_lut(
                    info["global_gain"], info["scalefac_scale"],
                    max_sf=1 << max(slen1, slen2, 1),
                ),
                dtype=np.int64,
            )
            line_sf = np.repeat(sf, band_width)
            gx[ch] = np.sign(q) * lut[line_sf]
            if ch < nch - 1:
                continue
            if ms_on:
                # mid/side recombination on the requantized spectra:
                # L,R = (M ± S)/sqrt(2) — ONE extra fixed-point rounding
                # (x 724 at 2^10), scale stays 2^-15
                m, s_ = gx[0], gx[1]
                gx[0] = _rdiv((m + s_) * _RSQRT2, 1 << _TBITS)
                gx[1] = _rdiv((m - s_) * _RSQRT2, 1 << _TBITS)
            for c in range(nch):
                frame_ch[c].append(
                    _reconstruct_granule(gx[c], states[c])
                )
        pcm_parts.append([np.concatenate(c) for c in frame_ch])
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
