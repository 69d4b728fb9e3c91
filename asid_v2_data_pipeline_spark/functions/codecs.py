"""Pure-Python multimedia container codecs: WAV/PCM and uncompressed BMP.

Round-5 replacement for the ``DecodeStub`` decode step in
``operators/multimodal.py`` for the formats implementable without codec
libraries — the RIFF/WAVE container (PCM 8/16-bit) and the Windows BMP
container (uncompressed 8-bit palette and 24-bit BGR).  Both are simple
public formats (Microsoft RIFF/WAVEFORMAT and BITMAPINFOHEADER specs);
parsing is struct + NumPy, so executor-side decode stays vectorized.

PNG also decodes for real (8-bit, non-interlaced, all five scanline
filters) — DEFLATE comes from the stdlib ``zlib`` — as do GIF (LZW)
and, since round 6, baseline sequential JPEG (fixed-point integer DCT +
canonical Huffman coding, encoder AND decoder, see the JPEG section).
Codecs needing libraries outside the stdlib (MP3/MP4/WebM) remain
stubbed — see ``operators/multimodal.py::DecodeStub``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM only)
# --------------------------------------------------------------------------


def _build_mulaw_table() -> "np.ndarray":
    """G.711 mu-law decode table (code byte -> linear int16), built from
    the ITU-T definition: invert, split sign/exponent/mantissa, expand
    with the 0x84 bias."""
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        u = ~code & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 0x07
        mant = u & 0x0F
        x = (((mant << 3) + 0x84) << exp) - 0x84
        out[code] = -x if sign else x
    return out


_MULAW_TABLE = _build_mulaw_table()


def _build_alaw_table() -> "np.ndarray":
    """G.711 A-law decode table (code byte -> linear int16), from the
    ITU-T definition: XOR the 0x55 toggle pattern, split sign/segment/
    mantissa, expand to the segment midpoint (seg 0 = (mant<<4)+8,
    seg s = ((mant<<4)+0x108) << (s-1); sign bit SET means positive)."""
    out = np.zeros(256, dtype=np.int16)
    for code in range(256):
        a = code ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 0x07
        mant = a & 0x0F
        x = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (
            exp - 1
        )
        out[code] = x if sign else -x
    return out


_ALAW_TABLE = _build_alaw_table()


def alaw_encode(samples: "np.ndarray") -> "np.ndarray":
    """Linear int16 -> G.711 A-law code bytes: the symmetric segment
    quantizer (|x| -> segment by leading bit, 4-bit mantissa; positive
    sign bit set, whole code XORed with 0x55).  Exact inverse-image of
    :func:`_build_alaw_table` — ``alaw_encode(table[c]) == c`` for all
    256 codes, the identity the unit matrix pins."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.clip(np.abs(x), 0, 32767)
    # segment = position of the leading bit above the seg-0 range
    exp = np.zeros_like(mag)
    nz = mag >= 256
    exp[nz] = (np.floor(np.log2(mag[nz])).astype(np.int32) - 7).clip(1, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def write_wav_alaw(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Minimal A-law WAV writer (fixture builder): linear int16 in,
    audio_format=6 / 8-bit container out."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    codes = alaw_encode(a)
    nch = a.shape[1]
    fmt = struct.pack("<HHIIHH", 6, nch, sample_rate, sample_rate * nch, nch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data = codes.tobytes()
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mulaw_encode(samples: "np.ndarray") -> "np.ndarray":
    """Linear int16 -> G.711 mu-law code bytes (the fixture-writer half;
    standard clamp to +/-32635, bias, exponent-segment search)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.clip(np.abs(x), 0, 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def write_wav_mulaw(samples: "np.ndarray", sample_rate: int = 8000) -> bytes:
    """Minimal mu-law WAV writer (fixture builder): linear int16 in,
    audio_format=7 / 8-bit container out."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    codes = mulaw_encode(a)
    nch = a.shape[1]
    fmt = struct.pack("<HHIIHH", 7, nch, sample_rate, sample_rate * nch, nch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data = codes.tobytes()
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA/DVI ADPCM (WAV audio format 0x11): 4-bit differential coding with
# the standard 89-entry step table and 8-entry index table (IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility",
# also the Microsoft multimedia registration for WAVE format 17)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition (shared by encode and decode so
    the encoder's predictor tracks the decoder exactly — no drift)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble & 7])))
    return pred, index


def ima_adpcm_decode_block(
    block: bytes, samples_per_block: int, channels: int = 1
) -> np.ndarray:
    """Decode one IMA block -> ``(samples_per_block, channels)`` int16.
    Layout per the WAVE format-17 registration: one 4-byte header per
    channel (predictor int16 LE, step index u8, reserved), then the
    channels' codes interleaved in 4-byte groups (8 nibbles per channel
    per group), low nibble first."""
    preds, idxs = [], []
    for c in range(channels):
        h = 4 * c
        preds.append(int.from_bytes(block[h : h + 2], "little", signed=True))
        idxs.append(max(0, min(88, block[h + 2])))
    out = np.empty((samples_per_block, channels), dtype=np.int16)
    out[0] = preds
    ks = [1] * channels
    pos = 4 * channels
    while pos < len(block):
        for c in range(channels):
            for byte in block[pos : pos + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    if ks[c] >= samples_per_block:
                        break
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    out[ks[c], c] = preds[c]
                    ks[c] += 1
            pos += 4
    if min(ks) < samples_per_block:
        raise ValueError("IMA ADPCM: truncated block")
    return out


def _ima_quantize(seg, pred, index):
    """Quantize one channel's samples after the block seed: returns
    (nibbles, final pred, final index) — the encoder reconstructs with
    the decoder's own step so there is no drift."""
    nibbles = []
    for s in seg:
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, index = _ima_step(pred, index, nib)
        nibbles.append(nib)
    return nibbles, pred, index


def ima_adpcm_encode(
    samples: np.ndarray, block_align: int = 256
) -> tuple[bytes, int]:
    """Encode int16 PCM — ``(n,)`` mono or ``(n, ch)`` — to IMA ADPCM
    blocks (fixture-builder half): per block and channel, header =
    (first sample, running step index), then the remaining samples'
    4-bit codes, channels interleaved in 4-byte groups.  Returns
    ``(payload, samples_per_block)``; the final block is zero-padded
    (decoders stop at the fact-chunk sample count)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    spb = (block_align - 4 * ch) * 2 // ch + 1
    if (spb - 1) % 8:
        raise ValueError("IMA ADPCM: block size must pack whole groups")
    idxs = [0] * ch
    blocks = []
    for start in range(0, len(x), spb):
        seg = x[start : start + spb]
        body = bytearray()
        nibs = []
        for c in range(ch):
            pred = int(seg[0, c])
            body += pred.to_bytes(2, "little", signed=True)
            body.append(idxs[c])
            body.append(0)
            n, _pred, idxs[c] = _ima_quantize(seg[1:, c], pred, idxs[c])
            nibs.append(n + [0] * ((spb - 1) - len(n)))
        for g in range(0, spb - 1, 8):
            for c in range(ch):
                grp = nibs[c][g : g + 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    body.append(lo | (hi << 4))
        blocks.append(bytes(body))
    return b"".join(blocks), spb


def write_wav_ima(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Minimal IMA ADPCM WAV writer (format 17, mono or stereo): PCM
    int16 in, real 4-bit compressed container out — fmt carries the
    cbSize=2 extension with wSamplesPerBlock, and ``fact`` records the
    true frame count (required for compressed WAVE formats)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    nch = a.shape[1]
    data, spb = ima_adpcm_encode(a, block_align)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, nch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(a))
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body



def _parses_untrusted(fn):
    """Parser boundary for untrusted bytes (r10 fuzz hardening): a
    truncated or corrupt payload must surface as ValueError, never as
    a struct.error / IndexError / zlib.error escape — callers
    (decode_image, the admission funnels) gate on ValueError to
    quarantine bad documents instead of failing the task."""
    import functools

    @functools.wraps(fn)
    def wrap(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError, zlib.error) as e:
            raise ValueError(
                f"{fn.__name__}: truncated or corrupt payload ({e})"
            ) from e

    return wrap


# --- MS-ADPCM (WAVE_FORMAT_ADPCM = 2) ----------------------------------------
#
# The other ubiquitous legacy 4-bit WAV codec (r10): second-order linear
# prediction with 7 fixed coefficient pairs chosen per block, a per-
# block transmitted initial delta, and the 16-entry delta adaptation
# table — all public constants from the Microsoft WAVE spec.  The
# predictor is computed with an arithmetic >>8 (floor) on both sides,
# so encode and decode agree bit-exactly on every input.

_MSA_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MSA_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MSA_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def ms_adpcm_decode_block(blk: bytes, spb: int, ch: int) -> np.ndarray:
    """One MS-ADPCM block -> ``(spb, ch)`` int64 samples.  Header per
    channel: predictor index, initial delta, sample t-1, sample t-2
    (each field grouped across channels); then 4-bit codes, high
    nibble first, channels alternating per nibble."""
    preds = list(blk[:ch])
    if any(p > 6 for p in preds):
        raise ValueError("MS-ADPCM: predictor index out of range")
    o = ch
    deltas = [
        int.from_bytes(blk[o + 2 * c : o + 2 * c + 2], "little", signed=True)
        for c in range(ch)
    ]
    o += 2 * ch
    s1 = [
        int.from_bytes(blk[o + 2 * c : o + 2 * c + 2], "little", signed=True)
        for c in range(ch)
    ]
    o += 2 * ch
    s2 = [
        int.from_bytes(blk[o + 2 * c : o + 2 * c + 2], "little", signed=True)
        for c in range(ch)
    ]
    o += 2 * ch
    out = np.zeros((spb, ch), dtype=np.int64)
    if spb >= 1:
        out[0] = s2
    if spb >= 2:
        out[1] = s1
    c1 = [_MSA_COEF1[p] for p in preds]
    c2 = [_MSA_COEF2[p] for p in preds]
    need = (spb - 2) * ch
    k = 0
    for byte in blk[o:]:
        for nib in (byte >> 4, byte & 0x0F):
            if k >= need:
                break
            c = k % ch
            t = 2 + k // ch
            pred = (s1[c] * c1[c] + s2[c] * c2[c]) >> 8
            signed = nib - 16 if nib >= 8 else nib
            samp = pred + deltas[c] * signed
            samp = max(-32768, min(32767, samp))
            out[t, c] = samp
            s2[c] = s1[c]
            s1[c] = samp
            deltas[c] = max(16, (_MSA_ADAPT[nib] * deltas[c]) >> 8)
            k += 1
    if k < need:
        raise ValueError("MS-ADPCM: block shorter than samples-per-block")
    return out


def ms_adpcm_encode(
    samples: np.ndarray, block_align: int = 256
) -> tuple[bytes, int]:
    """Encode int16 PCM — ``(n,)`` mono or ``(n, ch)`` — to MS-ADPCM
    blocks (fixture-builder half).  Per block and channel the
    predictor is chosen by least squared residual over the true
    samples, the initial delta from the mean early residual, then the
    nibble stream is generated TRACKING the decoder's state exactly
    (no drift).  Returns ``(payload, samples_per_block)``; the final
    block is zero-padded (decoders stop at the fact-chunk count)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    spb = (block_align - 7 * ch) * 2 // ch + 2
    if spb < 2:
        raise ValueError("MS-ADPCM: block too small for its header")
    blocks = []
    for start in range(0, len(x), spb):
        seg = x[start : start + spb]
        if len(seg) < spb:
            seg = np.vstack(
                [seg, np.zeros((spb - len(seg), ch), dtype=np.int64)]
            )
        head_p = bytearray()
        head_d = bytearray()
        head_s1 = bytearray()
        head_s2 = bytearray()
        nibs: list[list[int]] = []
        for c in range(ch):
            col = seg[:, c]
            best_p, best_err = 0, None
            for p in range(7):
                pred = (col[1:-1] * _MSA_COEF1[p] + col[:-2] * _MSA_COEF2[p]) >> 8
                err = int(((col[2:] - pred) ** 2).sum())
                if best_err is None or err < best_err:
                    best_p, best_err = p, err
            c1, c2 = _MSA_COEF1[best_p], _MSA_COEF2[best_p]
            resid = np.abs(
                col[2:] - ((col[1:-1] * c1 + col[:-2] * c2) >> 8)
            )
            delta = max(16, int(resid[:8].mean() // 4) if len(resid) else 16)
            s2v, s1v = int(col[0]), int(col[1])
            head_p.append(best_p)
            head_d += delta.to_bytes(2, "little", signed=True)
            head_s1 += s1v.to_bytes(2, "little", signed=True)
            head_s2 += s2v.to_bytes(2, "little", signed=True)
            cn = []
            for t in range(2, spb):
                pred = (s1v * c1 + s2v * c2) >> 8
                want = int(col[t])
                s = max(-8, min(7, round((want - pred) / delta)))
                nib = s + 16 if s < 0 else s
                samp = max(-32768, min(32767, pred + delta * s))
                s2v, s1v = s1v, samp
                delta = max(16, (_MSA_ADAPT[nib] * delta) >> 8)
                cn.append(nib)
            nibs.append(cn)
        body = bytearray()
        body += head_p + head_d + head_s1 + head_s2
        flat = []
        for t in range(spb - 2):
            for c in range(ch):
                flat.append(nibs[c][t])
        if len(flat) & 1:
            flat.append(0)
        for hi, lo in zip(flat[0::2], flat[1::2]):
            body.append((hi << 4) | lo)
        body += bytes(block_align - len(body))
        blocks.append(bytes(body))
    return b"".join(blocks), spb


def write_wav_ms(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Minimal MS-ADPCM WAV writer (format 2, mono or stereo): the fmt
    extension carries wSamplesPerBlock, wNumCoef=7 and the seven
    public coefficient pairs; ``fact`` records the true frame count
    (required for compressed WAVE formats)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    nch = a.shape[1]
    data, spb = ms_adpcm_encode(a, block_align)
    ext = struct.pack("<HH", spb, 7)
    for c1, c2 in zip(_MSA_COEF1, _MSA_COEF2):
        ext += struct.pack("<hh", c1, c2)
    fmt = struct.pack(
        "<HHIIHHH",
        0x02, nch, sample_rate,
        sample_rate * block_align // spb, block_align, 4, len(ext),
    ) + ext
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(a))
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_parses_untrusted
def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE container; returns ``(sample_rate, n_channels,
    samples)`` shaped ``(n_frames, n_channels)`` — uint8 for 8-bit PCM,
    int16 for 16-bit PCM and G.711 mu-law/A-law, int32 for 24/32-bit
    PCM.  WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its
    SubFormat GUID (how real-world 24-bit files are usually tagged).
    Compressed encodings raise ``NotImplementedError`` (they need real
    codec libraries)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    fmt_body = b""
    data = None
    n_fact = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if len(body) < 26:
                    raise ValueError("WAV: truncated extensible fmt")
                # real format = first two bytes of the SubFormat GUID
                fmt = (struct.unpack_from("<H", body, 24)[0],) + fmt[1:]
        elif cid == b"fact":
            n_fact = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format == 0x02:  # MS-ADPCM (r10)
        if bits != 4 or not 1 <= n_channels <= 2:
            raise NotImplementedError(
                "MS-ADPCM: only mono/stereo 4-bit supported"
            )
        block_align = _ba
        spb = (
            struct.unpack_from("<H", fmt_body, 18)[0]
            if len(fmt_body) >= 20
            else (block_align - 7 * n_channels) * 2 // n_channels + 2
        )
        chunks = [
            ms_adpcm_decode_block(
                data[i : i + block_align], spb, n_channels
            )
            for i in range(0, len(data) // block_align * block_align,
                           block_align)
        ]
        arr = (
            np.concatenate(chunks)
            if chunks
            else np.empty((0, n_channels), dtype=np.int64)
        ).astype(np.int16)
        if n_fact is not None:
            arr = arr[:n_fact]
        return sample_rate, n_channels, arr
    if audio_format == 0x11:  # IMA/DVI ADPCM: real 4-bit compression
        if bits != 4 or not 1 <= n_channels <= 2:
            raise NotImplementedError(
                "IMA ADPCM: only mono/stereo 4-bit supported"
            )
        block_align = _ba
        spb = (
            struct.unpack_from("<H", fmt_body, 18)[0]
            if len(fmt_body) >= 20
            else (block_align - 4 * n_channels) * 2 // n_channels + 1
        )
        chunks = [
            ima_adpcm_decode_block(
                data[i : i + block_align], spb, n_channels
            )
            for i in range(0, len(data) // block_align * block_align,
                           block_align)
        ]
        arr = (
            np.concatenate(chunks)
            if chunks
            else np.empty((0, n_channels), dtype=np.int16)
        )
        if n_fact is not None:
            arr = arr[:n_fact]
        return sample_rate, n_channels, arr
    if audio_format in (6, 7):  # G.711: telephony's 8-bit log PCM
        if bits != 8:
            raise NotImplementedError(f"{bits}-bit G.711 not supported")
        table = _ALAW_TABLE if audio_format == 6 else _MULAW_TABLE
        arr = table[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 3:  # IEEE float (r10): ubiquitous in
        # production audio; lossless container round trip, returned as
        # float32/float64 (the one non-integer sample dtype)
        if bits == 32:
            arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4")
        elif bits == 64:
            arr = np.frombuffer(data[: len(data) // 8 * 8], dtype="<f8")
        else:
            raise NotImplementedError(f"{bits}-bit float WAV")
    elif audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} is not PCM; compressed "
            "audio needs real codec libraries"
        )
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
        b = b.reshape(-1, 3).astype(np.int32)
        arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr -= (arr & 0x800000) << 1  # sign-extend bit 23
    elif bits == 32:
        arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    n_frames = arr.size // n_channels
    return sample_rate, n_channels, arr[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


def write_wav(
    samples: np.ndarray, sample_rate: int = 8000, bits: int | None = None
) -> bytes:
    """Minimal PCM WAV writer (fixture builder).  ``samples`` is uint8
    (8-bit), int16 (16-bit) or int32 (32-bit, or 24-bit packed when
    ``bits=24``), 1-D mono or ``(frames, channels)``."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.dtype in (np.float32, np.float64):  # format 3 (r10)
        bits = a.dtype.itemsize * 8
        data = a.astype(f"<f{a.dtype.itemsize}").tobytes()
        nch = a.shape[1]
        block = nch * bits // 8
        fmt = struct.pack(
            "<HHIIHHH", 3, nch, sample_rate,
            sample_rate * block, block, bits, 0,
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"fact" + struct.pack("<II", 4, len(a))
        body += b"data" + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
    if a.dtype == np.uint8:
        bits, data = 8, a.astype(np.uint8).tobytes()
    elif a.dtype in (np.int16, np.dtype("<i2")):
        bits, data = 16, a.astype("<i2").tobytes()
    elif a.dtype in (np.int32, np.dtype("<i4")) and bits == 24:
        flat = a.astype("<i4").reshape(-1)
        if flat.size and (
            int(flat.max()) >= 1 << 23 or int(flat.min()) < -(1 << 23)
        ):
            raise ValueError("24-bit WAV samples exceed 24 bits")
        le = flat.view(np.uint8).reshape(-1, 4)
        data = le[:, :3].tobytes()  # drop each little-endian high byte
    elif a.dtype in (np.int32, np.dtype("<i4")):
        bits, data = 32, a.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    nch = a.shape[1]
    block = nch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _f80_encode(rate: int) -> bytes:
    """80-bit IEEE 754 extended float (the AIFF sampleRate field):
    sign + 15-bit exponent (bias 16383) + 64-bit mantissa with an
    EXPLICIT leading 1."""
    if rate <= 0:
        raise ValueError("AIFF: sample rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">H", 16383 + e) + struct.pack(">Q", mant)


def _f80_decode(raw: bytes) -> int:
    if len(raw) != 10:
        raise ValueError("AIFF: sampleRate field must be 10 bytes")
    se = struct.unpack(">H", raw[:2])[0]
    mant = struct.unpack(">Q", raw[2:])[0]
    if se & 0x8000:
        raise ValueError("AIFF: negative sample rate")
    e = se - 16383
    if not -64 <= e <= 63 or mant == 0:
        raise ValueError("AIFF: sample rate out of range")
    shift = 63 - e
    if shift < 0:
        return mant << (-shift)
    if shift > 63:
        return 0
    return mant >> shift


def write_aiff(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal AIFF writer (fixture builder): IFF ``FORM``/``AIFF``
    with a COMM chunk (channels, frames, 16-bit, 80-bit extended-float
    sample rate) and an SSND chunk of big-endian int16 PCM.
    ``samples`` is 1-D mono or ``(frames, channels)`` int16."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.dtype not in (np.int16, np.dtype(">i2"), np.dtype("<i2")):
        raise ValueError("AIFF: only 16-bit samples supported")
    frames, nch = a.shape
    comm = (
        struct.pack(">hIh", nch, frames, 16) + _f80_encode(sample_rate)
    )
    data = a.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    if len(ssnd) & 1:
        body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body


def parse_aiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an AIFF file → ``(sample_rate, n_channels, samples
    (frames, ch) int64)``.  16-bit PCM only (AIFF-C compression and
    other depths raise NotImplementedError); loud ``ValueError`` on
    malformed IFF structure, per the fuzz contract."""
    if len(payload) < 12:
        raise ValueError("AIFF: truncated FORM header")
    if payload[:4] != b"FORM":
        raise ValueError("AIFF: missing FORM magic")
    form_len = struct.unpack(">I", payload[4:8])[0]
    if 8 + form_len > len(payload):
        raise ValueError("AIFF: FORM size exceeds payload")
    form_type = payload[8:12]
    if form_type == b"AIFC":
        raise NotImplementedError("AIFF: AIFF-C compression")
    if form_type != b"AIFF":
        raise ValueError(f"AIFF: not an AIFF form ({form_type!r})")
    end = 8 + form_len
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        clen = struct.unpack(">I", payload[pos + 4 : pos + 8])[0]
        body_at = pos + 8
        if body_at + clen > end:
            raise ValueError(f"AIFF: {cid!r} chunk exceeds form")
        if cid == b"COMM":
            comm = payload[body_at : body_at + clen]
        elif cid == b"SSND":
            ssnd = payload[body_at : body_at + clen]
        pos = body_at + clen + (clen & 1)
    if comm is None or len(comm) < 18:
        raise ValueError("AIFF: missing/short COMM chunk")
    if ssnd is None or len(ssnd) < 8:
        raise ValueError("AIFF: missing/short SSND chunk")
    nch, frames, bits = struct.unpack(">hIh", comm[:8])
    rate = _f80_decode(comm[8:18])
    if nch < 1:
        raise ValueError("AIFF: bad channel count")
    if bits != 16:
        raise NotImplementedError(f"AIFF: {bits}-bit samples")
    offset, _blk = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + offset :]
    need = frames * nch * 2
    if len(data) < need:
        raise ValueError("AIFF: SSND data shorter than COMM frames")
    samples = (
        np.frombuffer(data[:need], dtype=">i2")
        .astype(np.int64)
        .reshape(frames, nch)
    )
    return rate, nch, samples


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 8-bit palette / 24-bit BGR)
# --------------------------------------------------------------------------


def _bmp_rle8_decode(
    data: bytes, width: int, height: int
) -> "np.ndarray":
    """BI_RLE8: (count, value) runs; escape 0 -> end-of-line, 1 ->
    end-of-bitmap, 2 -> (dx, dy) delta, n>=3 -> n absolute bytes
    (word-aligned).  Rows are stored bottom-up like uncompressed BMPs;
    unreached pixels stay 0 per the format's skip semantics."""
    out = np.zeros((height, width), dtype=np.uint8)
    x = y = 0
    pos = 0
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n:
            run = min(n, width - x)
            out[y, x : x + run] = v
            x += run
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= height:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta skip
            if pos + 1 >= len(data):  # truncated (dx, dy) operands
                raise ValueError("BI_RLE8 truncated")
            x = min(width, x + data[pos])
            y = min(height - 1, y + data[pos + 1])
            pos += 2
        else:  # absolute mode: v literal bytes, padded to word
            take = min(v, width - x)
            if pos + take > len(data):
                raise ValueError("BI_RLE8 truncated")
            out[y, x : x + take] = np.frombuffer(
                data, np.uint8, count=take, offset=pos
            )
            x += take
            pos += v + (v & 1)
    return out[::-1]  # stored bottom-up


@_parses_untrusted
def parse_bmp(payload: bytes) -> np.ndarray:
    """Parse a BMP; returns uint8 pixels shaped ``(height, width, 3)``
    in RGB order — 24-bit BGR, 32-bit BGRX (alpha dropped), 16-bit
    X1R5G5B5 (5-bit channels replicated to 8-bit), 8-bit palette, and
    BI_RLE8 runs (runs / absolute mode / EOL / EOD / delta skips).
    Other compressions raise ``NotImplementedError``."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bits = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression == 1:  # BI_RLE8
        if bits != 8 or height < 0:
            raise ValueError("BI_RLE8 requires bottom-up 8-bit data")
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]
        idx = _bmp_rle8_decode(payload[data_off:], width, height)
        return np.ascontiguousarray(pal[idx])
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} needs real codec libraries"
        )
    flip = height > 0  # positive height = bottom-up rows
    height = abs(height)
    row_bytes = (width * bits // 8 + 3) // 4 * 4
    if bits == 24:
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        rgb = bgr[:, :, ::-1]
    elif bits == 32:
        # BGRX / BGRA rows (already 4-aligned); alpha/pad byte dropped
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, width, 4)
        rgb = rows[:, :, 2::-1]
    elif bits == 16:
        # BI_RGB 16-bit is 5-5-5 (X1R5G5B5), little-endian; scaled to
        # 8-bit by the standard (v << 3) | (v >> 2) replication
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)[:, : width * 2]
        v = rows.reshape(height, width, 2).astype(np.uint16)
        pix = v[:, :, 0] | (v[:, :, 1] << 8)
        r5 = (pix >> 10) & 0x1F
        g5 = (pix >> 5) & 0x1F
        b5 = pix & 0x1F
        rgb = np.stack(
            [(c << 3) | (c >> 2) for c in (r5, g5, b5)], axis=-1
        ).astype(np.uint8)
    elif bits == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRA entries -> RGB
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
        ).reshape(height, row_bytes)
        rgb = pal[rows[:, :width]]
    else:
        raise NotImplementedError(f"{bits}-bit BMP not supported")
    return np.ascontiguousarray(rgb[::-1] if flip else rgb)


def write_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (fixture builder).
    ``pixels`` is uint8 ``(height, width)`` grayscale or
    ``(height, width, 3)`` RGB; rows stored bottom-up, 4-byte padded."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + dib + data


# --------------------------------------------------------------------------
# PNG (8-bit, non-interlaced; gray / gray+alpha / RGB / RGBA / palette)
# --------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass geometry: (row_start, row_step, col_start, col_step)
_ADAM7 = (
    (0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
    (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1),
)


def _png_defilter(raw: bytes, h: int, stride: int, ch: int) -> np.ndarray:
    """Undo the five PNG scanline filters over ``h`` rows of
    ``stride`` bytes (1 filter byte + stride data bytes per row)."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    return out


@_parses_untrusted
def parse_png(payload: bytes) -> np.ndarray:
    """Parse a PNG; returns pixels ``(height, width, channels)`` —
    uint8 for depth ≤ 8 (sub-byte rows unpacked big-endian-first, raw
    sample values), uint16 for 16-bit (network byte order), palette
    entries expanded to RGB.  All five scanline filters
    (None/Sub/Up/Average/Paeth) are undone at the spec's bpp offset;
    ADAM7 INTERLACING decodes for real (seven independently-filtered
    sub-images scattered back on the pass grid)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1):
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} not supported"
        )
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    if depth < 8 and color not in (0, 3):
        raise ValueError("PNG sub-byte depth is gray/palette-only")
    ch = _PNG_CHANNELS[color]
    bpp = max(1, depth * ch // 8)  # filter offset: bytes per pixel

    def unpack(rows: np.ndarray, pw: int) -> np.ndarray:
        """(ph, stride) filtered bytes -> (ph, pw, ch) samples."""
        ph = rows.shape[0]
        if depth == 8:
            return rows.reshape(ph, pw, ch)
        if depth == 16:
            u16 = rows.reshape(ph, pw * ch, 2).astype(np.uint16)
            return ((u16[:, :, 0] << 8) | u16[:, :, 1]).reshape(
                ph, pw, ch
            )
        bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        return (
            (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
        ).astype(np.uint8)[:, :, None]

    def stride_of(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        px = unpack(_png_defilter(raw, h, stride_of(w), bpp), w)
    else:
        px = np.zeros(
            (h, w, ch), dtype=np.uint16 if depth == 16 else np.uint8
        )
        off = 0
        for r0, rs, c0, cs in _ADAM7:
            ph = len(range(r0, h, rs))
            pw = len(range(c0, w, cs))
            if ph == 0 or pw == 0:
                continue  # empty pass contributes no bytes
            seg = ph * (stride_of(pw) + 1)
            sub = unpack(
                _png_defilter(raw[off : off + seg], ph, stride_of(pw), bpp),
                pw,
            )
            off += seg
            px[r0::rs, c0::cs] = sub
        if off != len(raw):
            raise ValueError("PNG data length mismatch")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    return np.ascontiguousarray(px)


def _png_filter_lines(
    flat: np.ndarray, ch: int, filter_mode: str
) -> bytes:
    """Serialize rows of a (sub-)image with PNG scanline filters:
    filter 0 everywhere, or rows cycling through 0..4."""
    h, stride = flat.shape
    flat = flat.astype(np.int16)
    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        ft = 0 if filter_mode == "none" else y % 5
        left = np.zeros(stride, dtype=np.int16)
        left[ch:] = cur[:-ch]
        ul = np.zeros(stride, dtype=np.int16)
        ul[ch:] = prev[:-ch]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            enc = cur.copy()
            for i in range(stride):
                enc[i] = cur[i] - _paeth(int(left[i]), int(prev[i]), int(ul[i]))
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def write_png(
    pixels: np.ndarray,
    filter_mode: str = "cycle",
    level: int = 6,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Minimal PNG writer.  ``pixels`` is uint8 ``(h, w)`` gray or
    ``(h, w, c)`` with c ∈ {1,2,3,4} (``depth=8``); with
    ``depth ∈ {1,2,4}`` a gray ``(h, w)`` of values < 2^depth packed
    big-endian-first; with ``depth=16`` any channel count of uint16
    stored network order.  ``filter_mode``: ``"none"`` = filter 0
    every row; ``"cycle"`` = rows cycle through filters 0..4, so a
    reader must undo all five (the fixture-builder's job).
    ``interlace=True`` stores the seven ADAM7 sub-images, each
    independently filtered."""
    a = np.asarray(pixels, dtype=np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if depth in (1, 2, 4):
        if ch != 1:
            raise ValueError("sub-byte PNG depth is grayscale-only")
        if a.size and int(a.max()) >= 1 << depth:
            raise ValueError(f"samples exceed {depth}-bit depth")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = max(1, depth * ch // 8)

    def rows_of(sub: np.ndarray) -> np.ndarray:
        """(ph, pw, ch) samples -> (ph, stride) row bytes."""
        ph, pw, _c = sub.shape
        if depth == 8:
            return sub.reshape(ph, pw * ch)
        if depth == 16:
            be = sub.reshape(ph, pw * ch).astype(">u2")
            return be.view(np.uint8).reshape(ph, pw * ch * 2)
        bits = (
            (sub.reshape(ph, pw, 1) >> np.arange(depth - 1, -1, -1)) & 1
        ).astype(np.uint8)
        return np.packbits(bits.reshape(ph, pw * depth), axis=1)

    if interlace:
        body = b""
        for r0, rs, c0, cs in _ADAM7:
            sub = a[r0::rs, c0::cs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _png_filter_lines(rows_of(sub), bpp, filter_mode)
    else:
        body = _png_filter_lines(rows_of(a), bpp, filter_mode)
    comp = zlib.compress(body, level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, widths grow to 12 bits, codes packed
    LSB-first.  Handles the KwK case (code == next table slot)."""
    if not 2 <= min_code_size <= 11:
        # widths max out at 12 bits, so a root size past 11 (or below
        # the spec floor of 2) is corrupt — and a huge value would
        # make the 2^size root table allocation a hang (r10 fuzz)
        raise ValueError(
            f"corrupt LZW stream (min code size {min_code_size})"
        )
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:  # KwK
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        if prev is not None:
            # next assignable code = len(table) + 2 (CLEAR/EOI reserved)
            table[len(table) + 2] = prev + [entry[0]]
            # width grows when the next code to assign would not fit
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def _gif_interlace_rows(h: int) -> list[int]:
    """GIF interlace storage order: pass 1 rows 0,8,…; pass 2 rows
    4,12,…; pass 3 rows 2,6,…; pass 4 rows 1,3,… (GIF89a Appendix E)."""
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


@_parses_untrusted
def parse_gif(payload: bytes) -> np.ndarray:
    """Decode a GIF87a/89a first frame to uint8 RGB (h, w, 3): logical
    screen + global color table, extensions skipped, LZW-decompressed
    indices mapped through the palette.  INTERLACED images (four-pass
    row order) and LOCAL color tables (per-image palettes overriding
    the global one) decode for real."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF container")
    w0, h0, flags = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        palette = palette.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x80:  # local color table overrides global
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            arr = np.asarray(idx, dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in pass order
                out = np.empty_like(arr)
                out[_gif_interlace_rows(ih)] = arr
                arr = out
            return palette[arr].astype(np.uint8)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


@_parses_untrusted
def parse_gif_frames(
    payload: bytes,
) -> list[tuple[int, "np.ndarray"]]:
    """Decode an ANIMATED GIF: every image block composed onto the
    logical-screen canvas per its Graphic Control Extension — delay
    (centiseconds), disposal (1 leave / 2 restore-background /
    3 restore-previous), transparent index (those pixels keep the
    canvas) — returning ``[(delay_cs, canvas_rgb_uint8), ...]``, one
    entry per displayed frame.  Sub-rectangle frames, local color
    tables and interlacing all compose correctly."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF container")
    w0, h0, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    # Compose in RGB (ADVICE r7): each frame's indices map through its
    # OWN palette before landing on the canvas, so leftover pixels from
    # earlier frames keep their original colors when a later frame
    # carries a different local color table.
    canvas = np.zeros((h0, w0, 3), dtype=np.uint8)
    if gpal is not None and bg >= gpal.shape[0]:
        # malformed background index (ADVICE r8): fall back to black
        # rather than letting numpy raise a raw IndexError
        bg_rgb = np.zeros(3, np.uint8)
    else:
        bg_rgb = gpal[bg] if gpal is not None else np.zeros(3, np.uint8)
    canvas[:] = bg_rgb
    frames: list[tuple[int, np.ndarray]] = []
    delay, disposal, t_idx = 0, 0, None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                sz = payload[pos]
                gflags = payload[pos + 1]
                delay = struct.unpack_from("<H", payload, pos + 2)[0]
                t_idx = payload[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 1 + sz
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            x, y, iw, ih, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            pal = gpal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            arr = np.asarray(idx, dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:
                out = np.empty_like(arr)
                out[_gif_interlace_rows(ih)] = arr
                arr = out
            if int(arr.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF pixel index exceeds color table")
            before = canvas.copy()
            region = canvas[y : y + ih, x : x + iw]
            rgb = pal[arr]  # this frame through ITS palette
            if t_idx is None:
                region[:] = rgb
            else:
                keep = (arr == t_idx)[:, :, None]
                region[:] = np.where(keep, region, rgb)
            frames.append((delay, canvas.copy()))
            if disposal == 2:  # restore background over the region
                canvas[y : y + ih, x : x + iw] = bg_rgb
            elif disposal == 3:  # restore previous canvas
                canvas = before
            delay, disposal, t_idx = 0, 0, None
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def write_gif_anim(
    frames: list["np.ndarray"],
    palette: np.ndarray,
    delays_cs: list[int],
    rects: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    disposal: int = 1,
    transparent: int | None = None,
    local_palettes: list["np.ndarray"] | None = None,
) -> bytes:
    """Minimal animated GIF89a writer: one image block per frame, each
    preceded by a Graphic Control Extension carrying its delay,
    ``disposal`` mode and optional ``transparent`` index.  ``rects``
    places each frame's top-left on the logical screen (sub-rectangle
    updates); ``screen`` sizes the canvas (defaults to frame 0).
    ``local_palettes`` gives each frame its own local color table
    (the global ``palette`` then only supplies the background)."""
    pal = np.asarray(palette, dtype=np.uint8)
    n = pal.shape[0]
    bits = max(1, (n - 1).bit_length())
    if n != (1 << bits):
        raise ValueError("palette size must be a power of two")
    h0, w0 = screen or frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w0, h0, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for fi, frame in enumerate(frames):
        idx = np.asarray(frame, dtype=np.uint8)
        h, w = idx.shape
        x, y = (rects[fi] if rects else (0, 0))
        gflags = (disposal & 0x07) << 2
        t = 0
        if transparent is not None:
            gflags |= 0x01
            t = transparent
        out += bytes([0x21, 0xF9, 4, gflags])
        out += struct.pack("<H", delays_cs[fi])
        out += bytes([t, 0])
        iflags, lbits, lpal = 0, bits, None
        if local_palettes is not None:
            lpal = np.asarray(local_palettes[fi], dtype=np.uint8)
            ln = lpal.shape[0]
            lbits = max(1, (ln - 1).bit_length())
            if ln != (1 << lbits):
                raise ValueError("palette size must be a power of two")
            iflags = 0x80 | (lbits - 1)
        out += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, iflags)
        if lpal is not None:
            out += lpal.tobytes()
        mcs = max(2, lbits)
        out += bytes([mcs])
        data = _lzw_encode([int(v) for v in idx.reshape(-1)], mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (fixture half): CLEAR first, table resets
    at 4096 entries, codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []
    width = min_code_size + 1

    def emit(code: int):
        nonlocal width
        for i in range(width):
            out_bits.append((code >> i) & 1)

    def fresh():
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    emit(clear)
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (sym,)
    if buf:
        emit(table[buf])
    emit(eoi)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def write_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """Minimal GIF89a writer (fixture builder): ``indices`` (h, w)
    uint8 into ``palette`` (n, 3) uint8 with n a power of two >= 2.
    ``interlace`` stores rows in the four-pass order;
    ``local_palette`` moves the color table into the image descriptor
    (no global table) — both real decoder paths."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = pal.shape[0]
    bits = max(1, (n - 1).bit_length())
    if n != (1 << bits):
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    if local_palette:
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    else:
        out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        out += pal.tobytes()
    iflags = (0x40 if interlace else 0) | (
        0x80 | (bits - 1) if local_palette else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_palette:
        out += pal.tobytes()
    if interlace:
        idx = idx[_gif_interlace_rows(h)]
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode([int(x) for x in idx.ravel()], min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# JPEG (baseline sequential JFIF, ITU-T T.81)
# --------------------------------------------------------------------------
#
# Pure-Python baseline JPEG: Huffman entropy coding + an 8×8 DCT done in
# FIXED-POINT INTEGER arithmetic end-to-end.  The integer transform is
# deliberate: every step (DCT, quantize, dequantize, IDCT, clamp) is
# exact integer math with one explicit rounding rule, so an independent
# implementation (the DuckDB oracle in queries/media.py::_mm_jpeg_sql)
# can reproduce decode(encode(x)) bit-for-bit — the property the octet-
# exact mm_* parity checks are built on.  A float DCT would round-trip
# "almost always", which is exactly the kind of correctness a value-hash
# gate exists to reject.
#
# Scope: baseline DCT (SOF0) AND progressive DCT (SOF2, Huffman —
# spectral selection + successive approximation, r10), 8-bit, 1 or 3
# components, 4:4:4 or 4:2:0 sampling, restart markers (DRI + RSTn),
# in-stream DQT/DHT.  Quantization uses the standard Annex-K tables
# scaled by the public libjpeg quality formula.  Arithmetic coding,
# hierarchical and lossless modes raise loudly.

_DCT_BITS = 12  # transform fixed point: T = round(4096 * orthonormal DCT-II)


def _dct_matrix_int() -> np.ndarray:
    m = np.zeros((8, 8), dtype=np.int64)
    for u in range(8):
        s = (1.0 / 8.0) ** 0.5 if u == 0 else 0.5
        for x in range(8):
            m[u, x] = round(
                s * np.cos((2 * x + 1) * u * np.pi / 16.0) * (1 << _DCT_BITS)
            )
    return m


_DCT_T = _dct_matrix_int()

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Table K.1 (luminance) / K.2 (chrominance), natural order
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# ITU-T T.81 Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _rdiv(a, b):
    """Round-half-up integer division (symmetric rule shared by the
    whole pipeline AND the SQL oracle): floor((2a + b) / 2b), b > 0.
    NumPy int64 floor_divide == Python floor semantics."""
    return (2 * a + b) // (2 * b)


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shifted int block (8×8) -> quantized coefficients, natural
    order.  Two fixed-point passes with explicit rounding between them
    (the rounding IS the contract the oracle mirrors)."""
    a = _rdiv(block @ _DCT_T.T, 1 << _DCT_BITS)
    f = _rdiv(_DCT_T @ a, 1 << _DCT_BITS)
    return _rdiv_signed_by_table(f, q)


def _rdiv_signed_by_table(f: np.ndarray, q: np.ndarray) -> np.ndarray:
    return (2 * f + q) // (2 * q)


def _dequant_idct(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized coefficients (natural order) -> uint8 samples."""
    d = coef * q
    b = _rdiv(_DCT_T.T @ d, 1 << _DCT_BITS)
    p = _rdiv(b @ _DCT_T, 1 << _DCT_BITS) + 128
    return np.clip(p, 0, 255).astype(np.uint8)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block(
    w: _BitWriter, coef: np.ndarray, pred: int,
    dc: dict[int, tuple[int, int]], ac: dict[int, tuple[int, int]],
) -> int:
    zz = coef.ravel()[_ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _mag_bits(diff)
    w.put(*dc[size])
    if size:
        w.put(bits, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac[0xF0])  # ZRL
            run -= 16
        size, bits = _mag_bits(v)
        w.put(*ac[run * 16 + size])
        w.put(bits, size)
        run = 0
    if last_nz < 63:
        w.put(*ac[0x00])  # EOB
    return int(zz[0])


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public formula): 50 = tables as-is."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge"
    )


def _rgb_to_ycbcr_int(rgb: np.ndarray) -> np.ndarray:
    """JFIF color convert, fixed-point (coefficients × 65536) with the
    shared rounding rule — deterministic, like everything else here."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = _rdiv(19595 * r + 38470 * g + 7471 * b, 65536)
    cb = 128 + _rdiv(-11059 * r - 21709 * g + 32768 * b, 65536)
    cr = 128 + _rdiv(32768 * r - 27439 * g - 5329 * b, 65536)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255)


def _ycbcr_to_rgb_int(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    r = y + _rdiv(91881 * cr, 65536)
    g = y - _rdiv(22554 * cb + 46802 * cr, 65536)
    b = y + _rdiv(116130 * cb, 65536)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, m: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % m), (0, (-w) % m)), mode="edge")


def _jpeg_planes(
    px: np.ndarray, quality: int, subsampling: str
) -> list[tuple[np.ndarray, np.ndarray, int, int, int]]:
    """Shared component prep for the baseline and progressive writers:
    color convert, subsample, pad to the MCU grid.  Returns per
    component ``(plane int64, quant table, quant id, h_samp, v_samp)``."""
    gray = px.ndim == 2
    if not gray and px.shape[2] not in (3, 4):
        raise ValueError(
            "pixels must be (h, w) gray, (h, w, 3) RGB or (h, w, 4) "
            "4-component (CMYK-style, stored without color transform)"
        )
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    four = not gray and px.shape[2] == 4
    sub420 = subsampling == "420" and not gray and not four
    q_luma = _quality_table(_QUANT_LUMA, quality)
    q_chroma = _quality_table(_QUANT_CHROMA, quality)
    if gray:
        return [(_pad_to_8(px).astype(np.int64), q_luma, 0, 1, 1)]
    if four:  # r10: 4 components, identity color (Adobe transform 0)
        return [
            (_pad_to_8(px[..., ci]).astype(np.int64), q_luma, 0, 1, 1)
            for ci in range(4)
        ]
    if not sub420:
        ycc = _rgb_to_ycbcr_int(px)
        return [
            (
                _pad_to_8(ycc[..., ci].astype(np.int64)),
                q_luma if ci == 0 else q_chroma,
                0 if ci == 0 else 1,
                1,
                1,
            )
            for ci in range(3)
        ]
    ycc = _rgb_to_ycbcr_int(px)
    y16 = _pad_to(ycc[..., 0].astype(np.int64), 16)
    hh, ww = y16.shape
    chroma = []
    for ci in (1, 2):
        c16 = _pad_to(ycc[..., ci].astype(np.int64), 16)
        chroma.append(
            c16.reshape(hh // 2, 2, ww // 2, 2).sum(axis=(1, 3)) // 4
        )
    return [
        (y16, q_luma, 0, 2, 2),
        (chroma[0], q_chroma, 1, 1, 1),
        (chroma[1], q_chroma, 1, 1, 1),
    ]


def write_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline sequential JFIF writer: grayscale ``(h, w)`` or RGB
    ``(h, w, 3)`` uint8 in, standard Annex-K tables scaled by
    ``quality``.  Non-multiple-of-8 dimensions are edge-padded (the
    decoder crops back to the SOF dimensions, per spec).
    ``restart_interval > 0`` emits a DRI segment and RST0–RST7 markers
    every that many MCUs (byte-aligned, DC predictors reset) — the
    resync structure real MJPEG encoders emit.  ``subsampling`` is
    ``"444"`` (every component 1×1) or ``"420"`` (luma 2×2, chroma
    quarter-resolution by floor-mean — the dominant real-world form;
    MCU = four Y blocks + Cb + Cr over a 16×16 tile)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    planes = _jpeg_planes(px, quality, subsampling)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    # DQT: one table per quant id the planes actually reference
    for tid in sorted({p[2] for p in planes}):
        qt = next(p[1] for p in planes if p[2] == tid)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.ravel()[z]) for z in _ZIGZAG)
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_p, _q, tid, hi, vi) in enumerate(planes):
        out += struct.pack("BBB", ci + 1, (hi << 4) | vi, tid)
    # DHT: Annex-K luminance DC+AC, table id 0, used by every component
    for cls, (bits, vals) in ((0, _HUFF_DC_LUMA), (1, _HUFF_AC_LUMA)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (cls << 4) | 0
        ) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00)
    out += b"\x00\x3f\x00"  # Ss, Se, AhAl

    dc_tab = _huff_codes(*_HUFF_DC_LUMA)
    ac_tab = _huff_codes(*_HUFF_AC_LUMA)
    bw = _BitWriter()
    vmax = max(p[4] for p in planes)
    hmax = max(p[3] for p in planes)
    ph, pw = planes[0][0].shape
    mcus_y = ph // (8 * vmax)
    mcus_x = pw // (8 * hmax)
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # pad to byte boundary with 1-bits
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                preds = [0] * ncomp
            mcu += 1
            for ci, (plane, qt, _tid, hi, vi) in enumerate(planes):
                for byi in range(vi):
                    for bxi in range(hi):
                        r0 = (my * vi + byi) * 8
                        c0 = (mx * hi + bxi) * 8
                        blk = plane[r0 : r0 + 8, c0 : c0 + 8] - 128
                        coef = _fdct_quant(blk, qt)
                        preds[ci] = _encode_block(
                            bw, coef, preds[ci], dc_tab, ac_tab
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive JPEG (SOF2) writer ------------------------------------------
#
# Spectral selection + successive approximation per ITU-T T.81 Annex G
# (Huffman mode).  The quantized coefficients are IDENTICAL to the
# baseline writer's — progressive only changes their transmission
# order — so a progressive encode decodes bit-for-bit equal to the
# baseline encode of the same pixels (pinned in tests), and the
# mm_jpeg_* SQL oracles apply unchanged to progressive fixtures.


def _default_prog_scans(ncomp: int) -> list[tuple]:
    """The conventional progressive scan script (DC first with one
    approximation bit held back, luma AC split into two bands, chroma
    AC whole-band, then the refinement passes) — the same shape
    real-world encoders emit by default.  Scan = (comp indices, Ss,
    Se, Ah, Al)."""
    if ncomp == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    others = tuple(range(1, ncomp))
    all_c = tuple(range(ncomp))
    return (
        [(all_c, 0, 0, 0, 1)]
        + [((0,), 1, 5, 0, 2)]
        + [((c,), 1, 63, 0, 1) for c in others]
        + [((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1)]
        + [(all_c, 0, 0, 1, 0)]
        + [((c,), 1, 63, 1, 0) for c in others]
        + [((0,), 1, 63, 1, 0)]
    )


def _validate_scan_script(scans: list[tuple], ncomp: int) -> None:
    """Enforce the Annex-G sequencing rules AND completeness: every
    (component, coefficient) must be transmitted down to bit 0, DC
    before AC, refinements one bit at a time with Ah = previous Al.
    An incomplete script would 'work' but decode unequal to baseline —
    reject it loudly instead."""
    state: list[list] = [[None] * 64 for _ in range(ncomp)]
    for comps, ss, se, ah, al in scans:
        if not comps or len(set(comps)) != len(comps):
            raise ValueError("JPEG scan script: bad component list")
        if any(not 0 <= c < ncomp for c in comps):
            raise ValueError("JPEG scan script: component out of range")
        if not (0 <= ss <= se <= 63 and 0 <= al <= 13):
            raise ValueError("JPEG scan script: bad spectral band")
        if ss == 0 and se != 0:
            raise ValueError(
                "JPEG scan script: progressive DC scan requires Se=0"
            )
        if ss > 0 and len(comps) != 1:
            raise ValueError(
                "JPEG scan script: AC scans must be single-component"
            )
        if ah != 0 and al != ah - 1:
            raise ValueError(
                "JPEG scan script: refinement must lower Al by exactly 1"
            )
        for c in comps:
            for k in range(ss, se + 1):
                want = None if ah == 0 else ah
                if state[c][k] != want:
                    raise ValueError(
                        "JPEG scan script: band/approximation sequence "
                        f"invalid at component {c} coefficient {k}"
                    )
                if ss > 0 and state[c][0] is None:
                    raise ValueError(
                        "JPEG scan script: AC before DC for component "
                        f"{c}"
                    )
                state[c][k] = al
    for c in range(ncomp):
        for k in range(64):
            if state[c][k] != 0:
                raise ValueError(
                    "JPEG scan script: incomplete (component "
                    f"{c} coefficient {k} never reaches bit 0)"
                )


class _ScanOps:
    """Per-scan op recorder: the scan body is generated once as
    (symbol / raw-bits / restart) ops, the Huffman table is then built
    from the symbols actually used, and the ops replay into the bit
    writer.  Progressive refinement symbols (EOBn, runs of 15)
    don't exist in the Annex-K tables, so every scan carries its own
    in-stream DHT — exactly what real progressive encoders do."""

    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.ops.append((0, s))
        self.syms.add(s)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append((1, v, n))

    def rst(self, n: int) -> None:
        self.ops.append((2, n))


def _uniform_huff(syms: set[int]) -> tuple[list[int], list[int]]:
    """Canonical DHT spec (BITS, HUFFVAL) assigning every used symbol
    the same code length L = bit_length(n): n < 2**L always holds, so
    the all-ones code stays unused as the spec requires.  Suboptimal
    size, trivially correct — fixture synthesis is not a codec race."""
    vals = sorted(syms)
    n = len(vals)
    length = max(n.bit_length(), 1)
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


class _ACFirstEnc:
    """AC first-scan (Ah=0) encoder state: EOB runs span blocks."""

    def __init__(self, ops: _ScanOps) -> None:
        self.ops = ops
        self.eobrun = 0

    def flush(self) -> None:
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self.ops.sym(nb << 4)
            self.ops.bits(self.eobrun - (1 << nb), nb)
            self.eobrun = 0

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (v if v >= 0 else -v) >> al
            if t == 0:
                run += 1
                continue
            self.flush()
            while run > 15:
                self.ops.sym(0xF0)
                run -= 16
            size, bits = _mag_bits(t if v >= 0 else -t)
            self.ops.sym((run << 4) | size)
            self.ops.bits(bits, size)
            run = 0
        if run:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()


class _ACRefineEnc:
    """AC refinement (Ah>0) encoder state: EOB runs carry the
    correction bits of the blocks they cover, emitted right after the
    EOBn code in decoder traversal order."""

    def __init__(self, ops: _ScanOps) -> None:
        self.ops = ops
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self.ops.sym(nb << 4)
            self.ops.bits(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.pending:
            self.ops.bits(b, 1)
        self.pending = []

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        band = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [(v if v >= 0 else -v) >> al for v in band]
        eobpos = -1
        for rel, t in enumerate(absv):
            if t == 1:
                eobpos = rel
        run = 0
        newbits: list[int] = []
        for rel, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and rel <= eobpos:
                self.flush()
                self.ops.sym(0xF0)
                run -= 16
                for b in newbits:
                    self.ops.bits(b, 1)
                newbits = []
            if t > 1:
                # history coefficient: one correction bit, decoder
                # reads it while advancing through the run
                newbits.append(t & 1)
                continue
            # newly significant this scan
            self.flush()
            self.ops.sym((run << 4) | 1)
            self.ops.bits(0 if band[rel] < 0 else 1, 1)
            for b in newbits:
                self.ops.bits(b, 1)
            newbits = []
            run = 0
        if run or newbits:
            self.eobrun += 1
            self.pending.extend(newbits)
            if self.eobrun == 0x7FFF or len(self.pending) > 937 * 8:
                self.flush()


def _scan_units(
    comp_idx,
    samp: list[tuple[int, int]],
    fh: int,
    fw: int,
    hmax: int,
    vmax: int,
    mcus_y: int,
    mcus_x: int,
) -> list[list[tuple[int, int, int]]]:
    """Restart-unit ("MCU") traversal of one scan, shared verbatim by
    the writer and the decoder: ns > 1 interleaves vi×hi blocks per
    component over the frame MCU grid; ns == 1 is non-interleaved —
    one block per unit over the COMPONENT's ceil-dims grid, which for
    subsampled frames is smaller than its slice of the MCU grid (the
    grid-squaring padding blocks are not coded, T.81 A.2.2)."""
    units: list[list[tuple[int, int, int]]] = []
    if len(comp_idx) == 1:
        ci = comp_idx[0]
        hi, vi = samp[ci]
        nb_y, nb_x = _comp_block_dims(fh, fw, hi, vi, hmax, vmax)
        for byi in range(nb_y):
            for bxi in range(nb_x):
                units.append([(ci, byi, bxi)])
        return units
    for my in range(mcus_y):
        for mx in range(mcus_x):
            unit = []
            for ci in comp_idx:
                hi, vi = samp[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        unit.append((ci, my * vi + byi, mx * hi + bxi))
            units.append(unit)
    return units


def _comp_block_dims(
    fh: int, fw: int, hi: int, vi: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """Non-interleaved block grid of one component (T.81 A.1.1 ceil
    rule): blocks over ceil(ceil(dim*samp/sampmax) / 8) — padding
    blocks that exist only to square out the interleaved MCU grid are
    NOT coded in single-component scans."""
    ch = -(-(fh * vi) // vmax)
    cw = -(-(fw * hi) // hmax)
    return -(-ch // 8), -(-cw // 8)


def write_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    scans: list[tuple] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JFIF writer (SOF2, Huffman): same pixel prep,
    fixed-point DCT, and quantization as ``write_jpeg`` — the scans
    re-order transmission, they never change the coefficients — with
    spectral selection, successive approximation (DC and AC first +
    refinement passes incl. EOB-run coding), per-scan in-stream DHTs,
    and optional restart markers.  ``scans`` overrides the default
    script with (comp_indices, Ss, Se, Ah, Al) tuples, validated for
    spec legality AND completeness."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    planes = _jpeg_planes(px, quality, subsampling)
    ncomp = len(planes)
    if scans is None:
        scans = _default_prog_scans(ncomp)
    _validate_scan_script(scans, ncomp)
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)

    # quantized coefficients, zigzag order, over the full MCU grid
    coefs = []
    for plane, qt, _tid, _hi, _vi in planes:
        ph, pw = plane.shape
        by, bx = ph // 8, pw // 8
        blocks = (
            plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128
        )
        a = _rdiv(blocks @ _DCT_T.T, 1 << _DCT_BITS)
        f = _rdiv(_DCT_T @ a, 1 << _DCT_BITS)
        q = _rdiv_signed_by_table(f, qt)
        coefs.append(q.reshape(-1, 64)[:, _ZIGZAG].reshape(by, bx, 64))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tid in sorted({p[2] for p in planes}):
        qt = next(p[1] for p in planes if p[2] == tid)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.ravel()[z]) for z in _ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_p, _q, tid, hi, vi) in enumerate(planes):
        out += struct.pack("BBB", ci + 1, (hi << 4) | vi, tid)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    samp = [(p[3], p[4]) for p in planes]
    for comp_idx, ss, se, ah, al in scans:
        ops = _ScanOps()
        units = _scan_units(
            comp_idx, samp, h, w, hmax, vmax, mcus_y, mcus_x
        )
        if ss == 0:  # DC scan (interleaved when ns > 1)
            preds = dict.fromkeys(comp_idx, 0)
            for mcu, unit in enumerate(units):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    preds = dict.fromkeys(comp_idx, 0)
                    ops.rst((mcu // restart_interval - 1) % 8)
                for ci, byi, bxi in unit:
                    dc = int(coefs[ci][byi, bxi, 0])
                    if ah == 0:
                        v = dc >> al  # arithmetic shift, per G.1.2.1
                        diff = v - preds[ci]
                        preds[ci] = v
                        size, bits = _mag_bits(diff)
                        ops.sym(size)
                        ops.bits(bits, size)
                    else:  # refinement: one raw bit, no Huffman
                        ops.bits((dc >> al) & 1, 1)
        else:  # AC scan — single component, non-interleaved
            ci = comp_idx[0]
            enc = _ACFirstEnc(ops) if ah == 0 else _ACRefineEnc(ops)
            for mcu, unit in enumerate(units):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    enc.flush()
                    ops.rst((mcu // restart_interval - 1) % 8)
                enc.block(coefs[ci][unit[0][1], unit[0][2]], ss, se, al)
            enc.flush()

        # per-scan DHT from the symbols this scan actually uses
        cls = 0 if ss == 0 else 1
        if ops.syms:
            bits16, vals = _uniform_huff(ops.syms)
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(vals), (cls << 4) | 0
            ) + bytes(bits16) + bytes(vals)
            codes = _huff_codes(bits16, vals)
        else:
            codes = {}
        ns = len(comp_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idx:
            out += struct.pack("BB", ci + 1, 0x00)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)
        bw = _BitWriter()
        for op in ops.ops:
            if op[0] == 0:
                bw.put(*codes[op[1]])
            elif op[0] == 1:
                bw.put(op[1], op[2])
            else:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + op[1]])
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def write_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
) -> bytes:
    """LOSSLESS JPEG writer (T.81 Annex H, SOF3) — the process DNG and
    DICOM archives use: no DCT, no quantization; each sample codes the
    difference from its Annex-H prediction with DC-class Huffman
    (category + appended bits).  Grayscale ``(h, w)`` or ``(h, w, 3)``
    input, uint8 (precision 8) or uint16 (precision 16, values must
    fit 16 bits); one interleaved scan, one Huffman table built
    uniform over the categories the image actually uses.
    ``point_transform`` divides samples by ``2^Pt`` before coding
    (the decoder re-multiplies, per spec — the round trip returns
    ``(px >> Pt) << Pt``)."""
    px = np.asarray(pixels)
    if px.dtype == np.uint8:
        prec = 8
    elif px.dtype == np.uint16:
        prec = 16
    else:
        raise ValueError("lossless JPEG: uint8 or uint16 input")
    if not 1 <= predictor <= 7:
        raise ValueError("lossless JPEG: predictor must be 1..7")
    if not 0 <= point_transform < prec:
        raise ValueError("lossless JPEG: bad point transform")
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("lossless JPEG: (h, w) or (h, w, 3) input")
    h, w, nc = px.shape
    pt = point_transform
    default = 1 << (prec - pt - 1)
    shifted = (px.astype(np.int64) >> pt) if pt else px.astype(np.int64)

    # pass 1: diffs per component (the plane itself is the shifted
    # input — prediction reads reconstructed == original samples)
    diffs: list[list[int]] = [[] for _ in range(nc)]
    for ci in range(nc):
        p = shifted[:, :, ci]
        d = diffs[ci]
        for y in range(h):
            for x in range(w):
                pred = _lossless_pred(p, y, x, predictor, default)
                d.append((int(p[y, x]) - pred) & 0xFFFF)
    # categories: represent each mod-2^16 diff as signed -32768..32767;
    # 32768 itself is the SSSS=16 no-extra-bits special case
    syms: set[int] = set()
    for d in diffs:
        for v in d:
            sv = v - 65536 if v > 32768 else v
            syms.add(16 if v == 32768 else abs(sv).bit_length())
    bits16, vals = _uniform_huff(syms)
    codes = _huff_codes(bits16, vals)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(
        ">HB", 19 + len(vals), 0x00
    ) + bytes(bits16) + bytes(vals)
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * nc, prec, h, w, nc
    )
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack("BB", ci + 1, 0x00)
    out += struct.pack("BBB", predictor, 0, pt)  # Ss, Se, AhAl

    bw = _BitWriter()
    for k in range(h * w):
        for ci in range(nc):
            v = diffs[ci][k]
            if v == 32768:
                bw.put(*codes[16])
                continue
            sv = v - 65536 if v > 32768 else v
            size, extra = _mag_bits(sv)
            bw.put(*codes[size])
            if size:
                bw.put(extra, size)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy reader over the scan bytes: byte-level destuffing
    (0xFF00 → 0xFF) happens in the byte-fill loop, bit extraction is
    integer shifts on a ≤31-bit window — the former per-bit Python loop
    was the decoder's dominant cost."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _ensure(self, k: int) -> None:
        d = self.data
        n = self._n
        acc = self._acc
        pos = self.pos
        ln = len(d)
        while n < k and pos < ln:
            b0 = d[pos]
            if b0 == 0xFF:
                nxt = d[pos + 1] if pos + 1 < ln else None
                if nxt != 0x00:
                    break  # a real marker (RSTn/EOI/...) ends the data
                pos += 2  # stuffed
            else:
                pos += 1
            acc = (acc << 8) | b0
            n += 8
        self._acc = acc
        self._n = n
        self.pos = pos

    def bits(self, nb: int) -> int:
        if self._n < nb:
            self._ensure(nb)
            if self._n < nb:
                raise ValueError("JPEG: entropy stream exhausted")
        self._n -= nb
        v = (self._acc >> self._n) & ((1 << nb) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def peek16(self) -> int:
        """The next 16 bits without consuming (1-padded past the end of
        the interval) — the Huffman LUT key."""
        if self._n < 16:
            self._ensure(16)
        n = self._n
        if n >= 16:
            return (self._acc >> (n - 16)) & 0xFFFF
        return ((self._acc << (16 - n)) | ((1 << (16 - n)) - 1)) & 0xFFFF

    def skip(self, nb: int) -> None:
        if self._n < nb:
            raise ValueError("JPEG: entropy stream exhausted")
        self._n -= nb
        self._acc &= (1 << self._n) - 1

    def restart(self) -> int:
        """Consume an RSTn marker at a restart-interval boundary:
        discard the padding bits (writers pad with 1-bits; any byte
        holding real bits was already consumed, stuffed pairs
        included), require 0xFFD0–0xFFD7, return n.  The caller resets
        DC predictors (F.2.2.5)."""
        self._acc = 0
        self._n = 0
        d, p = self.data, self.pos
        if not (p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("JPEG: expected restart marker")
        self.pos = p + 2
        return d[p + 1] & 0x07


_HUFF_LUT_CACHE: dict[tuple[bytes, bytes], list] = {}


def _huff_lut(bits: list[int], vals: list[int]) -> tuple[int, list]:
    """Canonical Huffman table -> ``(shift, lut)`` where ``lut`` is a
    2^maxlen-entry lookup keyed by the next ``maxlen`` bits
    (``lut[peek16 >> shift] = (symbol, code_length)``, None for
    invalid prefixes).  Sizing by the table's actual max code length
    matters for PROGRESSIVE streams (r10): per-scan DHTs differ per
    image (symbol sets follow the content), so the content-keyed
    cache never hits across images — a ~6-bit scan table now builds a
    64-entry lut, not 65536 (the +1600% mm_mkv_jpeg_pool regression
    the r10 bench caught).  The standard Annex-K tables still cache
    process-wide."""
    key = (bytes(bits), bytes(vals))
    hit = _HUFF_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    maxlen = max(
        (length for length in range(1, 17) if bits[length - 1]),
        default=1,
    )
    lut = [None] * (1 << maxlen)
    code = 0
    k = 0
    for length in range(1, maxlen + 1):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            k += 1
            lo = code << (maxlen - length)
            entry = (sym, length)
            lut[lo : lo + (1 << (maxlen - length))] = [entry] * (
                1 << (maxlen - length)
            )
            code += 1
        code <<= 1
    out = (16 - maxlen, lut)
    _HUFF_LUT_CACHE[key] = out
    return out


def _read_symbol(br: _BitReader, table: tuple[int, list]) -> int:
    shift, lut = table
    e = lut[br.peek16() >> shift]
    if e is None:
        raise ValueError("JPEG: invalid Huffman code")
    br.skip(e[1])
    return e[0]


def _htable(htables: dict, cls: int, tid: int) -> list:
    lut = htables.get((cls, tid))
    if lut is None:
        raise ValueError(
            f"JPEG: scan uses undefined {'DC' if cls == 0 else 'AC'} "
            f"Huffman table {tid}"
        )
    return lut


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _lossless_pred(
    p: np.ndarray, y: int, x: int, predictor: int, default: int
) -> int:
    """The T.81 Annex-H prediction for sample (y, x) over the
    reconstructed plane ``p``: the scan's first sample uses the
    midpoint default, the rest of the first line uses Ra, each later
    line starts from Rb, and interior samples use the selected
    predictor 1..7 (the ``/2`` forms are one-bit arithmetic shifts,
    per H.1.2.1)."""
    if y == 0:
        return default if x == 0 else int(p[0, x - 1])
    if x == 0:
        return int(p[y - 1, 0])
    ra = int(p[y, x - 1])
    rb = int(p[y - 1, x])
    rc = int(p[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


def _decode_lossless_scan(
    br: "_BitReader",
    tables: list,
    predictor: int,
    pt: int,
    prec: int,
    fh: int,
    fw: int,
) -> list[np.ndarray]:
    """One interleaved SOF3 scan: per raster position, one
    DC-class-coded difference per component (category + extend;
    SSSS=16 means diff=32768 with no appended bits, per H.2), added
    to the Annex-H prediction modulo 2^16."""
    planes = [np.zeros((fh, fw), np.int64) for _ in tables]
    default = 1 << (prec - pt - 1)
    for y in range(fh):
        for x in range(fw):
            for k, tab in enumerate(tables):
                size = _read_symbol(br, tab)
                if size == 16:
                    diff = 32768
                elif size:
                    diff = _extend(br.bits(size), size)
                else:
                    diff = 0
                if size > 16:
                    raise ValueError(
                        f"JPEG: bad lossless diff category {size}"
                    )
                p = planes[k]
                pred = _lossless_pred(p, y, x, predictor, default)
                p[y, x] = (pred + diff) & 0xFFFF
    return planes


def _entropy_end(payload: bytes, start: int) -> int:
    """Index of the first REAL marker (not a stuffed 0xFF00, not
    RST0–RST7) at or after ``start`` — the end of one scan's entropy
    data in a multi-scan (progressive) stream."""
    j = start
    n = len(payload)
    while j < n:
        j = payload.find(b"\xff", j)
        if j < 0 or j + 1 >= n:
            return n
        nxt = payload[j + 1]
        if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
            return j
        j += 2
    return n


def _decode_prog_scan(
    br: "_BitReader",
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    comps: list[tuple[int, int, int, int]],
    prog_coefs: list[np.ndarray],
    htables: dict,
    fh: int,
    fw: int,
    hmax: int,
    vmax: int,
    restart_interval: int,
) -> None:
    """Decode ONE progressive scan (T.81 Annex G, Huffman mode) into
    the per-component zigzag coefficient accumulators: DC first
    (interleaved DPCM of dc >> Al), DC refinement (raw bit Al), AC
    first (spectral band with EOB-run coding), AC refinement
    (correction bits + newly-significant placement inside EOB runs).
    Restart markers reset DC predictors AND the EOB run."""
    if not (0 <= ss <= se <= 63):
        raise ValueError("JPEG: bad progressive spectral band")
    if ss == 0 and se != 0:
        raise ValueError(
            "JPEG: progressive DC scan must have Se=0 (a baseline-style "
            "full-band scan under SOF2 is malformed)"
        )
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("JPEG: progressive AC scans must be single-component")
    comp_idx = [ci for ci, _dt, _at in scan_comps]
    samp = [(hi, vi) for _cid, _tq, hi, vi in comps]
    mcus_y = -(-fh // (8 * vmax))
    mcus_x = -(-fw // (8 * hmax))
    units = _scan_units(comp_idx, samp, fh, fw, hmax, vmax, mcus_y, mcus_x)
    tabs = {ci: (dt, at) for ci, dt, at in scan_comps}
    preds = dict.fromkeys(comp_idx, 0)
    eobrun = 0
    p1 = 1 << al
    for mcu, unit in enumerate(units):
        if restart_interval and mcu and mcu % restart_interval == 0:
            got = br.restart()
            want = (mcu // restart_interval - 1) % 8
            if got != want:
                raise ValueError(
                    f"JPEG: restart marker out of sequence "
                    f"(RST{got}, expected RST{want})"
                )
            preds = dict.fromkeys(comp_idx, 0)
            eobrun = 0
        for ci, byi, bxi in unit:
            zz = prog_coefs[ci][byi, bxi]
            if ss == 0:
                if ah == 0:
                    dc_lut = _htable(htables, 0, tabs[ci][0])
                    size = _read_symbol(br, dc_lut)
                    if size > 15:
                        raise ValueError("JPEG: DC category out of range")
                    diff = _extend(br.bits(size), size) if size else 0
                    preds[ci] += diff
                    zz[0] = preds[ci] << al
                else:
                    if br.bit():
                        zz[0] |= p1
                continue
            ac_lut = _htable(htables, 1, tabs[ci][1])
            if ah == 0:  # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _read_symbol(br, ac_lut)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC index overflow")
                    zz[k] = _extend(br.bits(s), s) << al
                    k += 1
                continue
            # AC refinement scan
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _read_symbol(br, ac_lut)
                    r, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # ZRL: r = 15 → skip 16 zero-history positions
                    elif s == 1:
                        newval = p1 if br.bit() else -p1
                    else:
                        raise ValueError(
                            "JPEG: invalid refinement symbol"
                        )
                    while k <= se:
                        cur = int(zz[k])
                        if cur:
                            if br.bit() and (abs(cur) & p1) == 0:
                                zz[k] = cur + (p1 if cur >= 0 else -p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError(
                                "JPEG: refinement run overflow"
                            )
                        zz[k] = newval
                    k += 1
            if eobrun:
                while k <= se:
                    cur = int(zz[k])
                    if cur and br.bit() and (abs(cur) & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else -p1)
                    k += 1
                eobrun -= 1


@_parses_untrusted
def parse_jpeg(payload: bytes) -> np.ndarray:
    """JFIF decode -> uint8 ``(h, w)`` grayscale or ``(h, w, 3)`` RGB.
    Supports baseline sequential (SOF0) AND progressive (SOF2, r10:
    spectral selection + successive approximation over multiple scans,
    DC/AC first + refinement passes with EOB-run coding), 1 or 3
    components at 4:4:4 or 4:2:0 sampling, and RESTART INTERVALS
    (DRI + RSTn resync with DC-predictor/EOB-run reset).  Arithmetic
    and hierarchical streams raise loudly (NotImplementedError), never
    decode wrongly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    progressive = False
    lossless = False
    frame_prec = 8
    prog_coefs: list[np.ndarray] | None = None
    comps: list[tuple[int, int]] = []  # (comp_id, quant_id) in SOF order
    while i < len(payload):
        if i + 2 > len(payload):
            raise ValueError("JPEG: truncated before marker")
        if payload[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if i + 2 > len(payload):
            raise ValueError("JPEG: truncated segment length")
        seglen = struct.unpack(">H", payload[i : i + 2])[0]
        if seglen < 2 or i + seglen > len(payload):
            raise ValueError("JPEG: segment overruns payload")
        seg = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq not in (0, 1):
                    raise ValueError(f"JPEG: bad DQT precision {pq}")
                step = 1 + pq  # r10: pq=1 = 16-bit big-endian entries
                if j + 1 + 64 * step > len(seg):
                    raise ValueError("JPEG: DQT overruns the segment")
                nat = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    o = j + 1 + k * step
                    nat[_ZIGZAG[k]] = (
                        seg[o]
                        if pq == 0
                        else (seg[o] << 8) | seg[o + 1]
                    )
                qtables[tq] = nat.reshape(8, 8)
                j += 1 + 64 * step
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                if len(bits) < 16 or j + 17 + n > len(seg):
                    raise ValueError(
                        "JPEG: DHT counts overrun the segment"
                    )
                vals = list(seg[j + 17 : j + 17 + n])
                htables[(cls, tid)] = _huff_lut(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC2, 0xC3):  # SOF0 / SOF2 / SOF3 lossless
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            if len(seg) < 6:
                raise ValueError("JPEG: truncated SOF segment")
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"JPEG: bad lossless precision {prec}"
                    )
            elif prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            if nc not in (1, 3, 4):
                raise NotImplementedError(
                    "JPEG: 1, 3 or 4 components only"
                )
            if 6 + 3 * nc > len(seg):
                raise ValueError("JPEG: SOF components overrun segment")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, tq, samp >> 4, samp & 0x0F))
            samps = [(hi, vi) for _cid, _tq, hi, vi in comps]
            if lossless:
                if not all(s == (1, 1) for s in samps):
                    raise NotImplementedError(
                        "JPEG: lossless supports 1x1 sampling only"
                    )
            elif not (
                all(s == (1, 1) for s in samps)
                or (nc == 3 and samps == [(2, 2), (1, 1), (1, 1)])
            ):
                raise NotImplementedError(
                    "JPEG: only 4:4:4 or 4:2:0 sampling supported"
                )
            frame = (fh, fw, nc)
            frame_prec = prec
        elif marker in (0xC1, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: only baseline (SOF0), progressive (SOF2) and "
                "lossless (SOF3) supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG: truncated DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_tabs = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs.append((cs, tt >> 4, tt & 0x0F))
            fh, fw, nc = frame
            if lossless:
                if ns != nc:
                    raise NotImplementedError(
                        "JPEG: non-interleaved lossless scans"
                    )
                ss, _se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                pt = ahal & 0x0F
                if not 1 <= ss <= 7:
                    raise ValueError(
                        f"JPEG: bad lossless predictor {ss}"
                    )
                if pt >= frame_prec:
                    raise ValueError("JPEG: point transform >= precision")
                if restart_interval:
                    raise NotImplementedError(
                        "JPEG: restart intervals in lossless mode"
                    )
                cid_to_idx = {c[0]: idx for idx, c in enumerate(comps)}
                order = []
                for cs, dt, _at in scan_tabs:
                    if cs not in cid_to_idx:
                        raise ValueError(
                            f"JPEG: scan references component {cs} "
                            "absent from SOF"
                        )
                    order.append(_htable(htables, 0, dt))
                planes = _decode_lossless_scan(
                    _BitReader(payload[i + seglen :]),
                    order, ss, pt, frame_prec, fh, fw,
                )
                dt_out = np.uint8 if frame_prec <= 8 else np.uint16
                outs = [
                    (p << pt).astype(dt_out) for p in planes
                ]
                if nc == 1:
                    return outs[0]
                if nc == 3:
                    return np.stack(outs, axis=2)
                raise NotImplementedError(
                    "JPEG: lossless supports 1 or 3 components"
                )
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                hmax = max(hi for _c, _t, hi, _v in comps)
                vmax = max(vi for _c, _t, _h, vi in comps)
                if prog_coefs is None:
                    mcus_y = -(-fh // (8 * vmax))
                    mcus_x = -(-fw // (8 * hmax))
                    prog_coefs = [
                        np.zeros(
                            (mcus_y * vi, mcus_x * hi, 64), dtype=np.int64
                        )
                        for _cid, _tq, hi, vi in comps
                    ]
                cid_to_idx = {c[0]: idx for idx, c in enumerate(comps)}
                for cs, _dt, _at in scan_tabs:
                    if cs not in cid_to_idx:
                        raise ValueError(
                            f"JPEG: scan references component {cs} "
                            "absent from SOF"
                        )
                scan_comps = [
                    (cid_to_idx[cs], dt, at) for cs, dt, at in scan_tabs
                ]
                data_end = _entropy_end(payload, i + seglen)
                _decode_prog_scan(
                    _BitReader(payload[i + seglen : data_end]),
                    scan_comps, ss, se, ah, al, comps, prog_coefs,
                    htables, fh, fw, hmax, vmax, restart_interval,
                )
                i = data_end
                continue
            hmax = max(hi for _c, _t, hi, _v in comps)
            vmax = max(vi for _c, _t, _h, vi in comps)
            mcus_y = -(-fh // (8 * vmax))
            mcus_x = -(-fw // (8 * hmax))
            out_planes = [
                np.zeros(
                    (mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.uint8
                )
                for _cid, _tq, hi, vi in comps
            ]
            br = _BitReader(payload[i + seglen :])
            preds = [0] * nc
            mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        got = br.restart()
                        want = (mcu // restart_interval - 1) % 8
                        if got != want:
                            raise ValueError(
                                f"JPEG: restart marker out of sequence "
                                f"(RST{got}, expected RST{want})"
                            )
                        preds = [0] * nc
                    mcu += 1
                    for ci in range(nc):
                        _cs, dct_id, act_id = scan_tabs[ci]
                        dc = _htable(htables, 0, dct_id)
                        ac = _htable(htables, 1, act_id)
                        _cid, tq, hi, vi = comps[ci]
                        for byi in range(vi):
                            for bxi in range(hi):
                                coef = np.zeros(64, dtype=np.int64)
                                size = _read_symbol(br, dc)
                                if size > 15:
                                    raise ValueError(
                                        "JPEG: DC category out of range"
                                    )
                                diff = (
                                    _extend(br.bits(size), size)
                                    if size
                                    else 0
                                )
                                preds[ci] += diff
                                coef[0] = preds[ci]
                                k = 1
                                while k < 64:
                                    sym = _read_symbol(br, ac)
                                    if sym == 0x00:  # EOB
                                        break
                                    if sym == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += sym >> 4
                                    if k > 63:
                                        raise ValueError(
                                            "JPEG: AC index overflow"
                                        )
                                    size = sym & 0x0F
                                    coef[k] = _extend(br.bits(size), size)
                                    k += 1
                                nat = np.zeros(64, dtype=np.int64)
                                nat[_ZIGZAG] = coef
                                q = qtables.get(tq)
                                if q is None:
                                    raise ValueError(
                                        f"JPEG: undefined quant table {tq}"
                                    )
                                r0 = (my * vi + byi) * 8
                                c0 = (mx * hi + bxi) * 8
                                out_planes[ci][
                                    r0 : r0 + 8, c0 : c0 + 8
                                ] = _dequant_idct(nat.reshape(8, 8), q)
            if nc == 1:
                return out_planes[0][:fh, :fw]
            full = []
            for (_cid, _tq, hi, vi), plane in zip(comps, out_planes):
                if hi != hmax or vi != vmax:
                    # chroma upsample by sample replication
                    plane = np.repeat(
                        np.repeat(plane, vmax // vi, axis=0),
                        hmax // hi,
                        axis=1,
                    )
                full.append(plane[:fh, :fw])
            if nc == 4:  # r10: 4-component — identity color, raw planes
                return np.stack(full, axis=-1)
            return _ycbcr_to_rgb_int(np.stack(full, axis=-1))
        i += seglen
    if progressive and prog_coefs is not None:
        # all scans accumulated: dezigzag, dequantize + IDCT every
        # block (batched matmuls), then the same crop/upsample/color
        # tail as baseline
        fh, fw, nc = frame
        hmax = max(hi for _c, _t, hi, _v in comps)
        vmax = max(vi for _c, _t, _h, vi in comps)
        out_planes = []
        for (cid, tq, hi, vi), zz in zip(comps, prog_coefs):
            by, bx = zz.shape[:2]
            nat = np.zeros((by * bx, 64), dtype=np.int64)
            nat[:, _ZIGZAG] = zz.reshape(-1, 64)
            if tq not in qtables:
                raise ValueError(f"JPEG: undefined quant table {tq}")
            d = (nat * qtables[tq].ravel()).reshape(-1, 8, 8)
            b = _rdiv(_DCT_T.T @ d, 1 << _DCT_BITS)
            p = _rdiv(b @ _DCT_T, 1 << _DCT_BITS) + 128
            p = np.clip(p, 0, 255).astype(np.uint8)
            out_planes.append(
                p.reshape(by, bx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(by * 8, bx * 8)
            )
        if nc == 1:
            return out_planes[0][:fh, :fw]
        full = []
        for (_cid, _tq, hi, vi), plane in zip(comps, out_planes):
            if hi != hmax or vi != vmax:
                plane = np.repeat(
                    np.repeat(plane, vmax // vi, axis=0),
                    hmax // hi,
                    axis=1,
                )
            full.append(plane[:fh, :fw])
        if nc == 4:  # identity color, raw planes (see baseline tail)
            return np.stack(full, axis=-1)
        return _ycbcr_to_rgb_int(np.stack(full, axis=-1))
    raise ValueError("JPEG: no scan data found")


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatched image decode: BMP, PNG, GIF, JPEG (baseline
    SOF0 and progressive SOF2) or TIFF (strips, both byte orders,
    none/PackBits/Deflate/LZW, predictor 2 — ``functions/tiff.py``) ->
    uint8 RGB-ish array (PNG alpha/gray channels preserved).  Other
    formats raise ``NotImplementedError``."""
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if payload[:8] == PNG_MAGIC:
        return parse_png(payload)
    if payload[:4] == b"GIF8":
        return parse_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return parse_jpeg(payload)
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        from .tiff import parse_tiff

        return parse_tiff(payload)
    raise NotImplementedError("unsupported image container")
