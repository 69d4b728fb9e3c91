"""Pure-Python FLAC codec (encode + decode), dependency-free.

Implements the FLAC format from the public specification (RFC 9639 /
xiph.org format docs), the same from-spec approach as the JPEG/PNG/GIF
codecs in ``functions/codecs.py``:

- encoder: STREAMINFO + fixed-blocksize frames; CONSTANT / VERBATIM /
  FIXED(0-4) / LPC (Levinson-Durbin, quantized coefficients) subframes
  chosen per channel by exact rice-cost comparison; rice residual
  coding with brute-force optimal parameter and partition order;
  wasted-bits detection; independent or mid/side stereo; CRC-8 /
  CRC-16 footers and the STREAMINFO MD5 of the unencoded samples.
- decoder: the full subset an encoder like the above or libFLAC's
  default levels emits — all subframe types incl. LPC, rice/rice2
  with escape partitions, wasted bits, left/right/mid-side stereo,
  UTF-8-style coded frame numbers, CRC and MD5 verification.

Because FLAC is lossless the DuckDB oracle for any query over decoded
samples can recompute from the pre-encode samples directly — the same
octet-exact oracle pattern as PNG/GIF (see ``queries/media.py``).

Reference parity note: the reference pipeline's only media container is
netCDF rasters (``/root/reference/asip_v2/archive.py:19``); this module
is SURVEY §2.11 multimodal surface, not reference parity.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tab = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab.append(r & mask)
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TAB[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TAB[(r >> 8) ^ b]
    return r


# ------------------------------------------------------------- bit IO


class _BitWriter:
    """MSB-first bit writer (FLAC has no byte stuffing)."""

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

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit.
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        return bytes(self._out)


class _BitReader:
    """MSB-first bit reader over a memoryview."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self._buf = buf
        self._pos = pos  # byte position
        self._bit = 0  # bits consumed in current byte

    def read(self, nbits: int) -> int:
        v = 0
        while nbits > 0:
            if self._pos >= len(self._buf):
                raise ValueError("FLAC: bitstream truncated")
            avail = 8 - self._bit
            take = min(avail, nbits)
            byte = self._buf[self._pos]
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self._bit += take
            nbits -= take
            if self._bit == 8:
                self._bit = 0
                self._pos += 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self._pos >= len(self._buf):
                raise ValueError("FLAC: bitstream truncated in unary")
            byte = self._buf[self._pos]
            rem = 8 - self._bit
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                self._bit = 0
                self._pos += 1
                continue
            lead = rem - chunk.bit_length()
            q += lead
            self._bit += lead + 1
            if self._bit == 8:
                self._bit = 0
                self._pos += 1
            return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._pos += 1

    def tell_bytes(self) -> int:
        return self._pos + (1 if self._bit else 0)


# ----------------------------------------------- coded (UTF-8-like) number


def _write_coded_number(bw: _BitWriter, n: int) -> None:
    """FLAC frame/sample number: UTF-8-style variable length, up to 36
    bits (7 bytes)."""
    if n < 0x80:
        bw.write(n, 8)
        return
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF if nbytes < 7 else 0xFE
            shift = 6 * (nbytes - 1)
            bw.write(lead | ((n >> shift) & ((1 << (7 - nbytes)) - 1)), 8)
            for i in range(nbytes - 2, -1, -1):
                bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("FLAC: coded number exceeds 36 bits")


def _read_coded_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(8):
        if not (b0 >> (7 - i)) & 1:
            nbytes = i
            break
    else:
        raise ValueError("FLAC: invalid coded number lead byte")
    if nbytes < 2:
        raise ValueError("FLAC: invalid coded number lead byte")
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ------------------------------------------------------------ STREAMINFO


def _streaminfo(
    block_size: int,
    min_frame: int,
    max_frame: int,
    sample_rate: int,
    channels: int,
    bps: int,
    total: int,
    md5: bytes,
) -> bytes:
    bw = _BitWriter()
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(min_frame, 24)
    bw.write(max_frame, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    body = bw.getvalue() + md5
    assert len(body) == 34
    return body


def parse_streaminfo(body: bytes) -> dict:
    """Decode a 34-byte STREAMINFO block body (also the CodecPrivate
    payload format Matroska's A_FLAC carries, after the fLaC magic +
    block header)."""
    if len(body) < 34:
        raise ValueError("FLAC: STREAMINFO must be 34 bytes")
    br = _BitReader(body)
    out = {
        "min_block": br.read(16),
        "max_block": br.read(16),
        "min_frame": br.read(24),
        "max_frame": br.read(24),
        "sample_rate": br.read(20),
        "channels": br.read(3) + 1,
        "bits_per_sample": br.read(5) + 1,
        "total_samples": br.read(36),
        "md5": body[18:34],
    }
    return out


# ------------------------------------------------------------- predictors

# Fixed predictor residual: order-k forward difference.
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coefficients(
    x: np.ndarray, order: int, precision: int
) -> tuple[list[int], int] | None:
    """Levinson-Durbin on the block autocorrelation, then quantize to
    ``precision``-bit integers with a common shift. Returns (qcoefs,
    shift) or None when the block is degenerate (zero autocorrelation
    or unstable)."""
    f = x.astype(np.float64)
    n = len(f)
    if n <= order:
        return None
    ac = np.array(
        [np.dot(f[: n - k], f[k:]) for k in range(order + 1)]
    )
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k = acc / err
        a[:i], a[i] = a[:i] - k * a[i - 1 :: -1][:i], k
        err *= 1.0 - k * k
        if err <= 0.0 or not np.isfinite(err):
            return None
    cmax = np.max(np.abs(a))
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    # shift so the largest coefficient uses the full precision
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return [int(v) for v in q], shift


def _lpc_residual(
    x: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    order = len(coefs)
    xx = x.astype(np.int64)
    pred = np.zeros(len(xx) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        pred += c * xx[order - 1 - j : len(xx) - 1 - j]
    return xx[order:] - (pred >> shift)


# ------------------------------------------------------------ rice coding


_RICE_PS = np.arange(15, dtype=np.int64)  # 4-bit params; 0b1111 = escape


def _rice_cost(res: np.ndarray, p: int) -> int:
    if len(res) == 0:
        return 0
    u = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(u >> p)) + len(res) * (p + 1)


def _best_rice(res: np.ndarray) -> tuple[int, int]:
    """Exact-optimal rice parameter in [0, 14]: (param, bits) — all 15
    candidates evaluated in one vectorized pass."""
    if len(res) == 0:
        return 0, 0
    u = (np.abs(res) << 1) - (res < 0)
    costs = (u[None, :] >> _RICE_PS[:, None]).sum(axis=1) + len(res) * (
        _RICE_PS + 1
    )
    p = int(costs.argmin())
    return p, int(costs[p])


def _plan_partitions(
    res: np.ndarray, order: int, block_size: int, max_po: int = 4
) -> tuple[int, list[int], int]:
    """Choose partition order + per-partition rice params by exact cost.
    Returns (po, params, total_bits incl. the 2+4 method/order header).

    Hierarchical, like libFLAC's precompute_partition_info_sums: the
    per-p shifted sums are computed ONCE per deepest-level chunk
    (``np.add.reduceat``) and every shallower order aggregates child
    sums — the naive per-(order, partition) rescan was the encoder's
    hot spot (measured 4.1 of 4.4 s of a 50-doc profile; 7.9 k
    ``_rice_cost`` calls per 300-byte document)."""
    # deepest feasible order (every shallower one divides if this does)
    po_hi = 0
    for po in range(max_po, 0, -1):
        if block_size % (1 << po) == 0 and (block_size >> po) > order:
            po_hi = po
            break
    u = (np.abs(res) << 1) - (res < 0)
    sh = u[None, :] >> _RICE_PS[:, None]  # (15, n)
    if po_hi == 0:
        costs = sh.sum(axis=1) + len(res) * (_RICE_PS + 1)
        p = int(costs.argmin())
        return 0, [p], int(costs[p]) + 2 + 4 + 4
    nch = 1 << po_hi
    ppart = block_size >> po_hi
    # chunk i covers samples [i*ppart, (i+1)*ppart) minus the warmup
    # (res starts at sample ``order``); starts strictly increase because
    # ppart > order at the deepest feasible level
    starts = np.maximum(np.arange(nch, dtype=np.int64) * ppart - order, 0)
    chunk = np.add.reduceat(sh, starts, axis=1)  # (15, nch)
    best = None
    for po in range(po_hi, -1, -1):
        if block_size % (1 << po):
            continue
        nparts = 1 << po
        s = chunk.reshape(15, nparts, nch // nparts).sum(axis=2)
        cnts = np.full(nparts, block_size >> po, dtype=np.int64)
        cnts[0] -= order
        costs = s + cnts[None, :] * (_RICE_PS[:, None] + 1)
        pbest = costs.argmin(axis=0)  # (nparts,)
        bits = (
            int(costs[pbest, np.arange(nparts)].sum()) + 2 + 4 + 4 * nparts
        )
        if best is None or bits < best[2]:
            best = (po, [int(x) for x in pbest], bits)
    assert best is not None
    return best


def _write_residual(
    bw: _BitWriter,
    res: np.ndarray,
    order: int,
    block_size: int,
    po: int,
    params: list[int],
) -> None:
    bw.write(0, 2)  # method 0: 4-bit rice params
    bw.write(po, 4)
    ppart = block_size >> po
    start = 0
    for p_i in range(1 << po):
        cnt = ppart - order if p_i == 0 else ppart
        prm = params[p_i]
        bw.write(prm, 4)
        part = res[start : start + cnt]
        u = (np.abs(part) << 1) - (part < 0)
        for v in u.tolist():
            bw.write_unary(v >> prm)
            bw.write(v & ((1 << prm) - 1), prm)
        start += cnt


def _read_residual(
    br: _BitReader, order: int, block_size: int
) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if block_size % (1 << po):
        raise ValueError("FLAC: partition order does not divide block")
    ppart = block_size >> po
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p_i in range(1 << po):
        cnt = ppart - order if p_i == 0 else ppart
        if cnt < 0:
            raise ValueError("FLAC: predictor order exceeds partition")
        prm = br.read(pbits)
        if prm == escape:
            raw = br.read(5)
            for i in range(cnt):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << prm) | br.read(prm)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += cnt
    return out


# -------------------------------------------------------------- subframes


def _wasted_bits(x: np.ndarray, bps: int) -> int:
    if not x.any():
        return 0
    k = 0
    v = np.bitwise_or.reduce(x.astype(np.int64))
    while k < bps - 1 and not (v >> k) & 1:
        k += 1
    return k


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = len(x)
    x = x.astype(np.int64)
    if n and np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
        return
    wb = _wasted_bits(x, bps)
    xs = x >> wb if wb else x
    ebps = bps - wb

    # candidate 1: best fixed predictor by exact rice cost
    best = None  # (bits, kind, payload)
    for order in range(0, 5):
        if n <= order:
            break
        res = _fixed_residual(xs, order)
        if len(res) and int(np.max(np.abs(res))) >= 1 << 40:
            continue
        po, params, rbits = _plan_partitions(res, order, n)
        bits = order * ebps + rbits
        if best is None or bits < best[0]:
            best = (bits, "fixed", (order, res, po, params))

    # candidate 2: LPC order 8 (or n-1), precision 12
    order = min(8, n - 1)
    if order >= 1:
        got = _lpc_coefficients(xs, order, 12)
        if got is not None:
            coefs, shift = got
            res = _lpc_residual(xs, coefs, shift)
            if not (len(res) and int(np.max(np.abs(res))) >= 1 << 40):
                po, params, rbits = _plan_partitions(res, order, n)
                bits = order * ebps + 4 + 5 + 12 * order + rbits
                if best is None or bits < best[0]:
                    best = (bits, "lpc", (coefs, shift, res, po, params))

    verbatim_bits = n * ebps
    if best is None or best[0] >= verbatim_bits:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        _write_wasted(bw, wb)
        for v in xs.tolist():
            bw.write_signed(v, ebps)
        return

    if best[1] == "fixed":
        order, res, po, params = best[2]
        bw.write(0, 1)
        bw.write(8 | order, 6)
        _write_wasted(bw, wb)
        for v in xs[:order].tolist():
            bw.write_signed(v, ebps)
        _write_residual(bw, res, order, n, po, params)
    else:
        coefs, shift, res, po, params = best[2]
        order = len(coefs)
        bw.write(0, 1)
        bw.write(32 | (order - 1), 6)
        _write_wasted(bw, wb)
        for v in xs[:order].tolist():
            bw.write_signed(v, ebps)
        bw.write(12 - 1, 4)  # precision-1
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, 12)
        _write_residual(bw, res, order, n, po, params)


def _write_wasted(bw: _BitWriter, wb: int) -> None:
    if wb:
        bw.write(1, 1)
        bw.write_unary(wb - 1)
    else:
        bw.write(0, 1)


def _decode_subframe(
    br: _BitReader, n: int, bps: int
) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    t = br.read(6)
    wb = 0
    if br.read(1):
        wb = br.read_unary() + 1
    ebps = bps - wb
    if t == 0:  # CONSTANT
        out = np.full(n, br.read_signed(ebps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array(
            [br.read_signed(ebps) for _ in range(n)], dtype=np.int64
        )
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [br.read_signed(ebps) for _ in range(order)]
        res = _read_residual(br, order, n)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            p = 0
            for j, c in enumerate(coefs):
                p += c * out[i - 1 - j]
            out[i] = p + res[i - order]
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = [br.read_signed(ebps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, order, n)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            p = 0
            for j, c in enumerate(coefs):
                p += c * out[i - 1 - j]
            out[i] = (p >> shift) + res[i - order]
    else:
        raise ValueError(f"FLAC: reserved subframe type {t}")
    return out << wb if wb else out


# ---------------------------------------------------------------- frames

_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def _encode_frame(
    frame_no: int,
    block: np.ndarray,  # (n, ch) int
    bps: int,
    stereo_mode: str,
) -> bytes:
    n, ch = block.shape
    if ch == 2 and stereo_mode == "mid_side":
        left = block[:, 0].astype(np.int64)
        right = block[:, 1].astype(np.int64)
        chans = [(left + right) >> 1, left - right]
        ch_assign, extra = 10, [0, 1]
    else:
        chans = [block[:, c].astype(np.int64) for c in range(ch)]
        ch_assign, extra = ch - 1, [0] * ch

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking strategy
    bw.write(0b0111, 4)  # block size: 16 bit at end of header
    bw.write(0b0000, 4)  # sample rate: from STREAMINFO
    bw.write(ch_assign, 4)
    bw.write(_BPS_CODE[bps], 3)
    bw.write(0, 1)  # reserved
    _write_coded_number(bw, frame_no)
    bw.write(n - 1, 16)
    header = bw.getvalue()
    bw.write(crc8(header), 8)
    for x, ex in zip(chans, extra):
        _encode_subframe(bw, x, bps + ex)
    bw.align()
    body = bw.getvalue()
    return body + struct.pack(">H", crc16(body))


_BLOCK_FROM_CODE = {1: 192}
for _i in range(2, 6):
    _BLOCK_FROM_CODE[_i] = 576 << (_i - 2)
for _i in range(8, 16):
    _BLOCK_FROM_CODE[_i] = 256 << (_i - 8)

_RATE_FROM_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def decode_frame(
    payload: bytes, info: dict, pos: int = 0
) -> tuple[np.ndarray, int]:
    """Decode ONE frame starting at byte ``pos``; returns the (n, ch)
    sample block and the byte position just past the frame footer.
    ``info`` is a ``parse_streaminfo`` dict (also how Matroska A_FLAC
    blocks are decoded: each block payload is exactly one frame)."""
    br = _BitReader(payload, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    if br.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    variable = br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_assign = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved block-size code")
    elif bs_code == 6:
        n = br.read(8) + 1
    elif bs_code == 7:
        n = br.read(16) + 1
    else:
        n = _BLOCK_FROM_CODE[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise ValueError("FLAC: invalid sample-rate code")
    header_len = br.tell_bytes() - pos
    if br._bit:
        raise ValueError("FLAC: frame header must be byte-aligned")
    if crc8(payload[pos : pos + header_len]) != br.read(8):
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    if bps_code == 0:
        bps = info["bits_per_sample"]
    elif bps_code in _BPS_FROM_CODE:
        bps = _BPS_FROM_CODE[bps_code]
    else:
        raise ValueError("FLAC: reserved sample-size code")
    if ch_assign < 8:
        ch = ch_assign + 1
        chans = [_decode_subframe(br, n, bps) for _ in range(ch)]
    elif ch_assign in (8, 9, 10):
        ex0 = 1 if ch_assign == 9 else 0
        ex1 = 1 if ch_assign in (8, 10) else 0
        c0 = _decode_subframe(br, n, bps + ex0)
        c1 = _decode_subframe(br, n, bps + ex1)
        if ch_assign == 8:  # left/side
            chans = [c0, c0 - c1]
        elif ch_assign == 9:  # right/side
            chans = [c0 + c1, c1]
        else:  # mid/side
            mid = (c0 << 1) | (c1 & 1)
            chans = [(mid + c1) >> 1, (mid - c1) >> 1]
    else:
        raise ValueError("FLAC: reserved channel assignment")
    br.align()
    body_len = br.tell_bytes() - pos
    if pos + body_len + 2 > len(payload):
        raise ValueError("FLAC: frame truncated before its CRC-16")
    (want,) = struct.unpack_from(">H", payload, pos + body_len)
    if crc16(payload[pos : pos + body_len]) != want:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    del variable
    return np.stack(chans, axis=1), pos + body_len + 2


# -------------------------------------------------------------- top level


def write_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 4096,
    bits_per_sample: int = 16,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode PCM into a FLAC stream. ``samples`` is (n,) or (n, ch)
    signed ints within ``bits_per_sample``; ``stereo_mode`` in
    {"independent", "mid_side"} (mid/side needs 2 channels)."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not 1 <= ch <= 8:
        raise ValueError("FLAC: 1..8 channels")
    if bits_per_sample not in _BPS_CODE:
        raise ValueError("FLAC: unsupported bits per sample")
    lim = 1 << (bits_per_sample - 1)
    if n and (int(x.max(initial=0)) >= lim or int(x.min(initial=0)) < -lim):
        raise ValueError("FLAC: samples exceed bits_per_sample")
    if stereo_mode == "mid_side" and ch != 2:
        raise ValueError("FLAC: mid/side needs exactly 2 channels")
    if not 16 <= block_size <= 65535:
        raise ValueError("FLAC: block size out of range")

    # spec: MD5 runs over ceil(bps/8)-byte little-endian samples (12-
    # and 20-bit streams hash 2 and 3 bytes per sample, like libFLAC)
    width = (bits_per_sample + 7) // 8
    md5 = hashlib.md5()
    xi = x.astype(np.int64)
    for i in range(0, n, 65536):
        chunk = xi[i : i + 65536]
        raw = np.empty(chunk.size * width, dtype=np.uint8)
        le = chunk.reshape(-1)  # interleaved
        for b in range(width):
            raw[b::width] = ((le >> (8 * b)) & 0xFF).astype(np.uint8)
        md5.update(raw.tobytes())

    frames = []
    for f_i, start in enumerate(range(0, n, block_size)):
        frames.append(
            _encode_frame(
                f_i, x[start : start + block_size], bits_per_sample,
                stereo_mode,
            )
        )
    if not frames:
        raise ValueError("FLAC: empty stream")
    sizes = [len(f) for f in frames]
    si = _streaminfo(
        block_size, min(sizes), max(sizes), sample_rate, ch,
        bits_per_sample, n, md5.digest(),
    )
    head = MAGIC + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    return head + b"".join(frames)


def parse_flac(
    payload: bytes, verify_md5: bool = True
) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC stream → (sample_rate, bits_per_sample, samples
    (n, ch) int64). Verifies every frame CRC and, unless disabled, the
    STREAMINFO MD5 of the decoded samples."""
    info, pos = parse_flac_headers(payload)
    blocks = []
    total = 0
    while pos < len(payload):
        blk, pos = decode_frame(payload, info, pos)
        blocks.append(blk)
        total += len(blk)
        if info["total_samples"] and total >= info["total_samples"]:
            break
    x = (
        np.concatenate(blocks, axis=0)
        if blocks
        else np.empty((0, info["channels"]), dtype=np.int64)
    )
    if info["total_samples"]:
        x = x[: info["total_samples"]]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        width = (info["bits_per_sample"] + 7) // 8
        md5 = hashlib.md5()
        le = x.reshape(-1)
        raw = np.empty(le.size * width, dtype=np.uint8)
        for b in range(width):
            raw[b::width] = ((le >> (8 * b)) & 0xFF).astype(np.uint8)
        md5.update(raw.tobytes())
        if md5.digest() != info["md5"]:
            raise ValueError("FLAC: MD5 signature mismatch")
    return info["sample_rate"], info["bits_per_sample"], x


def parse_flac_headers(payload: bytes) -> tuple[dict, int]:
    """Walk the metadata blocks → (streaminfo dict, first-frame byte
    offset). Unknown metadata blocks are skipped by size."""
    if payload[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if hdr & 0x7F == 0:
            info = parse_streaminfo(body)
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    return info, pos


def flac_frames(payload: bytes) -> tuple[dict, list[bytes]]:
    """Split a FLAC stream into (streaminfo, [frame bytes]) — the shape
    Matroska A_FLAC wants: headers in CodecPrivate, one frame per
    block."""
    info, pos = parse_flac_headers(payload)
    out = []
    while pos < len(payload):
        _blk, nxt = decode_frame(payload, info, pos)
        out.append(payload[pos:nxt])
        pos = nxt
    return info, out


def flac_codec_private(payload: bytes) -> bytes:
    """The Matroska A_FLAC CodecPrivate: the stream's metadata headers
    verbatim (fLaC magic through the last metadata block)."""
    _info, pos = parse_flac_headers(payload)
    return payload[:pos]
