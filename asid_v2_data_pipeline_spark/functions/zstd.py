"""Zstandard frame DECODER (RFC 8878, pure Python).

Zstandard is the modern default compression of the data ecosystem —
Common Crawl distributes ``.zst``, Parquet/ORC/Arrow and Kafka all
ship it — so an ingestion engine meets ``0xFD2FB528`` frames
constantly.  Implemented from the public RFC 8878: frame headers
(descriptor, window descriptor, frame content size), the three block
types (raw / RLE / compressed), the full literals section (raw, RLE,
Huffman-compressed one- and four-stream, treeless repeats; Huffman
tree descriptions both direct-nibble and FSE-compressed with two
interleaved states), the sequences section (predefined / RLE /
FSE-compressed / repeat table modes for literal-length, offset and
match-length codes; backward bitstream with interleaved state
updates; the three-slot repeat-offset history including the
literal-length-zero twist), sequence execution with overlap-safe
match copies, and the xxHash64 content checksum.  The predefined FSE
distributions and the LL/ML code baseline/extra-bit tables are
transcribed from RFC 8878 §3.1.1.3.2.

DECODE ONLY, by design: at ingestion scale the compressed bytes
already exist (producers use the reference C encoder); what the
engine needs is a verified decode path.  Correctness is pinned by
bidirectional-in-spirit cross-validation: every test decodes frames
produced by the real C zstd reachable through
``pyarrow.Codec("zstd")`` across compression levels 1-19 and data
shapes chosen to exercise every block/literals/sequence mode
(``tests/test_zstd.py``).  The reference pipeline has no compression
surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Disclosed boundaries (``NotImplementedError``): dictionaries
(``Dictionary_ID != 0``), the legacy v0.x frame formats, window
sizes above 128 MiB (allocation guard).

Fuzz contract (SCALE.md round 10): ``decompress_zstd`` raises
``ValueError`` on malformed input — bad magic, reserved bits, corrupt
FSE/Huffman descriptions, bitstream under/overflow, offsets beyond
the decoded window, size overruns, checksum mismatches — never
``IndexError`` escapes, never unbounded allocation (every regenerated
size is bounded before allocation), never hangs.
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_MAX_WINDOW = 1 << 27  # 128 MiB allocation guard
_M64 = (1 << 64) - 1

# --- xxHash64 (public reference constants) ------------------------------------

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    data = bytes(data)
    n = len(data)
    pos = 0

    def _round(acc, inp):
        return (_rotl64((acc + inp * _P64_2) & _M64, 31) * _P64_1) & _M64

    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while pos <= n - 32:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1, v2, v3, v4 = (
                _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d),
            )
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h = (_rotl64(h ^ _round(0, k), 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl64(h ^ (k * _P64_1) & _M64, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ (data[pos] * _P64_5) & _M64, 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# --- bitstreams ----------------------------------------------------------------


class _FwdBits:
    """Forward little-endian bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("zstd: forward bitstream overrun")
        out = 0
        for i in range(n):
            bit = (self.data[(self.pos + i) >> 3] >> ((self.pos + i) & 7)) & 1
            out |= bit << i
        self.pos += n
        return out

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bit reader: zstd streams are written little-endian and
    read from the end, below a mandatory 1-bit sentinel."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream missing sentinel bit")
        self.val = int.from_bytes(data, "little")
        self.pos = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        """Strict read (state inits, extra bits)."""
        if n > self.pos:
            raise ValueError("zstd: bitstream underrun")
        self.pos -= n
        return (self.val >> self.pos) & ((1 << n) - 1)

    def read_pad(self, n: int) -> int:
        """Read allowing zero-padded overread (FSE weight streams end
        mid-update by specification)."""
        if n <= self.pos:
            self.pos -= n
            return (self.val >> self.pos) & ((1 << n) - 1)
        have = max(self.pos, 0)
        out = (self.val & ((1 << have) - 1)) << (n - have)
        self.pos -= n
        return out

    def peek_pad(self, n: int) -> int:
        if n <= self.pos:
            return (self.val >> (self.pos - n)) & ((1 << n) - 1)
        have = max(self.pos, 0)
        return (self.val & ((1 << have) - 1)) << (n - have)


# --- FSE -----------------------------------------------------------------------


def _fse_read_distribution(data: bytes, max_acc: int, max_sym: int):
    """Parse an FSE table description (forward stream): returns
    (probs, accuracy, bytes_consumed)."""
    bits = _FwdBits(data)
    acc = bits.read(4) + 5
    if acc > max_acc:
        raise ValueError("zstd: FSE accuracy too large")
    remaining = (1 << acc) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_sym:
            raise ValueError("zstd: too many FSE symbols")
        nb = remaining.bit_length()  # max bits for this value
        val = bits.read(nb - 1)
        lower_mask = (1 << (nb - 1)) - 1
        threshold = (1 << nb) - 1 - remaining
        if val < threshold:
            pass  # small value: nb-1 bits were enough
        else:
            # need the extra bit
            extra = bits.read(1)
            val |= extra << (nb - 1)
            if val > lower_mask:
                val -= threshold
        p = val - 1
        if p < -1:
            raise ValueError("zstd: bad FSE probability")
        probs.append(p)
        remaining -= 1 if p == -1 else p
        if remaining < 1:
            raise ValueError("zstd: FSE probabilities overflow table")
        if p == 0:
            while True:
                rep = bits.read(2)
                probs.extend([0] * rep)
                if len(probs) > max_sym + 1:
                    raise ValueError("zstd: FSE zero-run overflow")
                if rep != 3:
                    break
    return probs, acc, bits.bytes_consumed()


def _fse_build_table(probs: list[int], acc: int):
    """Build the FSE decode table: (symbol, nb_bits, baseline) per
    state (RFC 8878 §4.1.1)."""
    size = 1 << acc
    sym_t = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            sym_t[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            sym_t[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution")
    nb_t = [0] * size
    base_t = [0] * size
    nxt = [1 if p == -1 else p for p in probs]
    for i in range(size):
        s = sym_t[i]
        x = nxt[s]
        nxt[s] = x + 1
        nb = acc - (x.bit_length() - 1)
        nb_t[i] = nb
        base_t[i] = (x << nb) - size
    return sym_t, nb_t, base_t


def _fse_rle_table(symbol: int):
    return [symbol], [0], [0]


# --- Huffman literals -------------------------------------------------------------


def _huf_read_weights(data: bytes):
    """Huffman tree description → (weights list, bytes consumed)."""
    if not data:
        raise ValueError("zstd: empty huffman description")
    h = data[0]
    if h >= 128:
        n = h - 127
        nb = (n + 1) // 2
        if 1 + nb > len(data):
            raise ValueError("zstd: truncated huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nb
    # FSE-compressed weights
    if 1 + h > len(data):
        raise ValueError("zstd: truncated huffman FSE stream")
    body = data[1 : 1 + h]
    probs, acc, used = _fse_read_distribution(body, 6, 255)
    sym_t, nb_t, base_t = _fse_build_table(probs, acc)
    stream = body[used:]
    bits = _BackBits(stream)
    s1 = bits.read(acc)
    s2 = bits.read(acc)
    weights = []
    for _ in range(512):  # hard cap (255 weights max)
        weights.append(sym_t[s1])
        if bits.pos < 0:
            raise ValueError("zstd: huffman weight stream underrun")
        s1 = base_t[s1] + bits.read_pad(nb_t[s1])
        if bits.pos < 0:
            weights.append(sym_t[s2])
            break
        weights.append(sym_t[s2])
        s2 = base_t[s2] + bits.read_pad(nb_t[s2])
        if bits.pos < 0:
            weights.append(sym_t[s1])
            break
    else:
        raise ValueError("zstd: huffman weight stream too long")
    if len(weights) > 255:
        raise ValueError("zstd: too many huffman weights")
    return weights, 1 + h


def _huf_build_table(weights: list[int]):
    """Canonical zstd Huffman LUT from explicit weights (the last
    weight is implied).  Returns (lut, table_log) where lut maps a
    table_log-bit peek to (symbol, nb_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: huffman weights all zero")
    table_log = max(total.bit_length(), 1)
    left = (1 << table_log) - total
    if left <= 0:
        raise ValueError("zstd: corrupt huffman weights")
    if left & (left - 1):
        raise ValueError("zstd: huffman weights not completable")
    last_w = left.bit_length()  # log2(left)+1
    weights = weights + [last_w]
    if table_log > 11:
        raise ValueError("zstd: huffman table too large")
    size = 1 << table_log
    lut = [(0, 0)] * size
    # rank_idx[w]: next slot for weight w (weight-ascending layout)
    counts = [0] * (table_log + 2)
    for w in weights:
        if w > table_log:
            raise ValueError("zstd: huffman weight exceeds table log")
        counts[w] += 1
    rank_idx = [0] * (table_log + 2)
    at = 0
    for w in range(1, table_log + 2):
        rank_idx[w] = at
        at += counts[w] * (1 << (w - 1))
    if at != size:
        raise ValueError("zstd: huffman table does not fill")
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        start = rank_idx[w]
        span = 1 << (w - 1)
        nb = table_log + 1 - w
        for i in range(start, start + span):
            lut[i] = (sym, nb)
        rank_idx[w] += span
    return lut, table_log


def _huf_decode_stream(data: bytes, lut, table_log: int, n_out: int) -> bytes:
    bits = _BackBits(data)
    out = bytearray()
    for _ in range(n_out):
        sym, nb = lut[bits.peek_pad(table_log)]
        if nb > bits.pos:
            raise ValueError("zstd: huffman stream underrun")
        bits.pos -= nb
        out.append(sym)
    if bits.pos != 0:
        raise ValueError("zstd: huffman stream not fully consumed")
    return bytes(out)


# --- sequences: code tables (RFC 8878 §3.1.1.3.2.1) -------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

# predefined FSE distributions (RFC 8878 §3.1.1.3.2.2.1)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)
_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


class _FrameTables:
    """Per-frame repeatable decoding state: the previous Huffman table
    (treeless literals) and previous FSE tables (repeat mode)."""

    def __init__(self):
        self.huf = None  # (lut, table_log)
        self.fse = {"ll": None, "of": None, "ml": None}


# --- literals section ---------------------------------------------------------------


def _decode_literals(block: bytes, tables: _FrameTables) -> tuple[bytes, int]:
    """Decode the literals section; returns (literals, bytes consumed
    from the block)."""
    if not block:
        raise ValueError("zstd: empty compressed block")
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif size_format == 1:
            if len(block) < 2:
                raise ValueError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ValueError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if regen > _MAX_WINDOW:
            raise ValueError("zstd: literals exceed window guard")
        if lit_type == 0:
            if hdr + regen > len(block):
                raise ValueError("zstd: raw literals exceed block")
            return bytes(block[hdr : hdr + regen]), hdr + regen
        if hdr + 1 > len(block):
            raise ValueError("zstd: truncated RLE literal")
        return bytes([block[hdr]]) * regen, hdr + 1
    # compressed (2) / treeless (3)
    if size_format == 0:
        n_streams = 1
    else:
        n_streams = 4
    if size_format in (0, 1):
        if len(block) < 3:
            raise ValueError("zstd: truncated literals header")
        regen = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        comp = (block[1] >> 6) | (block[2] << 2)
        hdr = 3
    elif size_format == 2:
        if len(block) < 4:
            raise ValueError("zstd: truncated literals header")
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 3) << 12)
        comp = (block[2] >> 2) | (block[3] << 6)
        hdr = 4
    else:
        if len(block) < 5:
            raise ValueError("zstd: truncated literals header")
        regen = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        comp = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
        hdr = 5
    if regen > _MAX_WINDOW:
        raise ValueError("zstd: literals exceed window guard")
    if hdr + comp > len(block):
        raise ValueError("zstd: compressed literals exceed block")
    body = block[hdr : hdr + comp]
    if lit_type == 2:
        weights, used = _huf_read_weights(body)
        lut, tlog = _huf_build_table(weights)
        tables.huf = (lut, tlog)
        body = body[used:]
    else:
        if tables.huf is None:
            raise ValueError("zstd: treeless literals without a table")
        lut, tlog = tables.huf
    if n_streams == 1:
        lit = _huf_decode_stream(body, lut, tlog, regen)
    else:
        if len(body) < 6:
            raise ValueError("zstd: truncated four-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        rest = body[6:]
        if s1 + s2 + s3 > len(rest):
            raise ValueError("zstd: four-stream sizes exceed section")
        part = (regen + 3) // 4
        outs = []
        starts = [0, s1, s1 + s2, s1 + s2 + s3]
        ends = [s1, s1 + s2, s1 + s2 + s3, len(rest)]
        for k in range(4):
            n_k = part if k < 3 else regen - 3 * part
            if n_k < 0:
                raise ValueError("zstd: four-stream split underflow")
            outs.append(
                _huf_decode_stream(rest[starts[k] : ends[k]], lut, tlog, n_k)
            )
        lit = b"".join(outs)
    return lit, hdr + comp


# --- sequences section ----------------------------------------------------------------


def _read_seq_table(kind: str, mode: int, data: bytes, tables: _FrameTables):
    """Resolve one symbol table per its compression mode; returns
    (table, bytes consumed)."""
    if mode == 0:  # predefined
        probs, acc = {
            "ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT,
        }[kind]
        t = _fse_build_table(probs, acc)
        tables.fse[kind] = t
        return t, 0
    if mode == 1:  # RLE
        if not data:
            raise ValueError("zstd: truncated RLE table byte")
        if data[0] > _MAX_SYM[kind]:
            raise ValueError("zstd: RLE symbol out of range")
        t = _fse_rle_table(data[0])
        tables.fse[kind] = t
        return t, 1
    if mode == 2:  # FSE compressed
        probs, acc, used = _fse_read_distribution(
            data, _MAX_ACC[kind], _MAX_SYM[kind]
        )
        if len(probs) > _MAX_SYM[kind] + 1:
            raise ValueError("zstd: too many symbols in FSE table")
        t = _fse_build_table(probs, acc)
        tables.fse[kind] = t
        return t, used
    if tables.fse[kind] is None:
        raise ValueError("zstd: repeat mode without a previous table")
    return tables.fse[kind], 0


def _decode_sequences(
    data: bytes, tables: _FrameTables
) -> list[tuple[int, int, int]]:
    """Decode the sequences section → list of (ll, ml, offset_value)."""
    if not data:
        raise ValueError("zstd: empty sequences section")
    b0 = data[0]
    pos = 1
    if b0 == 0:
        return []
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if len(data) < 2:
            raise ValueError("zstd: truncated sequence count")
        nseq = ((b0 - 128) << 8) + data[1]
        pos = 2
    else:
        if len(data) < 3:
            raise ValueError("zstd: truncated sequence count")
        nseq = data[1] + (data[2] << 8) + 0x7F00
        pos = 3
    if pos >= len(data):
        raise ValueError("zstd: missing compression-modes byte")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_t, used = _read_seq_table("ll", (modes >> 6) & 3, data[pos:], tables)
    pos += used
    of_t, used = _read_seq_table("of", (modes >> 4) & 3, data[pos:], tables)
    pos += used
    ml_t, used = _read_seq_table("ml", (modes >> 2) & 3, data[pos:], tables)
    pos += used

    bits = _BackBits(data[pos:])
    ll_sym, ll_nb, ll_base = ll_t
    of_sym, of_nb, of_base = of_t
    ml_sym, ml_nb, ml_base = ml_t
    ll_acc = (len(ll_sym) - 1).bit_length() if len(ll_sym) > 1 else 0
    of_acc = (len(of_sym) - 1).bit_length() if len(of_sym) > 1 else 0
    ml_acc = (len(ml_sym) - 1).bit_length() if len(ml_sym) > 1 else 0
    ll_s = bits.read(ll_acc)
    of_s = bits.read(of_acc)
    ml_s = bits.read(ml_acc)
    out = []
    for i in range(nseq):
        of_code = of_sym[of_s]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        of_val = (1 << of_code) + (bits.read(of_code) if of_code else 0)
        ml_code = ml_sym[ml_s]
        if ml_code > 52:
            raise ValueError("zstd: match-length code out of range")
        ml = _ML_BASE[ml_code] + (
            bits.read(_ML_BITS[ml_code]) if _ML_BITS[ml_code] else 0
        )
        ll_code = ll_sym[ll_s]
        if ll_code > 35:
            raise ValueError("zstd: literal-length code out of range")
        ll = _LL_BASE[ll_code] + (
            bits.read(_LL_BITS[ll_code]) if _LL_BITS[ll_code] else 0
        )
        out.append((ll, ml, of_val))
        if i + 1 < nseq:
            ll_s = ll_base[ll_s] + bits.read(ll_nb[ll_s])
            ml_s = ml_base[ml_s] + bits.read(ml_nb[ml_s])
            of_s = of_base[of_s] + bits.read(of_nb[of_s])
    if bits.pos != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    return out


def _execute_sequences(
    literals: bytes,
    seqs: list[tuple[int, int, int]],
    out: bytearray,
    reps: list[int],
    block_start_guard: int,
):
    lit_pos = 0
    for ll, ml, of_val in seqs:
        if of_val > 3:
            offset = of_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_val - 1 if ll != 0 else of_val
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0, of_val == 3
                offset = reps[0] - 1
                if offset <= 0:
                    raise ValueError("zstd: repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(literals):
            raise ValueError("zstd: literal run exceeds literals")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond window")
        if len(out) + ml > block_start_guard + _MAX_WINDOW:
            raise ValueError("zstd: output exceeds window guard")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            pat = out[start:]
            reps_n = -(-ml // offset)
            out += (bytes(pat) * reps_n)[:ml]
    out += literals[lit_pos:]


# --- frames --------------------------------------------------------------------------


def decompress_zstd(data: bytes, max_out: int = 1 << 31) -> bytes:
    """Decode a concatenation of Zstandard (and skippable) frames."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("zstd: payload must be bytes")
    data = bytes(data)
    pos = 0
    out_all = bytearray()
    n_frames = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("zstd: truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == _SKIP_LO:
            if pos + 8 > len(data):
                raise ValueError("zstd: truncated skippable frame")
            (sk,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + sk > len(data):
                raise ValueError("zstd: skippable frame exceeds input")
            pos += 8 + sk
            continue
        if magic != _MAGIC:
            if magic in range(0xFD2FB522, 0xFD2FB528):
                raise NotImplementedError("zstd: legacy frame format")
            raise ValueError(f"zstd: bad frame magic 0x{magic:08x}")
        pos += 4
        pos = _decode_frame(data, pos, out_all, max_out)
        n_frames += 1
    if n_frames == 0:
        raise ValueError("zstd: no frames in input")
    return bytes(out_all)


def _decode_frame(
    data: bytes, pos: int, out_all: bytearray, max_out: int
) -> int:
    if pos >= len(data):
        raise ValueError("zstd: truncated frame header")
    desc = data[pos]
    pos += 1
    fcs_code = desc >> 6
    single_segment = (desc >> 5) & 1
    if (desc >> 3) & 1:
        raise ValueError("zstd: reserved frame-descriptor bit set")
    has_checksum = (desc >> 2) & 1
    dict_flag = desc & 3
    window = None
    if not single_segment:
        if pos >= len(data):
            raise ValueError("zstd: truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base >> 3) * (wd & 7)
    if dict_flag:
        n = (0, 1, 2, 4)[dict_flag]
        if pos + n > len(data):
            raise ValueError("zstd: truncated dictionary id")
        did = int.from_bytes(data[pos : pos + n], "little")
        pos += n
        if did:
            raise NotImplementedError("zstd: dictionary frames")
    fcs = None
    n = (1 if single_segment else 0, 2, 4, 8)[fcs_code]
    if n:
        if pos + n > len(data):
            raise ValueError("zstd: truncated frame content size")
        fcs = int.from_bytes(data[pos : pos + n], "little")
        if n == 2:
            fcs += 256
        pos += n
    if single_segment:
        window = fcs if fcs is not None else 0
    if window is not None and window > _MAX_WINDOW:
        raise NotImplementedError("zstd: window beyond 128 MiB guard")

    tables = _FrameTables()
    reps = [1, 4, 8]
    frame_start = len(out_all)
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ValueError("zstd: reserved block type")
        if len(out_all) - frame_start > max_out:
            raise ValueError("zstd: output exceeds caller bound")
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ValueError("zstd: raw block exceeds input")
            out_all += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos + 1 > len(data):
                raise ValueError("zstd: truncated RLE block")
            if bsize > _MAX_WINDOW:
                raise ValueError("zstd: RLE block exceeds window guard")
            out_all += bytes([data[pos]]) * bsize
            pos += 1
        else:  # compressed
            if pos + bsize > len(data):
                raise ValueError("zstd: compressed block exceeds input")
            block = data[pos : pos + bsize]
            pos += bsize
            literals, used = _decode_literals(block, tables)
            seqs = _decode_sequences(block[used:], tables)
            _execute_sequences(literals, seqs, out_all, reps, frame_start)
        if last:
            break
    if fcs is not None and len(out_all) - frame_start != fcs:
        raise ValueError("zstd: frame content size mismatch")
    if has_checksum:
        if pos + 4 > len(data):
            raise ValueError("zstd: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        got = xxh64(bytes(out_all[frame_start:])) & 0xFFFFFFFF
        if got != want:
            raise ValueError("zstd: content checksum mismatch")
    return pos
