"""WebP lossless (VP8L) codec, pure Python from the public bitstream
spec (RFC 9649 / "WebP Lossless Bitstream Specification") plus the
RIFF ``WEBP``/``VP8L`` container framing.

Implemented — both directions, internally cross-validated by seeded
randomized matrices:

- LSB-first bit IO; canonical prefix codes with the DEFLATE length
  assignment, read MSB-of-code-first;
- prefix-code serialization: the "simple" 1/2-symbol form AND the
  normal form (code-length code over the 19-symbol reordered
  alphabet, repeat ops 16/17/18, the optional max_symbol cut);
- spatially coded images with the optional color cache
  (``(0x1e35a7bd * argb) >> (32 - bits)``), LZ77 backward references
  (length/distance prefix values with extra bits), and meta-Huffman
  groups selected by an entropy subimage;
- all four transforms, inverse-applied in reverse order:
  SUBTRACT_GREEN, PREDICTOR (all 14 modes, contiguous-buffer edge
  semantics), COLOR (ColorTransformElement deltas ``(int8(t) *
  int8(c)) >> 5``), and COLOR_INDEXING with pixel bundling for
  palettes of ≤16 colors.

Disclosed boundary: distance codes 1..120 map to 2D pixel-proximity
offsets through a 120-entry table given only as literal data in the
spec; that table is not derivable from structure and is not
retrievable in this sandbox (the same adjudication as the MP3
tables-3..31 boundary), so the decoder raises NotImplementedError on
them.  This writer always emits plain distances (code = dist + 120),
and libwebp accepts those streams; only third-party files that use
proximity codes hit the boundary, loudly.

Strictness: bad magic/version, out-of-range cache bits, incomplete or
over-subscribed prefix codes, backrefs before the window, palette
index overflow and stream truncation all raise ValueError.

Reference comparison: the reference's only media is netCDF rasters
(``asip_v2/archive.py``); §2.11 multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_LEN = 15
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_HASH_MUL = 0x1E35A7BD


class _BitReader:
    """LSB-first over bytes."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for k in range(n):
            byte = self.pos >> 3
            if byte >= len(self.buf):
                raise ValueError("vp8l: bitstream truncated")
            out |= ((self.buf[byte] >> (self.pos & 7)) & 1) << k
            self.pos += 1
        return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# --- canonical prefix codes ------------------------------------------------------


def _build_lengths(freqs: list[int], max_len: int = _MAX_CODE_LEN) -> list[int]:
    """Length-limited canonical Huffman lengths (simple heuristic:
    standard Huffman, then overlong codes flattened and repaired to a
    complete Kraft sum — adequate for fixture-scale alphabets)."""
    import heapq

    live = [(f, i) for i, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    if not live:
        return [0] * n
    if len(live) == 1:
        out = [0] * n
        out[live[0][1]] = 1
        return out
    heap = [(f, i, None) for f, i in live]
    heapq.heapify(heap)
    nodes: list[tuple] = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], n + len(nodes), (a, b)))
    lengths = [0] * n

    def walk(node, depth):
        if node[2] is None:
            lengths[node[1]] = max(1, depth)
            return
        walk(node[2][0], depth + 1)
        walk(node[2][1], depth + 1)

    walk(heap[0], 0)
    if max(lengths) > max_len:
        # clamp and repair: count per length, push overflow shorter
        lengths = [min(l, max_len) if l else 0 for l in lengths]
        while True:
            kraft = sum(1 << (max_len - l) for l in lengths if l)
            if kraft <= 1 << max_len:
                break
            # lengthen the shortest-coded rare symbol
            cand = max(
                (l, -freqs[i], i)
                for i, l in enumerate(lengths)
                if 0 < l < max_len
            )
            lengths[cand[2]] += 1
        # tighten: if under-subscribed, shorten the most frequent
        while True:
            kraft = sum(1 << (max_len - l) for l in lengths if l)
            gap = (1 << max_len) - kraft
            if gap == 0:
                break
            done = False
            for i in sorted(
                range(n), key=lambda i: -freqs[i]
            ):
                if lengths[i] > 1 and (1 << (max_len - lengths[i])) <= gap:
                    lengths[i] -= 1
                    done = True
                    break
            if not done:
                raise ValueError("vp8l: kraft repair failed")
    return lengths


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), DEFLATE assignment (by length then
    symbol order), code compared MSB-first."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Decoder:
    """Prefix decoder: walk bits MSB-of-code-first."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        live = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not live:
            raise ValueError("vp8l: empty prefix code")
        if len(live) == 1:
            self.single = live[0][1]
            self.table = None
            return
        self.single = None
        codes = _canonical_codes(lengths)
        # completeness check
        kraft = sum(1 << (_MAX_CODE_LEN - l) for l, _ in live)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("vp8l: incomplete or oversubscribed code")
        self.table = {
            (n, code): sym for sym, (code, n) in codes.items()
        }

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for n in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((n, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: bad prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Decoder:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 1:
            lengths[sym0] = 1
            dec = _Decoder.__new__(_Decoder)
            dec.single = sym0
            dec.table = None
            return dec
        sym1 = br.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise ValueError("vp8l: simple-code symbol out of range")
        # spec order: the FIRST written symbol takes code 0
        dec = _Decoder.__new__(_Decoder)
        dec.single = None
        dec.table = {(1, 0): sym0, (1, 1): sym1}
        return dec
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _Decoder(_pad_complete(cl_lengths))
    max_symbol = alphabet_size
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("vp8l: max_symbol exceeds alphabet")
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    remaining = max_symbol
    while symbol < alphabet_size:
        if remaining <= 0:
            break
        remaining -= 1
        cl = cl_dec.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            if symbol + rep > alphabet_size:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(rep):
                lengths[symbol] = prev
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
        if symbol > alphabet_size:
            raise ValueError("vp8l: code-length run overflow")
    return _Decoder(lengths)


def _pad_complete(lengths: list[int]) -> list[int]:
    """The code-length code may be trivially sparse in our encoder's
    output; the VP8L contract still requires a usable code.  One or
    two live symbols are handled by _Decoder/simple logic; otherwise
    the code must already be complete."""
    live = [l for l in lengths if l]
    if len(live) == 1:
        return lengths
    if len(live) == 2 and all(l == 1 for l in live):
        return lengths
    return lengths


def _write_prefix_code(
    bw: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Serialize ``lengths`` (simple form when ≤2 symbols); returns
    the canonical code map for payload writing."""
    live = [s for s, l in enumerate(lengths) if l > 0]
    simple_ok = (
        1 <= len(live) <= 2
        and max(live) <= 255  # simple form carries 8-bit symbols only
        and (len(live) == 1 or all(lengths[s] == 1 for s in live))
    )
    if simple_ok:
        bw.write(1, 1)  # simple
        bw.write(len(live) - 1, 1)
        sym0 = live[0]
        if sym0 > 1:
            bw.write(1, 1)
            bw.write(sym0, 8)
        else:
            bw.write(0, 1)
            bw.write(sym0, 1)
        if len(live) == 2:
            bw.write(live[1], 8)
        if len(live) == 1:
            return {live[0]: (0, 0)}
        # written order == ascending order == code 0 then 1
        return {live[0]: (0, 1), live[1]: (1, 1)}
    bw.write(0, 1)  # normal
    # encode the length array with the code-length code (no repeats:
    # literal code lengths only, plus 17/18 zero runs for brevity)
    ops: list[tuple[int, int, int]] = []  # (cl_symbol, extra, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                ops.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                ops.append((0, 0, 0))
            i = j
        else:
            ops.append((lengths[i], 0, 0))
            i += 1
    cl_freq = [0] * 19
    for sym, _, _ in ops:
        cl_freq[sym] += 1
    cl_lengths = _build_lengths(cl_freq, 7)
    # ensure decodable: single live symbol is fine (decoder single path)
    num_cl = 19
    while num_cl > 4 and cl_lengths[_CL_ORDER[num_cl - 1]] == 0:
        num_cl -= 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # no max_symbol cut
    live_cl = sum(1 for l in cl_lengths if l)
    for sym, extra, ebits in ops:
        if live_cl > 1:
            code, cn = cl_codes[sym]
            bw.write(_rev(code, cn), cn)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _rev(code: int, n: int) -> int:
    out = 0
    for _ in range(n):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _emit(bw: _BitWriter, codes: dict, sym: int) -> None:
    code, n = codes[sym]
    if n:
        bw.write(_rev(code, n), n)


# --- LZ77 prefix values ------------------------------------------------------------


def _prefix_decode_value(code: int, br: _BitReader) -> int:
    """length/distance prefix value: 24-symbol log-scaled coding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_value, extra_bits); inverse of
    ``_prefix_decode_value``."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    high = (v >> extra) & 1
    code = 2 * extra + high + 2
    offset = (2 + high) << extra
    return code, v - offset, extra


# --- color cache -------------------------------------------------------------------


def _cache_index(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# --- image entropy decode ----------------------------------------------------------


def _decode_image(
    br: _BitReader, w: int, h: int, is_main: bool
) -> np.ndarray:
    """Decode one spatially coded image into uint32 ARGB[h*w]."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: color-cache bits out of range")
    meta = None
    n_groups = 1
    if is_main and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w >> meta_bits)
        mh = -(-h >> meta_bits)
        meta_img = _decode_image(br, mw, mh, False)
        meta = (meta_img, meta_bits, mw)
        n_groups = (
            int(
                max(
                    ((p >> 8) & 0xFFFF)
                    for p in meta_img
                )
            )
            + 1
        )
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        x = pos % w
        y = pos // w
        if meta is not None:
            mimg, mbits, mw = meta
            mp = int(mimg[(y >> mbits) * mw + (x >> mbits)])
            gi = (mp >> 8) & 0xFFFF
        else:
            gi = 0
        green_d, red_d, blue_d, alpha_d, dist_d = groups[gi]
        s = green_d.decode(br)
        if s < 256:
            g = s
            r = red_d.decode(br)
            b = blue_d.decode(br)
            a = alpha_d.decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            if cache_size:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _prefix_decode_value(s - 256, br)
            dcode = dist_d.decode(br)
            plane = _prefix_decode_value(dcode, br)
            if plane <= 120:
                raise NotImplementedError(
                    "VP8L: 2D proximity distance codes (<=120) are a "
                    "disclosed boundary (spec-literal table)"
                )
            d = plane - 120
            if d > pos:
                raise ValueError("vp8l: backref before window start")
            if pos + length > total:
                raise ValueError("vp8l: backref overruns the image")
            for k in range(length):
                px = int(out[pos - d])
                out[pos] = px
                if cache_size:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("vp8l: cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# --- transforms (inverse) -----------------------------------------------------------


def _inv_subtract_green(img: np.ndarray) -> None:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    img &= np.uint32(0xFF00FF00)
    img |= (r << 16) | b


def _avg2(a: int, b: int) -> int:
    # per-channel average of two ARGB pixels
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        v = ((a >> shift) & 0xFF) + ((b >> shift) & 0xFF) - ((c >> shift) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _clamp_add_sub_half(a: int, b: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        x = (a >> shift) & 0xFF
        c = (b >> shift) & 0xFF
        v = x + (x - c) // 2 if False else x + ((x - c) >> 1)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << shift
    return out


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # select
        p = _clamp_add_sub_full(L, T, TL)

        def dist(u, v):
            return sum(
                abs(((u >> s) & 0xFF) - ((v >> s) & 0xFF))
                for s in (0, 8, 16, 24)
            )

        return L if dist(p, L) <= dist(p, T) else T
    if mode == 12:
        return _clamp_add_sub_full(L, T, TL)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(L, T), TL)
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _inv_predictor(
    img: np.ndarray, w: int, h: int, modes: np.ndarray, bits: int, mw: int
) -> None:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(img[pos - 1])  # L
        elif x == 0:
            pred = int(img[pos - w])  # T
        else:
            mode = (int(modes[(y >> bits) * mw + (x >> bits)]) >> 8) & 0xFF
            L = int(img[pos - 1])
            T = int(img[pos - w])
            TL = int(img[pos - w - 1])
            TR = int(img[pos - w + 1])  # contiguous semantics at x=w-1
            pred = _predict(mode, L, T, TL, TR)
        # add residual (stored) to prediction, per channel mod 256
        res = int(img[pos])
        out = 0
        for shift in (0, 8, 16, 24):
            out |= (
                (((res >> shift) & 0xFF) + ((pred >> shift) & 0xFF)) & 0xFF
            ) << shift
        img[pos] = out


def _delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(
    img: np.ndarray, w: int, h: int, ctes: np.ndarray, bits: int, mw: int
) -> None:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = int(ctes[(y >> bits) * mw + (x >> bits)])
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        px = int(img[pos])
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + _delta(g2r, g)) & 0xFF
        b = ((px & 0xFF) + _delta(g2b, g) + _delta(r2b, r)) & 0xFF
        img[pos] = (px & 0xFF00FF00) | (r << 16) | b


def _palette_bpp(n: int) -> int:
    if n <= 2:
        return 1
    if n <= 4:
        return 2
    if n <= 16:
        return 4
    return 8


# --- top-level decode ---------------------------------------------------------------


def parse_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L stream to (h, w, 4) uint8 RGBA."""
    buf = bytes(data)
    if not buf or buf[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(buf)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    # Same allocation guard as parse_qoi/parse_tga: a ~30-byte stream can
    # claim 16384x16384 and force ~2 GB of np.zeros before any entropy
    # validation. Cap pixel count before allocating.
    if w * h > 64 << 20:
        raise ValueError("vp8l: pixel count exceeds 64M cap")
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    transforms = []  # applied inverse in reverse order
    dec_w = w
    palette = None
    while br.read(1):
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("vp8l: duplicate transform")
        if ttype == 2:  # subtract green
            transforms.append((2,))
        elif ttype == 0:  # predictor
            bits = br.read(3) + 2
            mw = -(-dec_w >> bits)
            mh = -(-h >> bits)
            sub = _decode_image(br, mw, mh, False)
            transforms.append((0, bits, mw, sub))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            mw = -(-dec_w >> bits)
            mh = -(-h >> bits)
            sub = _decode_image(br, mw, mh, False)
            transforms.append((1, bits, mw, sub))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_image(br, n_colors, 1, False)
            # palette entries are delta-coded per channel
            pal = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                cur = 0
                for shift in (0, 8, 16, 24):
                    cur |= (
                        (((int(pal_img[i]) >> shift) & 0xFF)
                         + ((prev >> shift) & 0xFF)) & 0xFF
                    ) << shift
                pal[i] = cur
                prev = cur
            bpp = _palette_bpp(n_colors)
            ppb = 8 // bpp  # pixels per packed byte-unit
            dec_w = -(-w // ppb)
            palette = (pal, bpp, ppb)
            transforms.append((3,))
    img = _decode_image(br, dec_w, h, True)
    # inverse transforms, reverse order
    for t in reversed(transforms):
        if t[0] == 3:
            pal, bpp, ppb = palette
            full = np.zeros(w * h, dtype=np.uint32)
            mask = (1 << bpp) - 1
            for y in range(h):
                for x in range(w):
                    packed = int(img[y * dec_w + x // ppb])
                    idx = ((packed >> 8) & 0xFF) >> (bpp * (x % ppb)) & mask
                    if idx >= len(pal):
                        raise ValueError("vp8l: palette index overflow")
                    full[y * w + x] = pal[idx]
            img = full
            dec_w = w
        elif t[0] == 2:
            _inv_subtract_green(img)
        elif t[0] == 0:
            _inv_predictor(img, dec_w, h, t[3], t[1], t[2])
        else:
            _inv_color_transform(img, dec_w, h, t[3], t[1], t[2])
    out = np.zeros((h, w, 4), dtype=np.uint8)
    flat = img.reshape(h, w)
    out[..., 0] = (flat >> 16) & 0xFF  # R
    out[..., 1] = (flat >> 8) & 0xFF  # G
    out[..., 2] = flat & 0xFF  # B
    out[..., 3] = (flat >> 24) & 0xFF  # A
    return out


# --- encoder ------------------------------------------------------------------------


def _histogram_codes(
    bw: _BitWriter, syms_streams: list[list[int]], alphabet_sizes: list[int]
) -> list[dict]:
    code_maps = []
    for syms, asize in zip(syms_streams, alphabet_sizes):
        freqs = [0] * asize
        for s in syms:
            freqs[s] += 1
        if not any(freqs):
            freqs[0] = 1  # unused stream still needs a valid code
        lengths = _build_lengths(freqs)
        code_maps.append(_write_prefix_code(bw, lengths))
    return code_maps


def _encode_image(
    bw: _BitWriter,
    img: np.ndarray,
    w: int,
    h: int,
    is_main: bool,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta: tuple | None = None,
) -> None:
    """Encode uint32 ARGB[w*h] as one spatially coded image.  ``meta``
    (group_img, bits, mw, n_groups) enables meta-Huffman on the main
    image."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    if is_main:
        if meta is not None:
            group_img, mbits, mw, n_groups = meta
            bw.write(1, 1)
            bw.write(mbits - 2, 3)
            _encode_image(
                bw, group_img, mw, -(-h >> mbits), False, 0, False
            )
        else:
            bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # tokenize: per group symbol streams
    ops: list[tuple] = []  # ('lit',gi,g,r,b,a)|('ref',gi,lcode,lex,leb,dcode,dex,deb)|('cache',gi,idx)
    total = w * h
    pos = 0
    flat = img
    # simple LZ77: exact-run detection of the previous pixel row/pixel
    while pos < total:
        x, y = pos % w, pos // w
        if meta is not None:
            group_img, mbits, mw, _ = meta
            gi = (int(group_img[(y >> mbits) * mw + (x >> mbits)]) >> 8) & 0xFF
        else:
            gi = 0
        px = int(flat[pos])
        if use_lz77 and pos > 0:
            best_len = 0
            best_d = 0
            for d in (1, w) if w > 1 else (1,):
                if d > pos:
                    continue
                ln = 0
                while (
                    pos + ln < total
                    and ln < 4096
                    and int(flat[pos + ln - d]) == int(flat[pos + ln])
                ):
                    ln += 1
                if ln > best_len:
                    best_len, best_d = ln, d
            if best_len >= 3:
                lcode, lex, leb = _prefix_encode_value(best_len)
                dcode, dex, deb = _prefix_encode_value(best_d + 120)
                ops.append(("ref", gi, lcode, lex, leb, dcode, dex, deb))
                for k in range(best_len):
                    cpx = int(flat[pos + k])
                    if cache_size:
                        cache[_cache_index(cpx, cache_bits)] = cpx
                pos += best_len
                continue
        if cache_size:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                ops.append(("cache", gi, ci))
                pos += 1
                continue
            cache[ci] = px
        ops.append(
            (
                "lit",
                gi,
                (px >> 8) & 0xFF,
                (px >> 16) & 0xFF,
                px & 0xFF,
                (px >> 24) & 0xFF,
            )
        )
        pos += 1

    green_alpha = 256 + 24 + cache_size
    streams: list[list[list[int]]] = [
        [[] for _ in range(5)] for _ in range(n_groups)
    ]
    for op in ops:
        kind, gi = op[0], op[1]
        if kind == "lit":
            _, _, g, r, b, a = op
            streams[gi][0].append(g)
            streams[gi][1].append(r)
            streams[gi][2].append(b)
            streams[gi][3].append(a)
        elif kind == "ref":
            _, _, lcode, _, _, dcode, _, _ = op
            streams[gi][0].append(256 + lcode)
            streams[gi][4].append(dcode)
        else:
            streams[gi][0].append(280 + op[2])
    group_codes = []
    for gi in range(n_groups):
        group_codes.append(
            _histogram_codes(
                bw,
                streams[gi],
                [green_alpha, 256, 256, 256, 40],
            )
        )
    for op in ops:
        kind, gi = op[0], op[1]
        green_c, red_c, blue_c, alpha_c, dist_c = group_codes[gi]
        if kind == "lit":
            _, _, g, r, b, a = op
            _emit(bw, green_c, g)
            _emit(bw, red_c, r)
            _emit(bw, blue_c, b)
            _emit(bw, alpha_c, a)
        elif kind == "ref":
            _, _, lcode, lex, leb, dcode, dex, deb = op
            _emit(bw, green_c, 256 + lcode)
            if leb:
                bw.write(lex, leb)
            _emit(bw, dist_c, dcode)
            if deb:
                bw.write(dex, deb)
        else:
            _emit(bw, green_c, 280 + op[2])


def write_vp8l(
    pixels: np.ndarray,
    subtract_green: bool = False,
    predictor_bits: int = 0,
    color_bits: int = 0,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta_bits: int = 0,
) -> bytes:
    """Encode (h, w, 4) uint8 RGBA as VP8L.  Transform toggles select
    the stream features; ``predictor_bits``/``color_bits`` are the
    block size_bits+2 (0 = off), ``meta_bits`` enables a 2-group
    meta-Huffman split (0 = off)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 4:
        raise ValueError("vp8l: pixels must be (h, w, 4) RGBA")
    h, w, _ = px.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("vp8l: dimensions out of range")
    img = (
        px[..., 3].astype(np.uint32) << 24
        | px[..., 0].astype(np.uint32) << 16
        | px[..., 1].astype(np.uint32) << 8
        | px[..., 2].astype(np.uint32)
    ).reshape(-1)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (px[..., 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    enc_w = w
    if palette:
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for v in img:
            v = int(v)
            if v not in index_of:
                index_of[v] = len(colors)
                colors.append(v)
        if len(colors) > 256:
            raise ValueError("vp8l: too many colors for palette")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            d = 0
            for shift in (0, 8, 16, 24):
                d |= ((((c >> shift) & 0xFF) - ((prev >> shift) & 0xFF)) & 0xFF) << shift
            deltas[i] = d
            prev = c
        _encode_image(bw, deltas, len(colors), 1, False, 0, False)
        bpp = _palette_bpp(len(colors))
        ppb = 8 // bpp
        enc_w = -(-w // ppb)
        packed = np.zeros(enc_w * h, dtype=np.uint32)
        for y in range(h):
            for x in range(w):
                idx = index_of[int(img[y * w + x])]
                at = y * enc_w + x // ppb
                cur = int(packed[at])
                green = ((cur >> 8) & 0xFF) | (idx << (bpp * (x % ppb)))
                packed[at] = 0xFF000000 | (green << 8)
        img = packed
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        g = (img >> 8) & 0xFF
        r = (((img >> 16) & 0xFF) - g) & 0xFF
        b = ((img & 0xFF) - g) & 0xFF
        img = (img & np.uint32(0xFF00FF00)) | (r << 16) | b
    if color_bits:
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(color_bits - 2, 3)
        mw = -(-enc_w >> color_bits)
        mh = -(-h >> color_bits)
        # fixed per-block elements derived from the block coords
        ctes = np.zeros(mw * mh, dtype=np.uint32)
        for i in range(mw * mh):
            g2r = (5 * i + 3) & 0xFF
            g2b = (7 * i + 1) & 0xFF
            r2b = (3 * i + 2) & 0xFF
            ctes[i] = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        # forward transform: subtract deltas
        tmp = img.copy()
        for pos in range(enc_w * h):
            x, y = pos % enc_w, pos // enc_w
            cte = int(ctes[(y >> color_bits) * mw + (x >> color_bits)])
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = int(tmp[pos])
            g = (p >> 8) & 0xFF
            r0 = (p >> 16) & 0xFF
            b0 = p & 0xFF
            r = (r0 - _delta(g2r, g)) & 0xFF
            b = (b0 - _delta(g2b, g) - _delta(r2b, r0)) & 0xFF
            tmp[pos] = (p & 0xFF00FF00) | (r << 16) | b
        img = tmp
        _encode_image(bw, ctes, mw, mh, False, 0, False)
    if predictor_bits:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_bits - 2, 3)
        mw = -(-enc_w >> predictor_bits)
        mh = -(-h >> predictor_bits)
        modes = np.zeros(mw * mh, dtype=np.uint32)
        for i in range(mw * mh):
            modes[i] = 0xFF000000 | (((i * 5 + 1) % 14) << 8)
        # forward: residual = pixel - prediction (prediction uses the
        # ORIGINAL pixels, computed in scan order like the decoder)
        orig = img.copy()
        res = img.copy()
        for pos in range(enc_w * h):
            x, y = pos % enc_w, pos // enc_w
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(orig[pos - 1])
            elif x == 0:
                pred = int(orig[pos - enc_w])
            else:
                mode = (int(modes[(y >> predictor_bits) * mw + (x >> predictor_bits)]) >> 8) & 0xFF
                pred = _predict(
                    mode,
                    int(orig[pos - 1]),
                    int(orig[pos - enc_w]),
                    int(orig[pos - enc_w - 1]),
                    int(orig[pos - enc_w + 1]),
                )
            p = int(orig[pos])
            out = 0
            for shift in (0, 8, 16, 24):
                out |= ((((p >> shift) & 0xFF) - ((pred >> shift) & 0xFF)) & 0xFF) << shift
            res[pos] = out
        img = res
        _encode_image(bw, modes, mw, mh, False, 0, False)
    bw.write(0, 1)  # no more transforms
    meta = None
    if meta_bits:
        mw = -(-enc_w >> meta_bits)
        mh = -(-h >> meta_bits)
        group_img = np.zeros(mw * mh, dtype=np.uint32)
        for i in range(mw * mh):
            group_img[i] = 0xFF000000 | ((i % 2) << 8)
        n_groups = (int(max((int(p) >> 8) & 0xFFFF for p in group_img)) + 1)
        meta = (group_img, meta_bits, mw, n_groups)
    _encode_image(
        bw, img, enc_w, h, True, cache_bits, use_lz77, meta
    )
    return bw.bytes()


# --- RIFF container -----------------------------------------------------------------


def write_webp(pixels: np.ndarray, **kwargs) -> bytes:
    """Wrap a VP8L encode in the RIFF WEBP container."""
    payload = write_vp8l(pixels, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def parse_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP file to (h, w, 4) uint8 RGBA."""
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP file")
    (riff_size,) = struct.unpack("<I", buf[4:8])
    if 8 + riff_size > len(buf):
        raise ValueError("webp: RIFF size overruns the payload")
    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError("webp: chunk overruns the file")
        if fourcc == b"VP8L":
            return parse_vp8l(buf[pos + 8 : pos + 8 + size])
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "webp: lossy VP8 / extended format are a disclosed "
                "boundary (require a full video-codec stack)"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk")


# --- VP8 (lossy) frame header + VP8X extended container: METADATA layer ------
#
# r13 (VERDICT r12 task 4): the "metadata in, payload adjudicated out"
# pattern MP3/Vorbis/Opus follow, applied to lossy WebP.  The VP8
# keyframe's leading 10 bytes (RFC 6386 §9.1 "uncompressed data chunk")
# and the whole VP8X extended header are PLAIN-BIT fields — no boolean
# coder, no normative tables — and they carry everything a curation
# pipeline filters on: dimensions, scaling, version, show_frame, the
# first-partition size, and the extended-feature flags.  Payload decode
# (boolean-coded mode/coefficient data) stays a disclosed boundary —
# see SCALE.md round 13 for the VP8/VP9 adjudication.

_VP8_START_CODE = b"\x9d\x01\x2a"


def parse_vp8_frame_header(data: bytes) -> dict:
    """Parse the uncompressed prefix of a VP8 frame (RFC 6386 §9.1).

    3-byte little-endian tag: bit 0 frame type (0 = key), bits 1-3
    version (0-3), bit 4 show_frame, bits 5-23 first-partition size.
    Keyframes continue with the 3-byte start code ``9d 01 2a`` and two
    16-bit LE words: 14-bit width/height plus 2-bit upscale codes.

    Strict: short data, bad start code, version > 3, zero dimensions
    and a first partition overrunning the data all raise ValueError —
    the same loud-failure fuzz contract every parser here carries.
    """
    buf = bytes(data)
    if len(buf) < 3:
        raise ValueError("vp8: frame tag truncated")
    tag = buf[0] | (buf[1] << 8) | (buf[2] << 16)
    key_frame = (tag & 1) == 0
    version = (tag >> 1) & 0x7
    show_frame = bool((tag >> 4) & 1)
    part0_size = tag >> 5
    if version > 3:
        raise ValueError(f"vp8: reserved version {version}")
    out = {
        "key_frame": key_frame,
        "version": version,
        "show_frame": show_frame,
        "part0_size": part0_size,
    }
    if not key_frame:
        if 3 + part0_size > len(buf):
            raise ValueError("vp8: first partition overruns the frame")
        return out
    if len(buf) < 10:
        raise ValueError("vp8: keyframe header truncated")
    if buf[3:6] != _VP8_START_CODE:
        raise ValueError("vp8: bad keyframe start code")
    (wv,) = struct.unpack("<H", buf[6:8])
    (hv,) = struct.unpack("<H", buf[8:10])
    width, xscale = wv & 0x3FFF, wv >> 14
    height, yscale = hv & 0x3FFF, hv >> 14
    if width == 0 or height == 0:
        raise ValueError("vp8: zero frame dimension")
    if 10 + part0_size > len(buf):
        raise ValueError("vp8: first partition overruns the frame")
    out.update(
        width=width, height=height, xscale=xscale, yscale=yscale
    )
    return out


def write_vp8_frame_stub(
    width: int,
    height: int,
    part0: bytes,
    version: int = 0,
    show_frame: bool = True,
    xscale: int = 0,
    yscale: int = 0,
    trailing: bytes = b"",
) -> bytes:
    """Spec-legal VP8 KEYFRAME header bytes over an opaque first
    partition (``part0``) — the fixture writer for the metadata layer.
    The partition content is boolean-coded in a real stream; this
    engine never decodes it (disclosed boundary), so fixtures carry
    deterministic filler there."""
    if not (1 <= width <= 0x3FFF and 1 <= height <= 0x3FFF):
        raise ValueError("vp8: dimensions out of 14-bit range")
    if not (0 <= version <= 3):
        raise ValueError("vp8: version out of range")
    if not (0 <= xscale <= 3 and 0 <= yscale <= 3):
        raise ValueError("vp8: scale code out of range")
    if len(part0) >= 1 << 19:
        raise ValueError("vp8: first partition too large for the tag")
    tag = (len(part0) << 5) | (int(bool(show_frame)) << 4) | (version << 1)
    return (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + _VP8_START_CODE
        + struct.pack("<H", width | (xscale << 14))
        + struct.pack("<H", height | (yscale << 14))
        + part0
        + trailing
    )


# VP8X feature flags (WebP container spec): one flags byte, MSB-first
# Rsv(2) | ICC | Alpha | EXIF | XMP | Animation | Rsv(1)
_VP8X_ICC = 0x20
_VP8X_ALPHA = 0x10
_VP8X_EXIF = 0x08
_VP8X_XMP = 0x04
_VP8X_ANIM = 0x02
_VP8X_FLAG_OF_CHUNK = {
    b"ICCP": _VP8X_ICC,
    b"ALPH": _VP8X_ALPHA,
    b"EXIF": _VP8X_EXIF,
    b"XMP ": _VP8X_XMP,
    b"ANIM": _VP8X_ANIM,
}


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"
    return out


def write_webp_lossy(
    width: int, height: int, part0: bytes, **kw
) -> bytes:
    """RIFF/WEBP simple lossy container around a VP8 keyframe stub."""
    chunk = _riff_chunk(b"VP8 ", write_vp8_frame_stub(width, height, part0, **kw))
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def write_webp_extended(
    canvas_width: int,
    canvas_height: int,
    image_chunk: tuple[bytes, bytes],
    extra_chunks: tuple[tuple[bytes, bytes], ...] = (),
) -> bytes:
    """RIFF/WEBP extended (VP8X) container: flags derived from the
    chunks actually present (so parse's flag↔chunk cross-check holds
    by construction), 24-bit canvas dims, then the feature chunks in
    spec order before the image chunk."""
    if not (1 <= canvas_width <= 1 << 24 and 1 <= canvas_height <= 1 << 24):
        raise ValueError("vp8x: canvas dimensions out of 24-bit range")
    flags = 0
    for fourcc, _ in extra_chunks:
        flags |= _VP8X_FLAG_OF_CHUNK.get(fourcc, 0)
    head = (
        bytes((flags,))
        + b"\x00\x00\x00"
        + struct.pack("<I", canvas_width - 1)[:3]
        + struct.pack("<I", canvas_height - 1)[:3]
    )
    body = _riff_chunk(b"VP8X", head)
    # spec chunk order: ICCP/ANIM before image data, EXIF/XMP after
    pre = [c for c in extra_chunks if c[0] in (b"ICCP", b"ANIM", b"ALPH")]
    post = [c for c in extra_chunks if c[0] in (b"EXIF", b"XMP ")]
    for fourcc, payload in pre:
        body += _riff_chunk(fourcc, payload)
    body += _riff_chunk(*image_chunk)
    for fourcc, payload in post:
        body += _riff_chunk(fourcc, payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def parse_webp_meta(data: bytes) -> dict:
    """Container-level WebP metadata — ALL three container forms:

    - simple lossy (``VP8 ``): the keyframe header fields;
    - simple lossless (``VP8L``): dims + alpha bit from the 5-byte
      VP8L header (signature 0x2f, 14-bit w-1 / h-1, alpha, version);
    - extended (``VP8X``): canvas dims + feature flags, CROSS-CHECKED
      against the chunks actually present (a flag without its chunk,
      or vice versa, raises — the loud-failure contract), plus the
      inner image's own header fields.

    Returns ``{"fmt", "width", "height", ...}`` where width/height are
    the CANVAS dims for extended files and the frame dims otherwise.
    """
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP file")
    (riff_size,) = struct.unpack("<I", buf[4:8])
    if 8 + riff_size > len(buf):
        raise ValueError("webp: RIFF size overruns the payload")
    pos, end = 12, 8 + riff_size
    chunks: list[tuple[bytes, int, int]] = []
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError("webp: chunk overruns the file")
        chunks.append((fourcc, pos + 8, size))
        pos += 8 + size + (size & 1)
    if not chunks:
        raise ValueError("webp: empty container")

    def _vp8l_meta(at: int, size: int) -> dict:
        if size < 5:
            raise ValueError("vp8l: header truncated")
        if buf[at] != 0x2F:
            raise ValueError("vp8l: bad signature byte")
        (v,) = struct.unpack("<I", buf[at + 1 : at + 5])
        if (v >> 29) & 0x7:
            raise ValueError("vp8l: reserved version bits set")
        return {
            "width": (v & 0x3FFF) + 1,
            "height": ((v >> 14) & 0x3FFF) + 1,
            "alpha": bool((v >> 28) & 1),
        }

    first, at0, sz0 = chunks[0]
    if first == b"VP8 ":
        hdr = parse_vp8_frame_header(buf[at0 : at0 + sz0])
        if not hdr["key_frame"]:
            raise ValueError("webp: VP8 chunk must be a keyframe")
        return {"fmt": "lossy", **hdr}
    if first == b"VP8L":
        return {"fmt": "lossless", **_vp8l_meta(at0, sz0)}
    if first != b"VP8X":
        raise ValueError(f"webp: unknown leading chunk {first!r}")
    if sz0 != 10:
        raise ValueError("webp: VP8X chunk must be 10 bytes")
    flags = buf[at0]
    if flags & ~0x3E or buf[at0 + 1 : at0 + 4] != b"\x00\x00\x00":
        raise ValueError("webp: VP8X reserved bits set")
    cw = 1 + (buf[at0 + 4] | (buf[at0 + 5] << 8) | (buf[at0 + 6] << 16))
    ch = 1 + (buf[at0 + 7] | (buf[at0 + 8] << 8) | (buf[at0 + 9] << 16))
    present = {f for f, _, _ in chunks[1:]}
    for fourcc, bit in _VP8X_FLAG_OF_CHUNK.items():
        if bool(flags & bit) != (fourcc in present):
            raise ValueError(
                f"webp: VP8X flag/chunk mismatch for {fourcc!r}"
            )
    out = {
        "fmt": "extended",
        "width": cw,
        "height": ch,
        "has_icc": bool(flags & _VP8X_ICC),
        "has_alpha": bool(flags & _VP8X_ALPHA),
        "has_exif": bool(flags & _VP8X_EXIF),
        "has_xmp": bool(flags & _VP8X_XMP),
        "has_anim": bool(flags & _VP8X_ANIM),
        "n_chunks": len(chunks),
    }
    for fourcc, at, sz in chunks[1:]:
        if fourcc == b"VP8 ":
            hdr = parse_vp8_frame_header(buf[at : at + sz])
            if not hdr["key_frame"]:
                raise ValueError("webp: VP8 chunk must be a keyframe")
            out["image"] = {"fmt": "lossy", **hdr}
            break
        if fourcc == b"VP8L":
            out["image"] = {"fmt": "lossless", **_vp8l_meta(at, sz)}
            break
    return out


# --- animated WebP (ANIM/ANMF) — still the plain-bit metadata layer ----------


def write_webp_animated(
    canvas_width: int,
    canvas_height: int,
    frames: "list[dict]",
    loop_count: int = 0,
    background: int = 0,
    extra_chunks: tuple[tuple[bytes, bytes], ...] = (),
) -> bytes:
    """Animated WebP container: VP8X with the ANIM flag, an ANIM chunk
    (4-byte background BGRA + 16-bit loop count), then one ANMF per
    frame.  Each ``frames`` entry: ``{"x", "y", "image": (fourcc,
    payload), "duration", "dispose", "blend"}`` — x/y must be even
    (the header stores them halved, per the container spec), and the
    frame dims are taken FROM the image chunk's own header so the
    ANMF↔image cross-check in :func:`parse_webp_meta` holds by
    construction."""
    if not (1 <= canvas_width <= 1 << 24 and 1 <= canvas_height <= 1 << 24):
        raise ValueError("vp8x: canvas dimensions out of 24-bit range")
    if not (0 <= loop_count < 1 << 16):
        raise ValueError("anim: loop count out of 16-bit range")
    if not frames:
        raise ValueError("anim: at least one frame required")
    flags = _VP8X_ANIM
    for fourcc, _ in extra_chunks:
        flags |= _VP8X_FLAG_OF_CHUNK.get(fourcc, 0)
    head = (
        bytes((flags,))
        + b"\x00\x00\x00"
        + struct.pack("<I", canvas_width - 1)[:3]
        + struct.pack("<I", canvas_height - 1)[:3]
    )
    body = _riff_chunk(b"VP8X", head)
    for fourcc, payload in extra_chunks:
        if fourcc in (b"ICCP",):
            body += _riff_chunk(fourcc, payload)
    body += _riff_chunk(
        b"ANIM", struct.pack("<I", background) + struct.pack("<H", loop_count)
    )
    for f in frames:
        fourcc, payload = f["image"]
        if fourcc == b"VP8 ":
            hdr = parse_vp8_frame_header(payload)
            fw, fh = hdr["width"], hdr["height"]
        elif fourcc == b"VP8L":
            if len(payload) < 5 or payload[0] != 0x2F:
                raise ValueError("anim: bad VP8L frame payload")
            (v,) = struct.unpack("<I", payload[1:5])
            fw, fh = (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        else:
            raise ValueError(f"anim: frame image chunk {fourcc!r}")
        x, y = f.get("x", 0), f.get("y", 0)
        if x % 2 or y % 2:
            raise ValueError("anim: frame x/y must be even (stored halved)")
        if x + fw > canvas_width or y + fh > canvas_height:
            raise ValueError("anim: frame rectangle outside the canvas")
        dur = f.get("duration", 100)
        if not (0 <= dur < 1 << 24):
            raise ValueError("anim: duration out of 24-bit range")
        fb = (int(bool(f.get("dispose", False))) << 0) | (
            int(bool(f.get("blend", False))) << 1
        )
        anmf = (
            struct.pack("<I", x // 2)[:3]
            + struct.pack("<I", y // 2)[:3]
            + struct.pack("<I", fw - 1)[:3]
            + struct.pack("<I", fh - 1)[:3]
            + struct.pack("<I", dur)[:3]
            + bytes((fb,))
            + _riff_chunk(fourcc, payload)
        )
        body += _riff_chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def parse_webp_anim(data: bytes) -> dict:
    """Animated-WebP metadata: :func:`parse_webp_meta` fields plus the
    ANIM chunk (loop count, background BGRA) and every ANMF frame's
    header (x, y, w, h, duration ms, blend/dispose bits), each frame's
    dims CROSS-CHECKED against its embedded image chunk's own header —
    a mismatch raises (loud-failure contract).  Returns ``{"fmt":
    "animated", "width", "height", "loop_count", "background",
    "n_frames", "total_duration", "frames": [...]}``."""
    meta = parse_webp_meta(data)
    if not meta.get("has_anim"):
        raise ValueError("webp: not an animated file (no ANIM flag)")
    buf = bytes(data)
    (riff_size,) = struct.unpack("<I", buf[4:8])
    pos, end = 12, 8 + riff_size
    anim = None
    frames: list[dict] = []
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        at = pos + 8
        if fourcc == b"ANIM":
            if size != 6:
                raise ValueError("webp: ANIM chunk must be 6 bytes")
            (bg,) = struct.unpack("<I", buf[at : at + 4])
            (loop,) = struct.unpack("<H", buf[at + 4 : at + 6])
            anim = {"background": bg, "loop_count": loop}
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("webp: ANMF header truncated")
            def u24(o):
                return buf[at + o] | (buf[at + o + 1] << 8) | (buf[at + o + 2] << 16)
            fx, fy = 2 * u24(0), 2 * u24(3)
            fw, fh = u24(6) + 1, u24(9) + 1
            dur = u24(12)
            fb = buf[at + 15]
            if fb & ~0x03:
                raise ValueError("webp: ANMF reserved flag bits set")
            sub = buf[at + 16 : at + size]
            if len(sub) < 8:
                raise ValueError("webp: ANMF frame data truncated")
            sf = sub[:4]
            (ssz,) = struct.unpack("<I", sub[4:8])
            if 8 + ssz > len(sub):
                raise ValueError("webp: ANMF frame chunk overruns")
            if sf == b"VP8 ":
                hdr = parse_vp8_frame_header(sub[8 : 8 + ssz])
                iw, ih = hdr["width"], hdr["height"]
            elif sf == b"VP8L":
                if ssz < 5 or sub[8] != 0x2F:
                    raise ValueError("webp: ANMF VP8L header bad")
                (v,) = struct.unpack("<I", sub[9:13])
                iw, ih = (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
            else:
                raise ValueError(f"webp: ANMF frame chunk {sf!r}")
            if (iw, ih) != (fw, fh):
                raise ValueError(
                    f"webp: ANMF dims {fw}x{fh} disagree with frame "
                    f"image header {iw}x{ih}"
                )
            if fx + fw > meta["width"] or fy + fh > meta["height"]:
                raise ValueError(
                    "webp: ANMF frame rectangle outside the canvas"
                )
            frames.append(
                {
                    "x": fx, "y": fy, "width": fw, "height": fh,
                    "duration": dur,
                    "dispose": bool(fb & 1), "blend": bool(fb & 2),
                }
            )
        pos += 8 + size + (size & 1)
    if anim is None:
        raise ValueError("webp: ANIM flag set but no ANIM chunk")
    if not frames:
        raise ValueError("webp: animated file with no ANMF frames")
    return {
        "fmt": "animated",
        "width": meta["width"],
        "height": meta["height"],
        **anim,
        "n_frames": len(frames),
        "total_duration": sum(f["duration"] for f in frames),
        "frames": frames,
    }
