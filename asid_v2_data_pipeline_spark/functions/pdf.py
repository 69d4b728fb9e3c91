"""Minimal PDF writer + text extractor (ISO 32000 subset, pure
Python).

PDF is the single largest document format in web-scale training
corpora; an ingestion engine that can't pull text out of a PDF leaves
that slice of the crawl on the floor.  Implemented from the public
ISO 32000-1 object model:

- **Objects**: dictionaries, arrays, names (with ``#xx`` escapes),
  numbers, booleans, null, literal strings (nested parens, all
  ``\\``-escapes, octal, line continuations), hex strings, indirect
  references, streams (``/Length`` possibly indirect).
- **Cross-reference**: BOTH classic ``xref`` tables (20-byte entries,
  ``/Prev`` chains for incremental updates) and modern cross-reference
  STREAMS (``/Type/XRef``, ``/W`` field widths, ``/Index`` runs, PNG
  predictors 10-15 and TIFF predictor 2 on the decoded rows) with
  type-2 entries resolving through OBJECT streams (``/Type/ObjStm``,
  ``/N``/``/First`` header of ``(objnum, offset)`` pairs) — the layout
  the majority of modern PDFs actually use.
- **Filters**: ``FlateDecode`` (with ``/DecodeParms`` predictors) and
  ``ASCIIHexDecode``, single or in filter arrays.
- **Text**: page tree walk (``/Pages``/``/Kids``, inheritance-free
  subset), content streams tokenized with the same lexer, text shown
  by ``Tj``, ``'``, ``"`` and ``TJ`` collected per page; strings
  decoded as Latin-1 (StandardEncoding's shared range — the writer
  only emits that range).

The writer emits deterministic bytes in either layout (``classic`` or
``xrefstream`` — the latter packs non-stream objects into one object
stream and writes a predictor-2 xref stream), so fixtures exercise
both parse paths with from-octets oracles.  The reference pipeline has
no document surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Disclosed boundaries (``NotImplementedError``): encryption
(``/Encrypt``), filters beyond Flate/ASCIIHex (LZW, DCT, JBIG2…),
non-Latin-1 text in the writer (composite fonts / ToUnicode CMaps),
linearization hints (ignored, not an error).

Fuzz contract (SCALE.md round 10): ``parse_pdf_text`` raises
``ValueError`` on malformed input — bad header/startxref, offsets
outside the file, xref loops, stream length overruns, bad predictors,
unbalanced structures — never ``IndexError``/``KeyError``/
``RecursionError`` escapes, never unbounded allocation or hangs
(object counts, nesting depth and xref-chain length are all capped).
"""

from __future__ import annotations

import re
import zlib

_HEADER = b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
_MAX_OBJECTS = 1 << 22
_MAX_DEPTH = 48
_MAX_XREF_CHAIN = 64

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    """An indirect reference ``n g R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover
        return f"{self.num} {self.gen} R"

    def __eq__(self, other):
        return (
            isinstance(other, _Ref)
            and other.num == self.num
            and other.gen == self.gen
        )

    def __hash__(self):
        return hash((self.num, self.gen))


class _Name(str):
    """A PDF name — distinct from strings in dict keys/values."""


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


# --- writer -----------------------------------------------------------------------


def _esc_string(s: str) -> bytes:
    """A literal PDF string for Latin-1 text."""
    out = bytearray(b"(")
    for ch in s:
        o = ord(ch)
        if o > 255:
            raise NotImplementedError(
                "pdf: non-Latin-1 text needs composite fonts"
            )
        if ch in "()\\":
            out += b"\\" + ch.encode("latin-1")
        elif 32 <= o <= 126:
            out.append(o)
        else:
            out += b"\\%03o" % o
    out += b")"
    return bytes(out)


def _ser(v) -> bytes:
    """Serialize one PDF object value."""
    if isinstance(v, _Ref):
        return b"%d %d R" % (v.num, v.gen)
    if isinstance(v, _Name):
        return b"/" + v.encode("latin-1")
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if v is None:
        return b"null"
    if isinstance(v, int):
        return b"%d" % v
    if isinstance(v, float):
        return (f"{v:.6f}").rstrip("0").rstrip(".").encode()
    if isinstance(v, str):
        return _esc_string(v)
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, list):
        return b"[" + b" ".join(_ser(x) for x in v) + b"]"
    if isinstance(v, dict):
        out = b"<<"
        for k, val in v.items():
            out += b"/" + k.encode("latin-1") + b" " + _ser(val)
        return out + b">>"
    raise ValueError(f"pdf: cannot serialize {type(v)}")


def _content_stream(lines: list[str]) -> bytes:
    """A text-only content stream: one Tj per line, T* line feeds."""
    out = bytearray(b"BT /F1 11 Tf 12 TL 54 768 Td\n")
    for i, line in enumerate(lines):
        if i:
            out += b"T* "
        out += _esc_string(line) + b" Tj\n"
    out += b"ET\n"
    return bytes(out)


def write_pdf(
    pages: list[list[str]],
    mode: str = "classic",
    compress: bool = True,
) -> bytes:
    """A complete single-font PDF whose page ``i`` shows
    ``pages[i]``'s lines.  ``mode="classic"`` writes a classic xref
    table; ``mode="xrefstream"`` packs the catalog/pages/page/font
    dictionaries into an OBJECT stream and writes a cross-reference
    STREAM (predictor 2) — the two real-world file layouts."""
    if mode not in ("classic", "xrefstream"):
        raise ValueError(f"pdf: unknown mode {mode!r}")
    if not pages:
        pages = [[]]
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page i:
    # 4+2i page, 5+2i content
    cat = {"Type": _Name("Catalog"), "Pages": _Ref(2, 0)}
    kids = [_Ref(4 + 2 * i, 0) for i in range(n_pages)]
    pagesd = {
        "Type": _Name("Pages"),
        "Kids": kids,
        "Count": n_pages,
    }
    font = {
        "Type": _Name("Font"),
        "Subtype": _Name("Type1"),
        "BaseFont": _Name("Helvetica"),
    }
    objs: dict[int, object] = {1: cat, 2: pagesd, 3: font}
    for i, lines in enumerate(pages):
        body = _content_stream(lines)
        sd: dict = {}
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, 15)
            raw = co.compress(body) + co.flush()
            sd["Filter"] = _Name("FlateDecode")
        else:
            raw = body
        sd["Length"] = len(raw)
        objs[4 + 2 * i] = {
            "Type": _Name("Page"),
            "Parent": _Ref(2, 0),
            "MediaBox": [0, 0, 612, 792],
            "Resources": {"Font": {"F1": _Ref(3, 0)}},
            "Contents": _Ref(5 + 2 * i, 0),
        }
        objs[5 + 2 * i] = _Stream(sd, raw)

    if mode == "classic":
        return _write_classic(objs)
    return _write_xrefstream(objs)


def _write_classic(objs: dict) -> bytes:
    out = bytearray(_HEADER)
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        v = objs[num]
        out += b"%d 0 obj\n" % num
        if isinstance(v, _Stream):
            out += _ser(v.d) + b"\nstream\n" + v.raw + b"\nendstream"
        else:
            out += _ser(v)
        out += b"\nendobj\n"
    xref_at = len(out)
    maxn = max(objs)
    out += b"xref\n0 %d\n" % (maxn + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        out += b"%010d 00000 n \n" % offsets[num]
    trailer = {
        "Size": maxn + 1,
        "Root": _Ref(1, 0),
    }
    out += b"trailer\n" + _ser(trailer) + b"\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


def _write_xrefstream(objs: dict) -> bytes:
    """Modern layout: non-stream objects in one object stream, stream
    objects top-level, one xref stream (fields ``/W [1 4 2]``,
    TIFF predictor 2 over 7-byte rows)."""
    out = bytearray(_HEADER)
    packed = sorted(n for n, v in objs.items() if not isinstance(v, _Stream))
    top = sorted(n for n, v in objs.items() if isinstance(v, _Stream))
    objstm_num = max(objs) + 1
    xref_num = objstm_num + 1

    # build the object stream
    header = bytearray()
    body = bytearray()
    inner_off: dict[int, int] = {}
    for n in packed:
        inner_off[n] = len(body)
        body += _ser(objs[n]) + b"\n"
    for n in packed:
        header += b"%d %d " % (n, inner_off[n])
    stm_body = bytes(header) + bytes(body)
    co = zlib.compressobj(6, zlib.DEFLATED, 15)
    stm_zip = co.compress(stm_body) + co.flush()

    offsets: dict[int, int] = {}
    for n in top:
        offsets[n] = len(out)
        v = objs[n]
        out += b"%d 0 obj\n" % n
        out += _ser(v.d) + b"\nstream\n" + v.raw + b"\nendstream\nendobj\n"
    offsets[objstm_num] = len(out)
    objstm_d = {
        "Type": _Name("ObjStm"),
        "N": len(packed),
        "First": len(header),
        "Filter": _Name("FlateDecode"),
        "Length": len(stm_zip),
    }
    out += b"%d 0 obj\n" % objstm_num
    out += _ser(objstm_d) + b"\nstream\n" + stm_zip + b"\nendstream\nendobj\n"

    # xref stream rows: W = [1 4 2]; entries 0..xref_num
    xref_at = len(out)
    rows = bytearray()

    def _row(t: int, f2: int, f3: int):
        rows.append(t)
        rows.extend(f2.to_bytes(4, "big") + f3.to_bytes(2, "big"))

    _row(0, 0, 0xFFFF)  # object 0: free
    for n in range(1, xref_num + 1):
        if n in packed:
            _row(2, objstm_num, packed.index(n))
        elif n in offsets:
            _row(1, offsets[n], 0)
        elif n == xref_num:
            _row(1, xref_at, 0)
        else:  # pragma: no cover — no gaps in our numbering
            _row(0, 0, 0xFFFF)
    # TIFF predictor 2 is horizontal differencing per row: with
    # 1-byte-wide samples this is byte-delta within the row
    width = 7
    pred = bytearray()
    for at in range(0, len(rows), width):
        row = rows[at : at + width]
        prev = 0
        for b in row:
            pred.append((b - prev) & 0xFF)
            prev = b
    co = zlib.compressobj(6, zlib.DEFLATED, 15)
    xz = co.compress(bytes(pred)) + co.flush()
    xd = {
        "Type": _Name("XRef"),
        "Size": xref_num + 1,
        "W": [1, 4, 2],
        "Root": _Ref(1, 0),
        "Filter": _Name("FlateDecode"),
        "DecodeParms": {"Predictor": 2, "Columns": 7, "Colors": 1},
        "Length": len(xz),
    }
    out += b"%d 0 obj\n" % xref_num
    out += _ser(xd) + b"\nstream\n" + xz + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# --- lexer / object parser ---------------------------------------------------------


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                e = d.find(b"\n", self.pos)
                self.pos = n if e < 0 else e + 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        return self.data[self.pos : self.pos + k]

    def read_token(self) -> bytes:
        """Next regular token (operator / keyword), after whitespace."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise ValueError("pdf: unexpected end of input")
        c = d[self.pos]
        if c in _DELIM:
            if d[self.pos : self.pos + 2] in (b"<<", b">>"):
                self.pos += 2
                return d[self.pos - 2 : self.pos]
            self.pos += 1
            return d[self.pos - 1 : self.pos]
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        return d[start : self.pos]

    def parse_object(self, depth: int = 0):
        """Parse one object starting at the current position."""
        if depth > _MAX_DEPTH:
            raise ValueError("pdf: structure nested too deep")
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise ValueError("pdf: unexpected end of input")
        c = d[self.pos]
        if d[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            out: dict = {}
            while True:
                self._skip_ws()
                if d[self.pos : self.pos + 2] == b">>":
                    self.pos += 2
                    return out
                key = self.parse_object(depth + 1)
                if not isinstance(key, _Name):
                    raise ValueError("pdf: dict key is not a name")
                out[str(key)] = self.parse_object(depth + 1)
        if c == 0x3C:  # '<' hex string
            e = d.find(b">", self.pos + 1)
            if e < 0:
                raise ValueError("pdf: unterminated hex string")
            hx = re.sub(rb"\s", b"", d[self.pos + 1 : e])
            if len(hx) % 2:
                hx += b"0"
            try:
                raw = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError) as exc:
                raise ValueError("pdf: bad hex string") from exc
            self.pos = e + 1
            return raw.decode("latin-1")
        if c == 0x28:  # '(' literal string
            return self._parse_literal_string()
        if c == 0x2F:  # '/' name
            self.pos += 1
            start = self.pos
            while self.pos < n and d[self.pos] not in _WS + _DELIM:
                self.pos += 1
            raw = d[start : self.pos]
            # #xx escapes
            def _unhash(m):
                return bytes([int(m.group(1), 16)])

            try:
                raw = re.sub(rb"#([0-9A-Fa-f]{2})", _unhash, raw)
            except ValueError as exc:  # pragma: no cover
                raise ValueError("pdf: bad name escape") from exc
            return _Name(raw.decode("latin-1"))
        if c == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos < n and d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object(depth + 1))
        if c == 0x5D or c == 0x3E or c == 0x29:
            raise ValueError("pdf: unbalanced close delimiter")
        tok = self.read_token()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        # number or indirect reference
        try:
            if re.fullmatch(rb"[+-]?\d+", tok):
                num = int(tok)
                # lookahead for "gen R"
                save = self.pos
                try:
                    t2 = self.read_token()
                    t3 = self.read_token()
                    if re.fullmatch(rb"\d+", t2) and t3 == b"R":
                        return _Ref(num, int(t2))
                except ValueError:
                    pass
                self.pos = save
                return num
            if re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", tok):
                return float(tok)
        except ValueError as exc:
            raise ValueError(f"pdf: bad number {tok!r}") from exc
        raise ValueError(f"pdf: unexpected token {tok!r}")

    def _parse_literal_string(self) -> str:
        d, n = self.data, len(self.data)
        self.pos += 1
        out = bytearray()
        level = 1
        while True:
            if self.pos >= n:
                raise ValueError("pdf: unterminated literal string")
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    raise ValueError("pdf: truncated string escape")
                e = d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f",
                    }[e]
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = e - 0x30
                    for _ in range(2):
                        if self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                            val = val * 8 + (d[self.pos] - 0x30)
                            self.pos += 1
                    out.append(val & 0xFF)
                elif e == 0x0A:
                    pass  # line continuation
                elif e == 0x0D:
                    if self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)  # spec: backslash ignored
            elif c == 0x28:
                level += 1
                out.append(c)
            elif c == 0x29:
                level -= 1
                if level == 0:
                    return out.decode("latin-1")
                out.append(c)
            else:
                out.append(c)


# --- document parser ----------------------------------------------------------------


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    pred = parms.get("Predictor", 1)
    if pred == 1:
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if bpc != 8:
        raise NotImplementedError("pdf: predictor with BitsPerComponent != 8")
    bpp = colors
    row_w = colors * columns
    if pred == 2:  # TIFF horizontal differencing
        out = bytearray(data)
        if row_w <= 0 or len(out) % row_w:
            raise ValueError("pdf: predictor row size mismatch")
        for at in range(0, len(out), row_w):
            for i in range(bpp, row_w):
                out[at + i] = (out[at + i] + out[at + i - bpp]) & 0xFF
        return bytes(out)
    if 10 <= pred <= 15:  # PNG predictors: per-row filter byte
        if (row_w + 1) <= 1 or len(data) % (row_w + 1):
            raise ValueError("pdf: predictor row size mismatch")
        out = bytearray()
        prev = bytearray(row_w)
        for at in range(0, len(data), row_w + 1):
            ft = data[at]
            row = bytearray(data[at + 1 : at + 1 + row_w])
            if ft == 0:
                pass
            elif ft == 1:
                for i in range(bpp, row_w):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif ft == 2:
                for i in range(row_w):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif ft == 3:
                for i in range(row_w):
                    left = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ft == 4:
                for i in range(row_w):
                    a = row[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    cc = prev[i - bpp] if i >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    row[i] = (row[i] + pr) & 0xFF
            else:
                raise ValueError(f"pdf: bad PNG filter type {ft}")
            out += row
            prev = row
        return bytes(out)
    raise NotImplementedError(f"pdf: predictor {pred}")


class _Document:
    def __init__(self, data: bytes):
        self.data = data
        self.xref: dict[int, tuple] = {}  # num -> (1, offset) | (2, stm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._parse_startxref()

    # -- xref ------------------------------------------------------------

    def _parse_startxref(self):
        data = self.data
        if not data.startswith(b"%PDF-"):
            raise ValueError("pdf: missing header")
        tail = data[-2048:]
        at = tail.rfind(b"startxref")
        if at < 0:
            raise ValueError("pdf: missing startxref")
        m = re.match(rb"startxref\s+(\d+)", tail[at:])
        if not m:
            raise ValueError("pdf: malformed startxref")
        off = int(m.group(1))
        seen = set()
        for _ in range(_MAX_XREF_CHAIN):
            if off in seen:
                raise ValueError("pdf: xref chain loop")
            seen.add(off)
            if off < 0 or off >= len(data):
                raise ValueError("pdf: xref offset outside file")
            if data[off : off + 4] == b"xref":
                prev = self._parse_xref_table(off)
            else:
                prev = self._parse_xref_stream(off)
            if "Encrypt" in self.trailer:
                raise NotImplementedError("pdf: encrypted document")
            if prev is None:
                return
            off = prev
        raise ValueError("pdf: xref chain too long")

    def _parse_xref_table(self, off: int):
        lex = _Lexer(self.data, off)
        if lex.read_token() != b"xref":
            raise ValueError("pdf: bad xref keyword")
        while True:
            lex._skip_ws()
            if lex.peek_bytes(7) == b"trailer":
                lex.read_token()
                tr = lex.parse_object()
                if not isinstance(tr, dict):
                    raise ValueError("pdf: trailer is not a dict")
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                return tr.get("Prev")
            start = lex.read_token()
            count = lex.read_token()
            if not (
                re.fullmatch(rb"\d+", start) and re.fullmatch(rb"\d+", count)
            ):
                raise ValueError("pdf: bad xref subsection header")
            start, count = int(start), int(count)
            if count > _MAX_OBJECTS:
                raise ValueError("pdf: implausible xref count")
            lex._skip_ws()
            for i in range(count):
                entry = self.data[lex.pos : lex.pos + 20]
                m = re.match(rb"(\d{10}) (\d{5}) ([nf])", entry)
                if not m:
                    raise ValueError("pdf: malformed xref entry")
                lex.pos += 20
                num = start + i
                if m.group(3) == b"n" and num not in self.xref:
                    self.xref[num] = (1, int(m.group(1)))

    def _parse_xref_stream(self, off: int):
        num, stm = self._parse_indirect_at(off)
        if not isinstance(stm, _Stream):
            raise ValueError("pdf: xref offset is not an xref stream")
        d = stm.d
        if d.get("Type") != "XRef":
            raise ValueError("pdf: xref stream has wrong /Type")
        body = self._decode_stream(stm)
        w = d.get("W")
        if (
            not isinstance(w, list)
            or len(w) != 3
            or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)
        ):
            raise ValueError("pdf: bad /W in xref stream")
        size = d.get("Size")
        if not isinstance(size, int) or size < 0 or size > _MAX_OBJECTS:
            raise ValueError("pdf: bad /Size in xref stream")
        index = d.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2:
            raise ValueError("pdf: bad /Index in xref stream")
        rw = sum(w)
        if rw == 0 or len(body) % rw:
            raise ValueError("pdf: xref stream size mismatch")
        pos = 0

        def field(width, default):
            nonlocal pos
            if width == 0:
                return default
            v = int.from_bytes(body[pos : pos + width], "big")
            pos += width
            return v

        for at in range(0, len(index), 2):
            start, count = index[at], index[at + 1]
            if (
                not isinstance(start, int)
                or not isinstance(count, int)
                or count < 0
                or count > _MAX_OBJECTS
            ):
                raise ValueError("pdf: bad /Index run")
            for i in range(count):
                if pos + rw > len(body):
                    raise ValueError("pdf: xref stream truncated")
                t = field(w[0], 1)
                f2 = field(w[1], 0)
                f3 = field(w[2], 0)
                numx = start + i
                if numx in self.xref:
                    continue
                if t == 1:
                    self.xref[numx] = (1, f2)
                elif t == 2:
                    self.xref[numx] = (2, f2, f3)
                # t == 0: free — skip
        for k, v in d.items():
            if k in ("Size", "Root", "Info", "ID", "Encrypt", "Prev"):
                self.trailer.setdefault(k, v)
        return d.get("Prev")

    # -- objects ---------------------------------------------------------

    def _parse_indirect_at(self, off: int) -> tuple[int, object]:
        if off < 0 or off >= len(self.data):
            raise ValueError("pdf: object offset outside file")
        lex = _Lexer(self.data, off)
        t1 = lex.read_token()
        t2 = lex.read_token()
        t3 = lex.read_token()
        if (
            not re.fullmatch(rb"\d+", t1)
            or not re.fullmatch(rb"\d+", t2)
            or t3 != b"obj"
        ):
            raise ValueError("pdf: malformed indirect object header")
        num = int(t1)
        val = lex.parse_object()
        lex._skip_ws()
        if isinstance(val, dict) and lex.peek_bytes(6) == b"stream":
            lex.pos += 6
            if lex.peek_bytes(2) == b"\r\n":
                lex.pos += 2
            elif lex.peek_bytes(1) == b"\n":
                lex.pos += 1
            length = val.get("Length")
            if isinstance(length, _Ref):
                length = self.resolve(length)
            if not isinstance(length, int) or length < 0:
                raise ValueError("pdf: bad stream /Length")
            if lex.pos + length > len(self.data):
                raise ValueError("pdf: stream exceeds file")
            raw = self.data[lex.pos : lex.pos + length]
            return num, _Stream(val, raw)
        return num, val

    def resolve(self, v, depth: int = 0):
        while isinstance(v, _Ref):
            if depth > _MAX_DEPTH:
                raise ValueError("pdf: reference chain too deep")
            depth += 1
            v = self._load(v.num)
        return v

    def _load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None  # spec: missing object is null
        self._cache[num] = None  # cycle guard
        if ent[0] == 1:
            got_num, val = self._parse_indirect_at(ent[1])
            if got_num != num:
                raise ValueError("pdf: xref points at wrong object")
        else:
            val = self._load_from_objstm(ent[1], ent[2])
        self._cache[num] = val
        return val

    def _load_from_objstm(self, stm_num: int, idx: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            stm = self.resolve(_Ref(stm_num, 0))
            if not isinstance(stm, _Stream) or stm.d.get("Type") != "ObjStm":
                raise ValueError("pdf: type-2 entry points at non-ObjStm")
            n = stm.d.get("N")
            first = stm.d.get("First")
            if (
                not isinstance(n, int)
                or not isinstance(first, int)
                or n < 0
                or n > _MAX_OBJECTS
                or first < 0
            ):
                raise ValueError("pdf: bad ObjStm header")
            body = self._decode_stream(stm)
            hdr = _Lexer(body[:first])
            pairs = []
            for _ in range(n):
                a = hdr.read_token()
                b = hdr.read_token()
                if not (
                    re.fullmatch(rb"\d+", a) and re.fullmatch(rb"\d+", b)
                ):
                    raise ValueError("pdf: bad ObjStm pair")
                pairs.append((int(a), int(b)))
            objs = []
            for _num, off in pairs:
                if first + off > len(body):
                    raise ValueError("pdf: ObjStm offset outside stream")
                objs.append(_Lexer(body, first + off).parse_object())
            self._objstm_cache[stm_num] = objs
        if idx < 0 or idx >= len(objs):
            raise ValueError("pdf: ObjStm index out of range")
        return objs[idx]

    def _decode_stream(self, stm: _Stream) -> bytes:
        filters = stm.d.get("Filter")
        if isinstance(filters, _Ref):
            filters = self.resolve(filters)
        if filters is None:
            filters = []
        elif isinstance(filters, _Name):
            filters = [filters]
        elif not isinstance(filters, list):
            raise ValueError("pdf: bad /Filter")
        parms = stm.d.get("DecodeParms")
        if isinstance(parms, _Ref):
            parms = self.resolve(parms)
        if parms is None:
            parms = [{}] * len(filters)
        elif isinstance(parms, dict):
            parms = [parms]
        elif not isinstance(parms, list):
            raise ValueError("pdf: bad /DecodeParms")
        while len(parms) < len(filters):
            parms.append({})
        body = stm.raw
        for f, p in zip(filters, parms):
            if isinstance(p, _Ref):
                p = self.resolve(p)
            if p is None:
                p = {}
            if not isinstance(p, dict):
                raise ValueError("pdf: bad DecodeParms entry")
            if f == "FlateDecode":
                try:
                    body = zlib.decompressobj().decompress(
                        body, 1 << 26
                    )
                except zlib.error as e:
                    raise ValueError(f"pdf: corrupt flate stream: {e}") from e
                body = _apply_predictor(body, p)
            elif f == "ASCIIHexDecode":
                hx = re.sub(rb"[\s>]", b"", body)
                if len(hx) % 2:
                    hx += b"0"
                try:
                    body = bytes.fromhex(hx.decode("ascii"))
                except (ValueError, UnicodeDecodeError) as e:
                    raise ValueError("pdf: bad ASCIIHex stream") from e
            else:
                raise NotImplementedError(f"pdf: filter {f}")
        return body

    # -- pages + text ------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("pdf: missing /Root catalog")
        out: list[dict] = []

        def walk(node, depth):
            if depth > _MAX_DEPTH:
                raise ValueError("pdf: page tree too deep")
            node = self.resolve(node)
            if not isinstance(node, dict):
                raise ValueError("pdf: bad page-tree node")
            t = node.get("Type")
            if t == "Pages":
                kids = self.resolve(node.get("Kids"))
                if not isinstance(kids, list):
                    raise ValueError("pdf: /Pages without /Kids")
                if len(out) + len(kids) > _MAX_OBJECTS:
                    raise ValueError("pdf: implausible page count")
                for k in kids:
                    walk(k, depth + 1)
            elif t == "Page":
                out.append(node)
            else:
                raise ValueError(f"pdf: unexpected page-tree type {t!r}")

        walk(root.get("Pages"), 0)
        return out

    def page_text(self, page: dict) -> str:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return ""
        streams = contents if isinstance(contents, list) else [contents]
        body = bytearray()
        for s in streams:
            s = self.resolve(s)
            if not isinstance(s, _Stream):
                raise ValueError("pdf: /Contents is not a stream")
            body += self._decode_stream(s)
            body += b"\n"
        return _extract_text(bytes(body))


def _extract_text(content: bytes) -> str:
    """Collect shown text from a content stream: every ``Tj``/``'``/
    ``"`` emits one line; ``TJ`` concatenates its array's strings into
    one line.  (Positioning operators are parsed and discarded — the
    writer's layout is line-per-Tj, the common text-PDF shape.)"""
    lex = _Lexer(content)
    stack: list = []
    lines: list[str] = []
    while True:
        lex._skip_ws()
        if lex.pos >= len(content):
            break
        c = content[lex.pos]
        if c in b"(<[/+-.0123456789" or content[
            lex.pos : lex.pos + 2
        ] == b"<<":
            stack.append(lex.parse_object())
            if len(stack) > 4096:
                raise ValueError("pdf: operand stack overflow")
            continue
        op = lex.read_token()
        if op in (b"Tj", b"'"):
            if not stack or not isinstance(stack[-1], str):
                raise ValueError("pdf: text operator without string")
            lines.append(stack[-1])
        elif op == b'"':
            if not stack or not isinstance(stack[-1], str):
                raise ValueError("pdf: text operator without string")
            lines.append(stack[-1])
        elif op == b"TJ":
            if not stack or not isinstance(stack[-1], list):
                raise ValueError("pdf: TJ without array")
            lines.append(
                "".join(x for x in stack[-1] if isinstance(x, str))
            )
        stack = []
    return "\n".join(lines)


def parse_pdf_text(data: bytes) -> list[str]:
    """Extract the shown text of every page, in page-tree order."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("pdf: payload must be bytes")
    doc = _Document(bytes(data))
    return [doc.page_text(p) for p in doc.pages()]
