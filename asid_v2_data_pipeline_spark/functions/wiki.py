"""MediaWiki dump ingestion: XML subset parser + wikitext stripper
(pure Python, from the public formats).

Wikipedia dumps (``pages-articles.xml``) are a canonical LLM
training-data source: a MediaWiki export XML wrapping wikitext markup
per page.  Two kernels:

- **``parse_xml``** — a strict, allocation-bounded XML subset parser
  (elements + attributes, character data, the five predefined
  entities plus numeric references, CDATA sections, comments,
  processing instructions and the XML declaration skipped, UTF-8).
  Strictness is per the XML spec: malformed input raises
  ``ValueError`` (unlike HTML, XML is not forgiving).  DTDs, external
  entities (XXE is a non-feature by design) and namespaces-as-
  semantics are disclosed boundaries — ``xmlns`` attributes are
  carried verbatim.
- **``wikitext_to_lines``** — a deterministic wikitext→plain-text
  stripper over the public markup: ``{{templates}}`` and ``{|
  tables |}`` removed (nested, depth-bounded), ``[[File:…]]``/
  ``[[Image:…]]`` dropped with their captions, ``[[target|label]]``
  → label, ``[[target]]`` → target, external ``[url label]`` →
  label (bare ``[url]`` dropped), quote runs (``''`` / ``'''`` /
  ``'''''``) removed, ``== headings ==`` unwrapped, ``<ref>…</ref>``
  and ``<!-- comments -->`` dropped, ``<nowiki>`` unwrapped, other
  tags stripped keeping inner text, list/indent markers
  (``* # : ;``) and ``----`` rules removed, entities decoded.
  Contract (pinned by the oracle): output lines are end-stripped but
  inner whitespace is verbatim, and empty lines are kept — line
  numbering is part of the determinism contract.

``mediawiki_pages`` walks the export structure (``<page>`` →
``<title>``/``<ns>``/``<id>``/``<revision><text>``).  The reference
pipeline has no document surface (NetCDF rasters only,
``/root/reference/asip_v2/archive.py:19-20``); §2.11 surface.

Fuzz contract (SCALE.md round 10): ``parse_xml`` raises
``ValueError`` on malformed input — tag mismatches, bad entities,
unterminated constructs — never ``IndexError``/``RecursionError``
escapes, never hangs (nesting depth and entity expansion are capped;
there is no entity definition mechanism at all, so billion-laughs is
structurally impossible).
"""

from __future__ import annotations

import re

_MAX_DEPTH = 128
_MAX_TMPL_DEPTH = 32

_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}

_NAME_RE = re.compile(r"[A-Za-z_:][A-Za-z0-9_:.\-]*")
_ATTR_RE = re.compile(
    r"\s+([A-Za-z_:][A-Za-z0-9_:.\-]*)\s*=\s*(\"[^\"]*\"|'[^']*')"
)


def _decode_entities(s: str) -> str:
    def sub(m):
        e = m.group(1)
        if e.startswith("#x") or e.startswith("#X"):
            try:
                return chr(int(e[2:], 16))
            except (ValueError, OverflowError) as exc:
                raise ValueError(f"xml: bad numeric entity &{e};") from exc
        if e.startswith("#"):
            try:
                return chr(int(e[1:]))
            except (ValueError, OverflowError) as exc:
                raise ValueError(f"xml: bad numeric entity &{e};") from exc
        if e in _ENTITIES:
            return _ENTITIES[e]
        raise ValueError(f"xml: undefined entity &{e};")

    if "&" not in s:
        return s
    out = re.sub(r"&([A-Za-z#][A-Za-z0-9]*);", sub, s)
    # any ampersand that didn't form an entity is an error (strict XML)
    if "&" in re.sub(r"&[A-Za-z#][A-Za-z0-9]*;", "", s):
        raise ValueError("xml: bare ampersand in character data")
    return out


class XmlElement:
    """One parsed element: ``tag``, ``attrs``, ``children`` (elements
    and strings interleaved, document order)."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []

    def text(self) -> str:
        """All character data in this subtree, document order."""
        parts = []
        for c in self.children:
            parts.append(c if isinstance(c, str) else c.text())
        return "".join(parts)

    def find_all(self, tag: str) -> list["XmlElement"]:
        out = []
        for c in self.children:
            if isinstance(c, XmlElement):
                if c.tag == tag:
                    out.append(c)
                out.extend(c.find_all(tag))
        return out

    def find(self, tag: str) -> "XmlElement | None":
        got = self.find_all(tag)
        return got[0] if got else None


def parse_xml(data) -> XmlElement:
    """Parse an XML document into its root element (strict subset:
    well-formed nesting, predefined + numeric entities, CDATA,
    comments/PIs/declaration skipped)."""
    if isinstance(data, (bytes, bytearray)):
        try:
            data = bytes(data).decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"xml: invalid UTF-8: {e}") from e
    if not isinstance(data, str):
        raise ValueError("xml: input must be str or bytes")
    pos = 0
    n = len(data)
    root: XmlElement | None = None
    stack: list[XmlElement] = []

    def add_text(s: str):
        if not s:
            return
        if stack:
            stack[-1].children.append(s)
        elif s.strip():
            raise ValueError("xml: character data outside root element")

    while pos < n:
        lt = data.find("<", pos)
        if lt < 0:
            add_text(_decode_entities(data[pos:]))
            break
        add_text(_decode_entities(data[pos:lt]))
        if data.startswith("<!--", lt):
            e = data.find("-->", lt + 4)
            if e < 0:
                raise ValueError("xml: unterminated comment")
            pos = e + 3
            continue
        if data.startswith("<![CDATA[", lt):
            e = data.find("]]>", lt + 9)
            if e < 0:
                raise ValueError("xml: unterminated CDATA section")
            add_text(data[lt + 9 : e])
            pos = e + 3
            continue
        if data.startswith("<?", lt):
            e = data.find("?>", lt + 2)
            if e < 0:
                raise ValueError("xml: unterminated processing instruction")
            pos = e + 2
            continue
        if data.startswith("<!", lt):
            raise NotImplementedError("xml: DTD / doctype declarations")
        if data.startswith("</", lt):
            m = _NAME_RE.match(data, lt + 2)
            if not m:
                raise ValueError("xml: malformed end tag")
            e = data.find(">", m.end())
            if e < 0 or data[m.end() : e].strip():
                raise ValueError("xml: malformed end tag")
            if not stack or stack[-1].tag != m.group(0):
                raise ValueError(
                    f"xml: mismatched end tag </{m.group(0)}>"
                )
            el = stack.pop()
            if not stack:
                root = el
            pos = e + 1
            continue
        # start tag
        m = _NAME_RE.match(data, lt + 1)
        if not m:
            raise ValueError("xml: malformed start tag")
        tag = m.group(0)
        at = m.end()
        attrs: dict[str, str] = {}
        while True:
            am = _ATTR_RE.match(data, at)
            if not am:
                break
            attrs[am.group(1)] = _decode_entities(am.group(2)[1:-1])
            at = am.end()
        rest = data.find(">", at)
        if rest < 0:
            raise ValueError("xml: unterminated start tag")
        middle = data[at:rest].strip()
        self_close = middle == "/" or (not middle and data[rest - 1] == "/")
        if middle not in ("", "/"):
            raise ValueError(f"xml: junk in start tag <{tag} …{middle!r}")
        if root is not None and not stack:
            raise ValueError("xml: multiple root elements")
        el = XmlElement(tag, attrs)
        if stack:
            stack[-1].children.append(el)
        if self_close:
            if not stack:
                root = el
        else:
            stack.append(el)
            if len(stack) > _MAX_DEPTH:
                raise ValueError("xml: nesting too deep")
        pos = rest + 1
    if stack:
        raise ValueError(f"xml: unclosed element <{stack[-1].tag}>")
    if root is None:
        raise ValueError("xml: no root element")
    return root


def mediawiki_pages(data) -> list[dict]:
    """Extract ``{title, ns, page_id, wikitext}`` per ``<page>`` of a
    MediaWiki export document."""
    root = parse_xml(data)
    if root.tag != "mediawiki":
        raise ValueError("wiki: root element is not <mediawiki>")
    out = []
    for page in root.find_all("page"):
        title = page.find("title")
        rev = page.find("revision")
        text = rev.find("text") if rev is not None else None
        ns = page.find("ns")
        pid = page.find("id")
        out.append(
            {
                "title": title.text() if title is not None else "",
                "ns": int(ns.text()) if ns is not None else 0,
                "page_id": int(pid.text()) if pid is not None else -1,
                "wikitext": text.text() if text is not None else "",
            }
        )
    return out


# --- wikitext ----------------------------------------------------------------------


def _strip_nested(s: str, opener: str, closer: str) -> str:
    """Remove nested ``opener…closer`` spans (templates, tables)."""
    out = []
    depth = 0
    i = 0
    n = len(s)
    lo, lc = len(opener), len(closer)
    while i < n:
        if s.startswith(opener, i):
            depth += 1
            if depth > _MAX_TMPL_DEPTH:
                raise ValueError("wiki: template nesting too deep")
            i += lo
        elif depth and s.startswith(closer, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _strip_links(s: str) -> str:
    """``[[File:…]]`` dropped (nested allowed in captions),
    ``[[t|label]]`` → label, ``[[t]]`` → t."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        if s.startswith("[[", i):
            depth = 1
            j = i + 2
            while j < n and depth:
                if s.startswith("[[", j):
                    depth += 1
                    j += 2
                elif s.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            if depth:
                out.append(s[i:])
                break
            inner = s[i + 2 : j - 2]
            head = inner.split("|", 1)[0].strip().lower()
            if head.startswith(("file:", "image:", "category:")):
                pass  # media/category links vanish
            else:
                # innermost visible text: last top-level pipe field
                parts = []
                depth2 = 0
                field = []
                for ch in inner:
                    if ch == "[":
                        depth2 += 1
                    elif ch == "]":
                        depth2 -= 1
                    if ch == "|" and depth2 == 0:
                        parts.append("".join(field))
                        field = []
                    else:
                        field.append(ch)
                parts.append("".join(field))
                out.append(_strip_links(parts[-1]) if len(parts) > 1 else parts[0])
            i = j
        elif s.startswith("[", i):
            j = s.find("]", i + 1)
            if j < 0:
                out.append(s[i:])
                break
            inner = s[i + 1 : j]
            if re.match(r"(https?|ftp)://", inner):
                sp = inner.find(" ")
                if sp >= 0:
                    out.append(inner[sp + 1 :])
                # bare [url]: dropped
            else:
                out.append(s[i : j + 1])  # not an external link — literal
            i = j + 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_REF_RE = re.compile(r"<ref[^>/]*?/>|<ref[^>]*?>.*?</ref>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_NOWIKI_RE = re.compile(r"<nowiki>(.*?)</nowiki>", re.S | re.I)
_TAG_RE = re.compile(r"</?[A-Za-z][^>]*>")
_HEADING_RE = re.compile(r"^(={1,6})\s*(.*?)\s*\1\s*$")


def wikitext_to_lines(src: str) -> list[str]:
    """Strip wikitext markup to plain-text lines (end-stripped, inner
    whitespace verbatim, empty lines kept — see module contract)."""
    if not isinstance(src, str):
        raise ValueError("wiki: wikitext must be str")
    s = _COMMENT_RE.sub("", src)
    # protect <nowiki> content from every later stripping pass (XML
    # character data cannot contain NUL, so the sentinel is safe)
    protected: list[str] = []

    def _hold(m):
        protected.append(m.group(1))
        return f"\x00{len(protected) - 1}\x01"

    s = _NOWIKI_RE.sub(_hold, s)
    s = _REF_RE.sub("", s)
    s = _strip_nested(s, "{{", "}}")
    s = _strip_nested(s, "{|", "|}")
    s = _strip_links(s)
    s = _TAG_RE.sub("", s)
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    s = _decode_entities_forgiving(s)
    if protected:
        s = re.sub(
            r"\x00(\d+)\x01", lambda m: protected[int(m.group(1))], s
        )
    lines = []
    for raw in s.split("\n"):
        m = _HEADING_RE.match(raw.strip())
        if m:
            lines.append(m.group(2))
            continue
        line = raw
        if line[:1] in ("*", "#", ":", ";"):
            line = line.lstrip("*#:; ")
        if line.strip() == "----":
            continue
        lines.append(line.rstrip())
    return lines


def _decode_entities_forgiving(s: str) -> str:
    """Entity decode for wikitext bodies: undefined/bare ampersands
    stay verbatim (wikitext, unlike XML, is forgiving)."""

    def sub(m):
        e = m.group(1)
        try:
            if e.startswith("#x") or e.startswith("#X"):
                return chr(int(e[2:], 16))
            if e.startswith("#"):
                return chr(int(e[1:]))
        except (ValueError, OverflowError):
            return m.group(0)
        return _ENTITIES.get(e, m.group(0))

    return re.sub(r"&([A-Za-z#][A-Za-z0-9]*);", sub, s)
