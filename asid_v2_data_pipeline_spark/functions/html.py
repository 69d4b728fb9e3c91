"""HTML → text extraction for web-crawl ingestion (SURVEY.md §2.11).

The canonical LLM training-data source is crawled HTML (Common Crawl
WARC files); before any quality/dedup/curation operator can run, pages
must become text.  This module is the pure-Python kernel behind the
``extract_warc_text`` operator: a single-pass, allocation-bounded HTML
scanner that

- drops non-content elements entirely (``script``/``style``/
  ``noscript``/``template``/``svg``/``head``), plus — when
  ``drop_boilerplate`` — the structural chrome a crawl pipeline
  removes (``nav``/``header``/``footer``/``aside``/``form``);
- captures ``<title>`` separately (it lives inside the dropped head);
- turns block-level element boundaries into line breaks and inline
  elements into nothing (HTML rendering semantics);
- decodes character references (named + numeric) per text node;
- collapses whitespace runs within a line and drops empty lines.

The reference pipeline has no web-text surface (its only inputs are
NetCDF rasters, ``/root/reference/asip_v2/archive.py:19-20``); this is
§2.11 training-data-pipeline surface.

Fuzz contract (SCALE.md round 10): HTML is a forgiving format by
specification — malformed markup degrades to best-effort text, it does
not raise — but the scanner must never hang, never allocate
unboundedly, and never throw anything but ``ValueError`` regardless of
input.  Pinned by the webtext fuzz tests.
"""

from __future__ import annotations

from html import unescape as _unescape

# elements whose entire subtree is never content
_DROP_ALWAYS = frozenset(
    ("script", "style", "noscript", "template", "svg", "head")
)
# structural chrome removed by boilerplate-dropping crawl pipelines
_DROP_BOILERPLATE = frozenset(("nav", "header", "footer", "aside", "form"))

# elements that establish a line break in rendered text (block-level
# plus explicit breaks and table structure)
_BLOCK = frozenset(
    (
        "address", "article", "blockquote", "br", "caption", "dd",
        "details", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "h1", "h2", "h3", "h4", "h5", "h6", "hr", "li",
        "main", "ol", "p", "pre", "section", "summary", "table",
        "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
    )
)

# void elements never nest content, so a stray "</br>" etc. must not
# decrement drop counters
_VOID = frozenset(
    (
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    )
)

# rawtext elements: content runs verbatim until the matching close tag
_RAWTEXT = frozenset(("script", "style", "textarea", "title", "xmp"))

_NAME_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyz0123456789-"
)


def _tag_name(s: str, i: int) -> tuple[str, int]:
    """Lower-cased tag name starting at ``i``; returns (name, end)."""
    j = i
    n = len(s)
    while j < n and (s[j].lower() in _NAME_CHARS):
        j += 1
    return s[i:j].lower(), j


def _skip_tag(s: str, i: int) -> int:
    """Position just past the ``>`` closing the tag whose attributes
    begin at ``i``; quoted attribute values may contain ``>``.  If the
    tag never closes the document is truncated mid-tag: everything
    after is attribute soup, return end-of-input."""
    n = len(s)
    while i < n:
        c = s[i]
        if c == '"' or c == "'":
            j = s.find(c, i + 1)
            if j < 0:
                return n
            i = j + 1
        elif c == ">":
            return i + 1
        else:
            i += 1
    return n


def html_to_text(
    markup: str, drop_boilerplate: bool = True
) -> tuple[str, str]:
    """Extract ``(title, text)`` from an HTML document.

    ``text`` is the rendered-order content text: block boundaries
    become line breaks, character references are decoded, whitespace
    runs collapse to one space per line, empty lines are dropped, and
    lines join with ``\\n``.  ``title`` is the (whitespace-normalized)
    content of the first ``<title>`` element.  Never raises on
    malformed markup — HTML is forgiving by spec — and runs in one
    bounded pass.
    """
    if not isinstance(markup, str):
        raise ValueError("html: markup must be str")
    s = markup
    n = len(s)
    drop = (
        _DROP_ALWAYS | _DROP_BOILERPLATE
        if drop_boilerplate
        else _DROP_ALWAYS
    )
    # per-name open counters for dropped subtrees; title is captured
    # even though head is dropped
    depth: dict[str, int] = {}
    dropping = 0  # sum of depth values, >0 => suppress text
    title_parts: list[str] = []
    title_done = False
    parts: list[str] = []  # text chunks + "\n" block markers
    buf: list[str] = []  # current text node accumulator
    i = 0

    def flush() -> None:
        if buf:
            parts.append(_unescape("".join(buf)))
            buf.clear()

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            if not dropping:
                buf.append(s[i:])
            break
        if lt > i and not dropping:
            buf.append(s[i:lt])
        i = lt
        # "<" at end of input: literal text
        if i + 1 >= n:
            if not dropping:
                buf.append(s[i:])
            break
        c = s[i + 1]
        if c == "!":
            if s.startswith("<!--", i):
                j = s.find("-->", i + 4)
                i = n if j < 0 else j + 3
            elif s.startswith("<![CDATA[", i):
                j = s.find("]]>", i + 9)
                i = n if j < 0 else j + 3
            else:  # doctype / bogus comment
                j = s.find(">", i + 2)
                i = n if j < 0 else j + 1
            continue
        if c == "?":  # processing instruction / bogus comment
            j = s.find(">", i + 2)
            i = n if j < 0 else j + 1
            continue
        if c == "/":
            name, j = _tag_name(s, i + 2)
            if not name:  # "</>" or "</ " — bogus, skip to ">"
                j2 = s.find(">", i + 2)
                i = n if j2 < 0 else j2 + 1
                continue
            i = _skip_tag(s, j)
            if name in drop and name not in _VOID:
                d = depth.get(name, 0)
                if d > 0:
                    depth[name] = d - 1
                    dropping -= 1
            if name in _BLOCK and not dropping:
                flush()
                parts.append("\n")
            continue
        if not c.isalpha():
            # "<3" etc: literal text "<"
            if not dropping:
                buf.append("<")
            i += 1
            continue
        name, j = _tag_name(s, i + 1)
        i = _skip_tag(s, j)
        self_closed = i >= 2 and s[i - 2 : i] == "/>"
        if name in _BLOCK and not dropping:
            flush()
            parts.append("\n")
        if name == "title" and not title_done:
            # rawtext capture (title sits inside the dropped head)
            close = s.lower().find("</title", i)
            end = n if close < 0 else close
            title_parts.append(s[i:end])
            title_done = True
            i = end
            continue
        if name in _RAWTEXT and not self_closed:
            # verbatim until the matching close tag (or EOF)
            close = s.lower().find("</" + name, i)
            if name not in drop and not dropping and close != i:
                seg = s[i : (n if close < 0 else close)]
                buf.append(seg)
            i = n if close < 0 else close
            continue
        if name in drop and name not in _VOID and not self_closed:
            depth[name] = depth.get(name, 0) + 1
            dropping += 1
        continue
    flush()

    lines: list[str] = []
    for chunk in "".join(parts).split("\n"):
        norm = " ".join(chunk.split())
        if norm:
            lines.append(norm)
    title = " ".join(_unescape("".join(title_parts)).split())
    return title, "\n".join(lines)


def _href_of_tag(s: str, i: int) -> tuple[str | None, int]:
    """Scan the attribute area starting at ``i`` (just past the tag
    name); return ``(href value or None, position past '>')`` with
    quoted values (which may contain ``>``) handled."""
    href: str | None = None
    n = len(s)
    while i < n:
        c = s[i]
        if c == ">":
            return href, i + 1
        if c == "/" or c.isspace():
            i += 1
            continue
        j = i
        while j < n and s[j] not in "=/> \t\r\n\f":
            j += 1
        name = s[i:j].lower()
        i = j
        while i < n and s[i].isspace():
            i += 1
        val = ""
        has_val = False
        if i < n and s[i] == "=":
            has_val = True
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i < n and (s[i] == '"' or s[i] == "'"):
                q = s[i]
                j = s.find(q, i + 1)
                if j < 0:
                    val, i = s[i + 1 :], n
                else:
                    val, i = s[i + 1 : j], j + 1
            else:
                j = i
                while j < n and s[j] not in "> \t\r\n\f":
                    j += 1
                val, i = s[i:j], j
        if name == "href" and href is None and has_val:
            href = val
    return href, n


def extract_links(markup: str) -> list[str]:
    """The hrefs of ``<a>``/``<area>`` elements in document order —
    the crawl-frontier / link-graph view of a page (href values
    entity-decoded; links inside dropped-for-TEXT regions like nav
    still count, as a crawler's frontier does).  Same forgiving-HTML
    contract as ``html_to_text``: never raises, never hangs."""
    if not isinstance(markup, str):
        raise ValueError("html: markup must be str")
    s = markup
    n = len(s)
    out: list[str] = []
    i = 0
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            break
        i = lt
        if i + 1 >= n:
            break
        c = s[i + 1]
        if c == "!":
            if s.startswith("<!--", i):
                j = s.find("-->", i + 4)
                i = n if j < 0 else j + 3
            elif s.startswith("<![CDATA[", i):
                j = s.find("]]>", i + 9)
                i = n if j < 0 else j + 3
            else:
                j = s.find(">", i + 2)
                i = n if j < 0 else j + 1
            continue
        if c == "?" or c == "/":
            j = s.find(">", i + 2)
            i = n if j < 0 else j + 1
            continue
        if not c.isalpha():
            i += 1
            continue
        name, j = _tag_name(s, i + 1)
        if name in ("a", "area"):
            href, i = _href_of_tag(s, j)
            if href is not None:
                out.append(_unescape(href))
            continue
        i = _skip_tag(s, j)
        if name in _RAWTEXT:
            close = s.lower().find("</" + name, i)
            i = n if close < 0 else close
    return out


def escape_text(text: str) -> str:
    """Minimal HTML escaping for text-node content (the fixture
    writer's inverse of reference decoding): ``&``, ``<``, ``>``."""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
