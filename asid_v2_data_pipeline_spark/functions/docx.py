"""DOCX (OOXML WordprocessingML) writer and text extractor, composed
from the repo's ZIP (``functions/zipf.py``) and XML
(``functions/wiki.parse_xml``) layers — the public ECMA-376 package
shape:

- ``[Content_Types].xml`` declaring the main document part,
- ``_rels/.rels`` wiring the package to ``word/document.xml``,
- ``word/document.xml``: ``w:body`` → ``w:p`` paragraphs → ``w:r``
  runs → ``w:t`` text (``xml:space="preserve"`` honored), plus
  ``w:tab`` → TAB and ``w:br``/``w:cr`` → newline.

``parse_docx`` walks exactly that chain and returns paragraph texts
in document order; a missing main part or rels wiring raises
ValueError.  Formatting properties (``w:rPr``/``w:pPr``) are
skipped — extraction wants content, not styling.

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); office-document ingestion is §2.11
training-data surface.
"""

from __future__ import annotations

from .html import escape_text
from .wiki import XmlElement, parse_xml
from .zipf import parse_zip, write_zip

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


def write_docx(paragraphs: list[list[str]]) -> bytes:
    """Serialize paragraphs (each a list of run texts) as a DOCX."""
    body = []
    for runs in paragraphs:
        rs = "".join(
            f'<w:r><w:t xml:space="preserve">{escape_text(r)}</w:t></w:r>'
            for r in runs
        )
        body.append(f"<w:p>{rs}</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<w:document xmlns:w="{_W_NS}">'
        f"<w:body>{''.join(body)}</w:body></w:document>"
    )
    return write_zip(
        [
            ("[Content_Types].xml", _CONTENT_TYPES.encode("utf-8")),
            ("_rels/.rels", _RELS.encode("utf-8")),
            ("word/document.xml", doc.encode("utf-8")),
        ],
        method="deflate",
    )


def _local(el: XmlElement) -> str:
    return el.tag.rsplit(":", 1)[-1]


def _run_text(el: XmlElement, parts: list[str]) -> None:
    """Collect content under one element: w:t verbatim, w:tab as TAB,
    w:br / w:cr as newline; recurse through wrappers, skip property
    bags."""
    name = _local(el)
    if name in ("rPr", "pPr", "sectPr"):
        return
    if name == "t":
        parts.append(el.text())
        return
    if name == "tab":
        parts.append("\t")
        return
    if name in ("br", "cr"):
        parts.append("\n")
        return
    for c in el.children:
        if isinstance(c, XmlElement):
            _run_text(c, parts)


def parse_docx(data: bytes) -> list[str]:
    """Extract paragraph texts in document order."""
    members = {n: d for n, d, _ in parse_zip(data)}
    rels = members.get("_rels/.rels")
    if rels is None:
        raise ValueError("docx: missing _rels/.rels")
    target = None
    for rel in _find_local(parse_xml(rels), "Relationship"):
        if rel.attrs.get("Type", "").endswith("/officeDocument"):
            target = rel.attrs.get("Target", "").lstrip("/")
    if target is None:
        raise ValueError("docx: no officeDocument relationship")
    doc = members.get(target)
    if doc is None:
        raise ValueError(f"docx: main part {target!r} missing")
    root = parse_xml(doc)
    if _local(root) != "document":
        raise ValueError("docx: main part is not a w:document")
    out: list[str] = []
    for p in _find_local(root, "p"):
        parts: list[str] = []
        _run_text_children(p, parts)
        out.append("".join(parts))
    return out


def _run_text_children(el: XmlElement, parts: list[str]) -> None:
    for c in el.children:
        if isinstance(c, XmlElement):
            _run_text(c, parts)


def _find_local(el: XmlElement, local: str) -> list[XmlElement]:
    out = []
    for c in el.children:
        if isinstance(c, XmlElement):
            if _local(c) == local:
                out.append(c)
            out.extend(_find_local(c, local))
    return out
