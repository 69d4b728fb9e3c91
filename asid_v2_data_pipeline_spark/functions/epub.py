"""EPUB (OCF + OPF + XHTML) book writer and text extractor, composed
from the repo's own ZIP (``functions/zipf.py``), XML
(``functions/wiki.parse_xml``) and HTML (``functions/html.py``)
layers — the public EPUB 3 / OCF structure:

- ``mimetype`` member FIRST and STORED with the exact bytes
  ``application/epub+zip`` (OCF §3.3);
- ``META-INF/container.xml`` pointing at the package document;
- the OPF package: ``dc:title`` metadata, a manifest of id→href
  items, and a ``spine`` whose ``itemref`` order is reading order;
- one XHTML content document per chapter.

``parse_epub`` walks exactly that chain — container → rootfile → OPF
manifest/spine → spine-ordered XHTML → ``html_to_text`` — so a book
is extracted in reading order no matter how the ZIP members are laid
out.  Structural violations (missing/reordered/compressed mimetype,
missing container or rootfile, dangling spine idrefs, missing
members) raise ValueError; malformed HTML inside a chapter does not
(HTML is forgiving by spec).

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); book-dump ingestion is §2.11
training-data surface.
"""

from __future__ import annotations

from .html import escape_text, html_to_text
from .wiki import XmlElement, parse_xml
from .zipf import parse_zip

_MIMETYPE = b"application/epub+zip"

_CONTAINER_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<container version="1.0" '
    'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">\n'
    '  <rootfiles>\n'
    '    <rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/>\n'
    '  </rootfiles>\n'
    "</container>\n"
)


def write_epub(
    title: str,
    chapters: list[tuple[str, list[str]]],
    identifier: str = "urn:fixture",
    language: str = "en",
) -> bytes:
    """Serialize ``(chapter_title, paragraphs)`` chapters as one EPUB.
    Chapter files are ``OEBPS/chap{i:03d}.xhtml`` with an ``<h1>``
    title and one ``<p>`` per paragraph; spine order = list order."""
    members: list[tuple[str, bytes]] = []
    manifest: list[str] = []
    spine: list[str] = []
    for i, (ch_title, paras) in enumerate(chapters):
        name = f"chap{i:03d}.xhtml"
        body = "".join(f"<p>{escape_text(p)}</p>" for p in paras)
        doc = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>{escape_text(ch_title)}</title></head>"
            f"<body><h1>{escape_text(ch_title)}</h1>{body}</body></html>"
        )
        members.append((f"OEBPS/{name}", doc.encode("utf-8")))
        manifest.append(
            f'<item id="c{i}" href="{name}" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">\n'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f'<dc:identifier id="uid">{escape_text(identifier)}</dc:identifier>'
        f"<dc:title>{escape_text(title)}</dc:title>"
        f"<dc:language>{escape_text(language)}</dc:language>"
        "</metadata>\n"
        f"<manifest>{''.join(manifest)}</manifest>\n"
        f"<spine>{''.join(spine)}</spine>\n"
        "</package>\n"
    )
    # mimetype FIRST and STORED (OCF §3.3); everything else deflated
    return _mixed_zip(
        [
            ("mimetype", _MIMETYPE, "store"),
            (
                "META-INF/container.xml",
                _CONTAINER_XML.encode("utf-8"),
                "deflate",
            ),
            ("OEBPS/content.opf", opf.encode("utf-8"), "deflate"),
            *((n, d, "deflate") for n, d in members),
        ]
    )


def _mixed_zip(entries: list[tuple[str, bytes, str]]) -> bytes:
    """One archive with a per-member method — ``write_zip`` is
    single-method, and OCF requires store-then-deflate in one file."""
    import struct
    import zlib

    blob = bytearray()
    central = bytearray()
    for name, data, method in entries:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == "store":
            comp, m = data, 0
        else:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp, m = co.compress(data) + co.flush(), 8
        off = len(blob)
        blob += struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 20, 0, m, 0, 0, crc, len(comp), len(data),
            len(nb), 0,
        ) + nb + comp
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, m, 0, 0, crc, len(comp), len(data),
            len(nb), 0, 0, 0, 0, 0, off,
        ) + nb
    eocd = struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, len(entries), len(entries),
        len(central), len(blob), 0,
    )
    return bytes(blob + central + eocd)


def _local_find_all(el: XmlElement, local: str) -> list[XmlElement]:
    """find_all matching the LOCAL part of the tag name (EPUB files
    use ``dc:``/default-namespace prefixes freely)."""
    out = []
    for c in el.children:
        if isinstance(c, XmlElement):
            if c.tag.rsplit(":", 1)[-1] == local:
                out.append(c)
            out.extend(_local_find_all(c, local))
    return out


def parse_epub(data: bytes) -> dict:
    """Extract ``{"title": str, "language": str, "chapters":
    [(chapter_title, text), ...]}`` in spine (reading) order.
    Enforces the OCF container rules; chapter text comes from
    ``html_to_text`` (title line from ``<title>``, body text with
    block boundaries as line breaks)."""
    members = parse_zip(data)
    if not members:
        raise ValueError("epub: empty archive")
    name0, data0, method0 = members[0]
    if name0 != "mimetype":
        raise ValueError("epub: first member must be mimetype")
    if method0 != "store":
        raise ValueError("epub: mimetype must be stored")
    if data0 != _MIMETYPE:
        raise ValueError("epub: wrong mimetype payload")
    by_name = {name: payload for name, payload, _ in members}
    container = by_name.get("META-INF/container.xml")
    if container is None:
        raise ValueError("epub: missing META-INF/container.xml")
    croot = parse_xml(container)
    rootfiles = _local_find_all(croot, "rootfile") + (
        [croot] if croot.tag.rsplit(":", 1)[-1] == "rootfile" else []
    )
    if not rootfiles:
        raise ValueError("epub: no rootfile in container.xml")
    opf_path = rootfiles[0].attrs.get("full-path")
    if not opf_path or opf_path not in by_name:
        raise ValueError(f"epub: rootfile {opf_path!r} missing")
    opf = parse_xml(by_name[opf_path])
    title_el = _local_find_all(opf, "title")
    lang_el = _local_find_all(opf, "language")
    title = title_el[0].text() if title_el else ""
    language = lang_el[0].text() if lang_el else ""
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    hrefs = {}
    for item in _local_find_all(opf, "item"):
        iid, href = item.attrs.get("id"), item.attrs.get("href")
        if iid and href:
            hrefs[iid] = base + href
    chapters: list[tuple[str, str]] = []
    for ref in _local_find_all(opf, "itemref"):
        idref = ref.attrs.get("idref")
        path = hrefs.get(idref)
        if path is None:
            raise ValueError(f"epub: spine idref {idref!r} not in manifest")
        doc = by_name.get(path)
        if doc is None:
            raise ValueError(f"epub: spine item {path!r} missing")
        ch_title, text = html_to_text(
            doc.decode("utf-8"), drop_boilerplate=False
        )
        chapters.append((ch_title, text))
    return {"title": title, "language": language, "chapters": chapters}
