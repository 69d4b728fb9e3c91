"""EPUB writer/extractor: OCF structural rules (mimetype first,
stored, exact bytes), container → OPF → spine traversal, stdlib
zipfile interop for the mixed-method archive, a seeded randomized
book matrix, and loud failure on structural corruption."""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.epub import (
    parse_epub,
    write_epub,
)
from asid_v2_data_pipeline_spark.functions.zipf import parse_zip


def _book(n_ch=3, n_par=4):
    return [
        (
            f"Chapter {i:03d}",
            [f"para {i} {j} text" for j in range(n_par)],
        )
        for i in range(n_ch)
    ]


def test_roundtrip():
    b = write_epub("My Book", _book(), language="fr")
    out = parse_epub(b)
    assert out["title"] == "My Book"
    assert out["language"] == "fr"
    assert [t for t, _ in out["chapters"]] == [
        "Chapter 000", "Chapter 001", "Chapter 002",
    ]
    assert out["chapters"][1][1] == (
        "Chapter 001\npara 1 0 text\npara 1 1 text\n"
        "para 1 2 text\npara 1 3 text"
    )


def test_ocf_layout_and_stdlib_interop():
    b = write_epub("T", _book(1, 1))
    members = parse_zip(b)
    assert members[0][0] == "mimetype"
    assert members[0][2] == "store"
    assert members[0][1] == b"application/epub+zip"
    assert all(m[2] == "deflate" for m in members[1:])
    z = zipfile.ZipFile(io.BytesIO(b))
    assert z.testzip() is None
    assert z.read("mimetype") == b"application/epub+zip"
    assert "OEBPS/content.opf" in z.namelist()


def test_escaping_roundtrips():
    b = write_epub("a & b <c>", [("T & <i>", ["x < y & z > w"])])
    out = parse_epub(b)
    assert out["title"] == "a & b <c>"
    assert out["chapters"][0][0] == "T & <i>"
    assert out["chapters"][0][1] == "T & <i>\nx < y & z > w"


def test_randomized_book_matrix():
    rng = np.random.default_rng(29)
    for trial in range(25):
        chapters = []
        for i in range(int(rng.integers(1, 8))):
            # printable only: C0/C1 controls (incl. U+0085 NEL) are
            # whitespace-normalized by html_to_text, by design
            alphabet = [
                *range(0x21, 0x7F), *range(0xA1, 0x250),
            ]
            paras = [
                "".join(
                    chr(alphabet[int(c)])
                    for c in rng.integers(0, len(alphabet), int(rng.integers(1, 60)))
                )
                for _ in range(int(rng.integers(0, 6)))
            ]
            chapters.append((f"ch{i}", paras))
        out = parse_epub(write_epub(f"b{trial}", chapters))
        assert len(out["chapters"]) == len(chapters)
        for (wt, wp), (gt, gx) in zip(chapters, out["chapters"]):
            assert gt == wt
            assert gx == "\n".join([wt, *wp]) if wp else gx == wt


def test_structural_corruption_raises():
    b = write_epub("T", _book(1, 1))
    # mimetype not first: drop it entirely by rebuilding without it
    from asid_v2_data_pipeline_spark.functions.epub import _mixed_zip

    members = [(n, d, m) for n, d, m in parse_zip(b)]
    with pytest.raises(ValueError, match="first member"):
        parse_epub(_mixed_zip(members[1:] + members[:1]))
    # mimetype deflated
    bad = [("mimetype", members[0][1], "deflate")] + members[1:]
    with pytest.raises(ValueError, match="stored"):
        parse_epub(_mixed_zip(bad))
    # wrong mimetype bytes
    bad = [("mimetype", b"text/plain", "store")] + members[1:]
    with pytest.raises(ValueError, match="payload"):
        parse_epub(_mixed_zip(bad))
    # missing container.xml
    bad = [m for m in members if m[0] != "META-INF/container.xml"]
    with pytest.raises(ValueError, match="container"):
        parse_epub(_mixed_zip(bad))
    # missing spine chapter member
    bad = [m for m in members if not m[0].endswith(".xhtml")]
    with pytest.raises(ValueError, match="missing"):
        parse_epub(_mixed_zip(bad))
    # truncation fuzz: every cut raises (ZIP needs its tail)
    for cut in range(0, len(b), 7):
        with pytest.raises(ValueError):
            parse_epub(b[:cut])
