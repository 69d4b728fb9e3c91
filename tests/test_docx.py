"""DOCX writer/extractor: run concatenation, xml:space preservation,
tab/br handling, rels traversal, stdlib zipfile interop, a seeded
randomized matrix, and loud failure on structural corruption."""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.docx import (
    parse_docx,
    write_docx,
)
from asid_v2_data_pipeline_spark.functions.wiki import parse_xml
from asid_v2_data_pipeline_spark.functions.zipf import parse_zip, write_zip


def test_roundtrip_and_interop():
    paras = [["hello ", "world"], ["one"], [" lead", "ing "], ["a&b<c>"]]
    b = write_docx(paras)
    assert parse_docx(b) == ["hello world", "one", " leading ", "a&b<c>"]
    z = zipfile.ZipFile(io.BytesIO(b))
    assert z.testzip() is None
    assert "word/document.xml" in z.namelist()


def test_tab_br_and_property_bags():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="ns"><w:body>'
        "<w:p><w:pPr><w:t>STYLE NOISE</w:t></w:pPr>"
        '<w:r><w:rPr><w:t>RUN NOISE</w:t></w:rPr>'
        '<w:t xml:space="preserve">a</w:t><w:tab/>'
        "<w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    members = [
        (n, d)
        for n, d, _ in parse_zip(write_docx([["x"]]))
        if n != "word/document.xml"
    ] + [("word/document.xml", doc.encode())]
    b = write_zip(members, method="deflate")
    assert parse_docx(b) == ["a\tb\nc"]


def test_randomized_matrix():
    rng = np.random.default_rng(67)
    for trial in range(30):
        paras = []
        for _ in range(int(rng.integers(1, 10))):
            runs = [
                "".join(
                    chr(int(c))
                    for c in rng.integers(0x20, 0x7F, int(rng.integers(0, 40)))
                )
                for _ in range(int(rng.integers(1, 4)))
            ]
            paras.append(runs)
        got = parse_docx(write_docx(paras))
        assert got == ["".join(r) for r in paras], trial


def test_structural_corruption_raises():
    good = parse_zip(write_docx([["x"]]))
    # missing rels
    b = write_zip(
        [(n, d) for n, d, _ in good if n != "_rels/.rels"],
        method="deflate",
    )
    with pytest.raises(ValueError, match="rels"):
        parse_docx(b)
    # missing main part
    b = write_zip(
        [(n, d) for n, d, _ in good if n != "word/document.xml"],
        method="deflate",
    )
    with pytest.raises(ValueError, match="missing"):
        parse_docx(b)
    # main part not a w:document
    b = write_zip(
        [
            (n, d) if n != "word/document.xml" else (n, b"<x:other/>")
            for n, d, _ in good
        ],
        method="deflate",
    )
    with pytest.raises(ValueError, match="w:document"):
        parse_docx(b)
    # truncation: ZIP central dir gone
    raw = write_docx([["x"]])
    for cut in range(0, len(raw), 11):
        with pytest.raises(ValueError):
            parse_docx(raw[:cut])
