"""PDF writer + text extractor (§2.11 document family).  Round trips
over both file layouts, string-escape coverage, incremental-update
/Prev chains, predictor coverage, disclosed boundaries, a seeded
randomized matrix, and the r10 fuzz contract."""

from __future__ import annotations

import re
import string

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.pdf import (
    _apply_predictor,
    parse_pdf_text,
    write_pdf,
)

PAGES = [
    ["hello world", "line two (with parens) and \\backslash\\"],
    ["page 2 line 1", ""],
    [],
]


def test_pdf_roundtrip_both_layouts():
    want = ["\n".join(p) for p in PAGES]
    for mode in ("classic", "xrefstream"):
        for compress in (True, False):
            blob = write_pdf(PAGES, mode, compress)
            assert parse_pdf_text(blob) == want, (mode, compress)
    # empty document: one empty page
    assert parse_pdf_text(write_pdf([])) == [""]


def test_pdf_string_escapes_and_latin1():
    tricky = [
        "tabs\tand\nnewlines\rhere",
        "octal \x01 low bytes \x7f high",
        "café ß près ÿ",
        "(((nested))) \\ backslashes \\\\",
    ]
    for mode in ("classic", "xrefstream"):
        got = parse_pdf_text(write_pdf([tricky], mode))
        assert got == ["\n".join(tricky)], mode
    with pytest.raises(NotImplementedError, match="Latin-1"):
        write_pdf([["中文 text"]])


def test_pdf_incremental_update_prev_chain():
    """An appended update section (the incremental-save layout) must
    win for the objects it redefines, with /Prev reaching the rest."""
    base = write_pdf([["original text"]], "classic")
    old_xref_at = int(
        re.search(rb"startxref\s+(\d+)", base).group(1)
    )
    # replace content object 5 with new text
    body = b"BT /F1 11 Tf 12 TL 54 768 Td\n(updated text) Tj\nET\n"
    upd = bytearray(base)
    at5 = len(upd)
    upd += (
        b"5 0 obj\n<</Length %d>>\nstream\n" % len(body)
        + body
        + b"\nendstream\nendobj\n"
    )
    xref_at = len(upd)
    upd += b"xref\n5 1\n%010d 00000 n \n" % at5
    upd += (
        b"trailer\n<</Size 6/Root 1 0 R/Prev %d>>\nstartxref\n%d\n%%%%EOF\n"
        % (old_xref_at, xref_at)
    )
    assert parse_pdf_text(bytes(upd)) == ["updated text"]
    assert parse_pdf_text(base) == ["original text"]


def test_pdf_ascii_hex_filter():
    body = b"BT (hex encoded) Tj ET"
    hx = body.hex().encode() + b">"
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n"
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n"
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/Contents 4 0 R>>\nendobj\n"
    )
    blob += b"4 0 obj\n<</Filter/ASCIIHexDecode/Length %d>>\nstream\n" % len(
        hx
    )
    blob += hx + b"\nendstream\nendobj\n"
    offs = [blob.find(b"%d 0 obj" % i) for i in range(1, 5)]
    xref_at = len(blob)
    blob += b"xref\n0 5\n0000000000 65535 f \n"
    for o in offs:
        blob += b"%010d 00000 n \n" % o
    blob += b"trailer\n<</Size 5/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n" % (
        xref_at
    )
    assert parse_pdf_text(blob) == ["hex encoded"]


def test_pdf_predictors_invert_forward_filtering():
    rng = np.random.default_rng(91)
    raw = bytes(rng.integers(0, 256, 35).astype(np.uint8))
    cols, bpp = 7, 1
    # TIFF predictor 2: forward-difference then expect restoration
    fwd = bytearray()
    for at in range(0, len(raw), cols):
        prev = 0
        for b in raw[at : at + cols]:
            fwd.append((b - prev) & 0xFF)
            prev = b
    assert (
        _apply_predictor(bytes(fwd), {"Predictor": 2, "Columns": cols})
        == raw
    )
    # PNG filters 0-4, one per row
    fwd = bytearray()
    prev_row = bytes(cols)
    for i, at in enumerate(range(0, len(raw), cols)):
        row = raw[at : at + cols]
        ft = i % 5
        fwd.append(ft)
        for j, b in enumerate(row):
            left = row[j - bpp] if j >= bpp else 0
            up = prev_row[j]
            ul = prev_row[j - bpp] if j >= bpp else 0
            if ft == 0:
                fwd.append(b)
            elif ft == 1:
                fwd.append((b - left) & 0xFF)
            elif ft == 2:
                fwd.append((b - up) & 0xFF)
            elif ft == 3:
                fwd.append((b - ((left + up) >> 1)) & 0xFF)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pr = (
                    left
                    if pa <= pb and pa <= pc
                    else (up if pb <= pc else ul)
                )
                fwd.append((b - pr) & 0xFF)
        prev_row = row
    assert (
        _apply_predictor(bytes(fwd), {"Predictor": 12, "Columns": cols})
        == raw
    )


def test_pdf_disclosed_boundaries():
    blob = write_pdf(PAGES, "classic")
    # encryption: injecting /Encrypt into the trailer shifts nothing
    # before it, so the startxref offset stays valid
    enc = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R/Encrypt 3 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf_text(enc)
    # unknown filter: same-length name keeps every offset valid, so
    # the failure is the filter itself
    assert b"/Filter /FlateDecode" in blob
    lzw = blob.replace(b"/Filter /FlateDecode", b"/Filter /AAateDecode")
    with pytest.raises(NotImplementedError, match="filter"):
        parse_pdf_text(lzw)


def test_pdf_randomized_matrix():
    rng = np.random.default_rng(92)
    alphabet = list(
        string.ascii_letters + string.digits + " ()\\'\"-_.,;:!?#%&*<>[]/"
    )
    for trial in range(30):
        pages = [
            [
                "".join(
                    rng.choice(alphabet, size=int(rng.integers(0, 70)))
                )
                for _ in range(int(rng.integers(0, 9)))
            ]
            for _ in range(int(rng.integers(1, 5)))
        ]
        mode = ("classic", "xrefstream")[trial % 2]
        got = parse_pdf_text(write_pdf(pages, mode, bool(trial % 3)))
        assert got == ["\n".join(p) for p in pages], (trial, mode)


def test_pdf_fuzz_fail_loudly():
    rng = np.random.default_rng(93)
    for mode in ("classic", "xrefstream"):
        blob = write_pdf(PAGES, mode)
        for cut in range(0, len(blob), max(1, len(blob) // 60)):
            try:
                parse_pdf_text(blob[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(500):
            b = bytearray(blob)
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            try:
                parse_pdf_text(bytes(b))
            except (ValueError, NotImplementedError):
                pass
