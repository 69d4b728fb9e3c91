"""WARC ingestion + HTML→text extraction (§2.11 web-crawl front end).

Covers: gzip member framing, WARC record round trips, HTTP response
parsing (content-length / chunked / gzip content-coding / charsets),
HTML extraction semantics (boilerplate drop, entities, rawtext,
blocks), a seeded randomized round-trip matrix (the r10 discipline),
the r10 fuzz contract, and the Spark operators incl. the quarantining
admitting twin.
"""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.html import (
    escape_text,
    html_to_text,
)
from asid_v2_data_pipeline_spark.functions.warc import (
    decode_body,
    gzip_member,
    iter_warc_records,
    parse_http_response,
    split_gzip_members,
    write_http_response,
    write_warc,
)


def _resp_headers(body: bytes, lang: str = "en", charset: str = "utf-8"):
    return [
        ("Content-Type", f"text/html; charset={charset}"),
        ("Content-Language", lang),
        ("Server", "unit/1.0"),
    ]


def _record(
    uri: str,
    body: bytes,
    rtype: str = "response",
    **http_kw,
) -> tuple[dict, bytes]:
    headers = {
        "WARC-Type": rtype,
        "WARC-Record-ID": f"<urn:test:{uri}>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "WARC-Target-URI": uri,
        "Content-Type": "application/http; msgtype=response",
    }
    block = write_http_response(200, _resp_headers(body), body, **http_kw)
    return headers, block


# --- gzip framing -------------------------------------------------------------


def test_gzip_members_roundtrip_and_validation():
    blobs = [b"", b"a", b"hello world" * 40, bytes(range(256)) * 3]
    data = b"".join(gzip_member(b) for b in blobs)
    assert split_gzip_members(data) == blobs
    # deterministic framing: same input -> same bytes
    assert gzip_member(b"xyz") == gzip_member(b"xyz")
    # corrupt CRC is loud
    bad = bytearray(gzip_member(b"payload"))
    bad[-6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        split_gzip_members(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        split_gzip_members(b"\x00\x00" + data)


# --- WARC records -------------------------------------------------------------


def test_warc_roundtrip_gzip_and_plain():
    recs = [
        _record("https://example.org/a", b"<html>alpha</html>"),
        _record("https://example.org/b", b"<html>beta</html>",
                rtype="request"),
        _record("https://example.org/c", b"<html>gamma</html>"),
    ]
    for per_gz in (True, False):
        data = write_warc(recs, per_record_gzip=per_gz)
        parsed = iter_warc_records(data)
        assert len(parsed) == 3
        assert [h["warc-type"] for h, _ in parsed] == [
            "response", "request", "response",
        ]
        assert parsed[0][0]["warc-target-uri"] == "https://example.org/a"
        # blocks round-trip exactly
        assert parsed[2][1] == recs[2][1]


def test_warc_header_folding_and_bad_inputs():
    rec = write_warc(
        [_record("https://example.org/x", b"hi")], per_record_gzip=False
    )
    folded = rec.replace(
        b"WARC-Date: 2026-01-01T00:00:00Z",
        b"WARC-Date: 2026-01-01\r\n T00:00:00Z",
    )
    parsed = iter_warc_records(folded)
    assert parsed[0][0]["warc-date"] == "2026-01-01 T00:00:00Z"
    with pytest.raises(ValueError):
        iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError):
        iter_warc_records(rec[:-3])  # missing separator


# --- HTTP response parsing ----------------------------------------------------


@pytest.mark.parametrize("chunked", [False, True])
@pytest.mark.parametrize("gzip_body", [False, True])
def test_http_response_codings(chunked, gzip_body):
    body = ("chunky " * 100).encode()
    block = write_http_response(
        200, _resp_headers(body), body, chunked=chunked,
        gzip_body=gzip_body, chunk_size=37,
    )
    status, headers, got = parse_http_response(block)
    assert status == 200
    assert got == body
    assert headers["content-language"] == "en"


def test_http_charsets_and_errors():
    for cs, text in (
        ("utf-8", "héllo wörld — ünïcode"),
        ("latin-1", "héllo"),
        ("utf-16", "mixed 中文"),
    ):
        body = text.encode("utf-16" if cs == "utf-16" else cs)
        block = write_http_response(
            200, _resp_headers(body, charset=cs), body
        )
        status, headers, raw = parse_http_response(block)
        assert decode_body(headers, raw) == text
    # unknown charset is loud
    body = b"x"
    block = write_http_response(
        200, _resp_headers(body, charset="klingon"), body
    )
    _, headers, raw = parse_http_response(block)
    with pytest.raises(ValueError, match="charset"):
        decode_body(headers, raw)
    # truncated chunked stream is loud
    block = write_http_response(
        200, _resp_headers(body), b"abcdef" * 30, chunked=True
    )
    with pytest.raises(ValueError):
        parse_http_response(block[:-9])


# --- HTML extraction ----------------------------------------------------------


def test_html_extraction_semantics():
    title, text = html_to_text(
        "<!doctype html><html><head><title>The &amp; Title</title>"
        "<style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
        "<header>Site chrome</header>"
        "<h1>Heading</h1>"
        "<p>First <b>bold</b> paragraph &lt;kept&gt;.</p>"
        "<p>Second&nbsp;one with &#65;&#x42;C.</p>"
        "<div>block<br>break</div>"
        "<!-- a comment <p>ignored</p> -->"
        "<footer>© chrome</footer></body></html>"
    )
    assert title == "The & Title"
    assert text.split("\n") == [
        "Heading",
        "First bold paragraph <kept>.",
        "Second one with ABC.",
        "block",
        "break",
    ]
    # boilerplate retained when asked
    _, full = html_to_text(
        "<nav>menu</nav><p>body</p>", drop_boilerplate=False
    )
    assert full.split("\n") == ["menu", "body"]
    # malformed markup degrades, never raises
    for junk in (
        "<p>unclosed", "a <3 b", "<><//><!--", "<p", "text</p></p>",
        "<script>never closed", "<title>t", "&#xZZ; &unknown;",
    ):
        html_to_text(junk)


def test_html_escape_roundtrip():
    s = "a & b < c > d & amp"
    _, text = html_to_text("<p>" + escape_text(s) + "</p>")
    assert text == s


# --- randomized round-trip matrix (r10 discipline) -----------------------------


def test_warc_randomized_matrix():
    """Seeded matrix over record counts × codings × charsets × chunk
    sizes: extraction recovers exactly the text each page was built
    from, with an independent in-test expectation (no module-side
    normalizer reuse)."""
    rng = np.random.default_rng(42)
    words = ["alpha", "beta", "gamma", "delta", "épsilon", "中文", "ze"]
    for trial in range(30):
        n_pages = int(rng.integers(1, 5))
        recs = []
        expected = []
        for p in range(n_pages):
            toks = [
                words[int(rng.integers(0, len(words)))]
                for _ in range(int(rng.integers(1, 40)))
            ]
            text = " ".join(toks)
            charset = ("utf-8", "latin-1")[int(rng.integers(0, 2))]
            if charset == "latin-1" and any(ord(c) > 255 for c in text):
                charset = "utf-8"
            html = (
                f"<html><head><title>p{p}</title></head><body>"
                f"<nav>junk{p}</nav><p>{escape_text(text)}</p>"
                "</body></html>"
            )
            body = html.encode(charset)
            headers, block = _record(
                f"https://t/{trial}/{p}", b"",
            )
            block = write_http_response(
                200,
                _resp_headers(body, charset=charset),
                body,
                chunked=bool(rng.integers(0, 2)),
                gzip_body=bool(rng.integers(0, 2)),
                chunk_size=int(rng.integers(3, 200)),
            )
            recs.append((headers, block))
            expected.append((f"p{p}", text))
        data = write_warc(recs, per_record_gzip=bool(rng.integers(0, 2)))
        got = []
        for h, blk in iter_warc_records(data):
            if h["warc-type"] != "response":
                continue
            status, hh, raw = parse_http_response(blk)
            title, text = html_to_text(decode_body(hh, raw))
            got.append((title, text))
        assert got == expected


# --- fuzz contract (r10) -------------------------------------------------------


def test_warc_fuzz_fail_loudly():
    """Truncation + byte-flip fuzz over the full ingest path: every
    corrupt payload either parses or raises ValueError — never
    IndexError/KeyError/zlib.error/UnicodeDecodeError escapes, never a
    hang (the admitting operator gates on ValueError)."""
    rng = np.random.default_rng(7)
    body = (
        "<html><head><title>t</title></head><body><p>"
        + escape_text("fuzz body & <text> " * 20)
        + "</p></body></html>"
    ).encode()
    recs = [
        _record("https://f/1", body),
        _record("https://f/2", body, chunked=True, chunk_size=17),
        _record("https://f/3", body, gzip_body=True),
    ]

    def run(blob: bytes) -> None:
        for h, blk in iter_warc_records(blob):
            if h.get("warc-type") == "response":
                _, hh, raw = parse_http_response(blk)
                html_to_text(decode_body(hh, raw))

    for per_gz in (True, False):
        blob = write_warc(recs, per_record_gzip=per_gz)
        for cut in range(1, len(blob), max(1, len(blob) // 80)):
            try:
                run(bytes(blob[:cut]))
            except ValueError:
                pass
        for _ in range(400):
            b = bytearray(blob)
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            try:
                run(bytes(b))
            except ValueError:
                pass


def test_html_fuzz_never_raises():
    rng = np.random.default_rng(11)
    base = (
        "<html><head><title>t&amp;</title><script>s<p></script></head>"
        "<body><nav>n</nav><p>a &#65; b</p><div>c<br>d</div>"
        "<textarea>raw <p> raw</textarea></body></html>"
    )
    for _ in range(500):
        b = list(base)
        for _ in range(int(rng.integers(1, 6))):
            i = int(rng.integers(0, len(b)))
            b[i] = chr(int(rng.integers(1, 128)))
        html_to_text("".join(b))
    # pathological nesting stays bounded
    html_to_text("<div>" * 5000 + "x" + "</div>" * 5000)
    html_to_text("<" * 3000)
    html_to_text("&" * 3000 + ";")


# --- Spark operators ----------------------------------------------------------


def _media_df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, payload binary",
    )


def test_extract_warc_text_operator(spark):
    body_a = b"<html><head><title>A</title></head><body><p>aa bb</p></body></html>"
    body_b = b"<html><head><title>B</title></head><body><p>cc</p><p>dd</p></body></html>"
    warc_a = write_warc(
        [
            ({"WARC-Type": "warcinfo"}, b"software: test\r\n"),
            _record("https://x/a", body_a),
        ]
    )
    warc_b = write_warc([_record("https://x/b", body_b, chunked=True)])
    from asid_v2_data_pipeline_spark.operators.webtext import (
        extract_warc_text,
    )

    rows = (
        extract_warc_text(_media_df(spark, {1: warc_a, 2: warc_b}))
        .orderBy("media_id")
        .collect()
    )
    assert [(r.media_id, r.url, r.title, r.text, r.n_records) for r in rows] == [
        (1, "https://x/a", "A", "aa bb", 2),
        (2, "https://x/b", "B", "cc\ndd", 1),
    ]


def test_extract_warc_text_admitting_quarantines(spark):
    good = write_warc(
        [_record("https://x/g", b"<html><body><p>ok</p></body></html>")]
    )
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt inside the gzip member -> CRC/deflate error
    from asid_v2_data_pipeline_spark.operators.webtext import (
        extract_warc_text_admitting,
    )

    rows = (
        extract_warc_text_admitting(
            _media_df(spark, {1: good, 2: bytes(bad)})
        )
        .orderBy("media_id")
        .collect()
    )
    assert rows[0].error is None and rows[0].text == "ok"
    assert rows[1].error == "ValueError" and rows[1].text is None


def test_extract_links_semantics():
    from asid_v2_data_pipeline_spark.functions.html import extract_links

    links = extract_links(
        '<html><head><script>var s = "<a href=\'/not-a-link\'>";'
        "</script></head><body>"
        '<nav><a href="/nav-counts">n</a></nav>'
        '<a href="https://x.io/p?a=1&amp;b=2">one</a>'
        "<a name=anchor>no href</a>"
        '<a href=bare-value>two</a>'
        '<a href="">empty</a>'
        '<area href="/area">'
        "<!-- <a href='/comment'>no</a> -->"
        '<a href="/q>r">quoted-gt</a>'
        "</body></html>"
    )
    assert links == [
        "/nav-counts",
        "https://x.io/p?a=1&b=2",  # entity-decoded
        "bare-value",
        "",
        "/area",
        "/q>r",
    ]
    # forgiving on junk, never raises
    for junk in ("<a href=", "<a", "<a href='unclosed", "<a href='x'"):
        extract_links(junk)


def test_extract_warc_links_operator(spark):
    body = (
        b"<html><body><nav><a href='https://t/a'>a</a></nav>"
        b"<p><a href='https://t/b'>b</a></p></body></html>"
    )
    blob = write_warc([_record("https://src/page", body)])
    from asid_v2_data_pipeline_spark.operators.webtext import (
        extract_warc_links,
    )

    rows = (
        extract_warc_links(_media_df(spark, {5: blob}))
        .orderBy("link")
        .collect()
    )
    assert [(r.media_id, r.url, r.link) for r in rows] == [
        (5, "https://src/page", "https://t/a"),
        (5, "https://src/page", "https://t/b"),
    ]
