"""Web-crawl + record-shard queries: WARC→HTTP→HTML extraction,
TFRecord/tf.Example, MessagePack shards, EPUB, subtitles (SRT/VTT),
MJPEG-in-AVI.  Split out of the former queries/scale.py (VERDICT r10
task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions import text as tx
from ..operators import dedup as dd
from ._shared import TOKENS_SQL, _cached_media, _char_hash_sql
from .media import (
    _BMP_F,
    _BMP_H,
    _BMP_W,
    _CODES_CTE_SQL,
    _JPEG_QUALITY,
    _MJPEG_MAX_FRAMES,
    _PR_DAMP,
    _PR_ITERS,
    _jpeg_passes_sql,
)



# --- web-crawl ingestion (WARC -> HTTP -> HTML -> text) ------------------------

_WARC_PAR = 80  # characters per generated <p> slice
_WARC_LINK_MOD = 500  # out-link target space: doc (7*id + k) % MOD
_WARC_LINKS = 3  # out-links per page (k = 1..3), in the nav


def _warc_build(batches):
    """Fixture: each document becomes ONE ``.warc.gz`` object (the
    Common Crawl layout — warcinfo + request + response records, one
    gzip member each) whose HTML body carries the doc text as
    ``_WARC_PAR``-char ``<p>`` slices (escaped), each closed by one
    numeric character reference (code ``33 + len(text) % 90``), inside
    dropped chrome (nav/header/footer/script/style).  HTTP coding
    varies deterministically: chunked transfer coding for
    ``doc_id % 3 == 0``, gzip content coding for ``doc_id % 4 == 0``,
    status 404 for ``doc_id % 13 == 5`` — so the extractor's every
    layer (member split, record filter, chunk reassembly, gzip decode,
    charset decode, tag/entity semantics) is on the oracle-checked
    path."""
    import pandas as pd

    from ..functions.html import escape_text
    from ..functions.warc import write_http_response, write_warc

    for pdf in batches:
        payloads = []
        for did, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            did = int(did)
            m = 33 + len(text) % 90
            paras = "".join(
                f"<p>{escape_text(text[i:i + _WARC_PAR])}&#{m};</p>"
                for i in range(0, len(text), _WARC_PAR)
            )
            nav_links = "".join(
                f'<li><a href="https://crawl.example.org/doc/'
                f'{(7 * did + k) % _WARC_LINK_MOD}">d{k}</a></li>'
                for k in range(1, _WARC_LINKS + 1)
            )
            html = (
                f"<html><head><title>Document {did}</title>"
                "<style>p{margin:0}</style>"
                "<script>var t = '<p>junk</p>';</script></head>"
                f"<body><nav><ul><li>Home</li>{nav_links}</ul></nav>"
                "<header>Crawl Fixture Site</header>"
                f"{paras}"
                f"<footer>&copy; fixture {did}</footer></body></html>"
            )
            body = html.encode("utf-8")
            url = f"https://crawl.example.org/{source}/{did}"
            status = 404 if did % 13 == 5 else 200
            resp = write_http_response(
                status,
                [
                    ("Content-Type", "text/html; charset=utf-8"),
                    ("Content-Language", str(lang)),
                ],
                body,
                chunked=did % 3 == 0,
                gzip_body=did % 4 == 0,
                chunk_size=64,
                reason="OK" if status == 200 else "Not Found",
            )
            req = (
                f"GET /{source}/{did} HTTP/1.1\r\n"
                "Host: crawl.example.org\r\n\r\n"
            ).encode()
            records = [
                (
                    {
                        "WARC-Type": "warcinfo",
                        "WARC-Record-ID": f"<urn:fixture:{did}:info>",
                        "Content-Type": "application/warc-fields",
                    },
                    b"software: asid-warc-fixture\r\n",
                ),
                (
                    {
                        "WARC-Type": "request",
                        "WARC-Record-ID": f"<urn:fixture:{did}:req>",
                        "WARC-Target-URI": url,
                        "Content-Type": "application/http; msgtype=request",
                    },
                    req,
                ),
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:fixture:{did}:resp>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": url,
                        "Content-Type": "application/http; msgtype=response",
                    },
                    resp,
                ),
            ]
            payloads.append(write_warc(records))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def _warc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_media(
        spark,
        sf_dir,
        "warc",
        _warc_build,
        cols=("doc_id", "text", "lang", "source"),
    )


_WARC_SRC_RE = r"^https://crawl\.example\.org/([^/]+)/"


def tx_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL web-crawl ingestion (§2.11): ``.warc.gz`` payloads split
    into gzip members, WARC records parsed and filtered to responses,
    HTTP parsed (chunked + gzip codings removed, charset decoded),
    HTML reduced to title + content text with boilerplate dropped —
    the operator is ``operators/webtext.extract_warc_text``, a
    zero-shuffle Arrow kernel.  The oracle re-derives the expected
    extracted text per document from the `documents` table (the
    fixture's paragraph slicing + entity markers are deterministic),
    so any drift in member framing, chunk reassembly, entity decoding
    or block/whitespace semantics breaks the value hash."""
    from ..operators.webtext import extract_warc_text

    rows = extract_warc_text(_warc_media(spark, sf_dir))
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "status",
        "content_language",
        F.regexp_extract("url", _WARC_SRC_RE, 1).alias("src"),
        "title",
        F.length("text").alias("n_chars"),
        tx.char_poly_hash(F.col("text")).alias("text_hash"),
        "n_records",
    ).orderBy("doc_id")


def _warc_expected_cte() -> str:
    """CTE ``ex``: the extractor's expected output text per document,
    re-derived from `documents` — ``_WARC_PAR``-char slices, leading
    whitespace trimmed per line (the extractor's line normalization;
    slices have no interior runs because the corpus has none), the
    per-paragraph marker character appended, lines joined by \\n."""
    p = _WARC_PAR
    return f"""
ex AS (
  SELECT doc_id, lang, source,
         CAST(CASE WHEN doc_id % 13 = 5 THEN 404 ELSE 200 END AS INT)
           AS status,
         array_to_string(
           list_transform(range(0, (len(text) + {p - 1}) // {p}),
             i -> ltrim(substr(text, CAST(1 + {p} * i AS BIGINT), {p}))
                  || chr(CAST(33 + len(text) % 90 AS INT))),
           chr(10)) AS t
  FROM documents)
"""


def _tx_warc_sql() -> str:
    ch = _char_hash_sql("t")
    return f"""
WITH {_warc_expected_cte()}
SELECT doc_id, status, lang AS content_language, source AS src,
       'Document ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS text_hash,
       CAST(3 AS INT) AS n_records
FROM ex ORDER BY doc_id
"""


def _warc_quarantine_build(batches):
    """Fixture kernel for ``tx_warc_quarantine``: the ``_warc_build``
    payloads (hashed as a dep, so a builder change still refixtures),
    with docs ``doc_id % 7 == 3`` getting their leading gzip magic
    destroyed — a deterministic corrupt-subset so the quarantine path
    itself is oracle-checkable."""
    for pdf in _warc_build(batches):
        pdf["payload"] = [
            (b"XX" + p[2:] if p is not None and mid % 7 == 3 else p)
            for mid, p in zip(pdf["media_id"], pdf["payload"])
        ]
        yield pdf


def tx_warc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING crawl ingestion: ``extract_warc_text_admitting``
    turns each corrupt ``.warc.gz`` object into a rejected ROW (null
    fields + error class) instead of a failed Spark task — at crawl
    scale a truncated member is a statistical certainty.  The fixture
    corrupts a deterministic subset (``doc_id % 7 == 3``, gzip magic
    destroyed), so the oracle re-derives BOTH sides: the expected
    extracted text for admitted docs and (doc_id, 'ValueError') for
    the corrupted ones."""
    from ..operators.webtext import extract_warc_text_admitting

    media = _cached_media(
        spark,
        sf_dir,
        "warcquar",
        _warc_quarantine_build,
        cols=("doc_id", "text", "lang", "source"),
        deps=(_warc_build,),
    )
    rows = extract_warc_text_admitting(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "status",
        F.length("text").alias("n_chars"),
        tx.char_poly_hash(F.col("text")).alias("text_hash"),
    ).orderBy("doc_id")


def _tx_warc_quarantine_sql() -> str:
    ch = _char_hash_sql("t")
    return f"""
WITH {_warc_expected_cte()},
good AS (
  SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
         status, CAST(len(t) AS INT) AS n_chars, {ch} AS text_hash
  FROM ex WHERE doc_id % 7 <> 3
),
rejected AS (
  SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
         CAST(NULL AS INT) AS status, CAST(NULL AS INT) AS n_chars,
         CAST(NULL AS BIGINT) AS text_hash
  FROM ex WHERE doc_id % 7 = 3
)
SELECT * FROM good UNION ALL SELECT * FROM rejected ORDER BY doc_id
"""


def gr_crawl_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END crawl link graph (§2.11): the WARC fixture pages
    carry REAL ``<a href>`` out-links in their nav (dropped for text,
    counted for the frontier — exactly a crawler's view), extracted by
    ``extract_warc_links`` (gzip member split → WARC/HTTP parse → HTML
    attribute scan), reduced to document edges, and ranked with the
    existing ``pagerank`` operator — the document-quality prior of
    web-corpus curation computed from the corpus's own link structure.
    Directed graph, NO symmetrization: targets live in
    ``[0, _WARC_LINK_MOD)`` and every node has out-links, so the
    dangling-free precondition holds while source-only nodes (ids ≥
    MOD at sf0.1) exercise the operator's left-join residual path.
    The oracle unrolls the identical six rounds with the same
    LEFT JOIN + COALESCE form."""
    from ..operators.graph import pagerank
    from ..operators.webtext import extract_warc_links

    links = extract_warc_links(_warc_media(spark, sf_dir))
    edges = links.select(
        F.col("media_id").alias("src"),
        F.regexp_extract("link", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("dst"),
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def _gr_crawl_pagerank_sql() -> str:
    d, mod, nl = _PR_DAMP, _WARC_LINK_MOD, _WARC_LINKS
    ks = ", ".join(str(k) for k in range(1, nl + 1))
    parts = [
        f"""edges AS (
  SELECT doc_id AS src, (7 * doc_id + k) % {mod} AS dst
  FROM documents, unnest([{ks}]) AS t(k)
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM deg, nn)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        rank = f"(1 - {d}) / nn.n + {d} * COALESCE(g.inm, 0)"
        parts.append(
            f"""r{k} AS (
  SELECT deg.src, {rank} AS rank, ({rank}) / deg.deg AS contrib
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS src, sum(r.contrib) AS inm
    FROM edges e JOIN r{k - 1} r ON e.src = r.src GROUP BY e.dst
  ) g ON g.src = deg.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM r{_PR_ITERS}"
        + " ORDER BY node"
    )


_WARC_MIN_CHARS, _WARC_MAX_CHARS = 60, 520


def cur_warc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl curation: WARC → HTML text → HTTP-status gate
    → length gate → exact dedup on extracted text (survivor = min
    doc_id) → per-(src, lang) corpus stats.  One declarative plan:
    the extraction kernel is zero-shuffle, the dedup shuffles once on
    the text key, the final agg once on (src, lang) — the same shape
    at 100 TB."""
    from ..operators.webtext import extract_warc_text

    rows = extract_warc_text(_warc_media(spark, sf_dir)).select(
        F.col("media_id").alias("doc_id"),
        "status",
        F.col("content_language").alias("lang"),
        F.regexp_extract("url", _WARC_SRC_RE, 1).alias("src"),
        "text",
    )
    filt = rows.filter(
        (F.col("status") == 200)
        & F.length("text").between(_WARC_MIN_CHARS, _WARC_MAX_CHARS)
    ).withColumn("n_toks", tx.token_count(F.col("text")))
    surv = dd.exact_dedup(filt, ["text"], "doc_id")
    return (
        surv.groupBy("src", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.sum("n_toks").alias("sum_toks"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("src", "lang")
    )


def _cur_warc_sql() -> str:
    toks_t = TOKENS_SQL.replace("text", "t")
    lo, hi = _WARC_MIN_CHARS, _WARC_MAX_CHARS
    return f"""
WITH {_warc_expected_cte()},
filt AS (
  SELECT doc_id, lang, source AS src, t,
         len({toks_t}) AS n_toks
  FROM ex
  WHERE status = 200 AND len(t) BETWEEN {lo} AND {hi}
),
surv AS (
  SELECT *, row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM filt
)
SELECT src, lang, COUNT(*) AS n_docs,
       CAST(SUM(len(t)) AS BIGINT) AS sum_chars,
       CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM surv WHERE rn = 1
GROUP BY src, lang ORDER BY src, lang
"""


# --- TFRecord shards of tf.train.Example -------------------------------------

_TFR_SLICE = 96  # characters per generated example


def _tfrecord_build(batches):
    """Fixture for ``src_tfrecord_scan``: each document becomes one
    TFRecord shard with one ``tf.train.Example`` per ``_TFR_SLICE``-char
    text slice.  Features per example: ``key`` bytes
    ``{doc_id:06d}-{sno:03d}``, ``txt`` bytes slice, ``sno`` int64,
    ``delta`` int64 ``sno - 2`` (negative for the first two — the
    10-byte varint path), ``score`` packed float32
    ``[len + 0.25, sno + 0.5]`` (dyadic, so float32-exact and
    SQL-replicable)."""
    import pandas as pd

    from ..functions.protof import encode_example
    from ..functions.tfrecord import write_tfrecord

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            recs = []
            for sno, i in enumerate(range(0, len(t), _TFR_SLICE)):
                s = t[i : i + _TFR_SLICE]
                recs.append(
                    encode_example(
                        {
                            "key": (
                                "bytes",
                                [f"{did:06d}-{sno:03d}".encode()],
                            ),
                            "txt": ("bytes", [s.encode("utf-8")]),
                            "sno": ("int64", [sno]),
                            "delta": ("int64", [sno - 2]),
                            "score": (
                                "float",
                                [len(s) + 0.25, sno + 0.5],
                            ),
                        }
                    )
                )
            payloads.append(write_tfrecord(recs) if recs else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_tfrecord_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord ingestion (§2.11): the tf.data training-shard format —
    masked-CRC32C framed records of serialized ``tf.train.Example``
    protos — scanned back into typed per-example rows
    (``extract_tfrecord_examples``).  The oracle re-derives every
    feature (key arithmetic, slice text, int64s incl. the negative
    varint path, float32-exact scores) from `documents`, so drift in
    CRC masking, record framing, varint/zigzag decode, packed-float
    parsing or map-entry traversal breaks the value hash."""
    from ..operators.multimodal import extract_tfrecord_examples

    media = _cached_media(spark, sf_dir, "tfrecord", _tfrecord_build)
    rows = extract_tfrecord_examples(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_feats",
        "sno",
        "delta",
        "score",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_tfrecord_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(5 AS INT) AS n_feats,
       sno,
       sno - 2 AS delta,
       CAST(len(t) + 0.25 AS DOUBLE) AS score,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""


# --- MessagePack record shards -------------------------------------------------

_MSGPACK_SLICE = 112  # characters per generated record


def _msgpack_build(batches):
    """Fixture for ``src_msgpack_scan``: each document becomes one
    shard of concatenated msgpack maps, one per ``_MSGPACK_SLICE``-char
    slice.  Fields chosen to cross format-family boundaries: ``sno``
    positive fixint→uint8, ``neg`` ``-(1 + 300*sno)`` negative
    fixint→int16, ``frac`` float64 ``sno + 0.25``, ``ok`` bool,
    ``nil`` None, ``tags`` fixarray [lang, str(doc_id)], ``blob`` bin8
    of the slice's first UTF-8 bytes, plus key/txt strings (fixstr and
    str8 both occur)."""
    import pandas as pd

    from ..functions.msgpackf import pack

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            did = int(did)
            parts = []
            for sno, i in enumerate(range(0, len(t), _MSGPACK_SLICE)):
                s = t[i : i + _MSGPACK_SLICE]
                parts.append(
                    pack(
                        {
                            "key": f"{did:06d}-{sno:03d}",
                            "sno": sno,
                            "neg": -(1 + 300 * sno),
                            "frac": sno + 0.25,
                            "ok": sno % 2 == 0,
                            "nil": None,
                            "cls": str(lang),
                            "tags": [str(lang), str(did)],
                            "blob": s.encode("utf-8")[:4],
                            "txt": s,
                        }
                    )
                )
            payloads.append(b"".join(parts) if parts else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_msgpack_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MessagePack shard ingestion (§2.11): concatenated msgpack maps —
    a common record-shard layout — decoded by the strict pure-Python
    codec (``functions/msgpackf.py``) into typed rows
    (``extract_msgpack_records``).  The oracle re-derives every field
    from `documents` (key printf arithmetic, the negative-int family,
    float64 fractions, bool parity, tag counts, slice text), so drift
    in any format family's length/endianness handling breaks the
    value hash."""
    from ..operators.multimodal import extract_msgpack_records

    media = _cached_media(
        spark, sf_dir, "msgpack", _msgpack_build,
        cols=("doc_id", "text", "lang"),
    )
    rows = extract_msgpack_records(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_fields",
        "sno",
        "neg",
        "frac",
        "ok",
        "cls",
        "n_tags",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_msgpack_sql() -> str:
    w = _MSGPACK_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, lang, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(10 AS INT) AS n_fields,
       sno,
       -(1 + 300 * sno) AS neg,
       CAST(sno + 0.25 AS DOUBLE) AS frac,
       sno % 2 = 0 AS ok,
       lang AS cls,
       CAST(2 AS INT) AS n_tags,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""


# --- EPUB books -----------------------------------------------------------------

_EPUB_CH = 240  # characters per chapter
_EPUB_PAR = 60  # characters per paragraph within a chapter


def _epub_build(batches):
    """Fixture for ``tx_epub_extract``: each document becomes one EPUB
    whose chapters are ``_EPUB_CH``-char text slices and whose
    paragraphs are the chapters' stripped ``_EPUB_PAR``-char
    sub-slices (stripped so the extractor's per-line whitespace
    normalization is the identity and the oracle can replay it with
    ``trim``).  Chapter titles ``Chapter {chno:03d}``, book title
    ``Doc {doc_id}``, dc:language from the doc's lang."""
    import pandas as pd

    from ..functions.epub import write_epub

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            did = int(did)
            chapters = []
            for chno, i in enumerate(range(0, len(t), _EPUB_CH)):
                ct = t[i : i + _EPUB_CH]
                paras = [
                    p
                    for j in range(0, len(ct), _EPUB_PAR)
                    if (p := ct[j : j + _EPUB_PAR].strip())
                ]
                chapters.append((f"Chapter {chno:03d}", paras))
            payloads.append(
                write_epub(f"Doc {did}", chapters, language=str(lang))
                if chapters
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB book-dump ingestion (§2.11): OCF container → container.xml
    → OPF manifest/spine → spine-ordered XHTML chapters → text
    (``extract_epub_chapters``) — ZIP, XML and HTML layers composed.
    The oracle re-derives chapter titles, OPF metadata and the exact
    extracted text (title line + trimmed paragraph lines) from
    `documents`, so drift in any layer — mixed-method ZIP, container
    indirection, spine ordering, XHTML text extraction — breaks the
    value hash."""
    from ..operators.multimodal import extract_epub_chapters

    media = _cached_media(
        spark, sf_dir, "epub", _epub_build, cols=("doc_id", "text", "lang")
    )
    rows = extract_epub_chapters(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "book",
        "language",
        "chno",
        "title",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "chno")


def _tx_epub_sql() -> str:
    c, p = _EPUB_CH, _EPUB_PAR
    ch = _char_hash_sql("t")
    return f"""
WITH chs AS (
  SELECT doc_id, lang, CAST(i AS INT) AS chno,
         substr(text, CAST(1 + {c} * i AS BIGINT), {c}) AS ct
  FROM documents,
       unnest(range(0, (len(text) + {c - 1}) // {c})) AS ts(i)
), lines AS (
  SELECT doc_id, lang, chno,
         printf('Chapter %03d', chno) || chr(10) ||
         array_to_string(
           list_filter(
             list_transform(range(0, (len(ct) + {p - 1}) // {p}),
               j -> trim(substr(ct, CAST(1 + {p} * j AS BIGINT), {p}))),
             x -> x <> ''),
           chr(10)) AS t
  FROM chs
)
SELECT doc_id,
       'Doc ' || doc_id AS book,
       lang AS language,
       chno,
       printf('Chapter %03d', chno) AS title,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, chno
"""


# --- subtitles (SRT / WebVTT funnel) --------------------------------------------

_SUB_SLICE = 48  # characters per cue
_SUB_LINE = 24  # characters per cue line


def _subtitle_build(batches):
    """Fixture for ``tx_subtitle_extract``: each document becomes one
    subtitle file — SRT for even doc_ids, WebVTT (with cue ids) for
    odd — one cue per ``_SUB_SLICE``-char slice, cue text split into
    two ``_SUB_LINE``-char lines (multi-line accumulation on the
    checked path).  Timings re-derivable in SQL:
    ``start = (doc_id % 5)*977000 + sno*2000 + (doc_id % 7)*17``
    (hours digit exercised), ``end = start + 1900``."""
    import pandas as pd

    from ..functions.subtitles import write_srt, write_webvtt

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            cues = []
            for sno, i in enumerate(range(0, len(t), _SUB_SLICE)):
                s = t[i : i + _SUB_SLICE]
                lines = [
                    part
                    for part in (s[:_SUB_LINE], s[_SUB_LINE:])
                    if part
                ]
                start = (did % 5) * 977_000 + sno * 2000 + (did % 7) * 17
                cues.append((start, start + 1900, "\n".join(lines)))
            if not cues:
                payloads.append(None)
            elif did % 2 == 0:
                payloads.append(write_srt(cues))
            else:
                payloads.append(
                    write_webvtt(
                        cues, ids=[f"c{k}" for k in range(len(cues))]
                    )
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_subtitle_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtitle ingestion funnel (§2.11): SRT and WebVTT files sniffed
    per payload and parsed into one row per cue
    (``extract_subtitle_cues``) — millisecond timing round-trip
    (HH:MM:SS,mmm vs HH:MM:SS.mmm), cue-id handling, verbatim
    multi-line text.  The oracle re-derives format by doc parity,
    timings by the fixture arithmetic and text from `documents`, so
    drift in timestamp formatting/parsing or line accumulation breaks
    the value hash."""
    from ..operators.multimodal import extract_subtitle_cues

    media = _cached_media(spark, sf_dir, "subtitle", _subtitle_build)
    rows = extract_subtitle_cues(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "fmt",
        "cueno",
        "start_ms",
        "end_ms",
        F.size(F.split("txt", "\n")).alias("n_lines"),
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "cueno")


def _tx_subtitle_sql() -> str:
    w, ln = _SUB_SLICE, _SUB_LINE
    ch = _char_hash_sql("t")
    return f"""
WITH cues AS (
  SELECT doc_id, CAST(i AS INT) AS cueno,
         (doc_id % 5) * 977000 + i * 2000 + (doc_id % 7) * 17 AS start_ms,
         array_to_string(
           list_filter(
             [substr(text, CAST(1 + {w} * i AS BIGINT), {ln}),
              substr(text, CAST(1 + {w} * i + {ln} AS BIGINT), {ln})],
             x -> x <> ''),
           chr(10)) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'srt' ELSE 'vtt' END AS fmt,
       cueno,
       start_ms,
       start_ms + 1900 AS end_ms,
       CAST(len(string_split(t, chr(10))) AS INT) AS n_lines,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM cues ORDER BY doc_id, cueno
"""


# --- MJPEG in AVI ----------------------------------------------------------------

_AVI_USEC = 40_000  # 25 fps


def mm_avi_mjpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI frame decode (§2.11): the ``mm_mkv_jpeg_pool``
    pixels in a RIFF/AVI container instead of Matroska — same
    fixed-point JPEG layer (odd frames progressive SOF2, even
    baseline SOF0), different mux: hdrl/strl headers, word-aligned
    00dc movi chunks, idx1 legacy index (cross-checked on read),
    timestamps reconstructed from ``usec_per_frame``.  The oracle is
    the container-independent JPEG replay keyed by (doc_id, frame) —
    the MKV twin's SQL with AVI's timestamp arithmetic — so the two
    containers must agree bit-for-bit on every decoded pixel."""
    from ..operators.multimodal import demux_avi_decode_jpeg_pool

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.avi import write_avi_mjpeg
        from ..functions.codecs import write_jpeg, write_jpeg_progressive

        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                frames = [
                    (write_jpeg_progressive if i % 2 else write_jpeg)(
                        np.frombuffer(
                            raw, np.uint8, count=n, offset=i * n
                        ).reshape(_BMP_H, _BMP_W),
                        quality=_JPEG_QUALITY,
                    )
                    for i in range(nf)
                ]
                payloads.append(
                    write_avi_mjpeg(
                        frames,
                        _BMP_W,
                        _BMP_H,
                        usec_per_frame=_AVI_USEC,
                        # layout mix (r12, VERDICT r11 task 5): odd
                        # docs use the file-absolute idx1 convention,
                        # even docs movi-relative, so parse_avi's
                        # dual-convention auto-detect runs under the
                        # from-octets oracle
                        idx_absolute=int(did) % 2 == 1,
                    )
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "avijpeg", build)
    pooled = demux_avi_decode_jpeg_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "ts_ms",
        "keyframe",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "ts_ms")


def _mm_avi_jpeg_sql() -> str:
    """Container-independent JPEG replay (the ``_mm_mkv_jpeg_sql``
    pipeline) with AVI's ``usec_per_frame``-derived timestamps."""
    ctes, cols = _jpeg_passes_sql("doc_id, fno")
    n = _BMP_W * _BMP_H
    ms = _AVI_USEC // 1000
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         list_transform(range(0, {n}), i ->
           CAST(cs[CAST(f * {n} + i + 1 AS INT)] AS BIGINT) - 128) AS xs
  FROM codes,
       unnest(range(0, LEAST(n_bytes // {n}, {_MJPEG_MAX_FRAMES}))) AS t(f)
),
{ctes}
SELECT doc_id, CAST(fno * {ms} AS BIGINT) AS ts_ms,
       TRUE AS keyframe,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id, ts_ms
"""

REGISTRY = {
    "tx_warc_extract": (tx_warc_extract, _tx_warc_sql()),
    "cur_warc_pipeline": (cur_warc_pipeline, _cur_warc_sql()),
    "tx_warc_quarantine": (tx_warc_quarantine, _tx_warc_quarantine_sql()),
    "gr_crawl_pagerank": (gr_crawl_pagerank, _gr_crawl_pagerank_sql()),
    "src_tfrecord_scan": (src_tfrecord_scan, _src_tfrecord_sql()),
    "src_msgpack_scan": (src_msgpack_scan, _src_msgpack_sql()),
    "tx_epub_extract": (tx_epub_extract, _tx_epub_sql()),
    "tx_subtitle_extract": (tx_subtitle_extract, _tx_subtitle_sql()),
    "mm_avi_mjpeg_pool": (mm_avi_mjpeg_pool, _mm_avi_jpeg_sql()),
}
