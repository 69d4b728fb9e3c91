"""Remaining format families: EXIF, QOI, DOCX, Markdown, WebP
lossless, robots.txt, TFRecord quarantine, sitemaps, quoted CSV,
ICO, tensor shards (safetensors/npz), Arrow IPC, legacy rasters
(TGA/PGM/PPM).  Split out of the former queries/scale.py (VERDICT
r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions import text as tx
from ._shared import (
    _cached_index,
    _cached_media,
    _char_hash_sql,
    _code_fingerprint_src,
    _index_cache_path,
)
from .media import _BMP_H, _BMP_W, _JPEG_QUALITY
from .webshards import _TFR_SLICE, _tfrecord_build



# --- EXIF metadata in JPEG APP1 --------------------------------------------------


def _exif_build(batches):
    """Fixture for ``mm_jpeg_exif``: each document with ≥64 text bytes
    becomes one 8×8 JPEG (baseline for even doc_ids, progressive for
    odd) with an EXIF APP1 spliced after SOI; every field is doc_id
    arithmetic so the oracle replays it in SQL."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_jpeg, write_jpeg_progressive
    from ..functions.exif import insert_jpeg_app1, write_exif

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < n:
                payloads.append(None)
                continue
            img = (write_jpeg_progressive if did % 2 else write_jpeg)(
                np.frombuffer(raw, np.uint8, count=n).reshape(
                    _BMP_H, _BMP_W
                ),
                quality=_JPEG_QUALITY,
            )
            app1 = write_exif(
                {
                    "make": "Fixture",
                    "model": f"Cam {did % 17}",
                    "orientation": 1 + did % 8,
                    "x_resolution": (72 + did % 10, 1),
                    "exposure_time": (1, 60 + did % 200),
                    "iso": 100 + (did % 40) * 25,
                    "datetime_original": (
                        f"2026:{1 + did % 12:02d}:{1 + did % 28:02d} "
                        f"{did % 24:02d}:{did % 60:02d}:{did * 7 % 60:02d}"
                    ),
                    "pixel_x": _BMP_W,
                    "pixel_y": _BMP_H,
                }
            )
            payloads.append(insert_jpeg_app1(img, app1))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_jpeg_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction (§2.11): a real JPEG marker walk finds
    the APP1 segment, then the TIFF-IFD chain (IFD0 → 0x8769 Exif
    sub-IFD) is decoded — ASCII, SHORT, LONG and RATIONAL types all on
    the checked path, over both SOF0 and SOF2 images.  The oracle
    replays the doc_id arithmetic behind every field, so drift in IFD
    layout, endian handling, inline-vs-offset values or the marker
    walk breaks the value hash."""
    from ..operators.multimodal import extract_jpeg_exif

    media = _cached_media(spark, sf_dir, "exif", _exif_build)
    rows = extract_jpeg_exif(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "make",
        "model",
        "orientation",
        "iso",
        "exp_num",
        "exp_den",
        "xres_num",
        "xres_den",
        "px_w",
        "px_h",
        "dto",
    ).orderBy("doc_id")


def _mm_jpeg_exif_sql() -> str:
    n = _BMP_W * _BMP_H
    return f"""
SELECT doc_id,
       'Fixture' AS make,
       'Cam ' || (doc_id % 17) AS model,
       CAST(1 + doc_id % 8 AS INT) AS orientation,
       CAST(100 + (doc_id % 40) * 25 AS INT) AS iso,
       CAST(1 AS BIGINT) AS exp_num,
       CAST(60 + doc_id % 200 AS BIGINT) AS exp_den,
       CAST(72 + doc_id % 10 AS BIGINT) AS xres_num,
       CAST(1 AS BIGINT) AS xres_den,
       CAST({_BMP_W} AS BIGINT) AS px_w,
       CAST({_BMP_H} AS BIGINT) AS px_h,
       printf('2026:%02d:%02d %02d:%02d:%02d',
              1 + doc_id % 12, 1 + doc_id % 28,
              doc_id % 24, doc_id % 60, doc_id * 7 % 60) AS dto
FROM documents WHERE len(text) >= {n} ORDER BY doc_id
"""


# --- QOI images ------------------------------------------------------------------


def _qoi_build(batches):
    """Fixture for ``mm_qoi_pool``: each document's leading text bytes
    become one 8×8 QOI image — RGB (192 bytes) for even doc_ids, RGBA
    (256 bytes) for odd — so the index cache, DIFF/LUMA deltas, runs
    and both literal ops all occur across the corpus."""
    import numpy as np
    import pandas as pd

    from ..functions.qoi import write_qoi

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            ch = 3 + did % 2
            nb = _BMP_W * _BMP_H * ch
            raw = t.encode("utf-8")
            if len(raw) < nb:
                payloads.append(None)
                continue
            px = np.frombuffer(raw, np.uint8, count=nb).reshape(
                _BMP_H, _BMP_W, ch
            )
            payloads.append(write_qoi(px))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_qoi_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QOI image decode (§2.11): the lossless one-page-spec format —
    index cache, DIFF/LUMA wraparound deltas, runs, RGB/RGBA literals,
    strict end marker — decoded back to raster bytes
    (``decode_qoi_stats``).  Losslessness makes the oracle exact: the
    decoded component stream must equal the document's leading bytes
    verbatim (value-hash + byte-sum), RGB and RGBA mixed by doc
    parity."""
    from ..operators.multimodal import decode_qoi_stats

    media = _cached_media(spark, sf_dir, "qoi", _qoi_build)
    rows = decode_qoi_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "channels",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_qoi_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CAST(3 + doc_id % 2 AS INT) AS channels,
         substr(text, 1, {n} * (3 + doc_id % 2)) AS t
  FROM documents
  WHERE len(text) >= {n} * (3 + doc_id % 2)
)
SELECT doc_id,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       channels,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""


# --- DOCX office documents --------------------------------------------------------

_DOCX_PAR = 72  # characters per paragraph
_DOCX_RUN = 30  # first-run length within a paragraph


def _docx_build(batches):
    """Fixture for ``tx_docx_extract``: each document becomes one DOCX
    whose paragraphs are ``_DOCX_PAR``-char slices, each split into
    two runs at ``_DOCX_RUN`` chars (run concatenation and
    ``xml:space`` preservation on the checked path)."""
    import pandas as pd

    from ..functions.docx import write_docx

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            paras = [
                [s[:_DOCX_RUN], s[_DOCX_RUN:]]
                if len(s) > _DOCX_RUN
                else [s]
                for i in range(0, len(t), _DOCX_PAR)
                for s in (t[i : i + _DOCX_PAR],)
            ]
            payloads.append(write_docx(paras) if paras else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX ingestion (§2.11): the ECMA-376 package walked through its
    rels wiring to WordprocessingML paragraphs/runs
    (``extract_docx_paragraphs``) — ZIP and XML layers composed.  The
    oracle re-derives every paragraph from `documents` slices, so
    drift in package traversal, run concatenation or whitespace
    preservation breaks the value hash."""
    from ..operators.multimodal import extract_docx_paragraphs

    media = _cached_media(spark, sf_dir, "docx", _docx_build)
    rows = extract_docx_paragraphs(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "pno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "pno")


def _tx_docx_sql() -> str:
    w = _DOCX_PAR
    ch = _char_hash_sql("t")
    return f"""
WITH paras AS (
  SELECT doc_id, CAST(i AS INT) AS pno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, pno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM paras ORDER BY doc_id, pno
"""


# --- Markdown ----------------------------------------------------------------------

_MD_SLICE = 64  # characters per markdown block


def _markdown_build(batches):
    """Fixture for ``tx_markdown_extract``: each document becomes one
    markdown file — an ATX heading, then one block per
    ``_MD_SLICE``-char slice rotating through five shapes by
    ``sno % 5`` (bold / italic / code span / list item / blockquote;
    emphasis and list variants use the stripped slice since their
    syntax cannot carry edge whitespace), a fenced code block, and an
    inline link."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            blocks = [f"# Doc {did}"]
            for sno, i in enumerate(range(0, len(t), _MD_SLICE)):
                s = t[i : i + _MD_SLICE]
                v = sno % 5
                if v == 0:
                    blocks.append(f"**{s.strip()}**")
                elif v == 1:
                    blocks.append(f"*{s.strip()}*")
                elif v == 2:
                    blocks.append(f"`{s}`")
                elif v == 3:
                    blocks.append(f"- {s.strip()}")
                else:
                    blocks.append(f"> {s}")
            blocks.append(f"```python\ncode {did} block\n```")
            blocks.append(f"[Doc {did}](https://example.org/{did})")
            payloads.append("\n\n".join(blocks).encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown ingestion (§2.11): the GitHub/docs-corpus text stage —
    headings, emphasis, code spans, list markers, blockquotes, fenced
    code and links all stripped to content lines
    (``extract_markdown_lines``).  The oracle re-derives every line
    (heading text, per-variant slice normalization, fence content,
    link label) from `documents`, so drift in any stripping rule
    breaks the value hash."""
    from ..operators.multimodal import extract_markdown_lines

    media = _cached_media(spark, sf_dir, "markdown", _markdown_build)
    rows = extract_markdown_lines(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "lineno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "lineno")


def _tx_markdown_sql() -> str:
    w = _MD_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS s
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), lines AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS lineno, 'Doc ' || doc_id AS t
  FROM documents
  UNION ALL
  SELECT doc_id, 1 + sno,
         CASE WHEN sno % 5 IN (0, 1, 3) THEN trim(s) ELSE rtrim(s) END
  FROM slices
  UNION ALL
  SELECT doc_id, 1 + (len(text) + {w - 1}) // {w},
         'code ' || doc_id || ' block'
  FROM documents
  UNION ALL
  SELECT doc_id, 2 + (len(text) + {w - 1}) // {w}, 'Doc ' || doc_id
  FROM documents
)
SELECT doc_id, CAST(lineno AS INT) AS lineno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, lineno
"""


# --- WebP lossless (VP8L) ---------------------------------------------------------

_WEBP_PAL_COLORS = 12  # palette-variant color count (≤16: bundling)


def _webp_build(batches):
    """Fixture for ``mm_webp_pool``: each document with ≥256 text
    bytes becomes one 8×8 lossless WebP, the stream features rotating
    by ``doc_id % 4`` — 0: color cache + LZ77; 1: SUBTRACT_GREEN;
    2: PREDICTOR (4×4 blocks, rotating modes); 3: COLOR_INDEXING over
    a fixed ``_WEBP_PAL_COLORS``-color palette (4-bit pixel bundling),
    indices from the text bytes.  Variants 0-2 take raw RGBA from the
    leading 256 bytes; variant 3 maps the leading 64 chars through
    palette color ``k = code % 12`` → ``(9k+1, 7k+2, 5k+3, 100)`` (all
    components ASCII-range so the oracle can rebuild the exact decoded
    string)."""
    import numpy as np
    import pandas as pd

    from ..functions.webp import write_webp

    n = _BMP_W * _BMP_H
    pal = np.array(
        [
            (9 * k + 1, 7 * k + 2, 5 * k + 3, 100)
            for k in range(_WEBP_PAL_COLORS)
        ],
        dtype=np.uint8,
    )
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 4 * n:
                payloads.append(None)
                continue
            v = did % 4
            if v == 3:
                idx = np.frombuffer(raw, np.uint8, count=n) % _WEBP_PAL_COLORS
                px = pal[idx].reshape(_BMP_H, _BMP_W, 4)
                payloads.append(write_webp(px, palette=True))
                continue
            px = np.frombuffer(raw, np.uint8, count=4 * n).reshape(
                _BMP_H, _BMP_W, 4
            )
            if v == 0:
                payloads.append(write_webp(px, cache_bits=5))
            elif v == 1:
                payloads.append(
                    write_webp(px, subtract_green=True, cache_bits=3)
                )
            else:
                payloads.append(write_webp(px, predictor_bits=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_webp_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP-lossless decode (§2.11): real VP8L streams — canonical
    prefix codes with in-stream code-length codes, color cache, LZ77
    backrefs, SUBTRACT_GREEN / PREDICTOR / COLOR_INDEXING transforms
    with pixel bundling — decoded back to raster bytes
    (``decode_webp_stats``).  Losslessness makes the oracle exact:
    variants 0-2 must reproduce the document's leading 256 bytes
    verbatim, variant 3 the palette mapping of its leading 64 chars
    (value hash + byte sum)."""
    from ..operators.multimodal import decode_webp_stats

    media = _cached_media(spark, sf_dir, "webp", _webp_build)
    rows = decode_webp_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_webp_sql() -> str:
    n = _BMP_W * _BMP_H
    p = _WEBP_PAL_COLORS
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 3 THEN
           array_to_string(list_transform(range(1, {n + 1}), i ->
             chr(9 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 1)
             || chr(7 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 2)
             || chr(5 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 3)
             || chr(100)), '')
         ELSE substr(text, 1, {4 * n}) END AS t
  FROM documents
  WHERE len(text) >= {4 * n}
)
SELECT doc_id,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""


# --- robots.txt (crawl politeness) -------------------------------------------------


def _robots_build(batches):
    """Fixture for ``tx_robots_rules``: each document becomes one
    robots.txt with a wildcard group (path-specific disallow + allow
    carve-out + crawl delay), a bot-specific group (blanket disallow
    with an anchored allow), comments, CRLF endings for odd doc_ids,
    and a sitemap — every field doc_id arithmetic."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            k = did % 5
            lines = [
                "# fixture robots",
                "User-agent: *",
                f"Disallow: /private{k}/",
                f"Allow: /private{k}/ok",
                f"Crawl-delay: {1 + did % 9}",
                "",
                f"User-agent: bot{did % 3}",
                "Disallow: /",
                "Allow: /open$",
                "",
                f"Sitemap: https://example.org/{did}/sitemap.xml",
            ]
            sep = "\r\n" if did % 2 else "\n"
            payloads.append(sep.join(lines).encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt evaluation (§2.11): the crawl-politeness gate — RFC
    9309 group selection (specific agent over ``*``), longest-match
    rules with Allow tie-wins, ``*``/``$`` wildcards, crawl delays and
    sitemaps (``evaluate_robots``).  The oracle replays every probe
    verdict from doc_id arithmetic, so drift in grouping, matching
    specificity or anchor handling breaks the value hash."""
    from ..operators.multimodal import evaluate_robots

    media = _cached_media(
        spark, sf_dir, "robots", _robots_build, cols=("doc_id",)
    )
    rows = evaluate_robots(
        media,
        [
            ("a_private", "crawler", "/private{k}/x"),
            ("a_ok", "crawler", "/private{k}/ok/page"),
            ("a_bot", "bot{b}", "/anything"),
            ("a_open", "bot{b}", "/open"),
            ("a_opensub", "bot{b}", "/open/sub"),
        ],
    )
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_groups",
        "delay",
        "sitemap",
        "a_private",
        "a_ok",
        "a_bot",
        "a_open",
        "a_opensub",
    ).orderBy("doc_id")


def _tx_robots_sql() -> str:
    return """
SELECT doc_id,
       CAST(2 AS INT) AS n_groups,
       CAST(1 + doc_id % 9 AS DOUBLE) AS delay,
       'https://example.org/' || doc_id || '/sitemap.xml' AS sitemap,
       FALSE AS a_private,
       TRUE AS a_ok,
       FALSE AS a_bot,
       TRUE AS a_open,
       FALSE AS a_opensub
FROM documents ORDER BY doc_id
"""


# --- TFRecord quarantine funnel ----------------------------------------------------


def _tfrecord_quarantine_build(batches):
    """Fixture kernel for ``src_tfrecord_quarantine``: the
    ``_tfrecord_build`` shards (hashed as a dep) with docs
    ``doc_id % 7 == 3`` getting their first data byte flipped — the
    data CRC then fails deterministically, so the quarantine path
    itself is oracle-checkable."""
    for pdf in _tfrecord_build(batches):
        pdf["payload"] = [
            (p[:12] + bytes([p[12] ^ 0xFF]) + p[13:])
            if p is not None and mid % 7 == 3
            else p
            for mid, p in zip(pdf["media_id"], pdf["payload"])
        ]
        yield pdf


def src_tfrecord_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING TFRecord ingestion (§2.11): a flipped bit in a
    100 TB shard corpus must cost one shard, never the pass —
    ``extract_tfrecord_examples_admitting`` turns each corrupt shard
    into a rejected ROW (error class, null fields).  The fixture
    corrupts a deterministic subset (``doc_id % 7 == 3``, first data
    byte flipped → data-CRC failure), so the oracle re-derives BOTH
    sides: every admitted example and ``(doc_id, 'ValueError')`` for
    the corrupted shards."""
    from ..operators.multimodal import extract_tfrecord_examples_admitting

    media = _cached_media(
        spark,
        sf_dir,
        "tfrecquar",
        _tfrecord_quarantine_build,
        deps=(_tfrecord_build,),
    )
    rows = extract_tfrecord_examples_admitting(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "key",
        "sno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_tfrecord_quarantine_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
  WHERE doc_id % 7 <> 3
)
SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
       printf('%06d-%03d', doc_id, sno) AS key, sno,
       CAST(len(t) AS INT) AS n_chars, {ch} AS txt_hash
FROM slices
UNION ALL
SELECT doc_id, FALSE, 'ValueError', NULL, NULL, NULL, NULL
FROM documents WHERE doc_id % 7 = 3
ORDER BY doc_id, key
"""


# --- sitemaps ----------------------------------------------------------------------

_SITEMAP_SLICE = 200  # characters per generated URL entry
_SITEMAP_FREQS = ("daily", "weekly", "monthly", "yearly")


def _sitemap_build(batches):
    """Fixture for ``tx_sitemap_urls``: each document becomes one
    sitemaps.org ``urlset`` with one ``<url>`` per
    ``_SITEMAP_SLICE``-char slice — loc/lastmod/changefreq/priority
    all doc_id+index arithmetic, entities in loc (&amp;) so XML
    unescaping is on the checked path."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t, source in zip(
            pdf["doc_id"], pdf["text"], pdf["source"]
        ):
            did = int(did)
            n = -(-len(t) // _SITEMAP_SLICE)
            urls = []
            for i in range(n):
                freq = _SITEMAP_FREQS[(did + i) % 4]
                urls.append(
                    "<url>"
                    f"<loc>https://example.org/{source}/{did}/p{i}"
                    f"?a={i}&amp;b={did % 7}</loc>"
                    f"<lastmod>2026-{1 + did % 12:02d}-{1 + i % 28:02d}"
                    "</lastmod>"
                    f"<changefreq>{freq}</changefreq>"
                    f"<priority>0.{(did + i) % 10}</priority>"
                    "</url>"
                )
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{"".join(urls)}</urlset>'
            )
            payloads.append(xml.encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (§2.11): the crawl-frontier seeding stage —
    sitemaps.org ``urlset`` documents parsed through the strict XML
    layer into per-URL rows (``extract_sitemap_urls``), entity
    unescaping and typed priority on the checked path.  The oracle
    replays every field from doc_id arithmetic."""
    from ..operators.multimodal import extract_sitemap_urls

    media = _cached_media(
        spark, sf_dir, "sitemap", _sitemap_build,
        cols=("doc_id", "text", "source"),
    )
    rows = extract_sitemap_urls(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "uno",
        "loc",
        "lastmod",
        "changefreq",
        F.round("priority", 4).alias("priority"),
    ).orderBy("doc_id", "uno")


def _tx_sitemap_sql() -> str:
    w = _SITEMAP_SLICE
    freqs = ", ".join(f"'{f}'" for f in _SITEMAP_FREQS)
    return f"""
WITH urls AS (
  SELECT doc_id, source, CAST(i AS INT) AS uno
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, uno,
       'https://example.org/' || source || '/' || doc_id || '/p' || uno
         || '?a=' || uno || '&b=' || (doc_id % 7) AS loc,
       printf('2026-%02d-%02d', 1 + doc_id % 12, 1 + uno % 28) AS lastmod,
       [{freqs}][CAST((doc_id + uno) % 4 + 1 AS INT)] AS changefreq,
       ROUND(CAST((doc_id + uno) % 10 AS DOUBLE) / 10, 4) AS priority
FROM urls ORDER BY doc_id, uno
"""


def cur_shard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SHARD curation (§2.11): the batch twin of
    ``streaming/shards_stream.py`` over the corrupted-shard fixture —
    admitting TFRecord decode (corrupt shards quarantined, not
    fatal), a length gate, and exact-dedup with min-(doc_id, key)
    survivors — one DataFrame plan (``admit_shard_batch``; payload
    bytes never shuffle, one fingerprint row per example moves).
    The oracle replays the whole chain in SQL: slices of the
    non-corrupted docs, length-gated, ROW_NUMBER-deduplicated on the
    exact text."""
    from ..streaming.shards_stream import admit_shard_batch

    media = _cached_media(
        spark,
        sf_dir,
        "tfrecquar",
        _tfrecord_quarantine_build,
        deps=(_tfrecord_build,),
    )
    admitted, _, _ = admit_shard_batch(media, None, min_chars=4)
    return admitted.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "sno",
        "n_chars",
        F.col("fp").alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _cur_shard_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
  WHERE doc_id % 7 <> 3
), gated AS (
  SELECT doc_id, sno, printf('%06d-%03d', doc_id, sno) AS key, t,
         ROW_NUMBER() OVER (
           PARTITION BY t ORDER BY doc_id, printf('%06d-%03d', doc_id, sno)
         ) AS rn
  FROM slices WHERE len(t) BETWEEN 4 AND {1 << 20}
)
SELECT doc_id, key, sno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM gated WHERE rn = 1 ORDER BY doc_id, key
"""


# --- quoted CSV via the native Spark reader ---------------------------------------

_CSV_P = 10  # characters per constructed-field piece


def _csv_fixture_value(text: str) -> str:
    """The constructed field value: four ``_CSV_P``-char pieces joined
    with a comma, a double quote and a LINE BREAK — every character
    class RFC-4180 quoting has to protect."""
    p = _CSV_P
    return (
        text[:p] + "," + text[p : 2 * p] + '"' + text[2 * p : 3 * p]
        + "\n" + text[3 * p : 4 * p]
    )


def _csv_escape(v: str) -> str:
    if any(c in v for c in ',"\n'):
        return '"' + v.replace('"', '""') + '"'
    return v


def src_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-CSV ingestion through the NATIVE Spark reader (§2.11):
    where a format is engine-native, the engine's own vectorized
    source is the right tool — the capability under test is the
    ingestion recipe (multiLine quoted fields, RFC-4180 doubled-quote
    escaping, embedded commas/quotes/line breaks) and its
    at-scale shape (the fixture writes one file, but ``spark.read
    .csv`` over a directory of shards parallelizes per file/split;
    multiLine disables intra-file splitting, the documented
    trade-off).  The fixture synthesizes one CSV (once per testdata
    fingerprint, auto-versioned on builder change) whose quoted field
    embeds all three hostile character classes, derived from the
    document text so the oracle re-derives every field with plain
    string arithmetic."""
    import ast
    import hashlib
    import inspect
    import os
    import textwrap

    src_bytes = b""
    for fn in (_csv_fixture_value, _csv_escape, src_csv_scan):
        src_bytes += _code_fingerprint_src(
            ast, textwrap.dedent(inspect.getsource(fn))
        )
    ver = hashlib.sha1(src_bytes).hexdigest()[:8]
    path = _index_cache_path(sf_dir, "documents.parquet", f"csvsrc-{ver}")

    def build():
        import pyarrow.parquet as pq

        tb = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )
        rows = sorted(
            zip(
                tb.column("doc_id").to_pylist(),
                tb.column("lang").to_pylist(),
                tb.column("text").to_pylist(),
            )
        )
        os.makedirs(path, exist_ok=True)
        out = ["doc_id,lang,val"]
        for did, lang, text in rows:
            if len(text) < 4 * _CSV_P:
                continue
            out.append(
                f"{did},{_csv_escape(str(lang))},"
                f"{_csv_escape(_csv_fixture_value(text))}"
            )
        with open(os.path.join(path, "part-0.csv"), "w") as fh:
            fh.write("\n".join(out) + "\n")

    _cached_index(path, build)
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .schema("doc_id long, lang string, val string")
        .csv(path)
    )
    return df.select(
        "doc_id",
        "lang",
        F.length("val").alias("n_chars"),
        tx.char_poly_hash(F.col("val")).alias("val_hash"),
    ).orderBy("doc_id")


def _src_csv_sql() -> str:
    p = _CSV_P
    ch = _char_hash_sql("t")
    return f"""
WITH vals AS (
  SELECT doc_id, lang,
         substr(text, 1, {p}) || ',' || substr(text, {p + 1}, {p})
         || '"' || substr(text, {2 * p + 1}, {p}) || chr(10)
         || substr(text, {3 * p + 1}, {p}) AS t
  FROM documents WHERE len(text) >= {4 * p}
)
SELECT doc_id, lang,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS val_hash
FROM vals ORDER BY doc_id
"""


# --- ICO icons ---------------------------------------------------------------------


def _ico_build(batches):
    """Fixture for ``mm_ico_pool``: each document with ≥256 text bytes
    becomes one two-entry icon — entry 0 a grayscale 8×8 PNG from the
    leading 64 bytes, entry 1 a 24-bit DIB (doubled-height header +
    AND mask) from the next 192 bytes as RGB — so both member formats
    sit in ONE container on the oracle-checked path."""
    import numpy as np
    import pandas as pd

    from ..functions.ico import write_ico

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            if len(raw) < 4 * n:
                payloads.append(None)
                continue
            gray = np.frombuffer(raw, np.uint8, count=n).reshape(
                _BMP_H, _BMP_W
            )
            rgb = np.frombuffer(
                raw, np.uint8, count=3 * n, offset=n
            ).reshape(_BMP_H, _BMP_W, 3)
            payloads.append(write_ico([("png", gray), ("dib", rgb)]))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_ico_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO container decode (§2.11): a real two-format container —
    ICONDIR directory, a PNG member and a doubled-height DIB member
    with its AND mask — decoded entry-by-entry with directory-vs-
    payload dimension cross-checks (``decode_ico_stats``).  Both
    member codecs are lossless, so the oracle is exact: entry 0 must
    reproduce the document's leading 64 bytes, entry 1 the next 192,
    verbatim."""
    from ..operators.multimodal import decode_ico_stats

    media = _cached_media(spark, sf_dir, "ico", _ico_build)
    rows = decode_ico_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "imgno",
        "fmt",
        "width",
        "height",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "imgno")


def _mm_ico_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH entries AS (
  SELECT doc_id, CAST(0 AS INT) AS imgno, 'png' AS fmt,
         substr(text, 1, {n}) AS t
  FROM documents WHERE len(text) >= {4 * n}
  UNION ALL
  SELECT doc_id, CAST(1 AS INT), 'dib',
         substr(text, {n + 1}, {3 * n})
  FROM documents WHERE len(text) >= {4 * n}
)
SELECT doc_id, imgno, fmt,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM entries ORDER BY doc_id, imgno
"""


# --- tensor shards (safetensors / npz) ---------------------------------------------


def _safetensors_build(batches):
    """Fixture for ``src_safetensors_scan``: each document with ≥112
    text bytes becomes one safetensors file — ``emb`` f32 (8, 8) from
    the leading 64 bytes, ``ids`` i64 (32,) from the next 32,
    ``mask`` bool (16,) (odd codes) from the next 16, ``scale`` an
    f16 SCALAR ``(doc_id %% 1000) / 4`` (f16-exact), plus a metadata
    map — four dtypes, three ranks and the metadata path all
    oracle-checked."""
    import numpy as np
    import pandas as pd

    from ..functions.tensors import write_safetensors

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 112:
                payloads.append(None)
                continue
            payloads.append(
                write_safetensors(
                    {
                        "emb": np.frombuffer(raw, np.uint8, 64)
                        .reshape(8, 8)
                        .astype("<f4"),
                        "ids": np.frombuffer(
                            raw, np.uint8, 32, offset=64
                        ).astype("<i8"),
                        "mask": np.frombuffer(
                            raw, np.uint8, 16, offset=96
                        )
                        % 2
                        == 1,
                        "scale": np.float16((did % 1000) / 4),
                    },
                    metadata={"doc": str(did), "fmt": "fixture"},
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_safetensors_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """safetensors ingestion (§2.11): the modern checkpoint /
    feature-shard format — 8-byte header length, JSON tensor table,
    offset-tiled little-endian buffers (gaps/overlaps rejected: the
    format's safety property) — scanned into per-file stats
    (``extract_safetensors_stats``).  The oracle re-derives every
    stat from the document bytes and doc_id arithmetic."""
    from ..operators.multimodal import extract_safetensors_stats

    media = _cached_media(
        spark, sf_dir, "safetensors", _safetensors_build
    )
    rows = extract_safetensors_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_tensors",
        "meta_doc",
        F.round("emb_sum", 4).alias("emb_sum"),
        "ids_sum",
        "mask_cnt",
        F.round("scale", 4).alias("scale"),
    ).orderBy("doc_id")


def _src_safetensors_sql() -> str:
    def codes(start, n):
        return (
            f"list_transform(range({start}, {start + n}), "
            f"i -> CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT))"
        )

    return f"""
SELECT doc_id,
       CAST(4 AS INT) AS n_tensors,
       CAST(doc_id AS VARCHAR) AS meta_doc,
       ROUND(CAST(list_sum({codes(1, 64)}) AS DOUBLE), 4) AS emb_sum,
       CAST(list_sum({codes(65, 32)}) AS BIGINT) AS ids_sum,
       CAST(len(list_filter({codes(97, 16)}, c -> c % 2 = 1)) AS INT)
         AS mask_cnt,
       ROUND(CAST(doc_id % 1000 AS DOUBLE) / 4, 4) AS scale
FROM documents WHERE len(text) >= 112 ORDER BY doc_id
"""


def _npz_build(batches):
    """Fixture for ``src_npz_scan``: each document with ≥84 text bytes
    becomes one ``.npz`` — ``a`` u1 (48,) raw codes, ``b`` i2 (24,)
    ``3*code - 200`` (negative i2 path), ``c`` f4 (12,)
    ``code + 0.5`` — three dtypes through the .npy header +
    store-method ZIP composition."""
    import numpy as np
    import pandas as pd

    from ..functions.tensors import write_npz

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            if len(raw) < 84:
                payloads.append(None)
                continue
            a = np.frombuffer(raw, np.uint8, 48)
            b = (
                3 * np.frombuffer(raw, np.uint8, 24, offset=48)
                .astype("<i2")
                - 200
            )
            c = (
                np.frombuffer(raw, np.uint8, 12, offset=72)
                .astype("<f4")
                + 0.5
            )
            payloads.append(write_npz({"a": a, "b": b, "c": c}))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_npz_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NumPy ``.npz`` ingestion (§2.11): the ad-hoc tensor-dump format
    (the REFERENCE's own storage layer — ``asip_v2/archive.py`` saves
    scene tensors as .npz) made a first-class source: ZIP-of-.npy
    members, literal-eval header parsing, three dtypes incl. the
    negative-int16 path (``extract_npz_stats``).  The oracle
    re-derives every stat from the document bytes."""
    from ..operators.multimodal import extract_npz_stats

    media = _cached_media(spark, sf_dir, "npz", _npz_build)
    rows = extract_npz_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_arrays",
        "a_sum",
        "b_sum",
        F.round("c_sum", 4).alias("c_sum"),
    ).orderBy("doc_id")


def _src_npz_sql() -> str:
    def codes(start, n):
        return (
            f"list_transform(range({start}, {start + n}), "
            f"i -> CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT))"
        )

    return f"""
SELECT doc_id,
       CAST(3 AS INT) AS n_arrays,
       CAST(list_sum({codes(1, 48)}) AS BIGINT) AS a_sum,
       CAST(list_sum(list_transform({codes(49, 24)}, c -> 3 * c - 200))
         AS BIGINT) AS b_sum,
       ROUND(CAST(list_sum({codes(73, 12)}) AS DOUBLE) + 6, 4) AS c_sum
FROM documents WHERE len(text) >= 84 ORDER BY doc_id
"""


# --- Arrow IPC streams -------------------------------------------------------------

_ARROW_SLICE = 80  # characters per record
_ARROW_BATCH = 3  # records per IPC batch


def _arrow_ipc_build(batches):
    """Fixture for ``src_arrow_ipc_scan``: each document becomes one
    Arrow IPC stream of ``(sno, txt, score)`` records —
    ``_ARROW_SLICE``-char slices, ``score = sno + 0.25`` — split into
    ``_ARROW_BATCH``-record batches so multi-batch streams are on the
    checked path."""
    import pandas as pd
    import pyarrow as pa

    schema = pa.schema(
        [("sno", pa.int64()), ("txt", pa.string()), ("score", pa.float64())]
    )
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            recs = [
                (sno, t[i : i + _ARROW_SLICE], sno + 0.25)
                for sno, i in enumerate(
                    range(0, len(t), _ARROW_SLICE)
                )
            ]
            if not recs:
                payloads.append(None)
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, schema) as w:
                for at in range(0, len(recs), _ARROW_BATCH):
                    chunk = recs[at : at + _ARROW_BATCH]
                    w.write_batch(
                        pa.record_batch(
                            [
                                pa.array([r[0] for r in chunk], pa.int64()),
                                pa.array([r[1] for r in chunk], pa.string()),
                                pa.array([r[2] for r in chunk], pa.float64()),
                            ],
                            schema=schema,
                        )
                    )
            payloads.append(sink.getvalue().to_pybytes())
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_arrow_ipc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC stream ingestion (§2.11): the zero-copy interchange
    format feature pipelines hand around, read back through the SAME
    Arrow runtime Spark's Python boundary uses
    (``extract_arrow_ipc_rows``) — multi-batch streams, three typed
    columns.  The oracle re-derives every record (slice text, batch
    and row counts, the dyadic score) from `documents`."""
    from ..operators.multimodal import extract_arrow_ipc_rows

    media = _cached_media(spark, sf_dir, "arrowipc", _arrow_ipc_build)
    rows = extract_arrow_ipc_rows(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_batches",
        "n_rows",
        "sno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id", "sno")


def _src_arrow_ipc_sql() -> str:
    w, b = _ARROW_SLICE, _ARROW_BATCH
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t,
         (len(text) + {w - 1}) // {w} AS nr
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       CAST((nr + {b - 1}) // {b} AS INT) AS n_batches,
       CAST(nr AS BIGINT) AS n_rows,
       sno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash,
       ROUND(CAST(sno AS DOUBLE) + 0.25, 4) AS score
FROM slices ORDER BY doc_id, sno
"""


# --- legacy rasters (TGA / PGM / PPM funnel) --------------------------------------


def _raster_build(batches):
    """Fixture for ``mm_raster_funnel``: docs with ≥192 text bytes
    rotate by ``doc_id % 3`` — 0: 8×8 24-bit TGA (RLE + bottom-up for
    even halves of that class, plain top-down otherwise), 1: 8×8 PGM
    from 64 bytes, 2: 8×8 PPM from 192 bytes — three lossless formats
    through one magic dispatch."""
    import numpy as np
    import pandas as pd

    from ..functions.rasters import write_pnm, write_tga

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 3 * n:
                payloads.append(None)
                continue
            v = did % 3
            if v == 0:
                rgb = np.frombuffer(raw, np.uint8, 3 * n).reshape(
                    _BMP_H, _BMP_W, 3
                )
                payloads.append(
                    write_tga(
                        rgb,
                        rle=did % 6 == 0,
                        top_down=did % 6 != 0,
                    )
                )
            elif v == 1:
                payloads.append(
                    write_pnm(
                        np.frombuffer(raw, np.uint8, n).reshape(
                            _BMP_H, _BMP_W
                        )
                    )
                )
            else:
                payloads.append(
                    write_pnm(
                        np.frombuffer(raw, np.uint8, 3 * n).reshape(
                            _BMP_H, _BMP_W, 3
                        )
                    )
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_raster_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-raster funnel (§2.11): TGA (plain/RLE, both origins) and
    netpbm PGM/PPM — the long-tail formats of scraped archives —
    magic-dispatched into one lossless decode
    (``decode_raster_stats``).  Exact oracle: every variant must
    reproduce its document's leading bytes verbatim."""
    from ..operators.multimodal import decode_raster_stats

    media = _cached_media(spark, sf_dir, "raster", _raster_build)
    rows = decode_raster_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "fmt",
        "width",
        "height",
        "channels",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_raster_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'tga' WHEN 1 THEN 'pgm'
              ELSE 'ppm' END AS fmt,
         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels,
         substr(text, 1,
                CASE WHEN doc_id % 3 = 1 THEN {n} ELSE {3 * n} END) AS t
  FROM documents WHERE len(text) >= {3 * n}
)
SELECT doc_id, fmt,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(channels AS INT) AS channels,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""

# --- WebP lossy / extended container metadata (r13) ---------------------------


def _webp_meta_build(batches):
    """Fixture for ``mm_webp_meta``: per document (>= 64 utf-8 bytes)
    one WebP container whose every metadata field is doc_id arithmetic —
    even docs get a simple lossy file (VP8 keyframe stub: dims
    ``1 + id % 1200`` x ``1 + (7 id) % 700``, version ``id % 4``,
    show_frame ``id % 2 == 0``, first partition = the leading
    ``10 + id % 40`` text BYTES), odd docs the VP8X extended form
    around the same frame (canvas = frame + ``3 + id % 5`` x ``+2``,
    EXIF iff ``id % 3 == 0``, XMP iff ``id % 5 == 0``) so the flags,
    canvas dims and chunk count are all oracle-recomputable."""
    import pandas as pd

    from ..functions.webp import (
        write_vp8_frame_stub,
        write_webp_extended,
        write_webp_lossy,
    )

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 64:
                payloads.append(None)
                continue
            w, h = 1 + did % 1200, 1 + (7 * did) % 700
            part0 = raw[: 10 + did % 40]
            kw = dict(version=did % 4, show_frame=did % 2 == 0)
            if did % 2 == 0:
                payloads.append(write_webp_lossy(w, h, part0, **kw))
            else:
                extra = []
                if did % 3 == 0:
                    extra.append((b"EXIF", raw[:16]))
                if did % 5 == 0:
                    extra.append((b"XMP ", raw[16:32]))
                payloads.append(
                    write_webp_extended(
                        w + 3 + did % 5,
                        h + 2,
                        (b"VP8 ", write_vp8_frame_stub(w, h, part0, **kw)),
                        tuple(extra),
                    )
                )
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


def mm_webp_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP lossy / extended container metadata (§2.11, r13): the VP8
    keyframe's plain-bit header fields and the VP8X canvas + feature
    flags — the curation-relevant half of lossy WebP, with payload
    decode a disclosed boundary (SCALE.md r13 VP8/VP9 adjudication).
    The parser cross-checks VP8X flags against the chunks present and
    the first-partition size against the frame bytes, so every field
    here is load-bearing."""
    from ..operators.multimodal import decode_webp_meta

    media = _cached_media(spark, sf_dir, "webp_meta", _webp_meta_build)
    return (
        decode_webp_meta(media)
        .select(
            F.col("media_id").alias("doc_id"),
            "fmt",
            "width",
            "height",
            "version",
            "show_frame",
            "part0_size",
            "has_exif",
            "has_xmp",
            "n_chunks",
        )
        .orderBy("doc_id")
    )


def _mm_webp_meta_sql() -> str:
    return """
WITH base AS (
  SELECT doc_id,
         1 + doc_id % 1200 AS fw,
         1 + (7 * doc_id) % 700 AS fh
  FROM documents
  WHERE octet_length(encode(text)) >= 64
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'lossy' ELSE 'extended' END AS fmt,
       CAST(CASE WHEN doc_id % 2 = 0 THEN fw
                 ELSE fw + 3 + doc_id % 5 END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN fh ELSE fh + 2 END AS INT) AS height,
       CAST(doc_id % 4 AS INT) AS version,
       doc_id % 2 = 0 AS show_frame,
       CAST(10 + doc_id % 40 AS INT) AS part0_size,
       doc_id % 2 = 1 AND doc_id % 3 = 0 AS has_exif,
       doc_id % 2 = 1 AND doc_id % 5 = 0 AS has_xmp,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1
                 ELSE 2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
            END AS INT) AS n_chunks
FROM base ORDER BY doc_id
"""


# --- animated WebP metadata (r13) ---------------------------------------------

_ANIM_CANVAS = (128, 64)


def _webp_anim_build(batches):
    """Fixture for ``mm_webp_anim``: per document (>= 64 utf-8 bytes)
    one animated WebP on a fixed 128x64 canvas with ``1 + id % 4``
    VP8-stub frames — frame i at ``(2*((id+i) % 10),
    2*((id//2 + i) % 8))``, dims ``8 + (id+i) % 60`` x
    ``4 + (3*id+i) % 30``, duration ``40 + (id*i) % 100`` ms, blend
    iff ``(id+i) % 2 == 0``, dispose iff ``(id+i) % 3 == 0``; loop
    count ``id % 7`` — every summary field is doc_id arithmetic."""
    import pandas as pd

    from ..functions.webp import write_vp8_frame_stub, write_webp_animated

    cw, chh = _ANIM_CANVAS
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 64:
                payloads.append(None)
                continue
            frames = []
            for i in range(1 + did % 4):
                w = 8 + (did + i) % 60
                h = 4 + (3 * did + i) % 30
                frames.append(
                    {
                        "x": 2 * ((did + i) % 10),
                        "y": 2 * ((did // 2 + i) % 8),
                        "image": (
                            b"VP8 ",
                            write_vp8_frame_stub(w, h, raw[: 8 + i]),
                        ),
                        "duration": 40 + (did * i) % 100,
                        "blend": (did + i) % 2 == 0,
                        "dispose": (did + i) % 3 == 0,
                    }
                )
            payloads.append(
                write_webp_animated(cw, chh, frames, loop_count=did % 7)
            )
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


def mm_webp_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-WebP metadata (§2.11, r13): ANIM/ANMF plain-bit
    headers — frame count, total duration, loop count, largest frame,
    blend/dispose counts — with each frame's ANMF dims cross-checked
    against its embedded image chunk's own header and its rect
    bounds-checked against the canvas (mismatch raises)."""
    from ..operators.multimodal import decode_webp_anim

    media = _cached_media(spark, sf_dir, "webp_anim", _webp_anim_build)
    return (
        decode_webp_anim(media)
        .select(
            F.col("media_id").alias("doc_id"),
            "width",
            "height",
            "n_frames",
            "loop_count",
            "total_duration",
            "max_frame_w",
            "max_frame_h",
            "n_blend",
            "n_dispose",
        )
        .orderBy("doc_id")
    )


def _mm_webp_anim_sql() -> str:
    cw, chh = _ANIM_CANVAS
    return f"""
WITH base AS (
  SELECT doc_id, range(0, CAST(1 + doc_id % 4 AS BIGINT)) AS idx
  FROM documents
  WHERE octet_length(encode(text)) >= 64
)
SELECT doc_id,
       CAST({cw} AS INT) AS width,
       CAST({chh} AS INT) AS height,
       CAST(1 + doc_id % 4 AS INT) AS n_frames,
       CAST(doc_id % 7 AS INT) AS loop_count,
       CAST(list_sum(list_transform(idx, i -> 40 + (doc_id * i) % 100))
         AS INT) AS total_duration,
       CAST(list_max(list_transform(idx, i -> 8 + (doc_id + i) % 60))
         AS INT) AS max_frame_w,
       CAST(list_max(list_transform(idx, i -> 4 + (3 * doc_id + i) % 30))
         AS INT) AS max_frame_h,
       CAST(list_sum(list_transform(idx, i ->
         CASE WHEN (doc_id + i) % 2 = 0 THEN 1 ELSE 0 END)) AS INT) AS n_blend,
       CAST(list_sum(list_transform(idx, i ->
         CASE WHEN (doc_id + i) % 3 = 0 THEN 1 ELSE 0 END)) AS INT) AS n_dispose
FROM base ORDER BY doc_id
"""


REGISTRY = {
    "mm_jpeg_exif": (mm_jpeg_exif, _mm_jpeg_exif_sql()),
    "mm_qoi_pool": (mm_qoi_pool, _mm_qoi_sql()),
    "tx_docx_extract": (tx_docx_extract, _tx_docx_sql()),
    "tx_markdown_extract": (tx_markdown_extract, _tx_markdown_sql()),
    "mm_webp_pool": (mm_webp_pool, _mm_webp_sql()),
    "mm_webp_meta": (mm_webp_meta, _mm_webp_meta_sql()),
    "mm_webp_anim": (mm_webp_anim, _mm_webp_anim_sql()),
    "tx_robots_rules": (tx_robots_rules, _tx_robots_sql()),
    "src_tfrecord_quarantine": (
        src_tfrecord_quarantine,
        _src_tfrecord_quarantine_sql(),
    ),
    "tx_sitemap_urls": (tx_sitemap_urls, _tx_sitemap_sql()),
    "cur_shard_pipeline": (cur_shard_pipeline, _cur_shard_sql()),
    "src_csv_scan": (src_csv_scan, _src_csv_sql()),
    "mm_ico_pool": (mm_ico_pool, _mm_ico_sql()),
    "src_safetensors_scan": (
        src_safetensors_scan,
        _src_safetensors_sql(),
    ),
    "src_npz_scan": (src_npz_scan, _src_npz_sql()),
    "src_arrow_ipc_scan": (src_arrow_ipc_scan, _src_arrow_ipc_sql()),
    "mm_raster_funnel": (mm_raster_funnel, _mm_raster_sql()),
}
