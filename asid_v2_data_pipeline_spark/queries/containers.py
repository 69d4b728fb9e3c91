"""Document/container-format queries: MP4/ISO-BMFF, lossless
JPEG (SOF3), ZIP, compressed shard funnels (lz4/snappy/gzip), Avro
OCF, PDF, MediaWiki dumps, URL canonicalization, TIFF, WebDataset
tar shards.  Split out of the former queries/scale.py (VERDICT r10
task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions import text as tx
from ..schemas import load_table
from ._shared import _cached_media, _char_hash_sql
from .media import _BMP_F, _BMP_H, _BMP_W, _CODES_CTE_SQL, _mm_bmp_sql
from .oracles_mp3 import _MP3_GG, _mm_mp3_rms_sql



# --- MP4 / ISO-BMFF container -------------------------------------------------

_MP4_FR = 16  # bytes per fixture raw video sample
_MP4_TICKS = 40  # stts delta between samples (25 fps at 1 ms scale)


def _mp4_raw_build(batches):
    """Fixture for ``mm_mp4_demux``: document bytes become complete
    ``_MP4_FR``-byte raw video samples muxed into a genuine MP4 —
    PROGRESSIVE layout (ftyp + mdat + moov with full
    stsd/stts/stsc/stsz/stco/stss tables, chunks of 4) for even
    doc_ids, FRAGMENTED layout (moov with mvex/trex + per-fragment
    moof/traf/trun + mdat, 3 samples per fragment) for odd doc_ids,
    rotating the three base-data-offset conventions and the
    tfdt-absent path by doc_id (r11, VERDICT r10 task 2).  The
    oracle derives everything from the raw octets, so it covers both
    layouts unchanged."""
    import pandas as pd

    from ..functions.mp4 import Mp4Track, write_mp4, write_mp4_fragmented

    tracks = [Mp4Track(1, "video", "raw", timescale=1000, width=4, height=4)]
    modes = ("moof", "explicit", "implicit")
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            n = len(raw) // _MP4_FR
            samples = [
                (
                    1,
                    i * _MP4_TICKS,
                    i % 4 == 0,
                    raw[i * _MP4_FR : (i + 1) * _MP4_FR],
                )
                for i in range(n)
            ]
            if not samples:
                payloads.append(None)
            elif did % 2 == 0:
                payloads.append(write_mp4(samples, tracks, chunk_every=4))
            else:
                payloads.append(
                    write_mp4_fragmented(
                        samples,
                        tracks,
                        frag_samples=3,
                        base_mode=modes[(did // 2) % 3],
                        with_tfdt=(did // 6) % 2 == 0,
                    )
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4/ISO-BMFF demux (§2.11): document bytes become raw
    video samples muxed into a genuine MP4 (``functions/mp4.py`` —
    box tree, sample tables, sync table), then ``demux_mp4_samples``
    resolves every sample back through the stsc/stsz/stco chunk
    arithmetic with stts timestamps and stss keyframe flags.  The
    oracle re-derives sample count, timestamps, keyframe cadence and
    exact byte sums from the raw octets — any drift in box framing,
    chunk mapping or table encoding breaks the value hash.  The MP4
    twin of ``mm_mkv_demux``."""
    from ..operators.multimodal import demux_mp4_samples

    media = _cached_media(spark, sf_dir, "mp4raw", _mp4_raw_build)
    out = demux_mp4_samples(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "track",
        "kind",
        "codec",
        "ts",
        "keyframe",
        "n_bytes",
        "byte_sum",
    ).orderBy("doc_id", "ts")


def _mm_mp4_sql() -> str:
    fr, tk = _MP4_FR, _MP4_TICKS
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         CAST(list_sum(list_transform(range(0, {fr}), k ->
              CAST(cs[CAST(f * {fr} + k + 1 AS INT)] AS BIGINT))) AS BIGINT)
           AS byte_sum
  FROM codes, unnest(range(0, n_bytes // {fr})) AS t(f)
)
SELECT doc_id, CAST(1 AS INT) AS track, 'video' AS kind,
       'raw' AS codec,
       CAST(fno * {tk} AS BIGINT) AS ts,
       (fno % 4 = 0) AS keyframe,
       CAST({fr} AS INT) AS n_bytes, byte_sum
FROM frames ORDER BY doc_id, ts
"""


def _mp3_mp4_build(batches):
    """Fixture for ``mm_mp4_mp3_rms``: the SAME variable-length mono
    Layer III stream as ``_mp3_mkv_build`` (F = 1 + n_bytes mod 3
    frames, byte→bitstream mapping unchanged — the oracle is shared),
    muxed per the MP3-in-MP4 registration: one MPEG frame per sample
    in an ``mp4a`` track whose esds declares objectTypeIndication
    0x6B, timescale 44100, stts delta 1152 (the per-frame sample
    count), chunks of 2."""
    import numpy as np
    import pandas as pd

    from ..functions.mp3 import _FRAME_LEN, write_mp3_l3
    from ..functions.mp4 import Mp4Track, write_mp4

    tracks = [
        Mp4Track(
            1, "audio", "mp3",
            timescale=44100, sample_rate=44100, channels=1,
        )
    ]
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            nf = 1 + nb % 3
            q = np.empty((nf, 2, 576), np.int64)
            sfs = np.empty((nf, 2, 21), np.int64)
            for f in range(nf):
                for g in range(2):
                    gc = f * 2 + g
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[f, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[f, g] = b[(21 * gc + np.arange(21)) % nb] % 8
            stream = write_mp3_l3(q, sfs, global_gain=_MP3_GG)
            samples = [
                (
                    1,
                    f * 1152,
                    True,
                    stream[f * _FRAME_LEN : (f + 1) * _FRAME_LEN],
                )
                for f in range(nf)
            ]
            payloads.append(write_mp4(samples, tracks, chunk_every=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp4_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3-in-MP4 decode: the ``mm_mkv_mp3_rms`` fixture
    stream re-muxed per the MP3-in-MP4 registration (``mp4a`` sample
    entry + esds objectTypeIndication 0x6B), demuxed back through the
    sample tables, reassembled in stts order and SAMPLE-decoded with
    cross-frame reconstruction state — one dropped or reordered
    sample changes every later PCM value and breaks the value hash.
    The oracle is the SAME generated fixed-point pipeline as the MKV
    twin (container-independent by construction: it replays from the
    pre-encode octets)."""
    from ..operators.multimodal import demux_mp4_decode_mp3_stats

    media = _cached_media(spark, sf_dir, "mp4mp3", _mp3_mp4_build)
    stats = demux_mp4_decode_mp3_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


# --- lossless JPEG (SOF3) -------------------------------------------------------


def mm_jpeg_lossless_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS JPEG decode (T.81 Annex H — the DNG/DICOM archive
    process, r10): document bytes become an 8×8 grayscale SOF3 stream
    whose PREDICTOR cycles 1..7 per document (all seven Annex-H
    prediction forms on the oracle-checked path), decoded through the
    magic-dispatched image pool.  Lossless, so the oracle is the SAME
    raw-octet pool as the BMP/PNG/GIF/TIFF twins — any drift in the
    prediction arithmetic, category coding or the mod-2^16 wrap
    breaks the value hash."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg_lossless

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(
                    write_jpeg_lossless(gray, predictor=1 + did % 7)
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpegll", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


# --- ZIP archives ---------------------------------------------------------------

_ZIP_SLICE = 120  # chars of text per zip member


def _zip_build(batches):
    """Fixture for ``tx_zip_extract``: each document becomes one ZIP
    archive of its ``_ZIP_SLICE``-char text slices
    (``{doc_id:06d}/p{i:03d}.txt``), STORE for even doc_ids and
    DEFLATE for odd; r11: every third doc writes the ZIP64 layout
    (EOCD64 + locator + 0x0001 extras) and every fifth the streamed
    flag-bit-3 shape (zeroed local sizes + data descriptor) — so
    directory walking, both methods, both boundary layouts, CRC
    checks and offset re-derivation are all on the oracle-checked
    path (the oracle is layout-independent)."""
    import pandas as pd

    from ..functions.zipf import write_zip

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            entries = [
                (
                    f"{did:06d}/p{i // _ZIP_SLICE:03d}.txt",
                    t[i : i + _ZIP_SLICE].encode("utf-8"),
                )
                for i in range(0, len(t), _ZIP_SLICE)
            ]
            payloads.append(
                write_zip(
                    entries,
                    "store" if did % 2 == 0 else "deflate",
                    force_zip64=did % 3 == 0,
                    streamed=did % 5 == 0,
                )
                if entries
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP dataset-dump ingestion (§2.11): archives unpacked via the
    central directory (``extract_zip_texts``), one row per member,
    CRC-verified.  The oracle re-derives member names (printf key
    arithmetic), methods (store/deflate by doc parity) and slice text
    from `documents` — any drift in directory parsing, local-header
    offset re-derivation or inflate breaks the value hash."""
    from ..operators.multimodal import extract_zip_texts

    media = _cached_media(spark, sf_dir, "zip", _zip_build)
    rows = extract_zip_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "name",
        "method",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "name")


def _tx_zip_sql() -> str:
    w = _ZIP_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS INT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d/p%03d.txt', doc_id, sno) AS name,
       CASE WHEN doc_id % 2 = 0 THEN 'store' ELSE 'deflate' END AS method,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, name
"""


# --- compressed shards (lz4 / snappy / gzip funnel) -----------------------------


def _compress_build(batches):
    """Fixture for ``tx_compress_funnel``: each document's text is
    compressed into ONE shard with the codec its producer would have
    picked — lz4 frame for ``doc_id%6==0``, snappy framing stream for
    ``1``, gzip member for ``2``, Zstandard frame for ``3``, XZ for
    ``4``, bzip2 for ``5`` — so magic dispatch, all six decoders and
    every checksum layer sit on the oracle-checked path.  The zstd
    arm is encoded by the REAL C encoder (``pyarrow.Codec``) with a
    content checksum appended — our engine is decode-only for zstd by
    design, exactly the production shape where producers wrote the
    bytes; the xz/bz2 arms go through the C stdlib codecs both ways
    (pure-Python reimplementations would add no format coverage)."""
    import pandas as pd

    from ..functions.lz4 import compress_frame
    from ..functions.snappyf import compress_stream
    from ..functions.warc import gzip_member
    from ..functions.zstd import xxh64

    import pyarrow as pa

    import bz2
    import lzma

    zc = pa.Codec("zstd", compression_level=3)
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = int(did) % 6
            if m == 0:
                # r11: alternate independent / linked-blocks framing
                # (lz4's CLI default is linked); docs fit one 64 KiB
                # block, so cross-block window reuse itself is pinned
                # by test_compressf.py's multi-block matrices
                payloads.append(
                    compress_frame(
                        raw,
                        block_checksum=True,
                        linked=(int(did) // 6) % 2 == 1,
                    )
                )
            elif m == 1:
                payloads.append(compress_stream(raw))
            elif m == 2:
                payloads.append(gzip_member(raw))
            elif m == 4:
                payloads.append(lzma.compress(raw, preset=1))
            elif m == 5:
                payloads.append(bz2.compress(raw, 1))
            else:
                fr = bytearray(zc.compress(raw))
                fr[4] |= 0x4  # set the content-checksum flag …
                fr += (xxh64(raw) & 0xFFFFFFFF).to_bytes(4, "little")
                payloads.append(bytes(fr))  # … so decode verifies it
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_compress_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-shard admission funnel (§2.11): LZ4 frames, snappy
    framing streams, gzip members, Zstandard frames, XZ streams and
    bzip2 — the six codecs a store layer actually serves —
    magic-dispatched into one
    verified decode (``decompress_texts``; xxHash32/64, masked
    CRC-32C and CRC32+ISIZE all checked).  The oracle re-derives the
    codec from doc parity and the text from `documents`: any
    dispatch, decompression or checksum drift breaks the value hash.
    The lz4/snappy/zstd decoders are cross-validated against their C
    implementations in ``tests/test_compressf.py`` /
    ``tests/test_zstd.py``."""
    from ..operators.multimodal import decompress_texts

    media = _cached_media(spark, sf_dir, "compress", _compress_build)
    rows = decompress_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "codec",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _tx_compress_sql() -> str:
    ch = _char_hash_sql("text")
    return f"""
SELECT doc_id,
       CASE doc_id % 6 WHEN 0 THEN 'lz4' WHEN 1 THEN 'snappy'
            WHEN 2 THEN 'gzip' WHEN 4 THEN 'xz' WHEN 5 THEN 'bz2'
            ELSE 'zstd' END AS codec,
       CAST(len(text) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM documents ORDER BY doc_id
"""


# --- Avro object containers ------------------------------------------------------

_AVRO_SLICE = 150  # chars of text per avro record


def _avro_build(batches):
    """Fixture for ``src_avro_scan``: each document becomes one Avro
    object container of its ``_AVRO_SLICE``-char slice records
    ``{seq, txt, score, comment}`` — ``score=(seq*7+doc_id%13)/4.0``
    (exact in binary), ``comment`` exercising the nullable union on
    odd seqs — with the codec rotating null/deflate/snappy by
    ``doc_id%3`` and a doc-derived sync marker, so zigzag varints,
    unions, all three codecs, the snappy CRC and sync verification all
    sit on the oracle-checked path."""
    import hashlib

    import pandas as pd

    from ..functions.avrof import write_avro

    schema = {
        "type": "record",
        "name": "slice",
        "fields": [
            {"name": "seq", "type": "long"},
            {"name": "txt", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "comment", "type": ["null", "string"]},
        ],
    }
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            recs = [
                {
                    "seq": i // _AVRO_SLICE,
                    "txt": t[i : i + _AVRO_SLICE],
                    "score": ((i // _AVRO_SLICE) * 7 + did % 13) / 4.0,
                    "comment": (
                        None
                        if (i // _AVRO_SLICE) % 2
                        else f"c{i // _AVRO_SLICE}"
                    ),
                }
                for i in range(0, len(t), _AVRO_SLICE)
            ]
            codec = ("null", "deflate", "snappy")[did % 3]
            sync = hashlib.sha1(f"sync{did}".encode()).digest()[:16]
            payloads.append(
                write_avro(recs, schema, codec, sync, block_records=8)
                if recs
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro interchange ingestion (§2.11): object containers decoded
    record-by-record (``extract_avro_records``; sync markers, zigzag
    varints, nullable unions, null/deflate/snappy codecs with the
    spec's snappy CRC-32).  The oracle re-derives every field from
    `documents` — slice arithmetic for ``seq``/``txt``, the exact
    quarter-valued ``score``, comment parity, codec by doc parity —
    so any binary-encoding or codec drift breaks the value hash.  No
    Avro library exists in this environment to cross-validate against
    (offline sandbox); the pin is the from-documents replay plus the
    snappy codec's own C cross-validation."""
    from ..operators.multimodal import extract_avro_records

    media = _cached_media(spark, sf_dir, "avro", _avro_build)
    rows = extract_avro_records(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "seq",
        "codec",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
        "score",
        F.col("comment").isNotNull().alias("has_comment"),
    ).orderBy("doc_id", "seq")


def _src_avro_sql() -> str:
    w = _AVRO_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seq,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, seq,
       CASE doc_id % 3 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate'
            ELSE 'snappy' END AS codec,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash,
       (seq * 7 + doc_id % 13) / 4.0 AS score,
       seq % 2 = 0 AS has_comment
FROM slices ORDER BY doc_id, seq
"""


# --- PDF documents ----------------------------------------------------------------

_PDF_LINE = 90  # chars per PDF text line
_PDF_PAGE_LINES = 8  # lines per page


def _pdf_build(batches):
    """Fixture for ``tx_pdf_extract``: each document becomes one PDF
    whose pages show its text as ``_PDF_LINE``-char lines,
    ``_PDF_PAGE_LINES`` per page — classic-xref layout for even
    doc_ids, xref-stream + object-stream layout for odd (uncompressed
    content streams every third doc), so both cross-reference parse
    paths, FlateDecode, the TIFF predictor and object-stream
    resolution all sit on the oracle-checked path."""
    import pandas as pd

    from ..functions.pdf import write_pdf

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            lines = [
                t[i : i + _PDF_LINE] for i in range(0, len(t), _PDF_LINE)
            ]
            pages = [
                lines[j : j + _PDF_PAGE_LINES]
                for j in range(0, len(lines), _PDF_PAGE_LINES)
            ]
            payloads.append(
                write_pdf(
                    pages,
                    mode="classic" if did % 2 == 0 else "xrefstream",
                    compress=did % 3 != 0,
                )
                if pages
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF-to-text ingestion (§2.11): page-tree walk + content-stream
    text collection over BOTH real-world file layouts — classic xref
    tables and xref streams with object streams
    (``extract_pdf_texts``).  The oracle re-derives each page's text
    from `documents` by the same line/page arithmetic: any drift in
    xref resolution, stream decoding, string unescaping or text-
    operator handling breaks the value hash."""
    from ..operators.multimodal import extract_pdf_texts

    media = _cached_media(spark, sf_dir, "pdf", _pdf_build)
    rows = extract_pdf_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "page",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "page")


def _tx_pdf_sql() -> str:
    w = _PDF_LINE
    per = _PDF_PAGE_LINES
    ch = _char_hash_sql("page_text")
    return f"""
WITH lines AS (
  SELECT doc_id, CAST(i AS INT) AS lno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), pages AS (
  SELECT doc_id, CAST(lno // {per} AS INT) AS page,
         string_agg(t, chr(10) ORDER BY lno) AS page_text
  FROM lines GROUP BY doc_id, lno // {per}
)
SELECT doc_id, page,
       CAST(len(page_text) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM pages ORDER BY doc_id, page
"""


# --- MediaWiki dumps ---------------------------------------------------------------

_WIKI_SLICE = 120  # chars of text per wiki paragraph


def _wiki_build(batches):
    """Fixture for ``tx_wiki_extract``: each document becomes one
    MediaWiki export XML whose single page's wikitext carries the
    ``_WIKI_SLICE``-char slices, each under a ``== h{doc}_{i} ==``
    heading and wrapped in a rotating decoration by slice parity —
    bold quotes, an internal link label, a trailing ``<ref>``, a
    leading template — all of which must strip back to the exact
    slice.  Every fifth doc ships the wikitext as a CDATA section
    (slices never contain ``]]>``: the charset is lowercase+space),
    the rest entity-escaped, so both XML character-data paths are on
    the oracle-checked path."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            parts = []
            for i in range(0, len(t), _WIKI_SLICE):
                sl = t[i : i + _WIKI_SLICE]
                k = i // _WIKI_SLICE
                parts.append(f"== h{did}_{k} ==")
                m = k % 4
                if m == 0:
                    parts.append(f"'''{sl}'''")
                elif m == 1:
                    parts.append(f"[[w{did}|{sl}]]")
                elif m == 2:
                    parts.append(f'{sl}<ref name="r{k}">cite {k}</ref>')
                else:
                    parts.append(f"{{{{tmpl|x={k}}}}}{sl}")
            if not parts:
                payloads.append(None)
                continue
            body = "\n".join(parts)
            if did % 5 == 0:
                text_node = f"<![CDATA[{body}]]>"
            else:
                text_node = (
                    body.replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
            xml = (
                '<?xml version="1.0" encoding="utf-8"?>\n'
                '<mediawiki xmlns="http://www.mediawiki.org/xml/'
                'export-0.10/" version="0.10">\n'
                "  <siteinfo><sitename>fixture</sitename></siteinfo>\n"
                "  <page>\n"
                f"    <title>Doc {did}</title>\n"
                "    <ns>0</ns>\n"
                f"    <id>{did}</id>\n"
                f"    <revision><id>1</id>"
                f'<text xml:space="preserve">{text_node}</text>'
                "</revision>\n"
                "  </page>\n"
                "</mediawiki>\n"
            )
            payloads.append(xml.encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_wiki_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikipedia-dump ingestion (§2.11): MediaWiki export XML parsed
    with the strict XML kernel (entities AND CDATA paths), wikitext
    stripped to plain lines (``extract_wiki_lines``: headings,
    quotes, links, refs, nested templates).  The oracle re-derives
    title, line numbering, heading text and the recovered slices from
    `documents` — any XML, entity or markup-stripping drift breaks
    the value hash."""
    from ..operators.multimodal import extract_wiki_lines

    media = _cached_media(spark, sf_dir, "wiki", _wiki_build)
    rows = extract_wiki_lines(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "title",
        "lineno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "lineno")


def _tx_wiki_sql() -> str:
    w = _WIKI_SLICE
    ch = _char_hash_sql("line")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS INT) AS k,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), lines AS (
  SELECT doc_id, 2 * k AS lineno,
         printf('h%d_%d', doc_id, k) AS line
  FROM slices
  UNION ALL
  SELECT doc_id, 2 * k + 1 AS lineno, rtrim(t) AS line
  FROM slices
)
SELECT doc_id, 'Doc ' || doc_id AS title, lineno,
       CAST(len(line) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, lineno
"""


# --- URL canonicalization -------------------------------------------------------


def tx_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (§2.11): two deterministically MESSY
    variants of each document's URL (upper-cased scheme/host, explicit
    default port, unsorted query, fragment vs. none) canonicalize to
    ONE form via ``functions/urls.canonical_url`` — pure native
    expressions, whole-stage-codegen end to end, zero Python.  The
    oracle constructs the expected canonical string directly and
    expects exactly one merged row per document with ``n_variants=2``:
    any canonicalization drift yields either a hash break (wrong
    string) or a row-count break (variants fail to merge)."""
    from ..functions.urls import canonical_url

    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 20).cast("string")
    did = F.col("doc_id").cast("string")
    nstr = F.col("n_chars").cast("string")
    base = F.concat(F.lit("/"), F.col("source"), F.lit("/"), did)
    u1 = F.concat(
        F.lit("HTTP://WWW.Site"), h, F.lit(".COM:80"), base,
        F.lit("?b="), nstr, F.lit("&a="), F.col("lang"), F.lit("#frag"),
    )
    u2 = F.concat(
        F.lit("http://www.site"), h, F.lit(".com"), base,
        F.lit("?a="), F.col("lang"), F.lit("&b="), nstr,
    )
    rows = d.select(
        "doc_id", F.explode(F.array(u1, u2)).alias("url")
    )
    return (
        rows.select(
            "doc_id", canonical_url(F.col("url")).alias("canonical")
        )
        .groupBy("doc_id", "canonical")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .orderBy("doc_id")
    )


def _tx_url_canonical_sql() -> str:
    return """
SELECT doc_id,
       'http://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.com/'
         || source || '/' || CAST(doc_id AS VARCHAR)
         || '?a=' || lang || '&b=' || CAST(n_chars AS VARCHAR)
         AS canonical,
       CAST(2 AS BIGINT) AS n_variants
FROM documents ORDER BY doc_id
"""


# --- TIFF image container -------------------------------------------------------


def mm_tiff_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode (§2.11): document bytes become an 8×8
    grayscale TIFF whose compression CYCLES per document (none /
    PackBits / Deflate / TIFF-LZW, with horizontal-differencing
    predictor on the compressed variants, byte order alternating per
    doc), then ``decode_image_pool`` magic-dispatches to
    ``parse_tiff`` and 2×2 block-mean pools.  r11: every third doc is
    TILED (16×16 tiles, zero-padded per TIFF 6.0 §15 and cropped back
    on decode) and every fifth rides the PALETTE path (photometric 3
    + 16-bit ColorMap; identity map, so the octet oracle is
    unchanged while the LUT machinery is exercised — random palettes
    are pinned in ``test_tiff.py``).  TIFF is lossless, so the oracle
    is the SAME raw-octet pool as the BMP/PNG/GIF twins — any drift
    in IFD layout, strip/tile arithmetic, PackBits/LZW coding or the
    predictor breaks the value hash."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.tiff import write_tiff

        comps = ("none", "packbits", "deflate", "lzw")
        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                comp = comps[did % 4]
                ident = np.repeat(
                    np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
                )
                payloads.append(
                    write_tiff(
                        gray,
                        compression=comp,
                        big_endian=did % 2 == 1,
                        rows_per_strip=3,
                        predictor=comp != "none",
                        tiles=(16, 16) if did % 3 == 2 else None,
                        palette=ident if did % 5 == 0 else None,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "tiff", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


# --- WebDataset tar shards ------------------------------------------------------

_WDS_SLICE = 128  # chars of text per shard sample


def _wds_build(batches):
    """Fixture for ``mm_webdataset_shard``: each document becomes one
    ``.tar.gz`` WebDataset shard whose samples are the text's
    ``_WDS_SLICE``-char slices — per sample three adjacent members
    ``<key>.txt`` / ``<key>.cls`` (the lang label) / ``<key>.id``,
    keys ``{doc_id:06d}-{i:03d}`` — the exact layout a WebDataset
    training loader reads sequentially."""
    import pandas as pd

    from ..functions.tarf import write_webdataset_shard

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"]
        ):
            did = int(did)
            samples = [
                (
                    f"{did:06d}-{i // _WDS_SLICE:03d}",
                    [
                        ("txt", t[i : i + _WDS_SLICE].encode("utf-8")),
                        ("cls", str(lang).encode("utf-8")),
                        ("id", str(did).encode("ascii")),
                    ],
                )
                for i in range(0, len(t), _WDS_SLICE)
            ]
            payloads.append(
                write_webdataset_shard(samples) if samples else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_webdataset_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset SHARD ingestion (§2.11): the de-facto tar-shard
    layout of large-scale multimodal training data — ``.tar.gz``
    shards (ustar members, deterministic gzip framing) whose adjacent
    same-basename members form samples — parsed back into per-sample
    rows by ``extract_webdataset_samples``.  The oracle re-derives
    every sample (key arithmetic, slice text, label) from the
    `documents` table, so any drift in tar header layout, checksum
    handling, padding, gzip framing or the adjacency grouping breaks
    the value hash."""
    from ..operators.multimodal import extract_webdataset_samples

    media = _cached_media(
        spark, sf_dir, "wds", _wds_build, cols=("doc_id", "text", "lang")
    )
    rows = extract_webdataset_samples(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_fields",
        "cls",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _mm_wds_sql() -> str:
    w = _WDS_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, lang, CAST(i AS INT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(3 AS INT) AS n_fields,
       lang AS cls,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""

REGISTRY = {
    "mm_mp4_demux": (mm_mp4_demux, _mm_mp4_sql()),
    "mm_webdataset_shard": (mm_webdataset_shard, _mm_wds_sql()),
    "mm_tiff_pool": (mm_tiff_pool, _mm_bmp_sql()),
    "tx_url_canonical": (tx_url_canonical, _tx_url_canonical_sql()),
    "tx_zip_extract": (tx_zip_extract, _tx_zip_sql()),
    "tx_compress_funnel": (tx_compress_funnel, _tx_compress_sql()),
    "src_avro_scan": (src_avro_scan, _src_avro_sql()),
    "tx_pdf_extract": (tx_pdf_extract, _tx_pdf_sql()),
    "tx_wiki_extract": (tx_wiki_extract, _tx_wiki_sql()),
    "mm_jpeg_lossless_pool": (mm_jpeg_lossless_pool, _mm_bmp_sql()),
    "mm_mp4_mp3_rms": (
        mm_mp4_mp3_rms,
        _mm_mp3_rms_sql(1, "(1 + n_bytes % 3)"),
    ),
}
