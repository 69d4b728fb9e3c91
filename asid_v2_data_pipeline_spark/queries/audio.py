"""Audio codec queries: FLAC (raw / MKV / Ogg), MP3 Layer III
(mono / stereo / M-S / intensity / general), multi-codec admission
funnels and audio curation with DuckDB oracles.  Split out of the
former queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ._shared import TOKENS_SQL, _cached_media
from .media import _BMP_F, _BMP_H, _BMP_W, _CODES_CTE_SQL, _MJPEG_MAX_FRAMES
from .graph import _FLAC_BLOCK, _FLAC_RATE, _FLAC_W
from .oracles_mp3 import (
    _AC_CLIP,
    _AC_FP_WIN,
    _AC_MAX_CLIP,
    _AC_MAX_SIL,
    _AC_MIN_FRAMES,
    _AC_SIL,
    _MP3_GG,
    _mm_mp3_general_sql,
    _mm_mp3_rms_sql,
    _mp3_final_select,
)
from .fixtures_audio import (
    _audio_mixed3_build,
    _audio_mixed4_build,
    _audio_mixed_build,
    _audio_quarantine_build,
    _flac_build,
    _mp3_build,
    _mp3_general_build,
    _mp3_intensity_build,
    _mp3_mkv_build,
    _ogg_flac_build,
    _ogg_meta_quar_build,
    _ogg_opus_build,
    _ogg_vorbis_build,
)


def mm_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-COMPRESSED audio codec end-to-end: document bytes
    become interleaved 16-bit stereo PCM inside a genuine FLAC stream
    (``functions/flac.write_flac`` — fixed/LPC subframe prediction
    chosen by exact rice cost, optimal rice partitions, mid/side or
    independent stereo per doc, CRC-8/16 footers, STREAMINFO MD5), then
    ``decode_flac_rms`` decodes it back (prediction reconstruction,
    rice, stereo undecorrelation, CRC + MD5 verification) and emits
    exact per-(channel, 16-sample-window) energies.  FLAC is lossless,
    so the DuckDB oracle recomputes the windows straight from the text
    octets — any drift anywhere in the compression round-trip breaks
    the value hash."""
    from ..operators.multimodal import decode_flac_rms

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    out = decode_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


def _flac_wins_sql() -> str:
    """Windowed stereo energies straight from the text octets — the
    pre-encode samples, valid as the FLAC oracle precisely because the
    codec is lossless."""
    w = _FLAC_W
    s = (
        f"(CAST(cs[CAST(4 * (w * {w} + k) + 2 * c + 1 AS INT)] AS BIGINT)"
        f" * 256"
        f" + CAST(cs[CAST(4 * (w * {w} + k) + 2 * c + 2 AS INT)] AS BIGINT)"
        f" - 32768)"
    )
    return f"""wins AS (
  SELECT doc_id, n_bytes, CAST(c AS INT) AS channel, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              {s} * {s})) AS BIGINT) AS sum_sq
  FROM codes,
       unnest(range(0, 2)) AS tc(c),
       unnest(range(0, (n_bytes // 4) // {w})) AS tw(w)
)"""


def _mm_flac_sql() -> str:
    return f"""
WITH {_CODES_CTE_SQL},
{_flac_wins_sql()}
SELECT doc_id, CAST({_FLAC_RATE} AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits, channel, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {_FLAC_W}), 6) AS rms
FROM wins ORDER BY doc_id, channel, win_no
"""


def mm_mkv_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END compressed audio in a video container — the audio
    sibling of ``mm_mkv_jpeg_pool``: the same stereo PCM is FLAC-
    encoded in 16-sample blocks (so every doc spans multiple frames),
    split per the Matroska A_FLAC codec mapping (headers in
    CodecPrivate, one frame per SimpleBlock, clusters of 4), then
    ``demux_decode_flac_rms`` demuxes the container, reassembles the
    stream, FLAC-decodes it (the STREAMINFO MD5 spans ALL samples, so
    one dropped or reordered MKV block fails loudly) and emits the
    windowed energies plus ``n_blocks``, the demuxed frame count the
    oracle re-derives as ceil(samples / block).  Composition of the
    repo's own EBML demuxer and FLAC codec — zero external codec
    libraries."""
    from ..operators.multimodal import demux_decode_flac_rms

    media = _cached_media(spark, sf_dir, "mkvflac", lambda it: _flac_build(it, _FLAC_BLOCK, True))
    out = demux_decode_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


def _mm_mkv_flac_sql() -> str:
    b = _FLAC_BLOCK
    return f"""
WITH {_CODES_CTE_SQL},
{_flac_wins_sql()}
SELECT doc_id,
       CAST(((n_bytes // 4) + {b} - 1) // {b} AS INT) AS n_blocks,
       CAST({_FLAC_RATE} AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits, channel, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {_FLAC_W}), 6) AS rms
FROM wins ORDER BY doc_id, channel, win_no
"""


def mm_ogg_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END FLAC-in-Ogg decode — Ogg completes the open-container
    family (Matroska, MP4, Ogg): the same stereo PCM as the MKV twin,
    FLAC-encoded in 16-sample blocks, wrapped per the FLAC-in-Ogg
    mapping (RFC 3533 pages, CRC-32-sealed, packets laced across
    pages), then ``demux_decode_ogg_flac_rms`` validates + reassembles
    the page stream, FLAC-decodes it (STREAMINFO MD5 spans ALL
    samples, so one dropped or reordered page fails loudly) and emits
    the windowed energies plus ``n_blocks`` (audio packets).  The
    oracle is the SAME octet replay as the MKV twin — container-
    independent by construction."""
    from ..operators.multimodal import demux_decode_ogg_flac_rms

    media = _cached_media(
        spark, sf_dir, "oggflac", _ogg_flac_build, deps=(_flac_build,)
    )
    out = demux_decode_ogg_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


def mm_audio_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio CURATION FUNNEL — the multimodal twin of
    ``cur_pipeline``: documents become real FLAC streams, decode back
    through the full codec (``decode_flac_audio_stats``), then the
    admission pipeline runs on MEASURED audio: quality gates (clipped-
    sample ratio, near-silence ratio, minimum duration) followed by
    exact dedup on an order-sensitive integer INTRO fingerprint (the
    head-window hash of audio fingerprinting, over the first
    ``_AC_FP_WIN`` decoded samples — ~24 real collision groups exist
    in the fixture corpus, so the dedup stage does real work), keeping
    the lowest doc_id per fingerprint as canonical.
    Every statistic is integer-exact and FLAC is lossless, so the
    DuckDB oracle re-derives the entire funnel — decode, gates, dedup,
    survivor choice — from the pre-encode octets.

    Scale shape: one zero-shuffle Arrow decode pass, then one
    fingerprint-keyed aggregation (the dedup shuffle moves one stats
    row per payload, never samples)."""
    from ..operators.multimodal import decode_flac_audio_stats

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    stats = decode_flac_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")  # decoded, not assumed
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_curation_sql() -> str:
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
stats AS (
  SELECT doc_id, CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    2 * (n_bytes // 4) AS ns,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE n_bytes // 4 > 0
),
gated AS (
  SELECT doc_id, n_frames,
         n_clip * 1.0 / ns AS clip_ratio,
         n_silence * 1.0 / ns AS silence_ratio,
         sqrt(CAST(sum_sq AS DOUBLE) / ns) AS rms, fp
  FROM stats
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / ns <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / ns <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


_GIF_DELAY = 10  # centiseconds between fixture frames (scaled by no.)


def mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANIMATED-GIF frame demux + decode — a second real animated
    container beside MKV: each document's bytes become up to
    ``_MJPEG_MAX_FRAMES`` full 8×8 frames in one genuine GIF89a
    animation (identity grayscale palette, per-frame Graphic Control
    Extensions with increasing delays), then ``decode_gif_frames``
    composes every displayed frame and 2×2-pools it.  The identity
    palette makes the animation lossless over the octets, so the oracle
    pools the raw text bytes per frame and re-derives the delay
    arithmetic — any drift in LZW, GCE parsing or canvas composition
    breaks the value hash."""
    from ..operators.multimodal import decode_gif_frames

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_gif_anim

        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                if nf == 0:
                    payloads.append(None)
                    continue
                frames = [
                    np.frombuffer(
                        raw, np.uint8, count=n, offset=i * n
                    ).reshape(_BMP_H, _BMP_W)
                    for i in range(nf)
                ]
                payloads.append(
                    write_gif_anim(
                        frames,
                        pal,
                        [_GIF_DELAY * (i + 1) for i in range(nf)],
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "gifanim", build)
    pooled = decode_gif_frames(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "frame_no",
        "delay_cs",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "frame_no")


def _mm_gif_frames_sql() -> str:
    n = _BMP_W * _BMP_H
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc)
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(
            f"CAST(cs[CAST(fno * {n} + {i} + 1 AS INT)] AS BIGINT)"
            for i in idx
        )
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (
  SELECT doc_id, CAST(f AS INT) AS fno, cs
  FROM codes,
       unnest(range(0, LEAST(n_bytes // {n}, {_MJPEG_MAX_FRAMES}))) AS t(f)
)
SELECT doc_id, fno AS frame_no,
       CAST({_GIF_DELAY} * (fno + 1) AS INT) AS delay_cs,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM frames ORDER BY doc_id, frame_no
"""


def mm_audio_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental media admission — the oracle-checked BATCH TWIN of
    ``streaming/media_stream.py`` (the pattern ``dd_incremental`` set
    for text): even-doc_id media are the already-admitted history
    (their gated fingerprints = the persisted index), odd-doc_id media
    are the arriving batch; the batch passes the quality gates, drops
    anything whose intro fingerprint is already indexed, and keeps the
    lowest media_id per fingerprint within itself.  Exercises the
    exact admission semantics the streaming loop runs per micro-batch,
    end-to-end through real FLAC decode, against a from-octets SQL
    oracle."""
    from ..operators.multimodal import decode_flac_audio_stats
    from ..streaming.media_stream import admit_media_batch

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    history = media.filter(F.col("media_id") % 2 == 0)
    batch = media.filter(F.col("media_id") % 2 == 1)
    hist_stats = decode_flac_audio_stats(
        history, _AC_CLIP, _AC_SIL, _AC_FP_WIN
    )
    n = F.col("n_frames") * F.col("n_channels")
    index_rows = hist_stats.filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("n_clip") / n <= _AC_MAX_CLIP)
        & (F.col("n_silence") / n <= _AC_MAX_SIL)
    ).select("fp")
    admitted, _fp_rows = admit_media_batch(
        batch,
        index_rows,
        clip_at=_AC_CLIP,
        silence_below=_AC_SIL,
        fp_window=_AC_FP_WIN,
        max_clip=_AC_MAX_CLIP,
        max_silence=_AC_MAX_SIL,
        min_frames=_AC_MIN_FRAMES,
    )
    return admitted.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        F.round("clip_ratio", 6).alias("clip_ratio"),
        F.round("silence_ratio", 6).alias("silence_ratio"),
        F.round("rms", 6).alias("rms"),
        "fp",
    ).orderBy("doc_id")


def _mm_audio_incremental_sql() -> str:
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
stats AS (
  SELECT doc_id, CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    2 * (n_bytes // 4) AS ns,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE n_bytes // 4 > 0
),
gated AS (
  SELECT doc_id, n_frames,
         n_clip * 1.0 / ns AS clip_ratio,
         n_silence * 1.0 / ns AS silence_ratio,
         sqrt(CAST(sum_sq AS DOUBLE) / ns) AS rms, fp
  FROM stats
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / ns <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / ns <= {_AC_MAX_SIL}
),
index_fps AS (SELECT DISTINCT fp FROM gated WHERE doc_id % 2 = 0),
novel AS (
  SELECT g.* FROM gated g
  WHERE g.doc_id % 2 = 1
    AND NOT EXISTS (SELECT 1 FROM index_fps i WHERE i.fp = g.fp)
),
surv AS (SELECT fp, min(doc_id) AS doc_id FROM novel GROUP BY fp)
SELECT n.doc_id, n.n_frames,
       ROUND(n.clip_ratio, 6) AS clip_ratio,
       ROUND(n.silence_ratio, 6) AS silence_ratio,
       ROUND(n.rms, 6) AS rms, n.fp
FROM novel n JOIN surv s ON s.fp = n.fp AND s.doc_id = n.doc_id
ORDER BY n.doc_id
"""


def mm_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3 SAMPLE decode (VERDICT r7 task 2, the last
    DecodeStub raise worth killing): each document becomes a REAL
    ID3v2-tagged MPEG-1 Layer III stream — side info, scalefactors and
    a table-1 Huffman-coded spectrum derived from the document bytes —
    and ``decode_mp3_audio_stats`` decodes the SAMPLES back: ID3 skip,
    sync walk, side-info parse, scalefactor read, Huffman decode,
    then the fixed-point reconstruction (requant LUT → alias
    butterflies → fused IMDCT+window with ONE rounding → overlap-add →
    frequency inversion → polyphase synthesis → int16 clamp).  Every
    reconstruction stage is integer-exact, so the DuckDB oracle
    replays the WHOLE pipeline from the pre-encode octets — any drift
    in the bitstream layout, the Huffman codes, a table constant or a
    rounding rule breaks the value hash (the lossy-codec trick of
    ``mm_jpeg_pool``, at Layer III scale: 5 chained stages over
    576-line granules instead of 4 over 8×8 blocks).

    Scale shape: one zero-shuffle Arrow decode pass over repartitioned
    payloads; one stats row per document moves afterwards."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3", _mp3_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_mp3_stereo_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO twin of ``mm_mp3_rms``: two INDEPENDENT channels per
    frame (mode 00; 32-byte side info, four granule-channel blocks,
    per-channel overlap + filterbank state), decoded samples
    channel-interleaved into the same integer stats.  The oracle runs
    the full fixed-point pipeline over all four granule-channel
    segments — the per-channel state separation (the overlap tail is
    the same-channel segment TWO back; the window FIFO never crosses
    channels) is exactly what the value hash pins."""
    from functools import partial

    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3st", partial(_mp3_build, nch=2))
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_audio_multicodec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-CODEC audio curation (r8): the admission funnel of
    ``mm_audio_curation`` over a HETEROGENEOUS corpus — half the
    payloads are real FLAC stereo, half ID3-prefixed MP3 mono — decoded
    by the magic-dispatched ``decode_audio_stats`` into ONE integer
    stats schema, then gated and fingerprint-deduplicated together.
    The oracle is the union of both codec re-derivations: FLAC stats
    straight from the pre-encode octets (lossless), MP3 stats through
    the full variable-free fixed-point pipeline (the ``admission``
    form of the shared generator) — the mixed-corpus gates and
    survivor choice are value-hashed end-to-end.

    Scale shape: one zero-shuffle Arrow decode pass regardless of
    codec mix; one fingerprint-keyed agg moving a stats row per doc."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix", _audio_mixed_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.when(F.col("media_id") % 2 == 0, F.lit("flac"))
        .otherwise(F.lit("mp3"))
        .alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec_sql() -> str:
    """Union oracle: even docs re-derived from octets (FLAC is
    lossless), odd docs through the admission form of the MP3 pipeline
    generator; then the identical gates + min-doc_id dedup."""
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 2 = 1"
    )
    return f"""
WITH {_CODES_CTE_SQL},
fl AS (
  SELECT doc_id, CAST(2 AS INT) AS n_channels,
    CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE doc_id % 2 = 0 AND n_bytes // 4 > 0
),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (SELECT * FROM fl UNION ALL SELECT * FROM mp3a),
gated AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'mp3' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def mm_audio_multicodec3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-codec audio curation (r9): the ``mm_audio_multicodec``
    funnel with a RIFF/WAVE arm — FLAC stereo, ID3-prefixed MP3 mono
    and raw 16-bit PCM WAV mono all decode through the one
    magic-dispatched ``decode_audio_stats`` into the shared admission
    schema, then gate and fingerprint-deduplicate together.  The two
    lossless arms (FLAC, WAV) re-derive straight from the pre-encode
    octets in the oracle; the MP3 arm replays the full fixed-point
    pipeline.  Scale shape identical to the 2-codec funnel: one
    zero-shuffle Arrow decode pass, one fp-keyed agg."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix3", _audio_mixed3_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("flac"), F.lit("mp3"), F.lit("wav")),
            (F.col("media_id") % 3 + 1).cast("int"),
        ).alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec3_sql() -> str:
    """Three-arm union oracle: FLAC (stereo pairs) and WAV (mono pairs)
    re-derived from octets — both lossless — plus the admission form of
    the MP3 pipeline generator; then the identical gates + dedup."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 3 = 1"
    )

    def lossless_arm(where: str, nch: int, frames: str) -> str:
        n_inter = f"{nch} * ({frames})"
        return f"""
  SELECT doc_id, CAST({nch} AS INT) AS n_channels,
    CAST({frames} AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, {n_inter}),
      k -> {s2} * {s2})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST({n_inter}, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM codes WHERE {where} AND {frames} > 0"""

    return f"""
WITH {_CODES_CTE_SQL},
fl AS ({lossless_arm("doc_id % 3 = 0", 2, "n_bytes // 4")}),
wv AS ({lossless_arm("doc_id % 3 = 2", 1, "n_bytes // 2")}),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (
  SELECT * FROM fl UNION ALL SELECT * FROM mp3a UNION ALL SELECT * FROM wv
),
gated AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3'
         ELSE 'wav' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def mm_audio_multicodec4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-container audio curation (r10): the heterogeneous funnel
    with an AIFF arm — FLAC, MP3, WAV and AIFF all magic-dispatch
    through the ONE ``decode_audio_stats`` kernel into the shared
    admission schema, then gate and fingerprint-deduplicate together.
    AIFF exercises the big-endian IFF path incl. the 80-bit
    extended-float sample-rate field.  Scale shape unchanged: one
    zero-shuffle Arrow decode pass, one fp-keyed agg."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix4", _audio_mixed4_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.element_at(
            F.array(
                F.lit("flac"), F.lit("mp3"), F.lit("wav"), F.lit("aiff")
            ),
            (F.col("media_id") % 4 + 1).cast("int"),
        ).alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec4_sql() -> str:
    """Four-arm union oracle: FLAC (stereo pairs), WAV and AIFF (mono
    pairs — both lossless, identical octet mapping) re-derived
    straight from the pre-encode octets, plus the admission form of
    the MP3 pipeline generator; then the identical gates + dedup."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 4 = 1"
    )

    def lossless_arm(where: str, nch: int, frames: str) -> str:
        n_inter = f"{nch} * ({frames})"
        return f"""
  SELECT doc_id, CAST({nch} AS INT) AS n_channels,
    CAST({frames} AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, {n_inter}),
      k -> {s2} * {s2})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST({n_inter}, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM codes WHERE {where} AND {frames} > 0"""

    return f"""
WITH {_CODES_CTE_SQL},
fl AS ({lossless_arm("doc_id % 4 = 0", 2, "n_bytes // 4")}),
wv AS ({lossless_arm("doc_id % 4 = 2", 1, "n_bytes // 2")}),
af AS ({lossless_arm("doc_id % 4 = 3", 1, "n_bytes // 2")}),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (
  SELECT * FROM fl UNION ALL SELECT * FROM mp3a
  UNION ALL SELECT * FROM wv UNION ALL SELECT * FROM af
),
gated AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3'
         WHEN 2 THEN 'wav' ELSE 'aiff' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def mm_audio_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING admission (r10): the funnel's production shape —
    ``decode_audio_stats_admitting`` turns each corrupt payload into a
    rejected ROW (null stats + error class) instead of a failed Spark
    task, the difference between losing one document and losing a
    100 TB pass when the corpus inevitably contains broken files.
    The fixture corrupts a deterministic subset (``doc_id % 7 == 3``,
    RIFF magic destroyed), so the oracle re-derives BOTH sides: exact
    stats from the pre-encode octets for the admitted docs, and the
    (doc_id, 'ValueError') rejects for the corrupted ones."""
    from ..operators.multimodal import decode_audio_stats_admitting

    media = _cached_media(spark, sf_dir, "audioquar", _audio_quarantine_build)
    stats = decode_audio_stats_admitting(
        media, _AC_CLIP, _AC_SIL, _AC_FP_WIN
    )
    return (
        stats.select(
            F.col("media_id").alias("doc_id"),
            F.col("error").isNull().alias("admitted"),
            "error",
            "n_frames",
            F.round(
                F.sqrt(F.col("sum_sq") / F.col("n_frames")), 6
            ).alias("rms"),
            "fp",
        )
        .orderBy("doc_id")
    )


def _mm_audio_quarantine_sql() -> str:
    """Both sides of the quarantine re-derived from octets: admitted
    docs' exact loudness/fingerprint (the lossless WAV mapping), and
    the corrupted subset as (doc_id, error='ValueError') null-stat
    rows."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
base AS (
  SELECT doc_id, n_bytes // 2 AS m, cs FROM codes WHERE n_bytes // 2 > 0
),
good AS (
  SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
    CAST(m AS BIGINT) AS n_frames,
    ROUND(sqrt(CAST(list_sum(list_transform(range(0, m),
      k -> {s2} * {s2})) AS DOUBLE) / m), 6) AS rms,
    CAST(list_sum(list_transform(range(0, LEAST(m, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM base WHERE doc_id % 7 <> 3
),
rejected AS (
  SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
    CAST(NULL AS BIGINT) AS n_frames, CAST(NULL AS DOUBLE) AS rms,
    CAST(NULL AS BIGINT) AS fp
  FROM base WHERE doc_id % 7 = 3
)
SELECT * FROM good UNION ALL SELECT * FROM rejected ORDER BY doc_id
"""


def mm_mp3_ms_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MID/SIDE joint-stereo twin of ``mm_mp3_stereo_rms`` (mode 01,
    mode_ext MS — how most real stereo MP3s are coded): the document
    bytes become quantized MID/SIDE spectra, and the decoder recombines
    ``L,R = rdiv((M ± S)·724, 2^10)`` on the requantized lines before
    reconstruction.  The oracle inserts the identical recombination CTE
    between requantization and the alias butterflies — the 724 constant
    and the extra rounding rule are value-hashed."""
    from functools import partial

    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3ms", partial(_mp3_build, nch=2, stereo_mode="ms"))
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


# general-profile MP3 fixture layout (r9, VERDICT r8 task 2): four


def mm_mp3_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERAL-PROFILE MP3 decode (r9, VERDICT r8 task 2): the fixture
    exercises every general-stream feature the r8 decoder disclosed —
    the bit reservoir across VBR frames (256/224 kbps frames pull
    their main data back into earlier frames' slack), scfsi, preflag,
    scalefac_scale, Huffman table 2, the count1 table-B quadruple
    region, and window switching (start → MIXED → short → stop, with
    subblock_gain, per-window short scalefactors, and the mixed
    block's two long subbands).  The oracle
    replays the complete fixed-point reconstruction from the
    pre-encode octets — per-segment block types select the fused
    normal/start/stop IMDCT tables or the three-window short path —
    so the value hash pins the whole general profile end to end.

    Scale shape: identical to ``mm_mp3_rms`` — one zero-shuffle Arrow
    decode pass over cached payloads, one stats row per document."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3gen4", _mp3_general_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_mp3_intensity_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTENSITY joint-stereo twin of ``mm_mp3_stereo_rms`` (r9,
    VERDICT r8 task 5 — the remaining mode_ext bit): bands at/above
    the right channel's transmitted bound (sfb 15) carry one spectrum
    split by the fixed-point tan-position factors
    ``L,R = rdiv(x·KL/KR[is_pos], 2^10)``; the oracle inserts the
    identical position-split CTE between requantization and the alias
    butterflies, value-hashing the KL/KR tables, the band-21-reuses-
    band-20 rule and the bound arithmetic."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3is", _mp3_intensity_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_mkv_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3-in-Matroska decode — completes the demux∘codec
    family (MJPEG video, FLAC audio, now the most common compressed
    audio format): a data-dependent number of REAL Layer III frames per
    document (1–3, so the decode-chain length varies per row) muxed per
    the A_MPEG/L3 codec mapping, demuxed back, reassembled in timestamp
    order and SAMPLE-decoded with cross-frame reconstruction state —
    one dropped or reordered SimpleBlock would change every later
    sample and break the value hash.  The oracle re-derives the frame
    count AND the whole variable-length fixed-point pipeline from the
    pre-encode octets (the ``frames_expr`` form of the shared
    generator).  One zero-shuffle Arrow pass; one stats row per doc."""
    from ..operators.multimodal import demux_decode_mp3_stats

    media = _cached_media(spark, sf_dir, "mkvmp3", _mp3_mkv_build)
    stats = demux_decode_mp3_stats(media)
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


def mm_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata extraction through a REAL ID3v2 container: each
    document becomes an ID3-tagged payload (title = first 3 tokens,
    artist = lang, album = source, track = doc_id mod 100; version,
    text encoding AND unsynchronization vary per doc to exercise
    v2.2's 6-byte frame headers, v2.3 plain vs v2.4 syncsafe frame
    sizes, the Latin-1 vs UTF-8 decoders, and the whole-tag (v2.2/
    v2.3) vs per-frame (v2.4) unsync paths) followed by opaque 'audio'
    bytes.  ``extract_id3_tags`` parses it back; the oracle recomputes
    every column — including the tag/audio byte split, which pins the
    per-version frame-header and syncsafe size arithmetic — from the
    documents table.  (The fixture text is ASCII, so unsync inserts no
    escape bytes here; the expansion arithmetic on 0xFF-bearing bodies
    is pinned by the UTF-16 unit matrix in test_codecs.py.)"""
    from ..operators.multimodal import extract_id3_tags


    def build(batches):
        import pandas as pd

        from ..functions.id3 import write_id3
        from ..functions.text import tokens_py

        for pdf in batches:
            ids, payloads = [], []
            for did, lang, source, t in zip(
                pdf["doc_id"], pdf["lang"], pdf["source"], pdf["text"]
            ):
                toks = tokens_py(t)[:3]
                frames = {
                    "TIT2": " ".join(toks),
                    "TPE1": str(lang),
                    "TALB": str(source),
                    "TRCK": str(int(did) % 100),
                }
                did_i = int(did)
                major = 2 if did_i % 5 == 0 else (3 if did_i % 3 == 0 else 4)
                ids.append(did)
                payloads.append(
                    write_id3(
                        frames,
                        major=major,
                        encoding=3 if did_i % 2 == 0 else 0,
                        unsync=did_i % 4 == 1,
                        audio=t.encode("utf-8")[:32],
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = _cached_media(spark, sf_dir, "id3", build, cols=("doc_id", "lang", "source", "text"))
    out = extract_id3_tags(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "major",
        "title",
        "artist",
        "album",
        "track",
        "tag_bytes",
        "audio_bytes",
    ).orderBy("doc_id")


def _mm_id3_sql() -> str:
    # tag layout: 10 header + per-frame (frame-header + 1 encoding byte
    # + len) + 16 padding, where the frame overhead is 7 for v2.2's
    # 6-byte headers and 11 for v2.3/v2.4's 10-byte headers; all
    # fixture text is ASCII so char length == byte length in Latin-1
    # and UTF-8 and unsynchronization inserts nothing
    return f"""
WITH base AS (
  SELECT doc_id, lang, source,
         array_to_string(list_slice({TOKENS_SQL}, 1, 3), ' ') AS title,
         CAST(doc_id % 100 AS VARCHAR) AS trck,
         octet_length(encode(text)) AS nb,
         CASE WHEN doc_id % 5 = 0 THEN 2
              WHEN doc_id % 3 = 0 THEN 3 ELSE 4 END AS mj
  FROM documents
)
SELECT doc_id,
       CAST(mj AS INT) AS major,
       title, lang AS artist, source AS album, trck AS track,
       CAST(10
            + 4 * (CASE WHEN mj = 2 THEN 7 ELSE 11 END)
            + len(title) + len(lang) + len(source) + len(trck)
            + 16 AS INT) AS tag_bytes,
       CAST(LEAST(32, nb) AS INT) AS audio_bytes
FROM base ORDER BY doc_id
"""


# per-family fixture parameters: (version, layer, sample rate, samples
# per frame, 5-entry kbps cycle drawn from that family's bitrate table)
_MP3_FAMILIES = (
    ("1", 3, 44100, 1152, (64, 96, 128, 192, 256)),
    ("2", 3, 22050, 576, (16, 24, 32, 48, 64)),
    ("1", 2, 44100, 1152, (48, 56, 64, 96, 128)),
    ("2.5", 1, 11025, 384, (32, 48, 64, 96, 112)),
)


def mm_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG audio stream metadata through REAL frame headers — the
    version×layer matrix: each document becomes an ID3v2-prefixed
    stream whose (version, layer, sample rate) cycle over MPEG-1 L3 /
    MPEG-2 L3 / MPEG-1 L2 / MPEG-2.5 L1 by doc_id, with per-frame VBR
    bitrates from that family's table and alternating padding bits;
    ``mp3_stream_info`` walks the sync words — every computed
    per-layer frame length must land exactly on the next header — and
    reports frame count, bitrate census, exact duration, version and
    layer.  The oracle recomputes everything from doc_id and the
    text's byte length."""
    from ..operators.multimodal import mp3_stream_info


    def build(batches):
        import pandas as pd

        from ..functions.id3 import write_mp3

        for pdf in batches:
            ids, payloads = [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                nb = len(t.encode("utf-8"))
                k = 1 + nb % 7
                ver, layer, sr, _spf, cycle = _MP3_FAMILIES[int(did) % 4]
                kbps = [
                    cycle[(int(did) + i) % len(cycle)] for i in range(k)
                ]
                pads = [(int(did) + i) % 2 for i in range(k)]
                ids.append(did)
                payloads.append(
                    write_mp3(
                        kbps,
                        sample_rate=sr,
                        paddings=pads,
                        id3_frames={"TIT2": str(int(did))},
                        version=ver,
                        layer=layer,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = _cached_media(spark, sf_dir, "mp3meta", build)
    out = mp3_stream_info(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        "sample_rate",
        "kbps_sum",
        "duration_us",
        "mpeg_version",
        "mpeg_layer",
    ).orderBy("doc_id")


def _mm_mp3_sql() -> str:
    def fam_case(expr: str) -> str:
        return (
            "CASE doc_id % 4 "
            + " ".join(
                f"WHEN {i} THEN {expr.format(*fam)}"
                for i, fam in enumerate(_MP3_FAMILIES)
            )
            + " END"
        )

    # expr placeholders: {0}=version {1}=layer {2}=rate {3}=spf {4}=cycle
    cyc = fam_case("list_value{4}")
    return f"""
WITH base AS (
  SELECT doc_id, 1 + (octet_length(encode(text)) % 7) AS k FROM documents
)
SELECT doc_id, CAST(k AS INT) AS n_frames,
       CAST({fam_case("{2}")} AS INT) AS sample_rate,
       CAST(list_sum(list_transform(range(0, k), i ->
            ({cyc})[CAST((doc_id + i) % 5 + 1 AS INT)])) AS BIGINT)
         AS kbps_sum,
       CAST((k * {fam_case("{3}")} * 1000000) // {fam_case("{2}")} AS BIGINT)
         AS duration_us,
       {fam_case("'{0}'")} AS mpeg_version,
       CAST({fam_case("{1}")} AS INT) AS mpeg_layer
FROM base ORDER BY doc_id
"""


_FR_BYTES, _FR_STRIDE, _FR_MAX = 16, 2, 8


def mm_ogg_vorbis_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg-VORBIS metadata extraction (r11, the bounded Vorbis spike):
    each payload is a real Ogg stream whose Vorbis header triple is
    parsed IN FULL — identification, comment tags, and the complete
    setup topology (codebooks with Huffman Kraft + VQ-lattice
    validation, floor1, residue2, mappings, modes) — into the columns
    a curation pipeline routes on, plus packet count and final
    granule.  The packet decode (floor/residue/MDCT) is the
    adjudicated boundary (SCALE.md §Vorbis); everything short of PCM
    is extracted and oracle-checked here."""
    from ..operators.multimodal import extract_vorbis_meta

    media = _cached_media(spark, sf_dir, "oggvorbis", _ogg_vorbis_build)
    rows = extract_vorbis_meta(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "channels",
        "sample_rate",
        "bitrate_nominal",
        "title",
        "n_tags",
        "n_codebooks",
        "n_modes",
        "n_audio_packets",
        "last_granule",
    ).orderBy("doc_id")


def _mm_ogg_vorbis_sql() -> str:
    return """
SELECT doc_id,
       CAST(1 + doc_id % 2 AS INT) AS channels,
       CAST(8000 * (1 + doc_id % 4) AS INT) AS sample_rate,
       CAST(1000 * (1 + doc_id % 5) AS INT) AS bitrate_nominal,
       substr(text, 1, 12) AS title,
       CAST(2 AS INT) AS n_tags,
       CAST(3 AS INT) AS n_codebooks,
       CAST(2 AS INT) AS n_modes,
       CAST(len(text) % 7 AS INT) AS n_audio_packets,
       CAST((len(text) % 7) * 128 AS BIGINT) AS last_granule
FROM documents ORDER BY doc_id
"""


def mm_ogg_opus_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg-OPUS metadata + decode-free duration (r11): Opus is the
    growing share of crawled web audio; each payload's RFC 7845
    headers parse into routing columns and the exact stream duration
    derives from the per-packet TOC bytes (RFC 6716 §3.1 — the same
    arithmetic opusinfo/ffprobe use).  The oracle replays the TOC
    duration table from the documents table, so any drift in the
    config→samples mapping, frame-count codes, granule convention or
    pre-skip trim breaks the value hash."""
    from ..operators.multimodal import extract_opus_meta

    media = _cached_media(spark, sf_dir, "oggopus", _ogg_opus_build)
    rows = extract_opus_meta(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "channels",
        "input_sample_rate",
        "pre_skip",
        "output_gain_q8",
        "title",
        "n_tags",
        "n_audio_packets",
        "total_samples48",
        "duration_samples",
    ).orderBy("doc_id")


def _mm_ogg_opus_sql() -> str:
    cfg = "(ascii(substr(text, CAST(2*i+1 AS BIGINT), 1)) % 32)"
    spf = f"""CASE WHEN {cfg} < 12 THEN
           CASE {cfg} % 4 WHEN 0 THEN 480 WHEN 1 THEN 960
                        WHEN 2 THEN 1920 ELSE 2880 END
         WHEN {cfg} < 16 THEN
           CASE {cfg} % 2 WHEN 0 THEN 480 ELSE 960 END
         ELSE CASE {cfg} % 4 WHEN 0 THEN 120 WHEN 1 THEN 240
                           WHEN 2 THEN 480 ELSE 960 END END"""
    return f"""
WITH pk AS (
  SELECT doc_id,
         LEAST(len(text) % 6, len(text) // 2) AS n_pkts,
         text
  FROM documents
),
samples AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(range(0, n_pkts), i ->
           (CASE WHEN ascii(substr(text, CAST(2*i+2 AS BIGINT), 1)) % 3 = 0
                 THEN 1 ELSE 2 END)
           * ({spf})
         )), 0) AS BIGINT) AS total
  FROM pk
)
SELECT p.doc_id,
       CAST(1 + p.doc_id % 2 AS INT) AS channels,
       CAST(8000 * (1 + p.doc_id % 6) AS INT) AS input_sample_rate,
       CAST(100 + p.doc_id % 200 AS INT) AS pre_skip,
       CAST((p.doc_id % 17) - 8 AS INT) AS output_gain_q8,
       substr(p.text, 1, 12) AS title,
       CAST(2 AS INT) AS n_tags,
       CAST(p.n_pkts AS INT) AS n_audio_packets,
       s.total AS total_samples48,
       CAST(greatest(0, s.total - (100 + p.doc_id % 200)) AS BIGINT)
         AS duration_samples
FROM pk p JOIN samples s USING (doc_id)
ORDER BY p.doc_id
"""


def mm_ogg_meta_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING Ogg metadata funnel (r11) — the streaming
    admission family's batch twin, oracle-checked on BOTH sides:
    Vorbis/Opus dispatch by BOS packet with a deterministically
    corrupted subset (flipped byte inside a CRC-sealed header page);
    one corrupt container costs one rejected row with the error
    class, admitted rows carry the routing metadata."""
    from ..operators.multimodal import extract_ogg_meta_admitting

    media = _cached_media(spark, sf_dir, "oggmetaquar", _ogg_meta_quar_build)
    rows = extract_ogg_meta_admitting(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "codec",
        "channels",
        "n_audio_packets",
    ).orderBy("doc_id")


def _mm_ogg_meta_quar_sql() -> str:
    return """
SELECT doc_id,
       (doc_id % 5 <> 2) AS admitted,
       CASE WHEN doc_id % 5 = 2 THEN 'ValueError' END AS error,
       CASE WHEN doc_id % 5 = 2 THEN NULL
            WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
       CASE WHEN doc_id % 5 = 2 THEN NULL
            WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 2 AS INT)
            ELSE CAST(1 AS INT) END AS channels,
       CASE WHEN doc_id % 5 = 2 THEN NULL
            WHEN doc_id % 2 = 0 THEN CAST(len(text) % 7 AS INT)
            ELSE CAST(LEAST(len(text) % 6, len(text) // 2) AS INT)
            END AS n_audio_packets
FROM documents ORDER BY doc_id
"""


REGISTRY = {
    "mm_flac_rms": (mm_flac_rms, _mm_flac_sql()),
    "mm_mkv_flac_rms": (mm_mkv_flac_rms, _mm_mkv_flac_sql()),
    "mm_audio_curation": (mm_audio_curation, _mm_audio_curation_sql()),
    "mm_audio_incremental": (mm_audio_incremental, _mm_audio_incremental_sql()),
    "mm_gif_frames": (mm_gif_frames, _mm_gif_frames_sql()),
    "mm_id3_tags": (mm_id3_tags, _mm_id3_sql()),
    "mm_mp3_meta": (mm_mp3_meta, _mm_mp3_sql()),
    "mm_mp3_rms": (mm_mp3_rms, _mm_mp3_rms_sql()),
    "mm_mp3_stereo_rms": (mm_mp3_stereo_rms, _mm_mp3_rms_sql(2)),
    "mm_mkv_mp3_rms": (
        mm_mkv_mp3_rms,
        _mm_mp3_rms_sql(1, "(1 + n_bytes % 3)"),
    ),
    "mm_mp3_ms_rms": (mm_mp3_ms_rms, _mm_mp3_rms_sql(2, ms=True)),
    "mm_mp3_intensity_rms": (
        mm_mp3_intensity_rms,
        _mm_mp3_rms_sql(2, intensity=True),
    ),
    "mm_mp3_general": (mm_mp3_general, _mm_mp3_general_sql()),
    "mm_audio_multicodec": (mm_audio_multicodec, _mm_audio_multicodec_sql()),
    "mm_audio_multicodec3": (
        mm_audio_multicodec3,
        _mm_audio_multicodec3_sql(),
    ),
    "mm_audio_quarantine": (
        mm_audio_quarantine,
        _mm_audio_quarantine_sql(),
    ),
    "mm_ogg_flac_rms": (mm_ogg_flac_rms, _mm_mkv_flac_sql()),
    "mm_ogg_vorbis_meta": (mm_ogg_vorbis_meta, _mm_ogg_vorbis_sql()),
    "mm_ogg_opus_meta": (mm_ogg_opus_meta, _mm_ogg_opus_sql()),
    "mm_ogg_meta_quarantine": (
        mm_ogg_meta_quarantine,
        _mm_ogg_meta_quar_sql(),
    ),
    "mm_audio_multicodec4": (
        mm_audio_multicodec4,
        _mm_audio_multicodec4_sql(),
    ),
}
