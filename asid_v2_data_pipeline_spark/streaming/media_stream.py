"""Streaming MEDIA admission: the audio curation funnel
(``queries/audio.py:mm_audio_curation``) as a continuous ingest loop —
the multimodal twin of ``dedup_stream``.

Media payloads arrive continuously; each micro-batch is REALLY decoded
(FLAC — ``operators/multimodal.decode_flac_audio_stats``), measured
(clip/silence ratios, duration, loudness, intro fingerprint), gated,
then deduplicated (a) against the persisted fingerprint index
(everything ever admitted) and (b) within itself, and admitted stats
rows land in the corpus sink while their fingerprints extend the index
— so the NEXT batch sees them as history.

Spark shapes (per micro-batch, via ``foreachBatch``):
- decode + stats: zero-shuffle Arrow ``mapInPandas`` over the batch;
- vs-index: broadcast the batch's fingerprints against the index scan
  (at 100 TB the index is bucketed by ``fp`` so the scan prunes);
- within-batch: min media_id per fingerprint survives;
- the dedup exchange moves one small stats row per payload — samples
  never shuffle.

Delivery semantics are inherited verbatim from ``dedup_stream``:
``foreachBatch`` is at-least-once, the sink is idempotent per
``batch_id`` (``_bid=<batch_id>`` partitions written with overwrite),
and the index read keeps STRICTLY-EARLIER partitions only, so a replay
sees exactly the history it saw the first time — exactly-once results
on top of at-least-once execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .admission import (
    admission_stream,
    dedup_by_fingerprint,
    process_admission_batch,
)

FP_SCHEMA = "fp long, media_id long"


def admit_media_batch(
    batch: DataFrame,
    index_rows: DataFrame | None,
    clip_at: int = 20000,
    silence_below: int = 8192,
    fp_window: int = 16,
    max_clip: float = 0.2,
    max_silence: float = 0.85,
    min_frames: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """One admission step: decode → gates → dedup.  Returns
    ``(admitted_stats, their_fp_rows)``.  Pure DataFrame logic (no side
    effects) so batch and streaming paths share it and tests can check
    it directly.

    r10: the decode is the QUARANTINING funnel — a corrupt payload in
    a micro-batch becomes a rejected row and falls out at the gate
    like any other inadmissible document, instead of killing the
    long-running stream (at ingest scale a corrupt file is a
    certainty, and a streaming query restart-loops on a poison
    message forever)."""
    from ..operators.multimodal import decode_audio_stats_admitting

    # codec-dispatched (r8): FLAC, MP3 and WAV payloads gate through
    # the same integer stats — the funnel curates a mixed-codec corpus
    stats = decode_audio_stats_admitting(
        batch, clip_at, silence_below, fp_window
    ).filter(F.col("error").isNull()).drop("error")
    # decoded channel count — mono and stereo payloads gate correctly
    # (ADVICE r7: a hardcoded *2 halved mono denominators)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        "media_id",
        "sample_rate",
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= min_frames)
        & (F.col("n_clip") / n <= max_clip)
        & (F.col("n_silence") / n <= max_silence)
    )
    # vs-index + within-batch dedup: the shared harness tail
    admitted = dedup_by_fingerprint(gated, index_rows)
    return admitted, admitted.select("fp", "media_id")


def process_media_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    **gates,
) -> None:
    """The idempotent micro-batch step (public so retry semantics are
    directly testable): admit vs strictly-earlier index partitions +
    within batch, then overwrite this batch's ``_bid`` partitions.
    Running it twice with the same ``batch_id`` yields identical
    persisted state (same strictly-before rationale as
    ``dedup_stream.process_batch``)."""
    process_admission_batch(
        batch,
        batch_id,
        lambda b, idx: admit_media_batch(b, idx, **gates),
        corpus_dir,
        index_dir,
    )


def audio_admission_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    **gates,
):
    """Run the streaming media-admission loop (``availableNow`` drain)
    over a parquet directory of ``(media_id long, payload binary)``
    rows.  Returns the StreamingQuery."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        process_media_batch(
            batch, batch_id, corpus_dir, index_dir, **gates
        )

    return admission_stream(
        spark, input_dir, _step, checkpoint_dir, max_files_per_trigger
    )
