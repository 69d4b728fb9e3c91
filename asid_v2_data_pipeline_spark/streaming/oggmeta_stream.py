"""Streaming OGG-METADATA admission — the first family built ON TOP
of the shared harness (``streaming/admission.py``, VERDICT r10 task
6) rather than as a copied loop: everything below is the family's
``admit_fn`` plus two thin delegations.

Crawled ``.ogg`` objects arrive continuously; each micro-batch is
dispatched by BOS packet (Vorbis / Opus,
``operators/multimodal.extract_ogg_meta_admitting``), gated on
duration and packet count, deduplicated on a (codec, title,
duration) fingerprint against the persisted index and within the
batch, and admitted metadata rows land in the corpus sink while
corrupt containers land in quarantine.  Delivery semantics (_bid
idempotent sinks, strictly-earlier index reads → exactly-once
results) and the scale shapes (zero-shuffle Arrow decode, broadcast
fingerprint dedup, payload bytes never shuffle) are the harness's —
see ``admission.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from .admission import (
    admission_stream,
    dedup_by_fingerprint,
    process_admission_batch,
)


def admit_ogg_meta_batch(
    batch: DataFrame,
    index_rows: DataFrame | None,
    min_packets: int = 1,
    min_duration: int = 0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One admission step: dispatch/extract → gates → dedup.
    Returns ``(admitted_meta, their_fp_rows, quarantined)``."""
    from ..operators.multimodal import extract_ogg_meta_admitting

    rows = extract_ogg_meta_admitting(batch)
    quarantined = rows.filter(F.col("error").isNotNull()).select(
        "media_id", "error"
    )
    gated = (
        rows.filter(F.col("error").isNull())
        .filter(
            (F.col("n_audio_packets") >= min_packets)
            & (F.col("duration_samples") >= min_duration)
        )
        .withColumn(
            "fp",
            tx.char_poly_hash(
                F.concat_ws(
                    "|",
                    "codec",
                    F.coalesce(F.col("title"), F.lit("")),
                    F.col("duration_samples").cast("string"),
                )
            ),
        )
    )
    admitted = dedup_by_fingerprint(gated, index_rows)
    return admitted, admitted.select("fp", "media_id"), quarantined


def process_ogg_meta_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    **gates,
) -> None:
    process_admission_batch(
        batch,
        batch_id,
        lambda b, idx: admit_ogg_meta_batch(b, idx, **gates),
        corpus_dir,
        index_dir,
        quarantine_dir,
    )


def ogg_meta_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    **gates,
):
    def _step(batch: DataFrame, batch_id: int) -> None:
        process_ogg_meta_batch(
            batch, batch_id, corpus_dir, index_dir, quarantine_dir,
            **gates,
        )

    return admission_stream(
        spark, input_dir, _step, checkpoint_dir, max_files_per_trigger
    )
