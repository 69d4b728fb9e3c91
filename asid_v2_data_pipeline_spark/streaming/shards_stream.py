"""Streaming RECORD-SHARD ingestion: the TFRecord → tf.Example funnel
(``queries/webshards.py:src_tfrecord_scan`` / ``src_tfrecord_quarantine``)
as a continuous ingest loop — the shard sibling of
``webtext_stream``.

Training shards arrive continuously (a producer drops TFRecord files
into object storage); each micro-batch is decoded (masked-CRC32C
framing → protobuf tf.Example,
``operators/multimodal.extract_tfrecord_examples_admitting``), gated
on text length, deduplicated (a) against the persisted
text-fingerprint index and (b) within itself, and admitted examples
land in the corpus sink while their fingerprints extend the index.  A
corrupt shard becomes QUARANTINE rows (media_id + error class), never
a stuck stream: at 100 TB shard scale a flipped bit is a statistical
certainty and a streaming query restart-loops on a poison message
forever.

Spark shapes (per micro-batch, via ``foreachBatch``):
- decode: zero-shuffle Arrow ``mapInPandas`` over the payloads;
- vs-index: broadcast the batch's fingerprints against the index scan;
- within-batch: min (media_id, key) per fingerprint survives;
- payload bytes never shuffle — one fingerprint row per example moves.

Delivery semantics are inherited verbatim from ``dedup_stream``:
``foreachBatch`` is at-least-once, every sink is idempotent per
``batch_id`` (``_bid=<batch_id>`` overwrite partitions), and the
index read keeps STRICTLY-EARLIER partitions only — exactly-once
results on top of at-least-once execution.
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


def admit_shard_batch(
    batch: DataFrame,
    index_rows: DataFrame | None,
    min_chars: int = 1,
    max_chars: int = 1 << 20,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One ingestion step: decode → gates → dedup.  Returns
    ``(admitted_examples, their_fp_rows, quarantined)``.  Pure
    DataFrame logic (no side effects) so batch and streaming paths
    share it and tests can check it directly."""
    from ..operators.multimodal import extract_tfrecord_examples_admitting

    rows = extract_tfrecord_examples_admitting(batch)
    quarantined = rows.filter(F.col("error").isNotNull()).select(
        "media_id", "error"
    )
    gated = (
        rows.filter(F.col("error").isNull())
        .filter(F.length("txt").between(min_chars, max_chars))
        .select(
            "media_id",
            "key",
            "sno",
            "txt",
            F.length("txt").alias("n_chars"),
            tx.char_poly_hash(F.col("txt")).alias("fp"),
        )
    )
    # vs-index + within-batch dedup: the shared harness tail
    admitted = dedup_by_fingerprint(gated, index_rows, keys=("media_id", "key"))
    return admitted, admitted.select("fp", "media_id"), quarantined


def process_shard_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    **gates,
) -> None:
    """The idempotent micro-batch step: admit vs strictly-earlier
    index partitions + within batch, then overwrite this batch's
    ``_bid`` partitions in all three sinks.  Running it twice with
    the same ``batch_id`` yields identical persisted state."""
    process_admission_batch(
        batch,
        batch_id,
        lambda b, idx: admit_shard_batch(b, idx, **gates),
        corpus_dir,
        index_dir,
        quarantine_dir,
    )


def shard_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    **gates,
):
    """Run the streaming shard-ingestion loop (``availableNow``
    drain) over a parquet directory of ``(media_id long, payload
    binary)`` rows.  Returns the StreamingQuery."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        process_shard_batch(
            batch, batch_id, corpus_dir, index_dir, quarantine_dir,
            **gates,
        )

    return admission_stream(
        spark, input_dir, _step, checkpoint_dir, max_files_per_trigger
    )
