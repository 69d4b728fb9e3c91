"""Shared streaming-admission harness (VERDICT r10 task 6).

``media_stream`` (audio), ``webtext_stream`` (WARC) and
``shards_stream`` (TFRecord) grew near-identical foreachBatch loops:
decode → gates → fingerprint-dedup (vs the persisted index, then
within batch) → admit/quarantine sinks, idempotent per ``batch_id``.
This module is that skeleton, extracted so the next format family is
configuration (an ``admit_fn``) rather than a copied loop.

Delivery semantics (shared by every family, originally proven in
``dedup_stream``): ``foreachBatch`` is at-least-once; every sink is
idempotent per ``batch_id`` (``_bid=<batch_id>`` partitions written
with overwrite); the index read keeps STRICTLY-EARLIER partitions
only, so a replayed batch sees exactly the history it saw the first
time — exactly-once results on top of at-least-once execution.

Scale shapes (shared): the decode is a zero-shuffle Arrow
``mapInPandas`` inside the family's ``admit_fn``; the vs-index dedup
broadcasts the BATCH's fingerprints against the index scan (at 100 TB
the index is bucketed by ``fp`` so the scan prunes); payload bytes
never shuffle — one fingerprint row per object moves.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_stream import _read_index


def dedup_by_fingerprint(
    gated: DataFrame,
    index_rows: DataFrame | None,
    keys: tuple[str, ...] = ("media_id",),
) -> DataFrame:
    """The shared dedup tail of every admission funnel: drop rows
    whose ``fp`` is already in the persisted index (anti-join against
    the broadcast distinct-fp set), then keep the min-``keys`` row
    per fingerprint within the batch."""
    if index_rows is not None:
        gated = gated.join(
            F.broadcast(index_rows.select("fp").distinct()),
            "fp",
            "left_anti",
        )
    if len(keys) == 1:
        survivors = gated.groupBy("fp").agg(
            F.min(keys[0]).alias(keys[0])
        )
    else:
        survivors = gated.groupBy("fp").agg(
            F.min(F.struct(*keys)).alias("_w")
        )
        survivors = survivors.select(
            "fp", *[F.col(f"_w.{k}").alias(k) for k in keys]
        )
    return gated.join(survivors, ["fp", *keys])


def process_admission_batch(
    batch: DataFrame,
    batch_id: int,
    admit_fn: Callable,
    corpus_dir: str,
    index_dir: str,
    quarantine_dir: str | None = None,
) -> None:
    """One idempotent micro-batch: read strictly-earlier index
    partitions, run ``admit_fn(batch, index_rows)`` → ``(admitted,
    fp_rows[, quarantined])``, overwrite this batch's ``_bid``
    partitions in every sink.  Running it twice with the same
    ``batch_id`` yields identical persisted state."""
    sp = batch.sparkSession
    index_rows = _read_index(sp, index_dir)
    if index_rows is not None:
        index_rows = index_rows.filter(F.col("_bid") < F.lit(batch_id))
    res = admit_fn(batch, index_rows)
    admitted, fp_rows = res[0], res[1]
    quarantined = res[2] if len(res) > 2 else None
    admitted.persist()
    try:
        admitted.write.mode("overwrite").parquet(
            f"{corpus_dir}/_bid={batch_id}"
        )
        fp_rows.write.mode("overwrite").parquet(
            f"{index_dir}/_bid={batch_id}"
        )
        if quarantine_dir is not None:
            if quarantined is None:
                raise ValueError(
                    "admission: quarantine_dir given but admit_fn "
                    "returned no quarantine frame"
                )
            quarantined.write.mode("overwrite").parquet(
                f"{quarantine_dir}/_bid={batch_id}"
            )
    finally:
        admitted.unpersist()


def admission_stream(
    spark: SparkSession,
    input_dir: str,
    step: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    schema: str = "media_id long, payload binary",
):
    """The shared stream driver: ``availableNow`` drain of a parquet
    directory through ``foreachBatch(step)``.  Returns the
    StreamingQuery."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
