"""Structured Streaming surface (SURVEY.md §2.10 T1/T2 + §7 phase 4).

The reference's only stream is incremental `.nc` file arrival guarded by a
JSON ledger (/root/reference/asip_v2/archive.py:180-203).  Here:

- ``incremental_file_stream``: Structured Streaming file source — the
  checkpoint *is* the ledger (exactly-once file tracking, resumable), with
  ``maxFilesPerTrigger`` as the per-scene micro-batch (T2).
- ``windowed_event_aggs``: watermark + tumbling/sliding window aggregation
  over an event stream — the Spark-idiomatic capability layer the north
  star asks for; also exposed as batch functions (window() works in both)
  so the DuckDB oracle can check the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_file_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """T1 — the ledger-guarded incremental scan as a streaming source.

    The checkpoint directory replaces processed_files.json: already-seen
    files are never re-served, restarts resume — the same at-least-once
    resumable contract, distributed."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )


def write_stream_to_parquet(
    df: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = True
):
    """T1 sink — parquet append with checkpoint (the ledger commit S4)."""
    w = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def tumbling_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregation (batch or streaming input).

    Batch form is oracle-checkable (DuckDB time_bucket); streaming form
    adds the watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", "2 hours")
    return (
        src.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_avg(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time window (each event lands in window/slide panes)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", "2 hours")
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.avg("value").alias("avg_value"), F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "avg_value", "n_events")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (session_window — native stateful op)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", "2 hours")
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_at_ingest(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact-key deduplication at the ingest boundary — the streaming twin
    of ``operators/dedup.py::exact_dedup`` for *identity* keys (redelivered
    events, at-least-once upstream producers).

    Uses ``dropDuplicatesWithinWatermark``: state holds one entry per key
    only until the watermark passes its event time + delay, so state size
    is bounded by the key arrival rate × the watermark horizon —
    unbounded-state ``dropDuplicates`` on a stream is the scale bug this
    avoids.  A duplicate arriving later than ``watermark_delay`` after the
    original is re-admitted (the documented trade: bounded state buys a
    bounded dedup horizon; content-level history dedup is
    ``streaming/dedup_stream.py``'s index).

    Batch input degrades to plain ``dropDuplicates`` (same key semantics,
    no horizon), so the same call works in both contexts."""
    keys = key_cols or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)
