"""Continuously-maintained rollup table: streaming events → additive
aggregate deltas → ``merge_aggregate`` into a bucketed parquet table.

The lambda-architecture replacement: instead of a nightly full
re-aggregation plus a bolt-on "speed layer", one streaming query keeps
the aggregate table current — each micro-batch is pre-aggregated to one
row per touched key (tiny), then folded into the table with
touched-bucket-only IO.  ``foreachBatch`` is at-least-once; the
``batch_id`` stamp in ``merge_aggregate`` makes re-application a no-op,
so the *table state* is exactly-once (same discipline as
``streaming/dedup_stream.py``).

Query the table with ``sources.merge.read_aggregate`` — a dashboard read
is a partition-pruned scan of a keys-sized table, never a re-scan of the
event history.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..sources.merge import merge_aggregate


def maintain_rollup(
    events: DataFrame,
    target_dir: str,
    delta_fn: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    n_buckets: int = 64,
    trigger_once: bool = True,
):
    """Start (and return) the maintenance query.

    ``delta_fn`` maps a raw micro-batch to its additive delta — one row
    per key, the same ``key_cols + sum_cols`` schema as the table (e.g.
    ``groupBy(type, hour).agg(count, sum)``).  It runs inside
    ``foreachBatch``, so it may use any batch-only operation.
    """

    def _step(batch: DataFrame, batch_id: int) -> None:
        delta = delta_fn(batch)
        merge_aggregate(
            batch.sparkSession,
            target_dir,
            delta,
            key_cols,
            sum_cols,
            n_buckets=n_buckets,
            batch_id=batch_id,
        )

    w = (
        events.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
