"""Watermarked stream-stream joins (§2.11 streaming tier).

The batch engine answers click→purchase attribution with an as-of join
(`operators/asof.py`); the streaming twin is Spark's watermarked
stream-stream inner join: both sides buffer in state, the equi-key plus a
*time-range* predicate lets the engine evict state once the watermark
passes the range bound — without the range bound the state grows forever,
which is the streaming analogue of the unpartitioned-window scale bug.

Scale shape: state is partitioned by the join key (user), each micro-batch
shuffles only its own rows, and state size is bounded by
``rows_per_user_per(max_delay + watermark_delay)`` — independent of stream
length.

Two contract points the tests pin (`tests/test_stream_join.py`):

- The global watermark is the **minimum** across all watermarked inputs
  (``multipleWatermarkPolicy=min``): a stream that stops advancing pins
  the watermark and state grows until it resumes — monitor per-source lag.
- Watermark completeness is a *guarantee floor*, not an input filter:
  late rows arriving in the same micro-batch still join; the
  deterministic effect is state **eviction** at batch boundaries — an
  evicted row can never be matched by later batches (where the batch
  join over the same files would match it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Join each purchase to every click by the same user in the
    ``max_delay`` window before it (streaming or batch input — the same
    expression works for both, so the batch form is oracle-checkable).

    Output: one row per (click, purchase) pair with the delay in seconds.
    For "latest click only" semantics, follow with the batch as-of join on
    the micro-batch output — stream-stream joins cannot rank within the
    join itself (state would need cross-row ordering).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark_delay)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark_delay)
    joined = p.join(
        c,
        F.expr(
            "c_user = p_user AND click_ts <= purchase_ts "
            f"AND click_ts >= purchase_ts - interval {max_delay}"
        ),
    )
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "click_id",
        "value",
        (
            F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
        ).alias("us_delay"),
    )
