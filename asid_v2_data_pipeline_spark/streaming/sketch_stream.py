"""Continuously-maintained Count-Min Sketch over a stream.

A CMS is an ADDITIVE aggregate over a bounded (depth×width) key space,
so streaming maintenance is exactly the rollup discipline: each
micro-batch is sketched (one bounded groupBy) and the delta folds into
the persisted sketch table through ``merge_aggregate`` — touched-bucket
IO only, batch-id stamped, so foreachBatch replays are no-ops and the
table state is exactly-once.  Query the live sketch any time with
``read_aggregate`` + ``operators.sketches.cms_estimate``: heavy-hitter
frequencies over an unbounded stream in O(depth·width) state, no raw
event retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import cms_build, hll_registers_by
from .rollup import maintain_rollup


def maintain_cms(
    events: DataFrame,
    target_dir: str,
    hash_col: str,
    checkpoint_dir: str,
    width: int = 1024,
    depth: int = 4,
    n_buckets: int = 16,
    trigger_once: bool = True,
):
    """Start (and return) the sketch-maintenance query over a streaming
    DataFrame carrying ``hash_col`` (one row per item occurrence)."""
    return maintain_rollup(
        events,
        target_dir,
        lambda b: cms_build(b, hash_col, width, depth),
        key_cols=["_d", "_bucket"],
        sum_cols=["cnt"],
        checkpoint_dir=checkpoint_dir,
        n_buckets=n_buckets,
        trigger_once=trigger_once,
    )


def maintain_hll(
    events: DataFrame,
    target_dir: str,
    group_cols: list[str],
    hash_col: str,
    checkpoint_dir: str,
    p: int = 6,
    trigger_once: bool = True,
):
    """Continuously-maintained grouped HLL (e.g. distinct users per
    event type over an unbounded stream).

    HLL merges by register-wise MAX, not addition, so it does NOT need
    the rollup's read-modify-write at all: each micro-batch writes its
    OWN (bounded: groups × 2^p rows) register table under a
    ``_bid=batch_id`` partition via dynamic overwrite — a replayed
    batch rewrites exactly its own partition — and the read view
    (:func:`read_hll_registers`) takes the MAX across all batch
    partitions.  Append-only state, exactly-once by construction, no
    merge job per trigger."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        regs = hll_registers_by(batch, group_cols, hash_col, p).withColumn(
            "_bid", F.lit(int(batch_id))
        )
        (
            regs.repartition(1)
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("_bid")
            .parquet(target_dir)
        )

    w = (
        events.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def read_hll_registers(
    spark: SparkSession, target_dir: str, group_cols: list[str]
) -> DataFrame:
    """The live merged register table: MAX per (group, register) across
    all batch partitions — feed to ``hll_estimate_by``."""
    spark.catalog.refreshByPath(target_dir)
    return (
        spark.read.parquet(target_dir)
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rank").alias("_rank"))
    )
