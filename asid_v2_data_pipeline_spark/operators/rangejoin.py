"""Banded interval joins — shuffle-partitioned range joins at 100 TB.

Spark has no native range-join optimization: ``a.start <= b.ts AND b.ts
<= a.end`` with only inequality predicates plans as a
BroadcastNestedLoopJoin (or a cartesian product if neither side fits in
memory) — quadratic work and a single-threaded build at scale.

The standard distributed fix is *banding*: quantize time into buckets of
width ``w``; an interval ``[s, e]`` is replicated into every bucket it
overlaps (``floor(s/w) .. floor(e/w)``) while a point ``t`` lands in
exactly one (``floor(t/w)``); an equi-join on ``(keys…, bucket)`` then
finds every possible match, and the exact range predicate filters the
band false-positives.  Replication factor is ``max_len/w + 1`` on the
interval side only — bounded and user-chosen; the join itself is an
ordinary shuffled hash/sort-merge join that AQE can skew-split.

Because a point belongs to exactly one bucket, no post-join dedup is
needed: each (interval, point) match is produced exactly once.

Flink's interval join and Databricks' range-join *hint* implement the
same binning strategy; here it is a plain DataFrame composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them (inclusive both
    ends), equi-keyed on ``keys`` and banded on ``bucket_width``.

    ``start_col``/``end_col``/``ts_col`` must be integral (e.g. epoch
    micros); ``bucket_width`` in the same unit, chosen so typical
    intervals span few buckets (fan-out = ``len/width + 1``).  Column
    names shared by both inputs (beyond ``keys``) must be disambiguated
    by the caller first.  ``how='inner'`` keeps matched pairs;
    ``'left'`` keeps interval rows with no point (NULL point columns).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive (got {bucket_width})")
    overlap = set(intervals.columns) & set(points.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    w = F.lit(bucket_width).cast("long")
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(ts_col) / w))
    pred = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    if how == "inner":
        return iv.join(pt, [*keys, "_bucket"], "inner").filter(pred).drop(
            "_bucket"
        )
    if how == "left":
        # left band-join would duplicate unmatched interval replicas;
        # instead: inner matches + anti-joined leftovers
        matched = iv.join(pt, [*keys, "_bucket"], "inner").filter(pred).drop(
            "_bucket"
        )
        iv_ids = intervals.columns
        leftovers = intervals.join(
            matched.select(*iv_ids).distinct(), iv_ids, "left_anti"
        )
        pt_types = {f.name: f.dataType for f in points.schema.fields}
        for c in points.columns:
            if c not in keys:
                leftovers = leftovers.withColumn(
                    c, F.lit(None).cast(pt_types[c])
                )
        return matched.unionByName(leftovers)
    raise ValueError(f"how must be 'inner' or 'left' (got {how!r})")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """All pairs of intervals that OVERLAP (``ls <= re AND rs <= le``,
    inclusive), equi-keyed on ``keys``, via the same banding.

    Both sides replicate across their buckets, so a pair sharing several
    buckets would match repeatedly; the standard dedup-free trick keeps a
    pair only in the FIRST bucket of the overlap region,
    ``floor(max(ls, rs) / w)`` — every surviving pair is emitted exactly
    once, no ``distinct()`` shuffle.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive (got {bucket_width})")
    overlap_cols = set(left.columns) & set(right.columns) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap_cols)}; "
            "rename before joining"
        )
    w = F.lit(bucket_width).cast("long")

    def banded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
            ),
        )

    pred = (
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.col("_bucket")
            == F.floor(F.greatest(F.col(left_start), F.col(right_start)) / w)
        )
    )
    return (
        banded(left, left_start, left_end)
        .join(banded(right, right_start, right_end), [*keys, "_bucket"])
        .filter(pred)
        .drop("_bucket")
    )
