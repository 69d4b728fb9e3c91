"""Skew mitigation utilities for hot keys at 100 TB.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two patterns AQE can't:

- **two-phase salted aggregation**: a groupBy whose key distribution is
  pathological (one scene holds half the pixels).  Phase 1 aggregates on
  ``(key, salt)`` — partial results spread over ``salt_buckets``
  partitions; phase 2 merges the partials.  Works for any algebraic
  aggregate (sum/count/min/max; avg = sum+count).
- **salted broadcast-side replication join**: a skewed fact joined to a
  dimension too big to broadcast — the fact side salts, the dim side
  explodes every row across all salts, restoring join correctness with
  ``salt_buckets``-way spread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase sum/count per key, immune to single-key skew."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{c}") for c in value_cols],
        F.count(F.lit(1)).alias("_n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in value_cols],
        F.sum("_n").alias("n"),
    )


def replicated_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skewed fact ⋈ dim on ``key``: fact rows get a random salt, dim rows
    are replicated across every salt — the shuffle spreads a hot key over
    ``salt_buckets`` partitions."""
    f_s = fact.withColumn("_salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    d_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return f_s.join(d_s, [key, "_salt"]).drop("_salt")
