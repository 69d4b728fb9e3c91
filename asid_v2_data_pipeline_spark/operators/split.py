"""Shuffle / split / batching operators (SURVEY.md §2.7 O2-O4, §2.8 B1).

The reference shuffles an id list and slices it ``[:int(n*p)]``
(/root/reference/asip_v2/utility.py:167-179, pinned
tests/test_utility.py:108-116) — an *exact-count* split, unlike Spark's
probabilistic ``randomSplit``.  We provide the deterministic analogue so
oracle hashes are stable, plus drop-last batch numbering
(data_generator.py:20-22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shuffled(df: DataFrame, seed: int) -> DataFrame:
    """O2 — deterministic shuffle: order by rand(seed).  Re-invoke with a
    new seed for epoch-end reshuffle (data_generator.py:43-47)."""
    return df.orderBy(F.rand(seed), *df.columns)


def fraction_split(
    df: DataFrame, fraction: float, seed: int
) -> tuple[DataFrame, DataFrame]:
    """O3 — exact-count head/tail split after a seeded shuffle:
    first ``floor(n * fraction)`` rows train, rest validation
    (utility.py:174-175).  row_number over the shuffled order keeps it
    deterministic and exact (vs. randomSplit's probabilistic split)."""
    n = df.count()
    k = int(n * fraction)
    w = Window.orderBy(F.rand(seed), *df.columns)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    train = ranked.filter(F.col("_rn") <= k).drop("_rn")
    val = ranked.filter(F.col("_rn") > k).drop("_rn")
    return train, val


def drop_last_batches(df: DataFrame, batch_size: int, order_cols: list[str]) -> DataFrame:
    """O4/B1 — keep only full batches (``floor(n/bs)`` of them; remainder
    rows never served — data_generator.py:20-22) and tag each row with its
    batch index."""
    w = Window.orderBy(*order_cols)
    ranked = df.withColumn("_rn", F.row_number().over(w) - 1)
    n = df.count()
    keep = (n // batch_size) * batch_size
    return (
        ranked.filter(F.col("_rn") < keep)
        .withColumn("batch_id", (F.col("_rn") / batch_size).cast("int"))
        .drop("_rn")
    )
