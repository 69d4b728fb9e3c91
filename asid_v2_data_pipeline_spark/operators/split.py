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


# Two LCG rounds mod 2^31 (glibc constants).  Max intermediate is
# (2^31-1)*1103515245 < 2^62 — no 64-bit overflow in Spark OR DuckDB, so
# the identical arithmetic runs in both engines (seeded rand() does not:
# it is engine- and partitioning-specific).
SHUFFLE_A = 1103515245
SHUFFLE_C = 12345
SHUFFLE_M = 1 << 31


def shuffle_hash(key, seed: int):
    """Portable keyed shuffle hash: deterministic permutation key for a
    non-negative integer id, reproducible in ANSI SQL —
    ``h = lcg(lcg(id + seed))`` with ``lcg(x) = (x*A + C) mod 2^31``.

    The reference only requires *a* deterministic permutation of the id
    list (utility.py:172-175, random.seed + random.shuffle), not
    Mersenne-Twister specifically."""
    h1 = (key % SHUFFLE_M + F.lit(seed)) % SHUFFLE_M
    h1 = (h1 * SHUFFLE_A + SHUFFLE_C) % SHUFFLE_M
    return (h1 * SHUFFLE_A + SHUFFLE_C) % SHUFFLE_M


def shuffle_hash_sql(key_expr: str, seed: int) -> str:
    """The same permutation key as ANSI/DuckDB SQL text (oracle side)."""
    h1 = f"(({key_expr}) % {SHUFFLE_M} + {seed}) % {SHUFFLE_M}"
    h1 = f"(({h1}) * {SHUFFLE_A} + {SHUFFLE_C}) % {SHUFFLE_M}"
    return f"(({h1}) * {SHUFFLE_A} + {SHUFFLE_C}) % {SHUFFLE_M}"


def shuffled(df: DataFrame, seed: int, id_col: str | None = None) -> DataFrame:
    """O2 — deterministic shuffle; re-invoke with a new seed for epoch-end
    reshuffle (data_generator.py:43-47).

    With ``id_col``: order by the portable ``shuffle_hash`` of the id —
    engine-independent, so the DuckDB oracle reproduces it exactly.
    Without: order by ``xxhash64(all columns, seed)`` — still fully
    deterministic (unlike ``rand(seed)``, whose output depends on the
    partition layout), just not oracle-portable."""
    if id_col is not None:
        return df.orderBy(
            shuffle_hash(F.col(id_col).cast("long"), seed), id_col, *df.columns
        )
    return df.orderBy(F.xxhash64(*df.columns, F.lit(seed)), *df.columns)


def fraction_split(
    df: DataFrame, fraction: float, seed: int, id_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """O3 — exact-count head/tail split after a seeded shuffle:
    first ``floor(n * fraction)`` rows train, rest validation
    (utility.py:174-175).  row_number over the shuffled order keeps it
    deterministic and exact (vs. randomSplit's probabilistic split)."""
    n = df.count()
    k = int(n * fraction)
    if id_col is not None:
        w = Window.orderBy(
            shuffle_hash(F.col(id_col).cast("long"), seed), id_col, *df.columns
        )
    else:
        w = Window.orderBy(F.xxhash64(*df.columns, F.lit(seed)), *df.columns)
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
