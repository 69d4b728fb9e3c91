"""Corpus statistics operators (SURVEY.md §2.11 adjunct).

Exact, engine-portable summary statistics for corpus curation reports:
nearest-rank quantiles per stratum and heavy-hitter (top-k frequency)
counts.  Everything is integer/rank arithmetic — no interpolated
percentiles whose float rounding differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_quantiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[int, int]],
    tie_col: str,
) -> DataFrame:
    """Nearest-rank quantiles per group: for q = num/den, the value at
    rank ``ceil(q·n)`` of the group ordered by ``(value, tie_col)``.

    ``quantiles`` are exact fractions (e.g. ``[(1,2), (9,10), (99,100)]``
    for p50/p90/p99): the selected rank is ``(num·n + den − 1) div den``
    — pure integer arithmetic, so any engine picks the same row (no
    float-interpolation divergence).  Output: one row per group with a
    ``p{num}_{den}`` column per quantile.

    Scale: one hash exchange on the group key; the within-group
    row_number sort is the honest cost of an EXACT quantile.  At 100 TB
    prefer ``percentile_approx`` (t-digest, map-side combinable, no
    sort) for dashboards and keep this for audited reports.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, tie_col)
    cw = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cw).alias("_n"),
    )
    aggs = []
    for num, den in quantiles:
        rank = F.expr(f"({num} * _n + {den} - 1) div {den}")
        aggs.append(
            F.max(F.when(F.col("_rn") == rank, F.col("_v"))).alias(
                f"p{num}_{den}"
            )
        )
    return ranked.groupBy(group_col).agg(*aggs)


def group_quantiles_sql(
    group_col: str,
    value_expr: str,
    quantiles: list[tuple[int, int]],
    tie_col: str,
    src: str = "documents",
) -> str:
    """Oracle twin: identical rank arithmetic in SQL."""
    cols = ", ".join(
        f"MAX(CASE WHEN _rn = ({num} * _n + {den} - 1) // {den} "
        f"THEN _v END) AS p{num}_{den}"
        for num, den in quantiles
    )
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_expr} AS _v,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {value_expr}, {tie_col}) AS _rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS _n
  FROM {src}
)
SELECT {group_col}, {cols}
FROM ranked GROUP BY {group_col}
"""


def group_quantiles_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate per-group quantiles via ``percentile_approx``
    (Greenwald-Khanna sketch): map-side combinable, NO within-group sort —
    the 100 TB dashboard path next to ``group_quantiles_exact`` (the
    audited path; approximate ops carry no DuckDB oracle by design).

    Guarantee: the returned value's rank is within ``n/accuracy`` of the
    target rank — pinned against the exact nearest-rank answers in
    tests/test_stats_approx.py.  Output columns ``q<prob with _ for .>``.
    """
    aggs = [
        F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(
            "q" + str(p).replace(".", "_")
        )
        for p in probs
    ]
    return df.groupBy(group_col).agg(*aggs)


def distinct_count_approx(
    df: DataFrame, group_col: str, key_col: str, rsd: float = 0.05
) -> DataFrame:
    """Approximate per-group distinct counts via HyperLogLog++
    (``approx_count_distinct``): one map-side-combinable aggregate, a few
    KB of sketch per group vs the exact path's full shuffle of every
    distinct key.  ``rsd`` is the target relative standard deviation;
    observed error is pinned in tests/test_stats_approx.py.  The exact
    ``countDistinct`` stays the audited path."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_distinct")
    )


def top_k_by_count(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    """Heavy hitters: the ``k`` most frequent keys, ties broken by key
    ascending (fully deterministic output).

    Scale: ``groupBy.count`` partially aggregates map-side, so hot keys
    (by definition the interesting ones) are combined before the
    exchange — no skew blow-up; the ordered limit compiles to
    TakeOrderedAndProject (per-partition top-k, then k·partitions rows
    to one reducer), never a full sort.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), *key_cols)
        .limit(k)
    )


def quantile_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantile: tuple[int, int],
    tie_col: str,
    approx: bool = False,
) -> DataFrame:
    """Per-group quantile admission gate: keep rows whose ``value_col`` is
    at or above their group's ``num/den`` nearest-rank quantile — the
    "drop the worst X% of each domain" curation rule, with the threshold
    derived from the data instead of hand-tuned.

    Two-phase by construction: thresholds come from
    ``group_quantiles_exact`` (or ``group_quantiles_approx`` — no sort,
    for the 100 TB dashboard path) over the group key, then broadcast
    back as a plain filter — the corpus itself never sorts globally and
    never shuffles.  The ``>= threshold`` form is tie-stable: every row
    equal to the threshold is kept, so the admitted SET is independent of
    any within-tie ordering.
    """
    num, den = quantile
    if approx:
        prob = num / den
        thr = group_quantiles_approx(df, group_col, value_col, [prob]).select(
            group_col,
            F.col("q" + str(prob).replace(".", "_")).alias("_thr"),
        )
    else:
        thr = group_quantiles_exact(
            df, group_col, value_col, [quantile], tie_col
        ).select(group_col, F.col(f"p{num}_{den}").alias("_thr"))
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(F.col(value_col) >= F.col("_thr"))
        .drop("_thr")
    )
