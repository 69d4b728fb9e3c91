"""As-of (backward) join — the canonical time-series operator Spark lacks
as a primitive (SURVEY.md §2.11 adjunct; reference has no temporal joins,
this is engine surface for the events stream).

Semantics: for each left row, attach the payload of the right row with
the greatest ``ts`` ≤ the left row's ``ts`` within the same key (DuckDB
``ASOF JOIN`` semantics, which the oracle uses directly).

Spark shape — the UNION-WINDOW plan, not a range join: tag right rows
side=0 and left rows side=1, union, then one window per key ordered by
``(ts, side)`` carrying ``last(payload, ignorenulls)`` forward.  Cost is
ONE hash exchange on the key + a per-key sort — no interval explosion,
no nested-loop: the plan a range join would need is O(|L|·|R|) per key
in the worst case, this is O((|L|+|R|) log) and AQE-splittable.  At
100 TB both sides stay partitioned on the key; skewed keys (one hot
user) split fine because the window is per-key.

Determinism: right rows are pre-deduped to one per (key, ts) (greatest
``tie_col`` wins), so equal-timestamp ties cannot produce
engine-dependent matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; adds ``asof_<c>`` columns (NULL when no right
    row qualifies).  ``direction='backward'`` matches the greatest
    right ``ts`` ≤ left ``ts``; ``'forward'`` the smallest right ``ts``
    ≥ left ``ts`` (conversion/funnel semantics).  Same union-window
    plan either way — forward just orders the window descending.
    ``tie_col`` must be in ``payload_cols``' table and makes
    equal-``ts`` matches deterministic (greatest tie for backward,
    smallest for forward)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    reserved = {"_ts", "_rp", "_side", "_lp", "_rn"}
    for side_name, df_ in (("left", left), ("right", right)):
        clash = [
            c for c in df_.columns if c in reserved or c.startswith("asof_")
        ]
        if clash:
            raise ValueError(
                f"asof join: {side_name} columns {clash} collide with the "
                f"operator's internal/output names (reserved: {sorted(reserved)}, "
                "prefix 'asof_'); rename them first"
            )
    back = direction == "backward"
    rp_fields = [tie_col] + [c for c in payload_cols if c != tie_col]
    r = right.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c) for c in rp_fields]).alias("_rp"),
    )
    tie = F.col(f"_rp.{tie_col}")
    wdd = Window.partitionBy(*key_cols, "_ts").orderBy(
        tie.desc() if back else tie.asc()
    )
    r = (
        r.withColumn("_rn", F.row_number().over(wdd))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_side", F.lit(0))
    )
    rp_type = r.schema["_rp"].dataType

    left_cols = [c for c in left.columns]
    l = left.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(None).cast(rp_type).alias("_rp"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lp"),
    )
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))

    u = l.unionByName(r.select(*l.columns))
    ts_order = F.col("_ts").asc() if back else F.col("_ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_m", F.last("_rp", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    return matched.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left_cols],
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in rp_fields],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """First right row at-or-after each left row (funnel/conversion)."""
    return asof_join_backward(
        left, right, key_cols, ts_col, payload_cols, tie_col,
        direction="forward",
    )
