"""Sequence packing — fill fixed-capacity training bins with documents
(SURVEY.md §2.11 adjunct; the step between curation and batch assembly
in an LLM data pipeline).

Semantics: within each group (shard), documents in ascending id order
are packed first-fit-contiguous — a new bin starts when adding the next
document would exceed ``capacity`` tokens (a document longer than the
capacity gets a bin of its own).  Deterministic given (group, id).

Spark shape: packing is inherently sequential, so it runs per group via
``applyInPandas`` (Arrow-batched — the 4th and only new Python crossing
in the engine, justified because a running-fill reset cannot be
expressed as a window/cumsum: the reset value depends on its own
history).  This mirrors production practice: real pipelines pack per
shard, not globally, precisely so shards parallelize.  One hash
exchange on the group key; group size is bounded by the shard, not the
corpus.  The DuckDB oracle replays the same recurrence as a recursive
CTE (tests/test_oracle_parity.py: ``tx_packing``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    group_col: str,
    id_col: str,
    ntok_col: str,
    capacity: int,
) -> DataFrame:
    """Adds ``bin_id`` (0-based per group) to ``(group, id, ntok)`` rows
    by the first-fit-contiguous recurrence above."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.col(ntok_col).cast("long").alias("_n"),
    )

    def _pack(pdf):
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for n in pdf["_n"]:
            if fill > 0 and fill + n > capacity:
                b += 1
                fill = 0
            fill += int(n)
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf

    g_type = base.schema["_g"].dataType.simpleString()
    id_type = base.schema["_id"].dataType.simpleString()
    out = base.groupBy("_g").applyInPandas(
        _pack, f"_g {g_type}, _id {id_type}, _n long, bin_id long"
    )
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_id").alias(id_col),
        F.col("_n").alias(ntok_col),
        F.col("bin_id").cast("int").alias("bin_id"),
    )


def pack_recurrence_sql(
    src_cte: str, group_col: str, id_col: str, ntok_col: str, capacity: int
) -> str:
    """The identical recurrence as a DuckDB recursive CTE (oracle twin).
    ``src_cte`` must define rows ``({group_col}, {id_col}, {ntok_col})``."""
    return f"""
WITH RECURSIVE src AS ({src_cte}),
t AS (
  SELECT {group_col} AS g, {id_col} AS id, {ntok_col} AS n,
         row_number() OVER (PARTITION BY {group_col} ORDER BY {id_col}) AS rn
  FROM src
),
p AS (
  SELECT g, id, n, rn, 0 AS bin_id, n AS fill FROM t WHERE rn = 1
  UNION ALL
  SELECT t.g, t.id, t.n, t.rn,
         CASE WHEN p.fill > 0 AND p.fill + t.n > {capacity}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill > 0 AND p.fill + t.n > {capacity}
              THEN t.n ELSE p.fill + t.n END
  FROM t JOIN p ON t.g = p.g AND t.rn = p.rn + 1
)
SELECT g AS {group_col}, id AS {id_col}, n AS {ntok_col}, CAST(bin_id AS INT) AS bin_id
FROM p
"""
