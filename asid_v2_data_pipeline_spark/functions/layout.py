"""Data-layout functions — multi-dimensional file clustering at 100 TB.

A table range-partitioned on ONE column prunes scans on that column only;
queries filtering on a second dimension read everything.  Z-ordering
(bit-interleaving the dimensions into one sort key) keeps rows close in
EVERY interleaved dimension close in the sort order, so min/max file
statistics prune scans on any of them — the same layout trick behind
Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order transforms,
expressed here as plain column arithmetic + ``repartitionByRange``.

The key is built with shifts/masks inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each non-negative integral column
    into one Z-curve (Morton) key.

    Bit ``b`` of input ``i`` lands at output position ``b * n + i`` —
    for two 16-bit inputs a 32-bit key, monotone in the Z-curve.  Values
    are masked to ``bits`` first: callers bucket/offset real data into
    ``[0, 2^bits)`` (e.g. ``floor(x / cell)``) — range overflow would
    silently alias distant cells.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long key")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            # (v >> b & 1) << (b*n + i)
            key = key + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as engine-portable SQL text (oracle)."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        v = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) << {b * n + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write parquet clustered by the Z-curve of ``zorder_cols``:
    ``repartitionByRange`` on the key gives each output file a tight
    key range (= a tight hyper-rectangle in the original dimensions), and
    ``sortWithinPartitions`` tightens per-rowgroup min/max stats — so a
    filter on ANY z-ordered column prunes files via parquet statistics.

    The range partitioner samples the key distribution, handling skew
    (dense regions get more files).  One shuffle — the price of the
    layout, paid once at write time.
    """
    keyed = df.withColumn(
        "_zkey", zorder_key([F.col(c) for c in zorder_cols], bits)
    )
    parts = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files
        else keyed.repartitionByRange("_zkey")
    )
    parts.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(
        path
    )
