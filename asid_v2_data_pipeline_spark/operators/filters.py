"""Scene/file-level predicates (SURVEY.md §2.2).

Pure filters — Catalyst pushes them into the Parquet scan, so they cost
nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.strings import day_of_year_0based


def health_predicate(window_sar: int) -> Column:
    """F2 — file-health check (check_file_healthiness,
    /root/reference/asip_v2/archive.py:205-221; pinned
    tests/test_archive.py:234-282).

    Requires: icechart present ∧ first AMSR2 label present ∧ unmasked
    extent ≥ window, where the effective left bound is
    ``max(rm_swath, aoi_upperleft_sample)`` (F8, archive.py:215).
    """
    lowerbound = F.greatest(F.col("rm_swath"), F.col("aoi_ul_sample"))
    return (
        F.col("has_icechart")
        & F.col("has_amsr2")
        & ((F.col("aoi_lr_sample") - lowerbound) >= window_sar)
        & ((F.col("aoi_lr_line") - F.col("aoi_ul_line")) >= window_sar)
    )


def healthy_scenes(scenes: DataFrame, window_sar: int) -> DataFrame:
    return scenes.filter(health_predicate(window_sar))


def day_of_year_filter(ts: Column, begin: int, end: int) -> Column:
    """F6 — keep timestamps whose 0-based day-of-year ∈ [begin, end]
    (train_model.py:69-81; the reference's ``(ts - Jan1).days`` is
    dayofyear - 1 — off-by-one pinned)."""
    d = day_of_year_0based(ts)
    return (d >= begin) & (d <= end)


def filename_prefix(df: DataFrame, col: str, prefix: Column | str) -> DataFrame:
    """F7 — scene grouping by filename prefix (apply_model.py:30-42)."""
    p = F.lit(prefix) if isinstance(prefix, str) else prefix
    return df.filter(F.col(col).startswith(p))
