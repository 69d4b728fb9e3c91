"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries``/``oracle_sql``
declare every implemented operator from SURVEY.md §2 (+ the §2.11
large-scale operators) with DuckDB-checkable oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from asid_v2_data_pipeline_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The end-to-end curation pipeline: quality filter → exact dedup →
    MinHash near-dup dedup → benchmark decontamination → per-source
    quota → language mixture, one DataFrame plan (oracle-checked as
    ``cur_pipeline``)."""
    from asid_v2_data_pipeline_spark.queries.curation import cur_pipeline

    return cur_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    return all_oracles()
