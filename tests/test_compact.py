"""Small-file compaction: fewer files, identical rows, no-op thresholds
(sources/compact.py)."""

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.sources.compact import (
    compact_parquet_dir,
    file_stats,
)


def _rows(spark, path):
    return sorted(r["id"] for r in spark.read.parquet(path).collect())


def test_compacts_many_appends_to_one_file(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(6):  # six micro-batch style appends -> >= 6 files
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    before = _rows(spark, path)
    stats = compact_parquet_dir(spark, path)
    assert stats["files_before"] >= 6
    assert stats["files_after"] == 1  # tiny table -> one target file
    assert _rows(spark, path) == before  # content byte-identical set


def test_swap_leaves_no_auxiliary_dirs(spark, tmp_path):
    """The three-step swap (live -> ._compact_old, staging -> live,
    delete old) must clean up after itself, including a stale
    ._compact_old left by a previous crash."""
    import os

    path = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(path)
    # simulate debris from a crashed earlier run
    stale = path + "._compact_old"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("x")
    before = _rows(spark, path)
    stats = compact_parquet_dir(spark, path)
    assert stats["files_after"] == 1
    assert _rows(spark, path) == before
    assert not os.path.exists(stale)
    assert not os.path.exists(path + "._compact_tmp")


def test_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.parquet(path)
    stats = compact_parquet_dir(spark, path)
    assert stats == {"files_before": 1, "files_after": 1}


def test_file_stats_rows_sum(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(50).repartition(5).write.parquet(path)
    fs = file_stats(spark, path)
    assert fs.agg(F.sum("rows")).collect()[0][0] == 50
    assert fs.count() == 5


def test_auto_restores_after_mid_swap_crash(spark, tmp_path):
    """A crash between rename(live -> ._compact_old) and rename(staging
    -> live) leaves the table path missing; the next run must restore
    the aside dir before compacting (sources/compact.py recovery)."""
    import os

    path = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before = _rows(spark, path)
    # simulate the mid-swap crash: live dir moved aside, no staging left
    os.rename(path, path + "._compact_old")
    assert not os.path.exists(path)
    stats = compact_parquet_dir(spark, path)
    assert stats["files_after"] == 1
    assert _rows(spark, path) == before
    assert not os.path.exists(path + "._compact_old")
