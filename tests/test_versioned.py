"""Manifest-versioned parquet tables: snapshot isolation, time travel,
crash safety, compaction without a rename window, rollback, vacuum."""

import json
import os

import pytest

from asid_v2_data_pipeline_spark.sources import versioned as V


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_append_overwrite_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    a = spark.range(0, 3).selectExpr("id", "id * 10 AS x")
    b = spark.range(3, 5).selectExpr("id", "id * 10 AS x")
    v0 = V.commit_version(a, p)
    v1 = V.commit_version(b, p, mode="append")
    assert (v0, v1) == (0, 1)
    assert _rows(V.read_version(spark, p, 0)) == _rows(a)
    assert _rows(V.read_version(spark, p, 1)) == _rows(a.unionAll(b))
    c = spark.range(100, 102).selectExpr("id", "id AS x")
    v2 = V.commit_version(c, p, mode="overwrite")
    assert _rows(V.read_latest(spark, p)) == _rows(c)
    assert _rows(V.read_version(spark, p, 1)) == _rows(a.unionAll(b))
    assert v2 == 2


def test_crashed_commit_is_invisible(spark, tmp_path):
    """Data + manifest written but pointer NOT swapped (crash before the
    replace): readers still see the old version; the next commit of the
    same number absorbs the orphan."""
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    # simulate the crash: do everything commit_version does except swap
    orphan = spark.range(900, 999)
    vdir = os.path.join(p, "data", "v1")
    orphan.write.mode("overwrite").parquet(vdir)
    with open(os.path.join(p, "_versions", "v1.json"), "w") as f:
        json.dump({"version": 1, "mode": "append",
                   "files": V._list_parquet(vdir),
                   "schema": orphan.schema.json()}, f)
    assert V.latest_version(p) == 0
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 3))
    # next commit reuses version number 1 and overwrites the orphan
    v = V.commit_version(spark.range(3, 5), p, mode="append")
    assert v == 1
    got = _rows(V.read_latest(spark, p))
    assert got == _rows(spark.range(0, 5))


def test_compact_no_window_and_old_reader_survives(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        V.commit_version(spark.range(i * 10, i * 10 + 5), p, mode="append")
    before = V.read_latest(spark, p)
    n_files_before = len(V.read_manifest(p, 3)["files"])
    assert n_files_before > 1
    v = V.compact_version(spark, p, target_files=1)
    assert len(V.read_manifest(p, v)["files"]) == 1
    assert _rows(V.read_latest(spark, p)) == _rows(before)
    # a reader pinned to version 3 still reads its exact files
    assert _rows(V.read_version(spark, p, 3)) == _rows(before)


def test_rollback_is_linear_history(spark, tmp_path):
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 3), p)
    V.commit_version(spark.range(0, 99), p, mode="overwrite")  # bad load
    v = V.rollback(p, 0)
    assert v == 2
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 3))
    # the bad version remains inspectable
    assert V.read_version(spark, p, 1).count() == 99
    with pytest.raises(ValueError):
        V.rollback(p, 99)


def test_vacuum_keeps_retained_files_only(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        V.commit_version(
            spark.range(i, i + 1), p,
            mode="overwrite" if i == 2 else "append",
        )
    deleted = V.vacuum(p, keep=2)
    # versions 2 and 3 retained: v0/v1-only files are gone
    assert deleted and all("/data/v0/" in d or "/data/v1/" in d for d in deleted)
    assert V.read_version(spark, p, 3).count() == 2  # v2 overwrote, v3 appended
    assert _rows(V.read_latest(spark, p)) == [(2,), (3,)]
    with pytest.raises(FileNotFoundError):
        V.read_manifest(p, 0)


def test_batch_id_idempotent_replay(spark, tmp_path):
    p = str(tmp_path / "t")
    v0 = V.commit_version(spark.range(0, 3), p, batch_id=0)
    v1 = V.commit_version(spark.range(3, 5), p, mode="append", batch_id=1)
    # at-least-once: the stream restarts and re-offers batch 1
    v1b = V.commit_version(spark.range(3, 5), p, mode="append", batch_id=1)
    assert (v0, v1, v1b) == (0, 1, 1)
    assert V.read_latest(spark, p).count() == 5  # not 7
    # a NEW batch advances normally
    v2 = V.commit_version(spark.range(5, 6), p, mode="append", batch_id=2)
    assert v2 == 2 and V.read_latest(spark, p).count() == 6


def test_streaming_sink_commits_micro_batches(spark, tmp_path):
    p = str(tmp_path / "t")
    src = str(tmp_path / "src")
    spark.range(0, 4).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(V.streaming_sink(p))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert V.latest_version(p) is not None
    assert _rows(V.read_latest(spark, p)) == _rows(spark.range(0, 4))


def test_diff_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    V.commit_version(spark.range(0, 4), p)
    V.commit_version(spark.range(2, 6), p, mode="overwrite")
    added, removed = V.diff_versions(spark, p, 0, 1)
    assert _rows(added) == [(4,), (5,)]
    assert _rows(removed) == [(0,), (1,)]
