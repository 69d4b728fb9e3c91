"""Small-file compaction for append-mode parquet directories.

Streaming parquet sinks (``streaming/ingest.py:write_stream_to_parquet``)
append one or more files per micro-batch; after thousands of triggers a
100 TB table becomes millions of KB-sized files and every scan pays
per-file open/footer costs — the classic small-files problem.  (The
engine's other tables don't need this: `sources/merge.py` tables rewrite
whole buckets per merge — one file per bucket by construction — and the
streaming dedup index has its own generation-based
``compact_index``.)

``compact_parquet_dir`` rewrites the directory's current file set into
``ceil(bytes / target_file_bytes)`` files via a staging directory and a
Hadoop-FS rename, so it works on any scheme (HDFS/S3A/local).  The swap
is not atomic for concurrent readers — run it in the same maintenance
window as any lakehouse OPTIMIZE; concurrent *appends* between the read
and the delete would be lost, so the caller must pause the writer (the
same single-writer contract as `sources/merge.py`).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    from .fsio import get_fs

    return get_fs(spark, path)


def file_stats(spark: SparkSession, path: str):
    """Per-file (path, size, rows) for a parquet dir — the audit view of
    layout health, computed distributedly from the ``_metadata`` hidden
    column (no driver-side listing)."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .groupBy("file", "bytes")
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path``'s parquet files into ~``target_file_bytes`` files.

    Returns ``{"files_before": b, "files_after": a}``; a no-op (and no
    write at all) when the directory already has fewer than ``min_files``
    files.  See module docstring for the concurrency contract.
    """
    # crash recovery: a previous run that died between the two renames
    # leaves the data stranded under ._compact_old with the live path
    # missing — restore it before doing anything else, so the table is
    # readable again and this run can proceed normally.
    fs = _fs(spark, path)
    old_aside = path.rstrip("/") + "._compact_old"
    if not fs.exists(path) and fs.exists(old_aside):
        if not fs.rename(old_aside, path):
            raise IOError(
                f"auto-restore {old_aside} -> {path} failed; "
                "restore manually before compacting"
            )
        spark.catalog.refreshByPath(path)

    stats = file_stats(spark, path).collect()
    files_before = len(stats)
    if files_before < min_files:
        return {"files_before": files_before, "files_after": files_before}
    total_bytes = sum(r["bytes"] for r in stats)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_out >= files_before:
        return {"files_before": files_before, "files_after": files_before}

    staging = path.rstrip("/") + "._compact_tmp"
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(staging)

    # three-step swap so a crash at any point leaves a recoverable,
    # discoverable state: (1) rename live dir aside, (2) rename staging
    # into place, (3) delete the old dir.  Never a window where the data
    # exists only under an opaque tmp name with the table path deleted;
    # a crash between (1) and (2) is auto-restored on the next run (see
    # the recovery block at the top of this function).
    if fs.exists(old_aside) and not fs.delete(old_aside, True):
        raise IOError(f"failed to clear stale {old_aside}")
    if not fs.rename(path, old_aside):
        raise IOError(f"rename {path} -> {old_aside} failed")
    if not fs.rename(staging, path):
        # roll the live dir back so the table path is never left empty
        fs.rename(old_aside, path)
        raise IOError(f"rename {staging} -> {path} failed")
    if not fs.delete(old_aside, True):
        raise IOError(f"compacted OK but failed to delete {old_aside}")
    spark.catalog.refreshByPath(path)
    after = len(file_stats(spark, path).collect())
    return {"files_before": files_before, "files_after": after}
