"""Incremental-ingest ledger (SURVEY.md §2.1 S2-S4, §2.10 T1).

The reference tracks processed scene files in ``processed_files.json``
(/root/reference/asip_v2/archive.py:180-203).  At 100 TB the ledger is a
table, not a JSON blob: the unprocessed set is a ``left_anti`` join and the
commit is an append — both distributed, idempotent, and usable from
Structured Streaming's ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_files(spark: SparkSession, input_dir: str, glob: str = "*.nc") -> DataFrame:
    """S2 — directory listing as a DataFrame (basename per row).

    The session-level FileStatusCache would otherwise serve a stale
    listing to repeated incremental runs — refresh first."""
    spark.catalog.refreshByPath(input_dir)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("name"))
    )
    return df


def unprocessed(files: DataFrame, ledger: DataFrame) -> DataFrame:
    """S3 — listing minus ledger (archive.py:180-195) as an anti-join."""
    return files.join(ledger, "name", "left_anti")


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    """S9 — the ledger table; empty when absent ("all files are being
    processed!", archive.py:189-191)."""
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], "name string")


def commit(processed: DataFrame, path: str) -> None:
    """S4 — append processed names (idempotent per name via pre-anti-join)."""
    processed.select("name").write.mode("append").parquet(path)


def read_json_ledger(spark: SparkSession, path: str) -> DataFrame:
    """S9 — compatibility reader for the reference's processed_files.json
    (a bare JSON array of filenames, archive.py:186-191) -> (name) rows."""
    from pyspark.sql import functions as F

    # a bare top-level array of strings isn't a valid Spark JSON record;
    # read the file whole and parse with from_json
    raw = spark.read.option("wholetext", "true").text(path)
    return raw.select(
        F.explode(F.from_json(F.col("value"), "array<string>")).alias("name")
    )


def write_reconstruction(
    stitched: DataFrame, out_dir: str, partition_by_scene: bool = True
) -> None:
    """S8 — reconstruction sink: full-scene pixel table, partitioned by
    scene (replaces {scene}_reconstruct.npz, apply_model.py:78-80; image
    materialization happens only at the consumer edge)."""
    w = stitched.write.mode("overwrite")
    if partition_by_scene:
        w = w.partitionBy("scene")
    w.parquet(out_dir)
