"""JSONL (newline-delimited JSON) source/sink — the interchange format of
LLM corpus pipelines (one document object per line).

Design rules for 100 TB:

- **Explicit schema, always.**  ``spark.read.json`` without a schema runs
  a full extra pass over the data to infer one, and infers it from
  whatever sample it sees — a silently different schema per day of data.
  ``read_jsonl`` therefore *requires* a schema.
- **Quarantine, don't crash.**  A trillion-line crawl has malformed
  lines; ``PERMISSIVE`` mode keeps them NULL-columned and records the
  raw line in ``corrupt_col`` for a side-channel audit, so one bad line
  can't kill a day-long job (``FAILFAST`` available for curated inputs).
- **Line-delimited only.**  ``multiLine=false`` (the default) keeps the
  format splittable — each executor seeks to a newline and parses its own
  block; a multi-line JSON array would serialize the whole file through
  one task.
- **Compression via codec, not container**: gzip JSONL is NOT
  splittable — one 10 GB .jsonl.gz is one task.  Prefer zstd (where the
  cluster's Hadoop natives provide it) or bzip2 (always available,
  splittable, slow), or simply many medium uncompressed files.  Codec
  availability is a cluster property, so the writer takes it explicitly
  and defaults to uncompressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    In ``PERMISSIVE`` mode, unparseable lines yield a row with all data
    columns NULL and the raw line in ``corrupt_col`` (appended to the
    schema); callers split good/bad with ``corrupt_records`` /
    ``valid_records``.  ``DROPMALFORMED`` silently drops bad lines;
    ``FAILFAST`` raises on the first one.

    The quarantine path parses via ``text`` + ``from_json`` rather than
    the raw JSON datasource: Spark forbids any query that references only
    the datasource-level corrupt column
    (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`` — the
    official workaround is caching the whole parse), while ``from_json``
    over text lines has no such restriction and keeps both streams lazy.
    Hive-style partition directories are still discovered and merged in;
    blank lines are skipped (not records, not corruption).
    """
    if mode.upper() != "PERMISSIVE" or corrupt_col is None:
        return (
            spark.read.schema(schema).option("mode", mode.upper()).json(path)
        )
    inner = StructType(
        [f for f in schema.fields if f.name != corrupt_col]
    ).add(corrupt_col, "string")
    raw = spark.read.text(path)
    part_cols = [c for c in raw.columns if c != "value"]
    parsed = raw.filter(F.trim(F.col("value")) != "").select(
        F.from_json(
            "value",
            inner,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("_r"),
        *part_cols,
    )
    out_cols = [
        F.col(c) if c in part_cols else F.col(f"_r.{c}").alias(c)
        for c in schema.fieldNames()
        if c != corrupt_col
    ]
    return parsed.select(
        *out_cols, F.col(f"_r.{corrupt_col}").alias(corrupt_col)
    )


def corrupt_records(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """The quarantine stream: raw lines that failed to parse."""
    return df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)


def valid_records(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """The clean stream, with the quarantine column dropped."""
    return df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Write newline-delimited JSON, one object per line.

    ``compression`` must name a codec the cluster's Hadoop build
    provides (e.g. ``gzip`` everywhere; ``zstd`` only with native libs —
    pass it explicitly where available).  Hive-style ``partition_by``
    layout lets a downstream reader prune partitions exactly as with
    parquet.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
