"""Keyed parquet MERGE (upsert / delete) with touched-bucket-only rewrite.

The reference's ledger cycle (asip_v2/archive.py process-list update) only
ever *appends* processed ids; a training-data pipeline also needs the CDC
shape — upsert changed documents, delete retired ones — without rewriting
the whole corpus.  Lakehouse formats (Delta/Iceberg/Hudi) solve this with
copy-on-write over a transaction log; on plain parquet the same IO bound
is reachable with a deterministic hash-bucket layout:

- the table lives at ``dir/_mb=<b>/`` with ``b = pmod(xxhash64(key), n)``;
- a merge shuffles ONLY the (small) update batch by bucket, reads back
  ONLY the touched buckets (partition-pruned scan), anti-joins old rows
  on the key and unions the new ones;
- the write uses dynamic partition overwrite, so untouched bucket
  directories are never opened, let alone rewritten.

Cost per merge ≈ |updates| + (touched_buckets/n)·|table| regardless of
total table size — at 100 TB with n=4096 a 1-bucket update touches
~25 GB, not 100 TB.  Pick ``n_buckets`` so one bucket ≈ a few HDFS
blocks.  Single-writer semantics (no transaction log): concurrent merges
to the same bucket race exactly as concurrent writes to any parquet dir
do; the reference's ledger has the same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_mb"


def _bucket(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _validate(df: DataFrame, key_col: str) -> None:
    if BUCKET_COL in df.columns:
        raise ValueError(
            f"column {BUCKET_COL!r} is reserved for the merge bucket layout"
        )
    if key_col not in df.columns:
        raise ValueError(f"merge key {key_col!r} not in {df.columns}")


def init_table(df: DataFrame, target_dir: str, key_col: str, n_buckets: int = 64) -> None:
    """Create (or fully replace) the bucketed table layout."""
    _validate(df, key_col)
    (
        df.withColumn(BUCKET_COL, _bucket(key_col, n_buckets))
        .repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(target_dir)
    )


def read_table(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the logical table (bucket column stripped).  mergeSchema
    reconciles buckets written before/after a schema-evolving merge."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(target_dir)
        .drop(BUCKET_COL)
    )


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    delete_col: str | None = None,
) -> dict:
    """MERGE ``updates`` into the bucketed table at ``target_dir``.

    Per key: the update row replaces any existing row (last write wins);
    rows where ``delete_col`` is true are tombstones — the key is removed
    and the tombstone row is not kept.  ``updates`` must carry at most one
    row per key (enforced; resolve upstream with e.g. a max-timestamp
    argmax — picking silently here would hide data bugs).

    Only buckets that appear in ``updates`` are read or rewritten; the
    returned dict reports ``{"touched_buckets": k, "n_buckets": n}`` so
    callers can audit the IO bound.  Idempotent: re-merging the same batch
    rewrites the same buckets to the same content.
    """
    _validate(updates, key_col)
    if delete_col is not None and delete_col not in updates.columns:
        raise ValueError(f"delete flag {delete_col!r} not in {updates.columns}")

    up = updates.withColumn(BUCKET_COL, _bucket(key_col, n_buckets))
    dup = (
        up.groupBy(key_col).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"updates carry multiple rows for key {dup[0][key_col]!r}; "
            "deduplicate the batch upstream (last-write-wins needs an "
            "explicit ordering you choose, not one we invent)"
        )
    touched = sorted(
        r[BUCKET_COL] for r in up.select(BUCKET_COL).distinct().collect()
    )
    if not touched:
        return {"touched_buckets": 0, "n_buckets": n_buckets}

    old = (
        spark.read.option("mergeSchema", "true")
        .parquet(target_dir)
        .filter(F.col(BUCKET_COL).isin(touched))
    )
    keep_keys = up.select(key_col, BUCKET_COL)
    survivors = old.join(
        F.broadcast(keep_keys.select(key_col)), key_col, "left_anti"
    )
    incoming = up
    if delete_col is not None:
        incoming = up.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        survivors = survivors.drop(delete_col) if delete_col in survivors.columns else survivors
    # schema evolution: a column present on only one side materializes as
    # NULL on the other (adds propagate forward; old-only columns are
    # preserved, not dropped) — the standard mergeSchema contract
    merged = survivors.unionByName(incoming, allowMissingColumns=True)

    if delete_col is None:
        # upsert-only: `incoming` carries at least one row in every
        # touched bucket by construction, so no bucket can be emptied —
        # skip the emptied-bucket scan (and its persist) entirely; the
        # common path pays exactly one job.
        # writer-level option, not session conf: per-write scope, no
        # clone-session mismatch (foreachBatch) and no cross-thread race
        (
            merged.repartition(F.col(BUCKET_COL))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(target_dir)
        )
        return {
            "touched_buckets": len(touched),
            "n_buckets": n_buckets,
            "emptied_buckets": 0,
        }

    # dynamic partition overwrite only rewrites partitions that receive
    # rows, so a bucket whose every key was tombstoned would keep its old
    # directory (and its supposedly deleted keys).  Find touched buckets
    # with zero output rows BEFORE the write (afterwards `merged` would
    # re-read the rewritten table) and delete those directories
    # explicitly.  `merged` is persisted across the collect + write pair
    # so the touched-bucket scan and anti-join execute once, not twice.
    merged.persist()
    kept_marker = False
    try:
        nonempty = {
            r[BUCKET_COL] for r in merged.select(BUCKET_COL).distinct().collect()
        }
        emptied = [b for b in touched if b not in nonempty]

        if nonempty:
            (
                merged.repartition(F.col(BUCKET_COL))
                .write.option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(target_dir)
            )
        else:
            # no bucket received rows.  If untouched bucket dirs
            # still hold data the emptied dirs can all go; but if
            # this merge would leave ZERO bucket dirs, deleting them
            # all leaves a footerless dir that bricks every later
            # read/merge — keep the table alive with one zero-row
            # file (schema preserved) in the first touched bucket
            from .fsio import get_fs

            fs = get_fs(spark, target_dir)
            touched_names = {f"{BUCKET_COL}={b}" for b in touched}
            others = [
                name
                for name in fs.list_dir_names(target_dir)
                if name.startswith(f"{BUCKET_COL}=")
                and name not in touched_names
            ]
            if not others:
                keep = emptied.pop(0)
                kept_marker = True
                (
                    merged.drop(BUCKET_COL)
                    .limit(0)
                    .write.mode("overwrite")
                    .parquet(target_dir.rstrip("/") + f"/{BUCKET_COL}={keep}")
                )
    finally:
        merged.unpersist()
    if emptied:
        from .fsio import get_fs

        fs = get_fs(spark, target_dir)
        for b in emptied:
            bp = target_dir.rstrip("/") + f"/{BUCKET_COL}={b}"
            if fs.exists(bp) and not fs.delete(bp, True):
                raise IOError(f"failed to delete emptied bucket dir {bp}")
        spark.catalog.refreshByPath(target_dir)
    return {
        "touched_buckets": len(touched),
        "n_buckets": n_buckets,
        # a kept zero-row marker bucket still counts as emptied
        "emptied_buckets": len(emptied) + (1 if kept_marker else 0),
    }


AGG_BID_COL = "_mbid"


def merge_aggregate(
    spark: SparkSession,
    target_dir: str,
    deltas: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
    batch_id: int | None = None,
) -> dict:
    """Incremental aggregate (materialized-view) maintenance: the table
    holds one row per key with running additive aggregates (sums/counts);
    ``deltas`` is a pre-aggregated batch — one row per key, the same
    additive columns.  Old rows in the touched buckets are full-outer
    joined with the delta on the key and the aggregates added, so
    maintenance cost is |delta| + the touched fraction of the table —
    the canonical "don't re-aggregate 100 TB to refresh a dashboard"
    shape.  Non-additive aggregates (quantiles, distincts) belong in the
    sketch tier (`operators/stats.py`), not here.

    ``batch_id`` makes re-application idempotent *per bucket*: every
    rewritten row is stamped with the batch id, and a bucket whose
    stored stamp already equals ``batch_id`` is skipped on retry.  The
    parquet job commit is all-or-nothing per job (Hadoop commit
    protocol), so a crashed merge leaves the old generation and a full
    retry is safe; a *successful* merge retried with the same
    ``batch_id`` is a no-op.  Streaming callers get exactly-once table
    state on top of foreachBatch's at-least-once (see
    ``streaming/rollup.py``).
    """
    for c in key_cols + sum_cols:
        if c not in deltas.columns:
            raise ValueError(f"column {c!r} not in deltas {deltas.columns}")
    if AGG_BID_COL in key_cols or AGG_BID_COL in sum_cols:
        raise ValueError(f"{AGG_BID_COL!r} is reserved")

    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets)).cast("int")
    up = deltas.select(*key_cols, *sum_cols).withColumn(BUCKET_COL, bucket)
    touched = sorted(r[BUCKET_COL] for r in up.select(BUCKET_COL).distinct().collect())
    if not touched:
        return {"touched_buckets": 0, "n_buckets": n_buckets, "skipped_buckets": 0}

    skipped = 0
    # existence probe must work on any Hadoop filesystem (HDFS/S3/ABFS…),
    # not just local paths — attempt the read and catch PATH_NOT_FOUND
    # (ADVICE r2: driver-local os.path probes silently disable the read
    # on remote filesystems)
    from pyspark.errors import AnalysisException

    try:
        # mergeSchema, like the upsert/read paths: the batch-id skip gate
        # below is `AGG_BID_COL in old.columns`, and a footer-sampled
        # schema from mixed-generation files could hide the stamp column
        # and silently double-apply a retried batch
        old = (
            spark.read.option("mergeSchema", "true")
            .parquet(target_dir)
            .filter(F.col(BUCKET_COL).isin(touched))
        )
        old.schema  # force analysis so a missing path surfaces HERE
    except AnalysisException:
        old = None
    if old is not None and batch_id is not None and AGG_BID_COL in old.columns:
        applied = {
            r[BUCKET_COL]
            for r in old.groupBy(BUCKET_COL)
            .agg(F.max(AGG_BID_COL).alias("_b"))
            .filter(F.col("_b") == batch_id)
            .collect()
        }
        if applied:
            skipped = len(applied)
            touched = [b for b in touched if b not in applied]
            if not touched:
                return {
                    "touched_buckets": 0,
                    "n_buckets": n_buckets,
                    "skipped_buckets": skipped,
                }
            up = up.filter(F.col(BUCKET_COL).isin(touched))
            old = old.filter(F.col(BUCKET_COL).isin(touched))

    if old is None:
        merged = up
    else:
        o = old.select(
            *key_cols, *[F.col(c).alias(f"_o_{c}") for c in sum_cols]
        )
        d = up.select(
            *key_cols, *[F.col(c).alias(f"_d_{c}") for c in sum_cols]
        )
        merged = (
            o.join(d, key_cols, "full_outer")
            .select(
                *key_cols,
                *[
                    (
                        F.coalesce(F.col(f"_o_{c}"), F.lit(0))
                        + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
                    ).alias(c)
                    for c in sum_cols
                ],
            )
            .withColumn(BUCKET_COL, bucket)
        )
    stamped = merged.withColumn(
        AGG_BID_COL, F.lit(-1 if batch_id is None else batch_id).cast("long")
    )

    # writer-level dynamic overwrite (see merge_upsert: session conf
    # would not survive a foreachBatch clone session and races across
    # concurrent writer threads)
    (
        stamped.repartition(F.col(BUCKET_COL))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(target_dir)
    )
    return {
        "touched_buckets": len(touched),
        "n_buckets": n_buckets,
        "skipped_buckets": skipped,
    }


def read_aggregate(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the logical aggregate table (bucket + stamp stripped)."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(target_dir)
        .drop(BUCKET_COL, AGG_BID_COL)
    )
