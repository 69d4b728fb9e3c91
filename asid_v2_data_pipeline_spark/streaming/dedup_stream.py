"""Streaming corpus curation: incremental dedup over a document stream.

The production ingest loop of a training-data pipeline: documents arrive
continuously; each micro-batch is deduplicated (a) against the persisted
signature index (everything ever admitted) and (b) within itself, then
admitted documents are appended to the corpus sink and their band rows
to the index — so the NEXT batch sees them as history.

Spark shapes (per micro-batch, via ``foreachBatch``):
- batch band rows: narrow computation over the (small) batch;
- vs-index candidates: `dedup.index_candidates` — batch side broadcast,
  the index scan never shuffles (at 100 TB the index table is
  partitioned by ``_band`` / bucketed by ``_bucket``, so the scan prunes
  to the batch's buckets);
- within-batch pairs: `dedup.minhash_lsh_pairs` on the batch alone;
- admission = batch anti-join (vs-index dupes ∪ within-batch losers);
  the deterministic survivor of a within-batch pair is the smaller id.

Delivery semantics: ``foreachBatch`` is AT-LEAST-ONCE — a crash between
the sink write and the checkpoint commit re-runs the micro-batch.  The
sink is therefore made idempotent per ``batch_id``: corpus rows and
index band rows land in a ``_bid=<batch_id>`` partition written with
``mode=overwrite``, so a retried batch replaces its own partition
instead of appending duplicates; and the index read EXCLUDES the current
batch's own partition (``_bid != batch_id``), so a retry that finds its
own band rows already persisted cannot mark the batch a duplicate of
itself.  Net effect: exactly-once *results* on top of at-least-once
execution.

The index grows one partition per micro-batch; ``compact_index`` folds
the accumulated partitions into a single compacted generation
(``_bid=-g``) and deletes the superseded ones via the Hadoop FileSystem
API (portable to HDFS/S3).  Crash-safety: a partially-deleted index
merely holds redundant copies of some band rows, which can only produce
redundant candidate pairs — admission decisions are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.dedup import (
    index_candidates,
    minhash_band_rows,
    minhash_lsh_pairs,
)

BAND_SCHEMA = "_id long, _band int, _bucket long"


def admit_batch(
    batch: DataFrame,
    index_rows: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """One curation step: returns ``(admitted_docs, their_band_rows)``.

    Pure DataFrame logic (no side effects) so batch and streaming paths
    share it and tests can check it directly.
    """
    band_rows = minhash_band_rows(batch, id_col, text_col, num_perm, bands, n)
    dup_ids = None
    if index_rows is not None:
        dup_ids = index_candidates(band_rows, index_rows).select(
            F.col("id_new").alias(id_col)
        )
    intra = minhash_lsh_pairs(batch, id_col, text_col, num_perm, bands, n)
    # within-batch survivor = smaller id; a loser matching an even-smaller
    # winner is still dropped (id_b side of any pair loses)
    losers = intra.select(F.col("id_b").alias(id_col))
    drops = losers if dup_ids is None else dup_ids.unionByName(losers)
    admitted = batch.join(drops.distinct(), id_col, "left_anti")
    admitted_rows = band_rows.join(
        admitted.select(F.col(id_col).alias("_id")), "_id", "left_semi"
    )
    return admitted, admitted_rows


def _read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Read the signature index, or None if it doesn't exist yet.

    Probes by attempting the read (AnalysisException == absent) rather
    than driver-local ``os.path`` — works on HDFS/S3 paths too."""
    try:
        spark.catalog.refreshByPath(index_dir)
        return spark.read.parquet(index_dir)
    except AnalysisException:
        return None


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Recursive delete via the filesystem shim (Hadoop FS on classic
    PySpark — any scheme; local fallback under Spark Connect)."""
    from ..sources.fsio import get_fs

    get_fs(spark, path).delete(path, recursive=True)


def process_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """The idempotent micro-batch step (public so retry semantics are
    directly testable): admit vs (index minus own partition) + within
    batch, then overwrite this batch's ``_bid`` partitions.  Running it
    twice with the same ``batch_id`` yields identical persisted state."""
    sp = batch.sparkSession
    index_rows = _read_index(sp, index_dir)
    if index_rows is not None:
        # STRICTLY-BEFORE, not merely != : a retried batch must see
        # exactly the history it saw the first time — with != a replay
        # running after LATER batches landed would treat their band rows
        # as history and drop documents that only collide with docs that
        # arrived after it (non-idempotent).  Batch ids are monotone
        # (structured-streaming contract) and compacted generations are
        # negative, so `<` keeps them and all earlier batches while
        # excluding the batch's own partition and later ones.  (After a
        # compaction that folded later batches in, an old-batch replay
        # can still see them — the documented compaction trade.)
        index_rows = index_rows.filter(F.col("_bid") < F.lit(batch_id))
    admitted, admitted_rows = admit_batch(batch, index_rows, id_col, text_col)
    # materialize admission before the index write reads the plan twice
    admitted.persist()
    try:
        admitted.write.mode("overwrite").parquet(f"{corpus_dir}/_bid={batch_id}")
        admitted_rows.write.mode("overwrite").parquet(
            f"{index_dir}/_bid={batch_id}"
        )
    finally:
        admitted.unpersist()


def dedup_document_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Run the streaming curation loop (``availableNow`` drain).

    Each micro-batch admits only documents novel vs the index AND within
    the batch, then OVERWRITES its own ``_bid=<batch_id>`` partition in
    ``corpus_dir`` / ``index_dir`` (idempotent on retry — see module
    docstring).  Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        process_batch(batch, batch_id, corpus_dir, index_dir, id_col, text_col)

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    drop_ids: DataFrame | None = None,
    target_partitions: int = 1,
) -> int:
    """Fold the per-batch index partitions into one compacted generation.

    Reads every ``_bid`` partition, dedupes identical band rows, drops
    rows of retired documents (``drop_ids``: a one-column DataFrame of
    ``_id``s), writes the survivors to a fresh negative generation
    ``_bid=-g``, then deletes the superseded partitions.  Admission
    decisions are identical before and after (same band-row SET); a crash
    mid-delete leaves redundant rows which only yield redundant candidate
    pairs.  Negative generations are never confused with a live
    ``batch_id`` (those are >= 0), so the retry-exclusion filter in
    ``_step`` keeps working.  Returns the number of partitions removed.
    """
    rows = _read_index(spark, index_dir)
    if rows is None:
        return 0
    old_gens = [r["_bid"] for r in rows.select("_bid").distinct().collect()]
    if len(old_gens) <= 1 and drop_ids is None:
        return 0  # already compact
    new_gen = min([g for g in old_gens if g < 0], default=0) - 1
    keep = rows.drop("_bid").dropDuplicates(["_id", "_band", "_bucket"])
    if drop_ids is not None:
        keep = keep.join(
            F.broadcast(drop_ids.select(F.col(drop_ids.columns[0]).alias("_id"))),
            "_id",
            "left_anti",
        )
    keep.coalesce(target_partitions).write.mode("overwrite").parquet(
        f"{index_dir}/_bid={new_gen}"
    )
    for g in old_gens:
        _delete_dir(spark, f"{index_dir}/_bid={g}")
    spark.catalog.refreshByPath(index_dir)
    return len(old_gens)
