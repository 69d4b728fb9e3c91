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

Exactly-once: the stream checkpoint tracks source files; sink + index
appends happen inside ``foreachBatch``.  Idempotence on retry is the
parquet append contract (same semantics as the reference's ledgered
ingest, SURVEY.md §2.10 T1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    the batch, appends them to ``corpus_dir`` and their band rows to
    ``index_dir``.  Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        index_rows = None
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        ):
            sp.catalog.refreshByPath(index_dir)
            index_rows = sp.read.schema(BAND_SCHEMA).parquet(index_dir)
        admitted, admitted_rows = admit_batch(
            batch, index_rows, id_col, text_col
        )
        # materialize admission before the index append reads the plan twice
        admitted.persist()
        try:
            admitted.write.mode("append").parquet(corpus_dir)
            admitted_rows.write.mode("append").parquet(index_dir)
        finally:
            admitted.unpersist()

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
