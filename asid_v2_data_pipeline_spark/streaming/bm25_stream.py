"""Streaming maintenance of the persisted BM25 serving index.

New document batches arrive as files; each micro-batch is admitted
into the token-hash-bucketed index by ``operators/retrieval.py::
append_bm25_index(batch_id=...)`` — postings land under the batch's
``(_tb, _bid)`` partitions via DYNAMIC overwrite and the stats row
records ``_last_bid``, so foreachBatch's at-least-once delivery
converges to exactly-once index state (a replayed last batch rewrites
its own partitions and skips the already-applied stats update) — the
same discipline as ``ann_stream.py``.

Bucket count and corpus stats are FROZEN at bootstrap
(``write_bm25_index``); per-term document frequencies are derived at
query time from the postings themselves, so they are always correct
after any number of appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.retrieval import append_bm25_index


def index_document_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Drain ``input_dir`` (``availableNow``) into the persisted BM25
    index at ``index_path`` (must already exist — bootstrap with
    ``write_bm25_index``).  Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        append_bm25_index(
            spark,
            batch,
            index_path,
            id_col=id_col,
            text_col=text_col,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
