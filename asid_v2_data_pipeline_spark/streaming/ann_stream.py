"""Streaming maintenance of the persisted IVF vector index.

New embedding batches arrive as files; each micro-batch is admitted
into the cell-partitioned index by ``operators/similarity.py::
append_ivf_index(batch_id=...)`` — assignment with the index's own
stored quantizer, then a DYNAMIC partition overwrite of exactly the
batch's ``(cell, _bid)`` partitions.

Delivery semantics: ``foreachBatch`` is at-least-once; the
``(cell, _bid=batch_id)`` overwrite makes a replayed batch rewrite
precisely its own partitions (deterministic assignment), so the
persisted index is exactly-once — the same discipline as
``dedup_stream.py`` and ``plans/curation_incremental.py``.

The quantizer is FROZEN at bootstrap (``write_ivf_index``); retrain +
rebuild offline when recall telemetry degrades — streaming centroid
updates would silently invalidate every already-written posting list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import append_ivf_index


def index_vector_stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
):
    """Drain ``input_dir`` (``availableNow``) into the persisted IVF
    index at ``index_path`` (must already exist — bootstrap with
    ``write_ivf_index``).  Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        append_ivf_index(
            spark,
            batch,
            index_path,
            id_col=id_col,
            vec_col=vec_col,
            batch_id=batch_id,
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
