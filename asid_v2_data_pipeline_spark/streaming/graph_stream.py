"""Streaming PageRank maintenance: edge deltas arrive continuously;
each micro-batch folds its edges into the persisted edge set and
re-runs K WARM-START power-method rounds from the previous rank table
(``operators/graph.pagerank_incremental``) — the graph member of the
engine's incremental-maintenance family (dedup / BM25 / IVF / sketch /
media streams), in the same ``foreachBatch`` house style.

State layout (both grow one partition per micro-batch):
- ``edges_dir/_bid=<b>``  — the batch's edge rows (src, dst);
- ``ranks_dir/_bid=<b>``  — the FULL rank table after folding batch b
  (one generation per batch; readers take the latest generation).

Per micro-batch: prior edges = every STRICTLY-EARLIER ``_bid``
partition; prior ranks = the latest strictly-earlier generation; the
union (distinct — the edge set is a set, re-sent edges are no-ops)
warm-starts K rounds from the prior ranks, and both partitions are
OVERWRITTEN under this ``batch_id``.  Delivery semantics inherited
verbatim from ``dedup_stream``: at-least-once execution + idempotent
``_bid`` overwrites + strictly-before reads = exactly-once results.

Precondition (as for the batch operator): edges form a dangling-free
graph, e.g. symmetrized deltas — the caller's contract, documented at
``operators/graph.pagerank``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup_stream import _read_index

EDGE_SCHEMA = "src long, dst long"


def latest_ranks(spark: SparkSession, ranks_dir: str) -> DataFrame | None:
    """The newest rank generation (rows of the max ``_bid``), or None
    before the first batch."""
    gens = _read_index(spark, ranks_dir)
    if gens is None:
        return None
    top = gens.agg(F.max("_bid").alias("m")).first()["m"]
    return gens.filter(F.col("_bid") == top).drop("_bid")


def process_graph_batch(
    batch: DataFrame,
    batch_id: int,
    edges_dir: str,
    ranks_dir: str,
    damping: float = 0.85,
    iters: int = 6,
) -> None:
    """The idempotent micro-batch step (public so retry semantics are
    directly testable): fold the batch's edges into the strictly-earlier
    edge set, warm-start ``iters`` rounds from the strictly-earlier
    latest rank generation (cold-start uniform on the first batch), and
    overwrite this batch's ``_bid`` partitions.  A replay sees exactly
    the history it saw the first time, so reruns are bit-identical."""
    from ..operators.graph import pagerank, pagerank_incremental

    sp = batch.sparkSession
    prior_edges = _read_index(sp, edges_dir)
    prior_ranks = None
    if prior_edges is not None:
        prior_edges = prior_edges.filter(
            F.col("_bid") < F.lit(batch_id)
        ).drop("_bid")
        gens = _read_index(sp, ranks_dir)
        if gens is not None:
            gens = gens.filter(F.col("_bid") < F.lit(batch_id))
            top = gens.agg(F.max("_bid").alias("m")).first()["m"]
            if top is not None:
                prior_ranks = gens.filter(F.col("_bid") == top).drop("_bid")
    new_edges = batch.select("src", "dst")
    all_edges = (
        new_edges
        if prior_edges is None
        else prior_edges.unionByName(new_edges)
    ).distinct()
    if prior_ranks is None:
        ranks = pagerank(all_edges, damping, iters)
    else:
        ranks = pagerank_incremental(all_edges, prior_ranks, damping, iters)
    new_edges.write.mode("overwrite").parquet(f"{edges_dir}/_bid={batch_id}")
    ranks.write.mode("overwrite").parquet(f"{ranks_dir}/_bid={batch_id}")


def pagerank_edge_stream(
    spark: SparkSession,
    input_dir: str,
    edges_dir: str,
    ranks_dir: str,
    checkpoint_dir: str,
    damping: float = 0.85,
    iters: int = 6,
    max_files_per_trigger: int = 1,
):
    """Run the streaming graph-maintenance loop (``availableNow``
    drain): one warm-start PageRank refresh per edge micro-batch.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.format("parquet")
        .schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        process_graph_batch(
            batch, batch_id, edges_dir, ranks_dir, damping, iters
        )

    return (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
