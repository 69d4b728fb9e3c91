"""Streaming PageRank maintenance: per-file edge micro-batches through
the warm-start loop — the streamed result must equal the batch-operator
chain exactly; a restart resumes from the checkpoint; the micro-batch
step is idempotent on retry (dedup_stream's exactly-once contract)."""

from __future__ import annotations

import pytest

from asid_v2_data_pipeline_spark.operators.graph import (
    pagerank,
    pagerank_incremental,
)
from asid_v2_data_pipeline_spark.streaming.graph_stream import (
    latest_ranks,
    pagerank_edge_stream,
    process_graph_batch,
)

SCHEMA = "src long, dst long"


def _sym(pairs):
    return [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]


def _write(spark, src, pairs):
    spark.createDataFrame(_sym(pairs), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("src", "edges", "ranks", "ck")}


def _drain(spark, d):
    q = pagerank_edge_stream(
        spark, d["src"], d["edges"], d["ranks"], d["ck"], iters=4
    )
    q.awaitTermination(180)


def _ranks_dict(spark, ranks_dir):
    return {
        r["node"]: r["rank"]
        for r in latest_ranks(spark, ranks_dir).collect()
    }


def test_stream_equals_batch_operator_chain_and_resumes(spark, tmp_path):
    d = _dirs(tmp_path)
    b1 = [(1, 2), (2, 3), (1, 3)]
    b2 = [(3, 4), (4, 5)]  # new nodes fold in
    _write(spark, d["src"], b1)
    _write(spark, d["src"], b2)
    _drain(spark, d)

    e1 = spark.createDataFrame(_sym(b1), SCHEMA)
    e12 = spark.createDataFrame(_sym(b1 + b2), SCHEMA)
    r1 = pagerank(e1, 0.85, 4)
    want = {
        r["node"]: r["rank"]
        for r in pagerank_incremental(e12, r1, 0.85, 4).collect()
    }
    got = _ranks_dict(spark, d["ranks"])
    assert got == want  # exact float equality: same ops, same order

    # restart with a third delta: checkpoint resumes, state carries
    b3 = [(5, 6), (6, 1)]
    _write(spark, d["src"], b3)
    _drain(spark, d)
    e123 = spark.createDataFrame(_sym(b1 + b2 + b3), SCHEMA)
    prev = spark.createDataFrame(
        [(k, v) for k, v in want.items()], "node long, rank double"
    )
    want3 = {
        r["node"]: r["rank"]
        for r in pagerank_incremental(e123, prev, 0.85, 4).collect()
    }
    got3 = _ranks_dict(spark, d["ranks"])
    assert set(got3) == set(want3)
    for k in want3:
        assert got3[k] == pytest.approx(want3[k], abs=1e-15)
    # (no sum==1 assertion: a K-round warm restart only contracts the
    # seed's non-stochastic excess by damping^K per refresh — finite-K
    # freshness vs exactness is the documented incremental trade)


def test_graph_batch_retry_is_idempotent(spark, tmp_path):
    d = _dirs(tmp_path)
    b0 = spark.createDataFrame(_sym([(1, 2), (2, 3)]), SCHEMA)
    b1 = spark.createDataFrame(_sym([(3, 4)]), SCHEMA)
    process_graph_batch(b0, 0, d["edges"], d["ranks"], iters=3)
    process_graph_batch(b1, 1, d["edges"], d["ranks"], iters=3)
    first = _ranks_dict(spark, d["ranks"])
    # replay batch 1 (at-least-once): strictly-before reads make the
    # rerun see the identical history -> identical persisted state
    process_graph_batch(b1, 1, d["edges"], d["ranks"], iters=3)
    assert _ranks_dict(spark, d["ranks"]) == first
    # and the edge partitions are per-batch overwrites, not appends
    edges = spark.read.parquet(d["edges"])
    assert edges.count() == len(_sym([(1, 2), (2, 3)])) + len(_sym([(3, 4)]))
