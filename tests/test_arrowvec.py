"""Differential tests: the Arrow-vectorized embedding kernels
(functions/arrowvec.py) are bit-identical to the Catalyst HOF forms
they replace (similarity.dot / .norm / ivf_assign+with_pq_codes+
pq_decode) — on edge cases AND the real sf0.001 embeddings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.functions.arrowvec import (
    pair_dot,
    pq_block,
    vec_norm,
)
from asid_v2_data_pipeline_spark.operators import similarity as sim
from asid_v2_data_pipeline_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def _edge_vectors(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero norm -> NaN cosine path
        (2, None),  # NULL vector
        (3, [-1.5, 2.5, -3.5, 4.5]),
        (4, [1e-300, 1e300, -1e300, 1.0]),  # cancellation order matters
        (5, [0.1, 0.2, 0.3, 0.4]),
    ]
    return spark.createDataFrame(rows, "vec_id: long, v: array<double>")


def test_norm_matches_expression_edges(spark):
    d = _edge_vectors(spark)
    out = d.select(
        "vec_id",
        sim.norm(F.col("v")).alias("e"),
        vec_norm(F.col("v")).alias("k"),
    ).collect()
    for r in out:
        assert r["e"] == r["k"], (r["vec_id"], r["e"], r["k"])


def test_norm_matches_expression_real_embeddings(spark):
    e = load_table(spark, SF, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    bad = (
        e.select(
            sim.norm(F.col("v")).alias("e"), vec_norm(F.col("v")).alias("k")
        )
        .filter(~(F.col("e") == F.col("k")))
        .count()
    )
    assert bad == 0


def test_empty_array_norm_is_zero(spark):
    d = spark.createDataFrame([(0, [])], "vec_id: long, v: array<double>")
    r = d.select(
        sim.norm(F.col("v")).alias("e"), vec_norm(F.col("v")).alias("k")
    ).first()
    assert r["e"] == 0.0 and r["k"] == 0.0


def test_pair_dot_matches_expression(spark):
    d = _edge_vectors(spark)
    a = d.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = d.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b)
    out = pairs.select(
        "ia",
        "ib",
        sim.dot(F.col("va"), F.col("vb")).alias("e"),
        pair_dot(F.col("va"), F.col("vb")).alias("k"),
    ).collect()
    for r in out:
        if r["e"] is None or r["k"] is None:
            assert r["e"] is None and r["k"] is None, r
        else:
            assert r["e"] == r["k"], r


def test_pair_dot_mismatched_lengths_null(spark):
    d = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])], "a: array<double>, b: array<double>"
    )
    r = d.select(
        sim.dot(F.col("a"), F.col("b")).alias("e"),
        pair_dot(F.col("a"), F.col("b")).alias("k"),
    ).first()
    assert r["e"] is None and r["k"] is None


def test_pair_dot_real_pairs(spark):
    e = load_table(spark, SF, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = e.crossJoin(F.broadcast(q))
    bad = (
        pairs.select(
            sim.dot(F.col("v"), F.col("qv")).alias("e"),
            pair_dot(F.col("v"), F.col("qv")).alias("k"),
        )
        .filter(~(F.col("e") == F.col("k")))
        .count()
    )
    assert bad == 0


@pytest.fixture(scope="module")
def _ivf_fixtures(spark):
    e = load_table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = sim.train_centroids_kmeanspp_lite(e, 4)
    books = sim.train_pq_codebooks_lite(e, m=4, ks=8)
    return e, cents, books


def test_pq_block_matches_expression_chain(spark, _ivf_fixtures):
    e, cents, books = _ivf_fixtures
    coded = sim.with_pq_codes(
        sim.ivf_assign(e, cents), books
    )
    vhat = sim.pq_decode(F.col("_pq"), books)
    expr = coded.select(
        "vec_id",
        "cell",
        "_pq",
        vhat.alias("_vhat"),
    ).select(
        "vec_id", "cell", "_pq", "_vhat", sim.norm(F.col("_vhat")).alias("_vhn")
    )
    kern = e.select(
        "vec_id", pq_block(F.col("embedding"), cents, books).alias("_b")
    ).select(
        "vec_id",
        F.col("_b.cell").alias("cell"),
        F.col("_b.pq").alias("_pq"),
        F.col("_b.vhat").alias("_vhat"),
        F.col("_b.vhn").alias("_vhn"),
    )
    ex = {r["vec_id"]: r for r in expr.collect()}
    kn = {r["vec_id"]: r for r in kern.collect()}
    assert set(ex) == set(kn)
    for vid, r in ex.items():
        k = kn[vid]
        assert r["cell"] == k["cell"], (vid, r["cell"], k["cell"])
        assert list(r["_pq"]) == list(k["_pq"]), vid
        assert list(r["_vhat"]) == list(k["_vhat"]), vid
        assert r["_vhn"] == k["_vhn"], (vid, r["_vhn"], k["_vhn"])


def test_pq_block_null_vector(spark, _ivf_fixtures):
    _, cents, books = _ivf_fixtures
    d = spark.createDataFrame([(0, None)], "vec_id: long, v: array<double>")
    r = d.select(pq_block(F.col("v"), cents, books).alias("b")).first()["b"]
    assert r["cell"] is None and r["pq"] is None
    assert r["vhat"] is None and r["vhn"] is None
