"""Fuzzy (MinHash-banded) cross-corpus decontamination."""

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.decontam import fuzzy_contamination

SF = "/root/testdata/sf0.001"


def test_catches_near_dup_misses_unrelated(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely unrelated text about spark shuffle partitions and joins"),
            (3, "the quick brown fox jumps over the lazy dog near the river"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id: long, text: string",
    )
    out = fuzzy_contamination(corpus, bench, "doc_id", "text", min_jaccard=0.5)
    rows = {(r["doc_id"], r["bench_id"]): r["jaccard"] for r in out.collect()}
    assert rows[(1, 100)] == 1.0
    assert (2, 100) not in rows
    assert (3, 100) in rows and 0.5 <= rows[(3, 100)] < 1.0


def test_no_explode_past_candidates_and_bench_broadcast(spark):
    """The Jaccard verify joins hash ARRAYS by id (array_intersect), it
    never explodes corpus grams; both benchmark sides broadcast."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    out = fuzzy_contamination(corpus, bench, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert out.count() > 0


def test_remove_duplicate_spans_pinned(spark):
    """Shared boilerplate vanishes from BOTH carriers; unique content
    survives; an untouched doc round-trips (whitespace-normalized);
    n_removed accounts exactly."""
    from asid_v2_data_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    boiler = "subscribe to our newsletter for daily updates and offers"
    d = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta epsilon"),
            (2, f"{boiler} zeta eta theta iota kappa"),
            (3, "totally unique content with no duplication at all here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(d, k=5).collect()}
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert out[1]["n_removed"] == 9
    assert out[2]["clean_text"] == "zeta eta theta iota kappa"
    assert out[2]["n_removed"] == 9
    assert out[3]["clean_text"].startswith("totally unique")
    assert out[3]["n_removed"] == 0
    assert len(out) == 3


def test_keep_best_per_cluster_pinned(spark):
    """Highest-score member survives per component (transitively
    connected), ties break to lowest id, singletons survive."""
    from asid_v2_data_pipeline_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    d = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.3), (9, 0.1)],
        "doc_id long, q double",
    )
    # 1-2 and 2-3 connect {1,2,3}; 4 and 9 appear in no pair (singletons)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = keep_best_per_cluster(d, pairs, "doc_id", "q").collect()
    got = {(r["doc_id"], r["cluster_id"]) for r in out}
    # cluster {1,2,3}: q ties 2 vs 3 at 0.9 -> lowest id 2 wins
    assert got == {(2, 1), (4, 4), (9, 9)}
