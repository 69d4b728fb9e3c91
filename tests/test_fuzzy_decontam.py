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


def test_remove_spans_keep_cols_equals_join_back(spark):
    """r13 (VERDICT r12 task 5): ``keep_cols`` passthrough returns
    exactly the rows the old join-back layout produced — same ids,
    same clean_text, same carried columns — on a corpus read from
    parquet (extra columns present)."""
    from pyspark.sql import functions as F

    from asid_v2_data_pipeline_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    carried = remove_duplicate_spans(
        d, "doc_id", "text", k=5, keep_cols=("lang", "source", "n_chars")
    )
    assert carried.columns == [
        "doc_id", "lang", "source", "n_chars", "clean_text", "n_removed",
    ]
    base = remove_duplicate_spans(d, "doc_id", "text", k=5)
    joined = d.drop("text").join(
        base.select("doc_id", "clean_text", "n_removed"), "doc_id"
    ).select(*carried.columns)
    a = sorted(tuple(r) for r in carried.collect())
    b = sorted(tuple(r) for r in joined.collect())
    assert a == b and len(a) == d.count()


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


def test_fingerprint_from_token_hashes_identity(spark):
    """r12 (tokenize-once rewiring of curate_v2): the token-hash fold
    equals ``tx.fingerprint`` on the raw text for every document —
    exact dedup keyed on either is the same dedup."""
    from asid_v2_data_pipeline_spark.functions import text as tx
    from asid_v2_data_pipeline_spark.operators.dedup import (
        fingerprint_from_token_hashes,
        token_hashes,
    )

    d = spark.createDataFrame(
        [
            (1, "alpha beta GAMMA, delta!"),
            (2, ""),
            (3, "one"),
            (4, "x y z " * 40),
            (5, "punct... only?!"),
            (6, "ALPHA beta gamma, delta!"),  # case-folds to doc 1's tokens
        ],
        "doc_id long, text string",
    )
    out = d.select(
        "doc_id",
        tx.fingerprint(F.col("text")).alias("a"),
        fingerprint_from_token_hashes(token_hashes(F.col("text"))).alias("b"),
    ).collect()
    assert len(out) == 6
    for r in out:
        assert r["a"] == r["b"], r["doc_id"]
    by_id = {r["doc_id"]: r["a"] for r in out}
    assert by_id[1] != by_id[3]


def test_decontam_prehashed_sides_equal_text_path(spark):
    """``contamination``/``fuzzy_contamination`` with pre-hashed
    docs/bench sides return exactly the text-path results."""
    from asid_v2_data_pipeline_spark.operators.decontam import contamination
    from asid_v2_data_pipeline_spark.operators.dedup import (
        with_shingle_hashes,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "completely unrelated text with nothing shared at all here"),
            (3, "the quick brown fox jumps over the lazy dog tonight yes"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog forever")],
        "doc_id long, text string",
    )
    n = 5
    want = sorted(
        tuple(r)
        for r in contamination(docs, bench, "doc_id", "text", n=n).collect()
    )
    dh = with_shingle_hashes(docs, "doc_id", "text", n).localCheckpoint()
    bh = with_shingle_hashes(bench, "doc_id", "text", n).localCheckpoint()
    got = sorted(
        tuple(r)
        for r in contamination(
            docs, bench, "doc_id", "text", n=n, docs_hashed=dh, bench_hashed=bh
        ).collect()
    )
    assert got == want and len(want) > 0

    want_f = sorted(
        tuple(r)
        for r in fuzzy_contamination(
            docs, bench, "doc_id", "text", min_jaccard=0.2
        ).collect()
    )
    dh3 = with_shingle_hashes(docs, "doc_id", "text", 3).localCheckpoint()
    bh3 = with_shingle_hashes(bench, "doc_id", "text", 3).localCheckpoint()
    got_f = sorted(
        tuple(r)
        for r in fuzzy_contamination(
            docs,
            bench,
            "doc_id",
            "text",
            min_jaccard=0.2,
            docs_hashed=dh3,
            bench_hashed=bh3,
        ).collect()
    )
    assert got_f == want_f and len(want_f) > 0


def test_prehashed_lazy_side_warns_materialized_does_not(spark):
    """r12 ADVICE: the docs_hashed/bench_hashed MUST-be-materialized
    contract is guarded — a lazy shingle-fold side triggers a
    RuntimeWarning (the Generate re-evaluation trap), a checkpointed
    side passes silently."""
    import warnings

    from asid_v2_data_pipeline_spark.operators.decontam import contamination
    from asid_v2_data_pipeline_spark.operators.dedup import (
        with_shingle_hashes,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today ok")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog forever")],
        "doc_id long, text string",
    )
    lazy = with_shingle_hashes(docs, "doc_id", "text", 5)  # NOT materialized
    mat = lazy.localCheckpoint()
    bh = with_shingle_hashes(bench, "doc_id", "text", 5).localCheckpoint()

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        contamination(
            docs, bench, "doc_id", "text", n=5, docs_hashed=lazy, bench_hashed=bh
        )
        assert any(
            issubclass(x.category, RuntimeWarning)
            and "docs_hashed" in str(x.message)
            for x in w
        )

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = contamination(
            docs, bench, "doc_id", "text", n=5, docs_hashed=mat, bench_hashed=bh
        )
        assert not [x for x in w if issubclass(x.category, RuntimeWarning)]
    assert out.count() == 1

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fuzzy_contamination(
            docs,
            bench,
            "doc_id",
            "text",
            min_jaccard=0.2,
            docs_hashed=mat,
            bench_hashed=with_shingle_hashes(bench, "doc_id", "text", 3),
        )
        assert any(
            issubclass(x.category, RuntimeWarning)
            and "bench_hashed" in str(x.message)
            for x in w
        )


def test_span_hash_shuffle_layout_identical(spark):
    """r12: the two-phase hash-shuffle span detector (the 100 TB
    exchange layout — 8-byte keys in the big shuffle, string confirm
    over candidates) returns exactly the single-phase string-groupBy
    results, spans and rewrites both."""
    from asid_v2_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    boiler = "all rights reserved contact us for more information"
    rows = [
        (1, f"alpha beta {boiler} gamma delta epsilon zeta"),
        (2, f"one two three {boiler} four five six seven"),
        (3, "totally unique content with no shared spans anywhere here"),
        (4, f"{boiler} leading and also trailing {boiler}"),
        (5, "short doc"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (3, 5):
        a = sorted(
            tuple(r) for r in duplicate_spans(d, k=k).collect()
        )
        b = sorted(
            tuple(r)
            for r in duplicate_spans(d, k=k, hash_shuffle=True).collect()
        )
        assert a == b and len(a) > 0, k
    ra = sorted(tuple(r) for r in remove_duplicate_spans(d, k=4).collect())
    rb = sorted(
        tuple(r)
        for r in remove_duplicate_spans(d, k=4, hash_shuffle=True).collect()
    )
    assert ra == rb
