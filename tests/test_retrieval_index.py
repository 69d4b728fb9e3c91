"""BM25 inverted-index query path: identical scores/top-k to the
no-explode path, equi-join-on-token plan shape
(operators/retrieval.py::bm25_scores_indexed)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.retrieval import (
    bm25_scores,
    bm25_scores_indexed,
    build_bm25_index,
)
from asid_v2_data_pipeline_spark.schemas import load_table

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TERMS = ["spark", "query", "window"]


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_index_path_matches_no_explode_scores(spark):
    """Every doc matching >= 1 term gets the IDENTICAL BM25 score from
    both paths (9-decimal rounding absorbs fp sum-order); the no-explode
    path scores non-matching docs exactly 0 and the index path omits
    them — same ranking either way."""
    d = _docs(spark)
    direct = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores(d, TERMS).collect()
    }
    postings, stats = build_bm25_index(d)
    indexed = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores_indexed(postings, stats, TERMS).collect()
    }
    assert indexed  # query terms do occur in the corpus
    for doc, s in indexed.items():
        assert direct[doc] == s
    omitted = set(direct) - set(indexed)
    assert all(direct[doc] == 0.0 for doc in omitted)


def test_index_path_top10_equals_query_path(spark):
    d = _docs(spark)
    postings, stats = build_bm25_index(d)

    def top10(df):
        return [
            (r["doc_id"], round(r["score"], 4))
            for r in df.orderBy(F.col("score").desc(), "doc_id")
            .limit(10)
            .collect()
        ]

    assert top10(bm25_scores_indexed(postings, stats, TERMS)) == top10(
        bm25_scores(d, TERMS)
    )


def test_duplicate_query_terms_weighted(spark):
    """A term appearing twice in the query contributes twice — same as
    the no-explode path's per-occurrence sum."""
    d = _docs(spark)
    postings, stats = build_bm25_index(d)
    dup = ["spark", "spark"]
    direct = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores(d, dup).collect()
        if r["score"] != 0.0
    }
    indexed = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores_indexed(postings, stats, dup).collect()
    }
    assert indexed == direct


def test_index_path_plan_is_equi_join_on_token(spark):
    """The candidate stage must be a broadcast EQUI-join on token (the
    partition-prunable index-lookup shape) — no cartesian anywhere; the
    only corpus-sized shuffles are the index build's own groupBys."""
    d = _docs(spark)
    postings, stats = build_bm25_index(d)
    scored = bm25_scores_indexed(postings, stats, TERMS)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [token" in plan


def test_persisted_index_prunes_and_matches(spark, tmp_path):
    """Round-5: the token-hash-bucketed persisted index (a) scans only
    the query terms' bucket partitions and (b) returns the identical
    scores to the no-explode path on matching docs."""
    from asid_v2_data_pipeline_spark.operators.retrieval import (
        bm25_scores_persisted,
        write_bm25_index,
    )

    d = _docs(spark)
    path = str(tmp_path / "bm25")
    write_bm25_index(d, path, n_buckets=16)

    # (a) pruning: the scan behind the persisted query path reads only
    # the terms' bucket files (_metadata.file_path reflects the files
    # actually read after partition pruning)
    buckets = {
        r["_tb"]
        for r in spark.createDataFrame([(t,) for t in TERMS], "token string")
        .select(F.pmod(F.hash("token"), F.lit(16)).alias("_tb"))
        .collect()
    }
    full = spark.read.parquet(f"{path}/postings")
    pruned = full.filter(F.col("_tb").isin(sorted(buckets)))

    def scanned(df):
        return {
            r["f"]
            for r in df.select(F.col("_metadata.file_path").alias("f"))
            .distinct()
            .collect()
        }

    all_files, pruned_files = scanned(full), scanned(pruned)
    assert pruned_files and pruned_files < all_files
    assert all(
        any(f"_tb={b}/" in f for b in buckets) for f in pruned_files
    ), pruned_files

    # (b) equality with the no-explode scorer
    direct = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores(d, TERMS).collect()
    }
    via_index = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores_persisted(spark, path, TERMS).collect()
    }  # n_buckets read from the index itself (self-describing)
    import pytest

    with pytest.raises(ValueError, match="n_buckets=16"):
        bm25_scores_persisted(spark, path, TERMS, n_buckets=32)
    assert via_index  # some docs match
    for did, s in via_index.items():
        assert direct[did] == s
    assert all(
        direct[did] == 0 for did in set(direct) - set(via_index)
    )


def test_bm25_append_equals_rebuild(spark, tmp_path):
    """Round-5: appending a doc batch into the persisted BM25 index
    (postings append + exact closed-form stats update) scores
    identically to rebuilding over the union."""
    from asid_v2_data_pipeline_spark.operators.retrieval import (
        append_bm25_index,
        bm25_scores_persisted,
        write_bm25_index,
    )

    d = _docs(spark)
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)

    inc = str(tmp_path / "inc")
    write_bm25_index(old, inc, n_buckets=16)
    stats = append_bm25_index(spark, new, inc)
    assert stats["appended_docs"] == new.count()

    full = str(tmp_path / "full")
    write_bm25_index(d, full, n_buckets=16)

    a = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores_persisted(spark, inc, TERMS).collect()
    }
    b = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25_scores_persisted(spark, full, TERMS).collect()
    }
    assert a == b and len(a) > 0


def test_append_counts_zero_token_docs_and_replays_idempotently(spark, tmp_path):
    """(a) A batch containing an empty-text doc updates N/avgdl exactly
    as a full rebuild counts it; (b) a replayed batch_id is a no-op for
    both postings and stats."""
    from asid_v2_data_pipeline_spark.operators.retrieval import (
        append_bm25_index,
        bm25_scores_persisted,
        build_bm25_index,
        write_bm25_index,
    )

    base = spark.createDataFrame(
        [(1, "spark shuffles data across executors"),
         (2, "duckdb runs in process")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(3, "spark joins broadcast small tables"), (4, "")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "bm25")
    write_bm25_index(base, p, n_buckets=8)
    append_bm25_index(spark, batch, p, batch_id=0)

    # stats equal a full rebuild over base+batch (empty doc counted)
    _, rebuilt_stats = build_bm25_index(base.unionByName(batch))
    want = rebuilt_stats.first()
    got = spark.read.parquet(f"{p}/stats").first()
    assert got["_n"] == want["_n"] == 4
    assert abs(got["_avgdl"] - want["_avgdl"]) < 1e-12

    # replay of batch 0: nothing changes
    before = sorted(
        map(tuple, bm25_scores_persisted(spark, p, ["spark"]).collect())
    )
    out = append_bm25_index(spark, batch, p, batch_id=0)
    assert out.get("replayed") is True
    after = sorted(
        map(tuple, bm25_scores_persisted(spark, p, ["spark"]).collect())
    )
    assert before == after
    assert spark.read.parquet(f"{p}/stats").first()["_n"] == 4


def test_streaming_bm25_ingest_equals_rebuild(spark, tmp_path):
    """Two micro-batches streamed into the index == one full rebuild
    over the union (scores per doc at 9 decimals), and the stream's
    checkpointed restart does not double-apply."""
    from asid_v2_data_pipeline_spark.operators.retrieval import (
        bm25_scores_persisted,
        build_bm25_index,
        bm25_scores_indexed,
        write_bm25_index,
    )
    from asid_v2_data_pipeline_spark.streaming.bm25_stream import (
        index_document_stream,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "spark shuffles data across executors"),
         (2, "duckdb runs in process")],
        "doc_id long, text string",
    )
    more = spark.createDataFrame(
        [(3, "spark joins broadcast small tables"),
         (4, "indexes prune file scans")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "bm25")
    src = str(tmp_path / "src")
    write_bm25_index(base, p, n_buckets=8)
    more.filter("doc_id = 3").coalesce(1).write.mode("append").parquet(src)
    more.filter("doc_id = 4").coalesce(1).write.mode("append").parquet(src)

    q = index_document_stream(
        spark, src, "doc_id long, text string", p, str(tmp_path / "ck")
    )
    q.awaitTermination(120)

    got = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_scores_persisted(spark, p, ["spark", "scans"]).collect()
    )
    postings, stats = build_bm25_index(base.unionByName(more))
    want = sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_scores_indexed(
            postings, stats, ["spark", "scans"]
        ).collect()
    )
    assert got == want and len(got) >= 3

    # restart over the same (fully-consumed) source: no state change
    n_before = spark.read.parquet(f"{p}/stats").first()["_n"]
    q2 = index_document_stream(
        spark, src, "doc_id long, text string", p, str(tmp_path / "ck")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{p}/stats").first()["_n"] == n_before


def test_spark_string_hash_replicates_f_hash(spark):
    """The serving path computes partition buckets with a driver-side
    Murmur3 replica of F.hash (r8: saves a Spark job per query).  Pin
    exact equality over unicode edge cases and random strings — if a
    Spark upgrade ever changes the hash, THIS breaks, not the pruning."""
    import random
    import string

    from asid_v2_data_pipeline_spark.operators.retrieval import (
        spark_string_hash,
    )

    rng = random.Random(8)
    words = [
        "", "a", "the", "spark", "ä", "日本語", "emoji\U0001F600",
        "\x00null", "x" * 257,
    ] + [
        "".join(
            rng.choices(string.ascii_letters + string.digits + " é日",
                        k=rng.randint(0, 24))
        )
        for _ in range(150)
    ]
    df = spark.createDataFrame([(w,) for w in set(words)], "token string")
    from pyspark.sql import functions as F

    for r in df.select("token", F.hash("token").alias("h")).collect():
        assert spark_string_hash(r["token"]) == r["h"], r["token"]
