"""Incremental curation: batch admission vs persisted state equals the
full lazy curate() on the union (ascending-id arrival), cross-batch
dedup semantics, and retry idempotency
(plans/curation_incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.plans.curation import curate
from asid_v2_data_pipeline_spark.plans.curation_incremental import (
    admit_increment,
    curated_corpus,
    curated_view,
)
from asid_v2_data_pipeline_spark.schemas import load_table

WEIGHTS = {"en": 2.25, "de": 1.0, "es": 0.5, "fr": 1.5, "zh": 0.25}
SF = "/root/testdata/sf0.001"


def _mix_rows(df):
    return sorted(
        (r["doc_id"], r["lang"], r["source"], int(r["epoch"]))
        for r in df.collect()
    )


def _setup(spark):
    d = load_table(spark, SF, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return corpus, bench


def _batches(corpus, edges=(170, 340)):
    lo = corpus.filter(F.col("doc_id") < edges[0])
    mid = corpus.filter(
        (F.col("doc_id") >= edges[0]) & (F.col("doc_id") < edges[1])
    )
    hi = corpus.filter(F.col("doc_id") >= edges[1])
    return [lo, mid, hi]


def test_incremental_equals_full_curate(spark, tmp_path):
    """Three ascending-id batches through admit_increment + curated_view
    == one lazy curate() over the union — rows, sources, epochs, all of
    it (quota binds at 30 per source on this data: 20 sources x ~25
    docs, so the view's global seeded rank is actually exercised)."""
    corpus, bench = _setup(spark)
    state = str(tmp_path / "state")
    for bid, b in enumerate(_batches(corpus)):
        admit_increment(b, bid, state, bench)

    inc = curated_view(spark, state, WEIGHTS)
    full = curate(corpus, bench, WEIGHTS)
    assert _mix_rows(inc) == _mix_rows(full)


def test_cross_batch_dedup_semantics(spark, tmp_path):
    """Exact dup of history -> dropped; near-dup of history -> dropped;
    near-dup of a DROPPED near-dup -> still dropped (seen/index cover
    exact-unique docs, not just admitted ones); novel doc -> admitted."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    b1 = spark.createDataFrame(
        [
            (1, base, "en", "s1", len(base)),
            (2, base.replace("dog", "cat"), "en", "s1", len(base)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    novel = (
        "completely different content about distributed engines and "
        "columnar storage formats with no shared shingles at all"
    )
    near_of_2 = base.replace("dog", "cat").replace("ok", "yes")
    b2 = spark.createDataFrame(
        [
            (50, base, "en", "s1", len(base)),  # exact dup of 1
            # near-dup (NOT byte-identical) of the dropped doc 2
            (51, near_of_2, "en", "s1", len(near_of_2)),
            (52, novel, "en", "s1", len(novel)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    bench = spark.createDataFrame(
        [(999, "benchmark question answer pairs", "en", "b", 31)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    state = str(tmp_path / "state")
    s1 = admit_increment(b1, 0, state, bench)
    # doc 2 is an intra-batch near-dup loser of 1: dropped from the
    # corpus but still exact-unique -> indexed
    assert s1["exact_new"] == 2 and s1["admitted"] == 1
    s2 = admit_increment(b2, 1, state, bench)
    assert s2["exact_new"] == 2  # 50 is an exact dup, never indexed
    # 51 dropped via the INDEX (its only near-dup, 2, was itself dropped
    # — the index covers exact-unique docs, not just admitted ones)
    assert s2["admitted"] == 1  # 52 admitted
    got = sorted(r["doc_id"] for r in curated_corpus(spark, state).collect())
    assert got == [1, 52]


def test_streaming_admission_equals_batch(spark, tmp_path):
    """curate_document_stream (availableNow drain, one file per trigger)
    over files of the same corpus == the batch admit_increment loop ==
    full curate, including across a restart with new files."""
    from asid_v2_data_pipeline_spark.plans.curation_incremental import (
        curate_document_stream,
    )

    corpus, bench = _setup(spark)
    src = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batches = _batches(corpus)
    # ascending-id file names so the stream admits in id order (the
    # equivalence contract) — write the first two, drain, then the third
    batches[0].coalesce(1).write.parquet(src + "/b0")
    batches[1].coalesce(1).write.parquet(src + "/b1")
    import glob as g

    files = sorted(
        p for b in ("b0", "b1") for p in g.glob(f"{src}/{b}/part-*.parquet")
    )
    flat = str(tmp_path / "flat")
    import os
    import shutil

    os.makedirs(flat)
    base_t = 1_700_000_000
    for i, p in enumerate(files):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(p, dst)
        # the file stream orders by modification time — pin strictly
        # increasing mtimes so arrival order is the ascending-id order
        # the equivalence contract requires
        os.utime(dst, (base_t + i * 60, base_t + i * 60))
    q = curate_document_stream(spark, flat, schema, state, bench, ck)
    q.awaitTermination()
    # restart with a new file: only the new batch is processed
    batches[2].coalesce(1).write.parquet(src + "/b2")
    dst = f"{flat}/999.parquet"
    shutil.copy(g.glob(f"{src}/b2/part-*.parquet")[0], dst)
    os.utime(dst, (base_t + 3600, base_t + 3600))
    q2 = curate_document_stream(spark, flat, schema, state, bench, ck)
    q2.awaitTermination()

    inc = curated_view(spark, state, WEIGHTS)
    full = curate(corpus, bench, WEIGHTS)
    assert _mix_rows(inc) == _mix_rows(full)


def test_retry_idempotent(spark, tmp_path):
    """Re-running a batch with the same batch_id (the foreachBatch
    at-least-once retry) leaves identical persisted state and an
    identical curated view."""
    corpus, bench = _setup(spark)
    state = str(tmp_path / "state")
    batches = _batches(corpus)
    stats = [admit_increment(b, i, state, bench) for i, b in enumerate(batches)]
    before = _mix_rows(curated_view(spark, state, WEIGHTS))

    replay = admit_increment(batches[1], 1, state, bench)
    assert replay["admitted"] == stats[1]["admitted"]
    assert replay["exact_new"] == stats[1]["exact_new"]
    assert _mix_rows(curated_view(spark, state, WEIGHTS)) == before


def test_out_of_order_batch_warns(spark, tmp_path):
    """Batches arriving out of ascending-id order break the batch-plan
    equivalence tie-break; admission must warn (not abort) and record
    max_id state per batch (plans/curation_incremental.py
    validate_order)."""
    import warnings as w

    corpus, bench = _setup(spark)
    hi = corpus.filter(F.col("doc_id") >= 340)
    lo = corpus.filter(F.col("doc_id") < 170)
    state = str(tmp_path / "state")
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        admit_increment(hi, 0, state, bench)
        assert not any("below an earlier batch" in str(x.message) for x in rec)
        admit_increment(lo, 1, state, bench)
        assert any("below an earlier batch" in str(x.message) for x in rec)


def test_greedy_streaming_quota_diverges_from_batch_plan(spark):
    """Round-5: executable form of the module-docstring argument for why
    quota lives in the VIEW, not at admission.  A retraction-free greedy
    per-batch quota keeps an early arrival forever; the batch plan's
    global seeded-hash rank can prefer a later-arriving doc.  With
    quota=1 and a doc pair whose hash order opposes arrival order, the
    two selections provably differ."""
    from asid_v2_data_pipeline_spark.operators.sampling import (
        quota_per_group,
    )
    from asid_v2_data_pipeline_spark.operators.split import shuffle_hash

    # find two ids whose seeded-hash rank opposes id order
    cand = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        shuffle_hash(F.col("id"), 17).alias("h"),
    )
    rows = {r["doc_id"]: r["h"] for r in cand.collect()}
    early, late = next(
        (a, b)
        for a in sorted(rows)
        for b in sorted(rows)
        if a < b and rows[b] < rows[a]
    )

    schema = "doc_id long, source string"
    batch0 = spark.createDataFrame([(early, "s")], schema)
    batch1 = spark.createDataFrame([(late, "s")], schema)

    # greedy, no retraction: batch0 fills the quota; batch1 arrives to
    # zero remaining capacity and is dropped
    admitted = quota_per_group(batch0, ["source"], 1, "doc_id")
    assert [r["doc_id"] for r in admitted.collect()] == [early]
    greedy = {early}  # capacity 0 left for batch1

    # the batch plan over the union picks the better-hashed LATER doc
    batch = {
        r["doc_id"]
        for r in quota_per_group(
            batch0.unionByName(batch1), ["source"], 1, "doc_id"
        ).collect()
    }
    assert batch == {late}
    assert greedy != batch


def test_incremental_with_classifier_gate_equals_gated_full(spark, tmp_path):
    """The learned gate is a pure per-doc map, so incremental admission
    with clf_weights == the batch curate() over the pre-gated corpus —
    the composition argument the docstring makes, executed."""
    from asid_v2_data_pipeline_spark.functions.classifier import (
        lcg_weights,
        score_documents,
    )

    corpus, bench = _setup(spark)
    w = lcg_weights(64, seed=17)
    state = str(tmp_path / "state")
    for bid, b in enumerate(_batches(corpus)):
        admit_increment(
            b, bid, state, bench, clf_weights=w, clf_bias=0.1, clf_min=0.5249
        )

    inc = curated_view(spark, state, WEIGHTS)
    gated = (
        score_documents(corpus, "text", w, 0.1)
        .filter(F.col("clf_score") >= 0.5249)
        .drop("clf_score")
    )
    full = curate(gated, bench, WEIGHTS)
    got, want = _mix_rows(inc), _mix_rows(full)
    assert got == want and len(got) > 0


def test_admit_from_cdc_equals_full_curate(spark, tmp_path):
    """VERDICT r6 task 7 — CDC → curation composition: the corpus is a
    VERSIONED table; admission consumes its change feed exactly-once
    through sync_changes cursors.  After three append commits (+ a
    crash-replay of the last delta), the curated view over the
    accumulated state equals one lazy curate() over the table's final
    version."""
    import json

    from asid_v2_data_pipeline_spark.plans.curation_incremental import (
        admit_from_cdc,
    )
    from asid_v2_data_pipeline_spark.sources import versioned as V

    corpus, bench = _setup(spark)
    table = str(tmp_path / "docs_table")
    state = str(tmp_path / "state")
    cursor = f"{state}/cdc_cursor.json"

    batches = _batches(corpus)
    # commit 1 -> admit (bootstrap: reads the whole v0)
    V.commit_version(batches[0], table)
    assert admit_from_cdc(spark, table, state, bench) == 0
    # nothing new -> no-op
    assert admit_from_cdc(spark, table, state, bench) is None
    # commits 2 and 3 -> each admitted as exactly its file-set delta
    V.commit_version(batches[1], table, mode="append")
    assert admit_from_cdc(spark, table, state, bench) == 1
    V.commit_version(batches[2], table, mode="append")
    assert admit_from_cdc(spark, table, state, bench) == 2

    inc = curated_view(spark, state, WEIGHTS)
    full = curate(V.read_latest(spark, table), bench, WEIGHTS)
    want = _mix_rows(full)
    assert _mix_rows(inc) == want

    # crash-replay: rewind the cursor to simulate dying after the
    # admission but before the cursor advance — the re-delivered delta
    # carries the same until-version batch id and is absorbed
    with open(cursor, "w") as fh:
        json.dump({"version": 1}, fh)
    assert admit_from_cdc(spark, table, state, bench) == 2
    assert _mix_rows(curated_view(spark, state, WEIGHTS)) == want
