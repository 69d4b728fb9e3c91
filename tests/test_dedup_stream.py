"""Runtime test of the streaming curation loop: per-file micro-batches
through a real streaming query; the signature index must carry admitted
docs forward so later batches dedup against earlier ones, and a second
drain (new files, same checkpoint) must resume without re-admitting."""

from __future__ import annotations

from asid_v2_data_pipeline_spark.streaming.dedup_stream import (
    dedup_document_stream,
)

SCHEMA = "doc_id long, text string"
BASE = "the quick brown fox jumps over the lazy dog and keeps running far away"
OTHER = "completely different content about sea ice concentration charts"


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _drain(spark, dirs):
    q = dedup_document_stream(
        spark,
        dirs["src"],
        SCHEMA,
        dirs["corpus"],
        dirs["index"],
        dirs["ck"],
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)


def _corpus_ids(spark, corpus):
    return sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())


def test_streaming_dedup_across_batches(spark, tmp_path):
    dirs = {
        "src": str(tmp_path / "src"),
        "corpus": str(tmp_path / "corpus"),
        "index": str(tmp_path / "index"),
        "ck": str(tmp_path / "ck"),
    }
    # batch 1: two novel docs + a within-batch near-dup of doc 1 (loser: 3)
    _write(
        spark,
        dirs["src"],
        [(1, BASE), (2, OTHER), (3, BASE + " tonight")],
    )
    # batch 2 (separate file => separate micro-batch): near-dup of doc 1
    # (must be caught VIA THE INDEX, not within-batch) + one novel doc
    _write(
        spark,
        dirs["src"],
        [(10, BASE + " again"), (11, "entirely novel words appear here only")],
    )
    _drain(spark, dirs)
    assert _corpus_ids(spark, dirs["corpus"]) == [1, 2, 11]

    # restart with a new file: checkpoint resumes (batch 1-2 files are
    # not re-served), and the index still catches history near-dups
    _write(
        spark,
        dirs["src"],
        [(20, BASE + " once more"), (21, "fresh topic nobody wrote about before")],
    )
    _drain(spark, dirs)
    assert _corpus_ids(spark, dirs["corpus"]) == [1, 2, 11, 21]


def test_retried_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch with the
    same batch_id (crash between sink write and checkpoint commit) must
    neither duplicate corpus rows nor mark the batch a dup of itself."""
    from asid_v2_data_pipeline_spark.streaming.dedup_stream import (
        process_batch,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    process_batch(b0, 0, corpus, index)
    assert _corpus_ids(spark, corpus) == [1, 2]

    # retry of batch 0: identical persisted state, nothing self-dropped
    process_batch(b0, 0, corpus, index)
    spark.catalog.refreshByPath(corpus)
    assert _corpus_ids(spark, corpus) == [1, 2]

    # next batch still dedups against batch 0 via the index
    b1 = spark.createDataFrame(
        [(10, BASE + " again"), (11, "entirely novel words appear here only")],
        SCHEMA,
    )
    process_batch(b1, 1, corpus, index)
    spark.catalog.refreshByPath(corpus)
    assert _corpus_ids(spark, corpus) == [1, 2, 11]

    # replay of batch 0 AFTER batch 1 landed: the index read keeps only
    # _bid < 0 (nothing), so batch 0 sees the same empty history it saw
    # originally — its docs are not dropped against the later batch
    process_batch(b0, 0, corpus, index)
    spark.catalog.refreshByPath(corpus)
    assert _corpus_ids(spark, corpus) == [1, 2, 11]


def test_index_compaction_bounded_and_equivalent(spark, tmp_path):
    """Many duplicate-heavy micro-batches grow one index partition each;
    compaction folds them into a single generation with identical
    admission decisions before and after."""
    from asid_v2_data_pipeline_spark.streaming.dedup_stream import (
        compact_index,
        process_batch,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    # batch 0 admits two docs; batches 1..4 each carry a near-dup of doc 1
    # (rejected via the index) plus one genuinely novel doc (admitted)
    process_batch(
        spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA), 0, corpus, index
    )
    for b in range(1, 5):
        process_batch(
            spark.createDataFrame(
                [
                    (100 + b, BASE + f" variant {b}"),
                    (
                        200 + b,
                        {
                            1: "glaciers calve into arctic fjords every spring",
                            2: "transformer models tokenize text into subword units",
                            3: "the orchestra tuned quietly before the overture began",
                            4: "volcanic soil grows exceptional coffee at high altitude",
                        }[b],
                    ),
                ],
                SCHEMA,
            ),
            b,
            corpus,
            index,
        )
    assert _corpus_ids(spark, corpus) == [1, 2, 201, 202, 203, 204]
    idx = spark.read.parquet(index)
    gens_before = idx.select("_bid").distinct().count()
    assert gens_before == 5  # one partition per micro-batch
    rows_before = sorted(
        (r["_id"], r["_band"], r["_bucket"])
        for r in idx.select("_id", "_band", "_bucket").collect()
    )

    removed = compact_index(spark, index)
    assert removed == 5
    idx2 = spark.read.parquet(index)
    assert idx2.select("_bid").distinct().count() == 1  # bounded
    assert sorted(
        (r["_id"], r["_band"], r["_bucket"])
        for r in idx2.select("_id", "_band", "_bucket").collect()
    ) == rows_before  # same band-row set => same admission decisions

    # and the compacted index still rejects history near-dups
    process_batch(
        spark.createDataFrame([(300, BASE + " once more")], SCHEMA),
        6,
        corpus,
        index,
    )
    spark.catalog.refreshByPath(corpus)
    assert _corpus_ids(spark, corpus) == [1, 2, 201, 202, 203, 204]

    # idempotent: compacting a compacted index is a no-op
    assert compact_index(spark, index) == 0


def test_compaction_drop_ids_retires_documents(spark, tmp_path):
    """Compaction with drop_ids removes a retired doc's band rows: a
    later near-dup of the retired doc is then ADMITTED (the index no
    longer vouches for it)."""
    from asid_v2_data_pipeline_spark.streaming.dedup_stream import (
        compact_index,
        process_batch,
    )

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    process_batch(
        spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA), 0, corpus, index
    )
    # retire doc 1 from the index
    drop = spark.createDataFrame([(1,)], "_id long")
    compact_index(spark, index, drop_ids=drop)
    idx = spark.read.parquet(index)
    assert idx.filter(idx["_id"] == 1).count() == 0
    assert idx.filter(idx["_id"] == 2).count() > 0

    # near-dup of retired doc 1 is admitted now
    process_batch(
        spark.createDataFrame([(30, BASE + " again")], SCHEMA), 1, corpus, index
    )
    spark.catalog.refreshByPath(corpus)
    assert 30 in _corpus_ids(spark, corpus)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode watermark semantics as an actual restarted stream:
    a finalized window is emitted once; an event arriving beyond the
    watermark is dropped and never re-emits or alters the window."""
    import datetime as dt

    from asid_v2_data_pipeline_spark.streaming.ingest import (
        tumbling_event_counts,
    )

    src = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sch = "event_id long, ts timestamp, event_type string, value double"

    def write(rows):
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            tumbling_event_counts(stream, "1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        spark.catalog.refreshByPath(out)
        return [
            ((str(r["w_start"]), r["event_type"]), (r["n_events"], r["sum_value"]))
            for r in spark.read.parquet(out).collect()
        ]

    # drain 1: two clicks in window 0, plus an event far enough ahead
    # (03:30) that the 2h watermark (-> 01:30) finalizes window 0
    write(
        [
            (1, t0 + dt.timedelta(minutes=5), "click", 1.0),
            (2, t0 + dt.timedelta(minutes=10), "click", 2.0),
            (3, t0 + dt.timedelta(hours=3, minutes=30), "view", 3.0),
        ]
    )
    first = dict(drain())
    assert first[("2024-01-01 00:00:00", "click")] == (2, 3.0)

    # drain 2: a BEYOND-WATERMARK late click into window 0 (dropped) and
    # a 06:30 event advancing the watermark past window 3's end
    write(
        [
            (4, t0 + dt.timedelta(minutes=20), "click", 100.0),
            (5, t0 + dt.timedelta(hours=6, minutes=30), "click", 4.0),
        ]
    )
    rows = drain()
    w0 = [v for k, v in rows if k == ("2024-01-01 00:00:00", "click")]
    assert w0 == [(2, 3.0)]  # exactly one emission, late event ignored
    assert dict(rows)[("2024-01-01 03:00:00", "view")] == (1, 3.0)
