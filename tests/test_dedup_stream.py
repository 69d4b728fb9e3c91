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
