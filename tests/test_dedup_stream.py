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
