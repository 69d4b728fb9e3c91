"""Runtime test of the streaming RECORD-SHARD ingestion loop:
per-file micro-batches of real TFRecord shards through a streaming
query; length gates reject short examples, the fingerprint index
carries admitted examples forward so later batches dedup against
earlier ones, a second drain resumes from the checkpoint, corrupt
shards land in the quarantine sink (never a stuck stream), and the
micro-batch step is idempotent on retry."""

from __future__ import annotations

from asid_v2_data_pipeline_spark.functions.protof import encode_example
from asid_v2_data_pipeline_spark.functions.tfrecord import write_tfrecord
from asid_v2_data_pipeline_spark.streaming.shards_stream import (
    process_shard_batch,
    shard_ingest_stream,
)

SCHEMA = "media_id long, payload binary"


def _shard(did: int, texts: list[str]) -> bytes:
    return write_tfrecord(
        [
            encode_example(
                {
                    "key": ("bytes", [f"{did:06d}-{i:03d}".encode()]),
                    "txt": ("bytes", [t.encode()]),
                    "sno": ("int64", [i]),
                }
            )
            for i, t in enumerate(texts)
        ]
    )


def _write(spark, src, rows):
    spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)


def _dirs(tmp_path):
    return {
        k: str(tmp_path / k)
        for k in ("src", "corpus", "index", "quar", "ck")
    }


def _drain(spark, dirs):
    q = shard_ingest_stream(
        spark,
        dirs["src"],
        dirs["corpus"],
        dirs["index"],
        dirs["quar"],
        dirs["ck"],
        max_files_per_trigger=1,
        min_chars=4,
    )
    q.awaitTermination(180)


def _keys(spark, path):
    return sorted(
        (r["media_id"], r["key"])
        for r in spark.read.parquet(path).collect()
    )


def test_streaming_shard_ingestion(spark, tmp_path):
    dirs = _dirs(tmp_path)
    bad = bytearray(_shard(3, ["whatever content"]))
    bad[12] ^= 0xFF  # data CRC fails -> quarantine
    # batch 1: one multi-example shard (with a within-shard duplicate
    # and a too-short example), one corrupt shard
    _write(
        spark,
        dirs["src"],
        [
            (1, _shard(1, ["alpha beta gamma", "second text", "alpha beta gamma", "x"])),
            (3, bytes(bad)),
        ],
    )
    # batch 2: an index-caught duplicate + one novel shard
    _write(
        spark,
        dirs["src"],
        [(10, _shard(10, ["alpha beta gamma", "fresh example"]))],
    )
    _drain(spark, dirs)
    assert _keys(spark, dirs["corpus"]) == [
        (1, "000001-000"),
        (1, "000001-001"),
        (10, "000010-001"),
    ]
    quar = spark.read.parquet(dirs["quar"]).collect()
    assert [(r["media_id"], r["error"]) for r in quar] == [(3, "ValueError")]

    # restart with a new file: checkpoint resumes, index still dedups
    _write(
        spark,
        dirs["src"],
        [(20, _shard(20, ["second text", "newest example"]))],
    )
    _drain(spark, dirs)
    assert _keys(spark, dirs["corpus"]) == [
        (1, "000001-000"),
        (1, "000001-001"),
        (10, "000010-001"),
        (20, "000020-001"),
    ]


def test_shard_batch_step_idempotent(spark, tmp_path):
    dirs = _dirs(tmp_path)
    batch = spark.createDataFrame(
        [(1, bytearray(_shard(1, ["some longer text", "another body"])))],
        SCHEMA,
    )
    for _ in range(2):  # same batch_id twice = a foreachBatch retry
        process_shard_batch(
            batch, 0, dirs["corpus"], dirs["index"], dirs["quar"],
            min_chars=4,
        )
    assert _keys(spark, dirs["corpus"]) == [
        (1, "000001-000"),
        (1, "000001-001"),
    ]
    assert (
        spark.read.parquet(dirs["index"]).select("fp").distinct().count()
        == 2
    )
