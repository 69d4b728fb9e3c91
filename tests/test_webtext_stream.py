"""Runtime test of the streaming WEB-CRAWL ingestion loop: per-file
micro-batches of real .warc.gz payloads through a streaming query;
status/length gates reject bad pages, the text-fingerprint index
carries admitted documents forward so later batches dedup against
earlier ones, a second drain resumes from the checkpoint, corrupt
payloads land in the quarantine sink (never a stuck stream), and the
micro-batch step is idempotent on retry (the exactly-once-results
contract of dedup_stream, inherited)."""

from __future__ import annotations

from asid_v2_data_pipeline_spark.functions.html import escape_text
from asid_v2_data_pipeline_spark.functions.warc import (
    write_http_response,
    write_warc,
)
from asid_v2_data_pipeline_spark.streaming.webtext_stream import (
    process_warc_batch,
    warc_ingest_stream,
)

SCHEMA = "media_id long, payload binary"


def _page(text: str, status: int = 200, title: str = "t") -> bytes:
    body = (
        f"<html><head><title>{title}</title></head><body>"
        f"<nav>chrome</nav><p>{escape_text(text)}</p></body></html>"
    ).encode()
    resp = write_http_response(
        status,
        [("Content-Type", "text/html; charset=utf-8"),
         ("Content-Language", "en")],
        body,
        reason="OK" if status == 200 else "Err",
    )
    return write_warc(
        [(
            {
                "WARC-Type": "response",
                "WARC-Record-ID": "<urn:t:1>",
                "WARC-Target-URI": "https://t/x",
                "Content-Type": "application/http; msgtype=response",
            },
            resp,
        )]
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
    q = warc_ingest_stream(
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


def _ids(spark, path):
    return sorted(r["media_id"] for r in spark.read.parquet(path).collect())


def test_streaming_warc_ingestion(spark, tmp_path):
    dirs = _dirs(tmp_path)
    # batch 1: two novel pages, an exact text duplicate (within-batch
    # loser), a 404 (status gate), a too-short page (length gate)
    _write(
        spark,
        dirs["src"],
        [
            (1, _page("alpha beta gamma content")),
            (2, _page("another novel document body")),
            (3, _page("alpha beta gamma content")),
            (4, _page("gone for good", status=404)),
            (5, _page("x")),
        ],
    )
    # batch 2: an index-caught duplicate of 1 + one novel page
    _write(
        spark,
        dirs["src"],
        [(10, _page("alpha beta gamma content")), (11, _page("fresh one"))],
    )
    _drain(spark, dirs)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11]
    row = (
        spark.read.parquet(dirs["corpus"])
        .filter("media_id = 1")
        .collect()[0]
    )
    assert row["text"] == "alpha beta gamma content"
    assert row["title"] == "t" and row["content_language"] == "en"

    # restart with a new file: checkpoint resumes, index still dedups
    _write(
        spark,
        dirs["src"],
        [(20, _page("alpha beta gamma content")), (21, _page("newest doc"))],
    )
    _drain(spark, dirs)
    assert _ids(spark, dirs["corpus"]) == [1, 2, 11, 21]


def test_warc_batch_poison_quarantined_and_retry_idempotent(
    spark, tmp_path
):
    good = _page("good page body here")
    poison = bytearray(good)
    poison[-5] ^= 0xFF  # corrupt the gzip member
    batch = spark.createDataFrame(
        [(1, bytearray(good)), (2, poison),
         (3, bytearray(_page("second good page")))],
        SCHEMA,
    )
    dirs = _dirs(tmp_path)
    process_warc_batch(
        batch, 0, dirs["corpus"], dirs["index"], dirs["quar"],
        min_chars=4,
    )
    assert _ids(spark, dirs["corpus"]) == [1, 3]
    quar = spark.read.parquet(dirs["quar"]).collect()
    assert [(r["media_id"], r["error"]) for r in quar] == [
        (2, "ValueError")
    ]
    # retry with the same batch_id: identical persisted state
    process_warc_batch(
        batch, 0, dirs["corpus"], dirs["index"], dirs["quar"],
        min_chars=4,
    )
    assert _ids(spark, dirs["corpus"]) == [1, 3]
    assert spark.read.parquet(dirs["index"]).count() == 2
    assert spark.read.parquet(dirs["quar"]).count() == 1
