"""Runtime tests for dedup_at_ingest (dropDuplicatesWithinWatermark):
duplicates across micro-batches within the horizon are dropped, state is
bounded by the watermark (a key re-arriving beyond the horizon is
re-admitted), and the checkpoint carries dedup state across restarts."""

from __future__ import annotations

import datetime as dt

from asid_v2_data_pipeline_spark.streaming.ingest import dedup_at_ingest

SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, ck, out, delay="1 hour"):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    dd = dedup_at_ingest(stream, ["event_id"], watermark_delay=delay)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        dd.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_duplicates_dropped_across_restarts(spark, tmp_path):
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    m = dt.timedelta(minutes=1)
    _write(spark, src, [(1, 10, T0, "click", 1.0), (2, 10, T0 + m, "click", 2.0)])
    _run(spark, src, ck, out)
    # same event ids redelivered in a later run (restart in between):
    # dedup state came back from the checkpoint
    _write(spark, src, [(1, 10, T0, "click", 1.0), (3, 10, T0 + 2 * m, "click", 3.0)])
    _run(spark, src, ck, out)
    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3]


def test_horizon_bounds_state(spark, tmp_path):
    """A key re-arriving AFTER the watermark passed its expiry is admitted
    again — proof the state entry was dropped, i.e. state is bounded."""
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    h = dt.timedelta(hours=1)
    _write(spark, src, [(1, 10, T0, "click", 1.0)])
    _run(spark, src, ck, out)
    # advance the watermark far past T0 + delay (1h):  wm = T0+9h - 1h
    _write(spark, src, [(2, 11, T0 + 9 * h, "click", 2.0)])
    _run(spark, src, ck, out)
    # expired key 1 redelivered (late row, same id): re-admitted because
    # its dedup state aged out of the horizon
    _write(spark, src, [(1, 10, T0 + 9 * h, "click", 1.0)])
    _run(spark, src, ck, out)
    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == [1, 1, 2]


def test_batch_degrades_to_drop_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 10, T0, "click", 1.0), (1, 10, T0, "click", 1.0), (2, 10, T0, "click", 2.0)],
        SCHEMA,
    )
    got = sorted(r["event_id"] for r in dedup_at_ingest(df, ["event_id"]).collect())
    assert got == [1, 2]
