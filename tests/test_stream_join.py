"""Runtime tests for the watermarked stream-stream attribution join:
(1) streaming output over on-time data equals the batch form;
(2) rows arriving behind the watermark are dropped deterministically
(state eviction), where the batch join would still match them."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.streaming.joins import attribution_join

SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def _run_stream(spark, src, ck, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    j = attribution_join(clicks, purchases)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        j.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_result(spark, src):
    df = spark.read.parquet(src)
    return attribution_join(
        df.filter(F.col("event_type") == "click"),
        df.filter(F.col("event_type") == "purchase"),
    )


def _pairs(df):
    return {(r["purchase_id"], r["click_id"], r["us_delay"]) for r in df.collect()}


def test_stream_matches_batch_on_time(spark, tmp_path):
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    m = dt.timedelta(minutes=1)
    _write(
        spark,
        src,
        [
            (1, 10, T0, "click", 0.0),
            (2, 10, T0 + 10 * m, "purchase", 5.0),   # joins click 1
            (3, 10, T0 + 5 * m, "click", 0.0),       # also within window of 2
            (4, 11, T0 + 3 * m, "purchase", 7.0),    # user 11: no click -> no row
            (5, 12, T0, "click", 0.0),
            (6, 12, T0 + 90 * m, "purchase", 9.0),   # 90min > 1h window -> no row
        ],
    )
    _run_stream(spark, src, ck, out)
    got = _pairs(spark.read.parquet(out))
    want = _pairs(_batch_result(spark, src))
    assert got == want
    assert {(p, c) for p, c, _ in got} == {(2, 1), (2, 3)}


def test_evicted_state_no_longer_matches(spark, tmp_path):
    """Watermark state eviction: a click whose event time falls behind
    ``watermark - max_delay`` is purged from join state at the end of its
    micro-batch run, so a purchase arriving in a LATER micro-batch cannot
    match it — even though the batch join over the same files does.
    (Late rows arriving together in ONE micro-batch still join — Spark
    only guarantees completeness up to the watermark, it does not filter
    intra-batch matches; that's why this test splits the pair across
    runs.)"""
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    h = dt.timedelta(hours=1)
    m = dt.timedelta(minutes=1)
    # run 1: on-time pair for user 10; a lone click for user 20; sentinels
    # at T0+8h on BOTH streams — the global watermark is the MIN across
    # all watermarked inputs (multipleWatermarkPolicy=min), so advancing
    # only one stream would leave it pinned at the other's max.  After
    # this run wm = T0+7h30m, putting user 20's click far behind the
    # click-state retention bound (wm - max_delay = T0+6h30m)
    _write(
        spark,
        src,
        [
            (1, 10, T0, "click", 0.0),
            (2, 10, T0 + 10 * m, "purchase", 5.0),
            (3, 20, T0, "click", 0.0),
            (99, 99, T0 + 8 * h, "click", 0.0),
            (98, 98, T0 + 8 * h, "purchase", 0.0),
        ],
    )
    _run_stream(spark, src, ck, out)
    # run 2: an unrelated on-time event — its micro-batch runs under the
    # advanced watermark, and end-of-batch cleanup purges user 20's click
    # (eviction is applied at batch boundaries, not at watermark-update
    # time, so one intervening batch is needed before the state is gone)
    _write(spark, src, [(50, 50, T0 + 8 * h + m, "click", 0.0)])
    _run_stream(spark, src, ck, out)
    # run 3: a purchase 5 minutes after user 20's click — would match it,
    # but that click's state is gone
    _write(spark, src, [(4, 20, T0 + 5 * m, "purchase", 6.0)])
    _run_stream(spark, src, ck, out)
    got = {(p, c) for p, c, _ in _pairs(spark.read.parquet(out))}
    assert (2, 1) in got
    assert (4, 3) not in got  # click state evicted before the purchase came
    # the batch join over the same files DOES match it — the discrepancy
    # is the documented streaming contract, not a bug
    batch = {(r["purchase_id"], r["click_id"]) for r in _batch_result(spark, src).collect()}
    assert (4, 3) in batch


def test_stream_static_join_sees_dimension_updates(spark, tmp_path):
    """Stream-static join contract: the static side is re-resolved every
    micro-batch, so a slowly-changing dimension updated between runs is
    visible to later batches without restarting anything — the
    enrichment-join pattern needs NO custom reload machinery."""
    src, ck, out, dim = (str(tmp_path / d) for d in ("src", "ck", "out", "dim"))
    m = dt.timedelta(minutes=1)
    spark.createDataFrame(
        [(10, "bronze")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        joined = stream.join(spark.read.parquet(dim), "user_id", "left")
        q = (
            joined.writeStream.foreachBatch(
                lambda b, i: b.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write(spark, src, [(1, 10, T0, "click", 1.0)])
    run()
    # dimension changes between micro-batch runs
    spark.createDataFrame(
        [(10, "gold")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim)
    _write(spark, src, [(2, 10, T0 + m, "click", 2.0)])
    run()
    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "bronze", 2: "gold"}
