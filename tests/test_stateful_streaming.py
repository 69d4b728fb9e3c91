"""Runtime test of the custom stateful operator: two micro-batches through
a real streaming query; state must carry across batches and across a
query restart (checkpoint recovery)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.streaming.stateful import running_user_profiles


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(src)


def _run_available(spark, src, ck, out_dir):
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    prof = running_user_profiles(stream)

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        prof.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_accumulates_across_restarts(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    out = str(tmp_path / "out")
    _write_batch(
        spark,
        src,
        [(1, t0, 10.0), (1, t0, 5.0), (2, t0, 1.0)],
    )
    _run_available(spark, src, ck, out)
    latest = (
        spark.read.parquet(out)
        .orderBy(F.col("batch_id").desc())
        .collect()
    )
    got1 = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in latest}
    assert got1[1] == (2, 15.0)
    assert got1[2] == (1, 1.0)

    # second run: new file, restarted query, same checkpoint -> state carries
    _write_batch(spark, src, [(1, t0 + dt.timedelta(hours=1), 2.5)])
    _run_available(spark, src, ck, out)
    rows = spark.read.parquet(out).collect()
    maxb = max(r["batch_id"] for r in rows)
    got2 = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in rows
        if r["batch_id"] == maxb
    }
    assert got2[1] == (3, 17.5)  # cumulative across restart
