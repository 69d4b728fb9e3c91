"""Incremental aggregate maintenance: merge_aggregate equals a full
re-aggregation, is idempotent per batch_id, touches only delta buckets;
the streaming maintain_rollup keeps the table equal to the batch
aggregate across multiple runs/restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.sources import merge as mg
from asid_v2_data_pipeline_spark.streaming.rollup import maintain_rollup

SCHEMA = "event_id long, user_id long, ts timestamp, event_type string, value double"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _delta(df):
    return (
        df.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )


def _table(spark, tdir):
    return {
        (r["event_type"], r["h"]): (r["n"], round(r["sv"], 6))
        for r in mg.read_aggregate(spark, tdir).collect()
    }


def _expected(spark, src):
    return {
        (r["event_type"], r["h"]): (r["n"], round(r["sv"], 6))
        for r in _delta(spark.read.parquet(src)).collect()
    }


def test_merge_aggregate_accumulates_and_is_idempotent(spark, tmp_path):
    tdir = str(tmp_path / "agg")
    m = dt.timedelta(minutes=1)
    b1 = spark.createDataFrame(
        [(1, 1, T0, "click", 1.0), (2, 1, T0 + m, "click", 2.0), (3, 1, T0, "view", 4.0)],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [(4, 1, T0 + 2 * m, "click", 8.0), (5, 1, T0 + dt.timedelta(hours=2), "view", 16.0)],
        SCHEMA,
    )
    s1 = mg.merge_aggregate(
        spark, tdir, _delta(b1), ["event_type", "h"], ["n", "sv"], n_buckets=8, batch_id=0
    )
    assert s1["touched_buckets"] >= 1 and s1["skipped_buckets"] == 0
    mg.merge_aggregate(
        spark, tdir, _delta(b2), ["event_type", "h"], ["n", "sv"], n_buckets=8, batch_id=1
    )
    got = _table(spark, tdir)
    assert got[("click", T0.replace(minute=0))] == (3, 11.0)  # 1+2 then +8
    assert got[("view", T0.replace(minute=0))] == (1, 4.0)
    assert got[("view", T0.replace(minute=0) + dt.timedelta(hours=2))] == (1, 16.0)
    # retry of batch 1 with the same batch_id: every touched bucket skips
    s3 = mg.merge_aggregate(
        spark, tdir, _delta(b2), ["event_type", "h"], ["n", "sv"], n_buckets=8, batch_id=1
    )
    assert s3["touched_buckets"] == 0 and s3["skipped_buckets"] >= 1
    assert _table(spark, tdir) == got


def test_streaming_rollup_matches_batch_aggregate(spark, tmp_path):
    src, ck, tdir = (str(tmp_path / d) for d in ("src", "ck", "agg"))
    m = dt.timedelta(minutes=1)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = maintain_rollup(
            stream, tdir, _delta, ["event_type", "h"], ["n", "sv"], ck, n_buckets=8
        )
        q.awaitTermination(120)

    write([(1, 1, T0, "click", 1.0), (2, 2, T0 + m, "view", 2.0)])
    run()
    assert _table(spark, tdir) == _expected(spark, src)
    # more events, restarted query, same checkpoint — table stays equal to
    # the full batch re-aggregation without ever re-reading old events
    write([(3, 1, T0 + 2 * m, "click", 4.0), (4, 3, T0 + dt.timedelta(hours=3), "click", 8.0)])
    run()
    assert _table(spark, tdir) == _expected(spark, src)


def test_random_delta_sequence_with_retries_matches_model(spark, tmp_path):
    """Model-based: random delta batches — some re-applied with the same
    batch_id (simulating foreachBatch retries) — must leave the table
    equal to a Counter replay that counts each logical batch once."""
    import random
    from collections import defaultdict

    rng = random.Random(99)
    tdir = str(tmp_path / "agg")
    model = defaultdict(lambda: [0, 0.0])
    for bid in range(5):
        rows = [
            (rng.randint(0, 9), rng.randint(1, 3), round(rng.uniform(0, 10), 3))
            for _ in range(rng.randint(1, 6))
        ]
        delta = spark.createDataFrame(rows, "g int, n long, sv double").groupBy(
            "g"
        ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        reps = 1 + (rng.random() < 0.5)  # half the batches get retried
        for _ in range(reps):
            mg.merge_aggregate(
                spark, tdir, delta, ["g"], ["n", "sv"], n_buckets=4, batch_id=bid
            )
        for r in delta.collect():  # model counts the batch ONCE
            model[r["g"]][0] += r["n"]
            model[r["g"]][1] += r["sv"]
    got = {
        r["g"]: (r["n"], round(r["sv"], 6))
        for r in mg.read_aggregate(spark, tdir).collect()
    }
    want = {g: (n, round(sv, 6)) for g, (n, sv) in model.items()}
    assert got == want
