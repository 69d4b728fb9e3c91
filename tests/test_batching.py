"""Tests for the ML feeding surface (B1/B2/B4, A1/A2) + the parquet patch
sink round-trip (S6/S7) + padding/mask operators + a real streaming run
(T1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark import fixtures
from asid_v2_data_pipeline_spark.config import PipelineConfig
from asid_v2_data_pipeline_spark.operators.batching import (
    assemble_batches,
    class_pixel_counts,
    class_weights,
    pivot_patches,
    predict_batches,
)
from asid_v2_data_pipeline_spark.operators.masks import sar_size_mask, upsample_mask
from asid_v2_data_pipeline_spark.operators.resize import pad_centered
from asid_v2_data_pipeline_spark.operators.stitch import stitch_pixels
from asid_v2_data_pipeline_spark.plans.build_pipeline import (
    build_patches,
    write_patch_sink,
)

VARS = ["nersc_sar_primary", "nersc_sar_secondary"]


@pytest.fixture(scope="module")
def built(spark):
    cfg = PipelineConfig(window_sar=8, stride_sar=8, window_amsr2=2)
    px = build_patches(
        fixtures.scenes(spark),
        fixtures.sar_pixels(spark),
        fixtures.icechart_pixels(spark),
        fixtures.polygon_codes(spark),
        fixtures.amsr2_pixels(spark),
        cfg,
    )
    px.cache()
    yield px
    px.unpersist()


def test_pivot_shapes(spark, built):
    piv = pivot_patches(built, VARS, 8)
    rows = piv.collect()
    assert len(rows) == 13
    for r in rows:
        for v in VARS:
            assert len(r[v]) == 64


def test_assemble_batches_drop_last(spark, built):
    piv = pivot_patches(built, VARS, 8)
    out = assemble_batches(piv, VARS, 8, batch_size=4).collect()
    # 13 patches, bs=4 -> 3 full batches, remainder dropped
    assert len(out) == 3
    for r in out:
        assert r["n"] == 4
        assert r[f"{VARS[0]}_shape"] == [4, 8, 8, 1]


def test_predict_and_stitch_roundtrip(spark, built):
    """Identity-ish model: mean of channels; prediction pixels stitch back
    to a full-coverage image over clean patches."""
    piv = pivot_patches(built, VARS, 8)
    pred = predict_batches(piv, VARS, 8)
    assert pred.count() == 13 * 64
    img = stitch_pixels(pred, 8)
    # spot-check one pixel: mean of the two SAR channels at (0,0)
    v = img.filter((F.col("line") == 0) & (F.col("sample") == 0)).collect()[0]["value"]
    assert v == pytest.approx((0.0 + 1000.0) / 2, abs=1e-3)


def test_class_stats(spark, built):
    classes = [f"ice_type_{k}" for k in range(4)]
    counts = class_pixel_counts(built, classes)
    got = {r["var"]: r["n_pixels"] for r in counts.collect()}
    assert sum(got.values()) <= 13 * 64  # unmapped polygons contribute 0
    w = class_weights(counts, {c: 2.0 for c in classes})
    for r in w.collect():
        assert r["weighted"] == 2.0 * r["n_pixels"]


def test_patch_sink_roundtrip(spark, built, tmp_path):
    out = str(tmp_path / "patches")
    write_patch_sink(built, out)
    back = spark.read.parquet(out)
    assert back.count() == built.count()
    # partition pruning by scene works (scene is a partition column)
    assert back.filter(F.col("scene") == fixtures.SCENE_A).count() == built.count()


def test_bucketed_patch_table_kills_pivot_shuffle(spark, built, tmp_path):
    """S6 bucketed variant: pivot over the bucketed table plans with NO
    Exchange (bucket layout satisfies the groupBy clustering), and the
    data round-trips exactly."""
    from asid_v2_data_pipeline_spark.plans.build_pipeline import (
        write_patch_table_bucketed,
    )

    table = "patches_bucketed_test"
    write_patch_table_bucketed(
        built, table, num_buckets=4, path=str(tmp_path / "bucketed")
    )
    try:
        back = spark.table(table)
        assert back.count() == built.count()
        piv = pivot_patches(back, VARS, 8)
        rows = piv.collect()
        assert len(rows) == 13 and all(len(r[VARS[0]]) == 64 for r in rows)
        plan = piv._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_pad_centered(spark):
    """calculate_pading pinned (tests/test_archive.py:46-57): 2x2 padded
    with pads (1,2,3,4) -> 5x9 constant 100 except [1:3, 3:5]."""
    rows = [("s", 0, 0, 1.0), ("s", 0, 1, 2.0), ("s", 1, 0, 3.0), ("s", 1, 1, 4.0)]
    df = spark.createDataFrame(rows, "scene string, line int, sample int, value double")
    keys = df.select("scene").distinct()
    # pads (top,bottom,left,right)=(1,2,3,4) -> out 5x9, centered_pads
    # computes (1,2,3,4) for in=(2,2), out=(5,9)
    out = pad_centered(
        df, spark, 2, 2, 5, 9, keys, {"value": 100.0}
    ).collect()
    grid = [[None] * 9 for _ in range(5)]
    for r in out:
        grid[r["line"]][r["sample"]] = r["value"]
    assert grid[1][3] == 1.0 and grid[1][4] == 2.0
    assert grid[2][3] == 3.0 and grid[2][4] == 4.0
    flat = [v for row in grid for v in row]
    assert flat.count(100.0) == 45 - 4 and None not in flat


def test_mask_union_and_upsample(spark):
    """F4/F5 pinned (tests/test_archive.py:305-343)."""
    rows = [
        ("s", 0, 0, 999.0, 10.0, 1),
        ("s", 0, 1, 998.0, 11.0, 2),
        ("s", 1, 0, 997.0, 32.0, 3),
        ("s", 1, 1, 996.0, 33.0, 4),
    ]
    df = spark.createDataFrame(
        rows,
        "scene string, line int, sample int, sar float, distance_map float, polygon_id int",
    )
    m = df.select(
        "line", "sample", sar_size_mask(["sar"], distance_threshold=20).alias("m")
    ).collect()
    got = {(r["line"], r["sample"]): r["m"] for r in m}
    assert got == {(0, 0): True, (0, 1): True, (1, 0): False, (1, 1): False}

    coarse = spark.createDataFrame(
        [("s", 0, 0, False), ("s", 1, 0, True)], "scene string, line int, sample int, mask boolean"
    )
    up = upsample_mask(coarse, 2)
    assert up.count() == 8
    assert up.filter(F.col("mask")).count() == 4  # the True cell -> 2x2 block


def test_streaming_windowed_agg_runtime(spark, tmp_path):
    """The tumbling window agg running as an actual stream (watermark
    path), not just its batch twin."""
    import datetime as dt

    from asid_v2_data_pipeline_spark.streaming.ingest import tumbling_event_counts

    src = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "click", 1.0),
        (2, t0 + dt.timedelta(minutes=10), "click", 2.0),
        (3, t0 + dt.timedelta(hours=1, minutes=5), "view", 3.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = tumbling_event_counts(stream, "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["w_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_agg").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 3.0)


def test_streaming_ingest_availablenow(spark, tmp_path, built):
    """T1 — real Structured Streaming run: parquet file source with
    availableNow trigger; checkpoint = the ledger."""
    from asid_v2_data_pipeline_spark.streaming.ingest import (
        incremental_file_stream,
        write_stream_to_parquet,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    built.limit(100).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = incremental_file_stream(spark, src, schema)
    q = write_stream_to_parquet(stream, out, ck)
    q.awaitTermination(60)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100
    # restart with no new files: checkpoint prevents reprocessing
    q2 = write_stream_to_parquet(
        incremental_file_stream(spark, src, schema), out, ck
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 100
