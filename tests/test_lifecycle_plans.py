"""Train/apply lifecycle plans (§3.2/§3.3) and the incremental build
driver (§3.1 outer loop)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark import fixtures
from asid_v2_data_pipeline_spark.config import PipelineConfig
from asid_v2_data_pipeline_spark.plans.apply_pipeline import apply_model
from asid_v2_data_pipeline_spark.plans.build_pipeline import build_patches
from asid_v2_data_pipeline_spark.plans.incremental import run_incremental_build
from asid_v2_data_pipeline_spark.plans.train_pipeline import (
    select_training_patches,
    train_val_feeds,
)
from asid_v2_data_pipeline_spark.sources.netcdf import fake_decoder

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


def test_day_of_year_selection(spark, built):
    """SCENE_A is 2018-04-10 -> 0-based doy 99 (reference's off-by-one)."""
    cfg = PipelineConfig(
        window_sar=8, stride_sar=8, window_amsr2=2,
        beginning_day_of_year=99, ending_day_of_year=99,
    )
    sel = select_training_patches(built, cfg)
    assert sel.count() == built.count()  # all fixture patches are SCENE_A
    cfg2 = PipelineConfig(
        window_sar=8, stride_sar=8, window_amsr2=2,
        beginning_day_of_year=100, ending_day_of_year=100,
    )
    assert select_training_patches(built, cfg2).count() == 0


def test_train_val_feeds(spark, built):
    cfg = PipelineConfig(
        window_sar=8, stride_sar=8, window_amsr2=2, percentage=0.7, batch_size=2
    )
    train, val = train_val_feeds(built, cfg, VARS, seed=5)
    tr = train.collect()
    va = val.collect()
    # 13 patches -> 9 train (floor(13*.7)=9) -> 4 full batches of 2;
    # 4 val -> 2 batches
    assert sum(r["n"] for r in tr) == 8
    assert sum(r["n"] for r in va) == 4
    for r in tr + va:
        assert r[f"{VARS[0]}_shape"] == [2, 8, 8, 1]


def test_apply_reconstruction(spark, built):
    cfg = PipelineConfig(window_sar=8, stride_sar=8, window_amsr2=2)
    img = apply_model(built, cfg, VARS)
    rows = img.collect()
    # bug-compatible sizing: max(struct(i,j)) over 13 patches -> (3,3)
    # -> 32x32 canvas
    assert len(rows) == 32 * 32
    vals = {(r["line"], r["sample"]): r["value"] for r in rows}
    # clean patch (0,0): prediction = mean of the two SAR channels
    assert vals[(0, 0)] == pytest.approx((0.0 + 1000.0) / 2, abs=1e-3)
    # dropped patch (1,2) region: canvas fill
    assert vals[(8, 16)] == 0.0


def test_incremental_build_driver(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for name in ("20180410T084537_a.nc", "20180110T120000_b.nc"):
        (src / name).write_bytes(b"\x00" * 16)
    out = str(tmp_path / "pixels")
    led = str(tmp_path / "ledger")
    cfg = PipelineConfig(window_sar=8, stride_sar=8, window_amsr2=2)

    n1 = run_incremental_build(spark, str(src), out, led, cfg, fake_decoder(8))
    assert n1 == 2
    assert spark.read.parquet(out).select("scene").distinct().count() == 2

    # idempotent: nothing new -> no work
    assert run_incremental_build(spark, str(src), out, led, cfg, fake_decoder(8)) == 0

    # new file arrives -> only it is processed
    (src / "20180907T060000_c.nc").write_bytes(b"\x00" * 16)
    n3 = run_incremental_build(spark, str(src), out, led, cfg, fake_decoder(8))
    assert n3 == 1
    counts = (
        spark.read.parquet(out).groupBy("scene").count().collect()
    )
    assert all(r["count"] == 2 * 64 for r in counts)  # no double-processing

    # new file sharing a scene prefix with an already-processed one:
    # only the NEW file's pixels are appended (regression for the
    # decode-then-filter-by-prefix bug, which re-appended the old file's)
    (src / "20180410T084537_d.nc").write_bytes(b"\x00" * 16)
    n4 = run_incremental_build(spark, str(src), out, led, cfg, fake_decoder(8))
    assert n4 == 1
    spark.catalog.refreshByPath(out)
    got = {
        r["scene"]: r["count"]
        for r in spark.read.parquet(out).groupBy("scene").count().collect()
    }
    assert got["20180410T084537"] == 2 * 2 * 64  # _a + _d exactly once each
