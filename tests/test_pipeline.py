"""End-to-end build-pipeline tests on the domain fixtures (SURVEY.md §3.1),
plus ledger and regrid semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark import fixtures
from asid_v2_data_pipeline_spark.config import PipelineConfig
from asid_v2_data_pipeline_spark.operators.filters import healthy_scenes
from asid_v2_data_pipeline_spark.operators.regrid import (
    bilinear_regrid,
    target_points,
)
from asid_v2_data_pipeline_spark.plans.build_pipeline import build_patches
from asid_v2_data_pipeline_spark.sources.ledger import unprocessed


@pytest.fixture(scope="module")
def built(spark):
    cfg = PipelineConfig(window_sar=8, stride_sar=8, window_amsr2=2, encoding="binary")
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


def test_health_filter_excludes_unhealthy(spark):
    ok = sorted(r["scene"] for r in healthy_scenes(fixtures.scenes(spark), 8).collect())
    assert ok == sorted([fixtures.SCENE_A, fixtures.SCENE_B, fixtures.SCENE_C])


def test_clean_patch_set(built):
    """16 tumbling patches minus 3 dirty ones (icechart hole, masked SAR
    cluster, single-NULL pixel) = 13 survivors."""
    keys = sorted((r["i"], r["j"]) for r in built.select("i", "j").distinct().collect())
    assert len(keys) == 13
    for dirty in [(0, 1), (1, 2), (2, 1)]:
        assert dirty not in keys


def test_patch_pixel_counts(built):
    counts = {r["var"]: r["n"] for r in built.groupBy("var").agg(F.count("*").alias("n")).collect()}
    for v in ("nersc_sar_primary", "nersc_sar_secondary", "ice_type_0", "ice_type_3"):
        assert counts[v] == 13 * 64
    for v in ("btemp_6_9h", "btemp_6_9v"):  # C8 renaming applied
        assert counts[v] == 13 * 4


def test_decode_join_values(built):
    """Block index = 4i+j -> ids cycle [33,35,40,...]: patch (0,2) is
    polygon 40 (ct<10 -> open water, oh=[1,0,0,0]); patch (1,0) is polygon
    42 (multi-year dominant, oh=[0,0,0,1])."""
    def val(var, i, j):
        return built.filter(
            (F.col("var") == var)
            & (F.col("i") == i)
            & (F.col("j") == j)
            & (F.col("prow") == 0)
            & (F.col("pcol") == 0)
        ).collect()[0]["value"]

    assert val("ice_type_0", 0, 2) == 1.0
    assert val("ice_type_3", 1, 0) == 1.0
    assert val("ice_type_0", 1, 0) == 0.0


def test_no_null_values_in_clean_patches(built):
    assert built.filter(F.col("value").isNull()).count() == 0


def test_regrid_extrapolation(spark):
    """fill_value=None semantics: targets outside the coarse hull
    extrapolate linearly from the edge segment — exact for a linear
    field."""
    amsr = fixtures.amsr2_pixels(spark)
    # 40x40 target space: targets at 2+4k up to 38 > last coarse coord 30
    dims = spark.createDataFrame(
        [(fixtures.SCENE_A, 40, 40)], "scene string, height int, width int"
    )
    tgt = target_points(spark, dims, 4)
    rg = bilinear_regrid(amsr, tgt).filter(F.col("ch") == "btemp_6.9h")
    chk = rg.withColumn(
        "expected", 200 + 0.5 * (2 + 4 * F.col("ti")) + 0.25 * (2 + 4 * F.col("tj"))
    )
    err = chk.agg(F.max(F.abs(F.col("value") - F.col("expected")))).collect()[0][0]
    assert err < 1e-9
    assert rg.count() == 100  # full 10x10 target grid incl. extrapolated


def test_regrid_null_propagation(spark):
    amsr = fixtures.amsr2_pixels(spark).withColumn(
        "btemp",
        F.when((F.col("aline") == 0) & (F.col("asample") == 0), None).otherwise(
            F.col("btemp")
        ),
    )
    dims = spark.createDataFrame(
        [(fixtures.SCENE_A, 32, 32)], "scene string, height int, width int"
    )
    rg = bilinear_regrid(amsr, target_points(spark, dims, 4))
    # the 4 targets whose corner set includes (0,0) must be NULL per channel
    nulls = rg.filter(F.col("value").isNull()).count()
    assert nulls == 2  # exactly the (0,0) target for each of 2 channels


def test_ledger_antijoin(spark):
    files = fixtures.scenes(spark).select(
        F.element_at(F.split("path", "/"), -1).alias("name")
    )
    led = fixtures.ledger(spark)
    todo = sorted(r["name"] for r in unprocessed(files, led).collect())
    assert len(todo) == 4
    assert f"{fixtures.SCENE_B}_S1B_AMSR2_Icechart.nc" not in todo


def test_continous_pipeline_normalization(spark):
    """ice_type_* sums to 1 except pixels of unmapped-stage polygons
    (reference behavior, hot_encoding_utils.py:137-143)."""
    cfg = PipelineConfig(window_sar=8, stride_sar=8, window_amsr2=2, encoding="continous")
    px = build_patches(
        fixtures.scenes(spark),
        fixtures.sar_pixels(spark),
        fixtures.icechart_pixels(spark),
        fixtures.polygon_codes(spark),
        fixtures.amsr2_pixels(spark),
        cfg,
    )
    sums = (
        px.filter(F.col("var").startswith("ice_type"))
        .groupBy("i", "j", "prow", "pcol")
        .agg(F.round(F.sum("value"), 6).alias("s"))
    )
    distinct_sums = sorted(r["s"] for r in sums.select("s").distinct().collect())
    # 0.3 = polygon 44 (stage 94 unmapped: only 1-ct/100 is set);
    # 0.95 = polygon 40 (ct<10 with all partials -9: 1-ct/100, sa unmapped)
    assert distinct_sums == [0.3, 0.95, 1.0]
