"""Overlapping-stride build path, checked differentially against a NumPy
replication of the reference's make_batch semantics
(/root/reference/asip_v2/archive.py:50-72: view_as_windows + NaN skip)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark import fixtures
from asid_v2_data_pipeline_spark.config import PipelineConfig
from asid_v2_data_pipeline_spark.plans.build_pipeline import build_patches


def _sar_primary_array():
    """Rebuild fixtures.sar_pixels' sar_primary as a NumPy masked grid."""
    H = W = 32
    arr = np.zeros((H, W))
    for line in range(H):
        for sample in range(W):
            i, j = line // 8, sample // 8
            masked = (i, j) == (1, 2) and line % 8 < 4
            single = (i, j) == (2, 1) and (line, sample) == (17, 9)
            arr[line, sample] = np.nan if (masked or single) else line * W + sample
    return arr


def _reference_clean_locs(arr, window, stride):
    """make_batch semantics: all full windows, skip any containing NaN."""
    H, W = arr.shape
    locs = []
    for i in range((H - window) // stride + 1):
        for j in range((W - window) // stride + 1):
            v = arr[i * stride : i * stride + window, j * stride : j * stride + window]
            if not np.any(np.isnan(v)):
                locs.append((i, j))
    return set(locs)


@pytest.mark.parametrize("stride", [4, 8])
def test_sliding_build_matches_reference_semantics(spark, stride):
    cfg = PipelineConfig(window_sar=8, stride_sar=stride, window_amsr2=2)
    px = build_patches(
        fixtures.scenes(spark),
        fixtures.sar_pixels(spark),
        fixtures.icechart_pixels(spark),
        fixtures.polygon_codes(spark),
        fixtures.amsr2_pixels(spark),
        cfg,
    )
    got = {
        (r["i"], r["j"])
        for r in px.select("i", "j").distinct().collect()
    }

    # reference: intersection of clean locs across all variable groups
    sar1 = _sar_primary_array()
    ref_sar = _reference_clean_locs(sar1, 8, stride)
    # sar_secondary shares the (1,2)-cluster mask only; icechart has a
    # hole at (2,10) -> affects windows covering that pixel
    ice = np.zeros((32, 32))
    ice[2, 10] = np.nan
    ref_ice = _reference_clean_locs(ice, 8, stride)
    expected = ref_sar & ref_ice
    assert got == expected

    # patch pixel counts: every surviving patch fully materialized
    n = px.filter(F.col("var") == "nersc_sar_primary").count()
    assert n == len(expected) * 64


def test_sliding_patch_values(spark):
    """Overlapping patches duplicate pixels with consistent values: the
    same grid pixel appears in multiple patches with the same value."""
    cfg = PipelineConfig(window_sar=8, stride_sar=4, window_amsr2=2)
    px = build_patches(
        fixtures.scenes(spark),
        fixtures.sar_pixels(spark),
        fixtures.icechart_pixels(spark),
        fixtures.polygon_codes(spark),
        fixtures.amsr2_pixels(spark),
        cfg,
    )
    sp = px.filter(F.col("var") == "nersc_sar_primary")
    # reconstruct absolute coords; duplicated pixels must agree on value
    back = sp.select(
        (F.col("i") * 4 + F.col("prow")).alias("line"),
        (F.col("j") * 4 + F.col("pcol")).alias("sample"),
        "value",
    )
    per_pixel = back.groupBy("line", "sample").agg(
        F.countDistinct("value").alias("nv"), F.count("*").alias("n")
    )
    assert per_pixel.filter(F.col("nv") > 1).count() == 0
    assert per_pixel.filter(F.col("n") > 1).count() > 0  # overlaps exist
