"""Old-API mask pipeline + raw decode (pinned) and the netCDF source
plumbing with an injected decode kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.plans.masked_pipeline import (
    compute_masks,
    decode_icechart_raw,
)
from asid_v2_data_pipeline_spark.sources.netcdf import fake_decoder, read_scenes


def test_decode_icechart_raw_pinned(spark):
    """tests/test_archive.py:145-159 — map {33: [92,...], 45: [30, 10,...]},
    array [[45,33],[33,45]]: element 0 (CT) -> [[30,92],[92,30]],
    element 1 (CA) -> [[10,-9],[-9,10]]."""
    codes = spark.createDataFrame(
        [("s", 33, 92, -9), ("s", 45, 30, 10)], "scene string, id int, ct int, ca int"
    )
    ice = spark.createDataFrame(
        [("s", 0, 0, 45), ("s", 0, 1, 33), ("s", 1, 0, 33), ("s", 1, 1, 45)],
        "scene string, line int, sample int, polygon_id int",
    )
    ct = {
        (r["line"], r["sample"]): r["ct"]
        for r in decode_icechart_raw(ice, codes, "ct").collect()
    }
    assert ct == {(0, 0): 30, (0, 1): 92, (1, 0): 92, (1, 1): 30}
    ca = {
        (r["line"], r["sample"]): r["ca"]
        for r in decode_icechart_raw(ice, codes, "ca").collect()
    }
    assert ca == {(0, 0): 10, (0, 1): -9, (1, 0): -9, (1, 1): 10}


def test_compute_masks_composition(spark):
    """4x4 SAR grid, aspect 2, coarse 2x2 with one masked cell: the
    composed full mask ORs SAR nulls, distance, and the upsampled AMSR
    mask; the downsampled mask any-pools."""
    sar_rows = []
    for line in range(4):
        for sample in range(4):
            v = None if (line, sample) == (0, 0) else 1.0
            sar_rows.append(("s", line, sample, v, 100.0))
    sar = spark.createDataFrame(
        sar_rows, "scene string, line int, sample int, sar float, distance_map float"
    )
    ice = spark.createDataFrame(
        [("s", line, s, 1) for line in range(4) for s in range(4)],
        "scene string, line int, sample int, polygon_id int",
    )
    amsr_mask = spark.createDataFrame(
        [("s", 0, 0, False), ("s", 0, 1, False), ("s", 1, 0, False), ("s", 1, 1, True)],
        "scene string, line int, sample int, mask boolean",
    )
    full, coarse = compute_masks(
        sar, ice, amsr_mask, ["sar"], distance_threshold=0, aspect_ratio=2,
        sar_h=4, sar_w=4,
    )
    fm = {(r["line"], r["sample"]): r["mask"] for r in full.collect()}
    assert fm[(0, 0)] is True  # SAR null
    assert fm[(0, 1)] is False
    assert fm[(3, 3)] is True  # upsampled AMSR mask (coarse (1,1))
    assert fm[(2, 2)] is True
    cm = {(r["line"], r["sample"]): r["mask"] for r in coarse.collect()}
    assert cm == {(0, 0): True, (0, 1): False, (1, 0): False, (1, 1): True}


def test_netcdf_source_with_injected_decoder(spark, tmp_path):
    """binaryFile -> mapInPandas plumbing with a deterministic fake
    kernel: 2 files x 2 vars x 8x8 pixels, one masked pixel per var."""
    for name in ("20180410T084537_a.nc", "20180110T120000_b.nc"):
        (tmp_path / name).write_bytes(b"\x00" * 64)
    df = read_scenes(
        spark, str(tmp_path), ["sar_primary", "sar_secondary"], fake_decoder(8)
    )
    assert df.count() == 2 * 2 * 64
    assert df.filter(F.col("value").isNull()).count() == 4  # 1/var/file
    scenes = sorted(r["scene"] for r in df.select("scene").distinct().collect())
    assert scenes == ["20180110T120000", "20180410T084537"]


def test_netcdf_stub_raises_without_lib(spark, tmp_path):
    (tmp_path / "20180410T084537_x.nc").write_bytes(b"\x00")
    df = read_scenes(spark, str(tmp_path), ["sar_primary"])
    with pytest.raises(Exception, match="(?i)netcdf|NotImplemented"):
        df.collect()
