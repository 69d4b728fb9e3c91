"""Filename-convention scalar functions (C5-C12) and the W4 parity-mode
pandas UDF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.functions.strings import (
    header_truncate,
    npz_name_conventer,
    parse_code_row,
    parse_patch_loc,
    patch_filename,
    patch_filename_old,
    scene_id,
    scene_timestamp,
)
from asid_v2_data_pipeline_spark.operators.resize import (
    avg_pool,
    avg_pool_parity,
    uniform_filter_parity,
)


def test_scene_id_and_timestamp(spark):
    """C5/C9 pinned (tests/test_archive.py:293-296)."""
    df = spark.createDataFrame([("20180410T084537_S1B_AMSR2_",)], "name string")
    r = df.select(
        scene_id(F.col("name")).alias("s"),
        F.date_format(scene_timestamp(F.col("name")), "yyyy-MM-dd HH:mm:ss").alias("t"),
    ).collect()[0]
    assert r["s"] == "20180410T084537"
    assert r["t"] == "2018-04-10 08:45:37"


def test_header_truncate_and_code_row(spark):
    """C6/C7 pinned (tests/test_archive.py:287-303)."""
    hdr = "id;CT;CA;SA;FA;CB;SB;FB;CC;SC;FC;CN;CD;CF;POLY_TYPE"
    row = "33;92;-9;91; 8;-9;-9;-9;-9;-9;-9;-9;-9;-9;I"
    df = spark.createDataFrame([(hdr, row)], "h string, r string")
    got = df.select(
        header_truncate(F.col("h")).alias("names"),
        *[c.alias(f"v{i}") for i, c in enumerate(parse_code_row(F.col("r")))],
    ).collect()[0]
    assert got["names"] == ["id", "CT", "CA", "SA", "FA", "CB", "SB", "FB", "CC", "SC", "FC"]
    assert [got[f"v{i}"] for i in range(11)] == [33, 92, -9, 91, 8, -9, -9, -9, -9, -9, -9]


def test_name_conventer(spark):
    """C8 pinned (tests/test_archive.py:202-206)."""
    df = spark.createDataFrame([("btemp_89.0h",)], "n string")
    assert (
        df.select(npz_name_conventer(F.col("n")).alias("o")).collect()[0]["o"]
        == "btemp_89_0h"
    )


def test_patch_filenames_roundtrip(spark):
    """C11/C12 — new format {scene}_{seq:06d}.npz (archive.py:291) and the
    old format with loc suffix (tests/test_archive.py:433-447), parsed
    back."""
    df = spark.createDataFrame([("20180410T084537", 7, 11, 12)], "s string, q int, i int, j int")
    out = df.select(
        patch_filename(F.col("s"), F.col("q")).alias("new"),
        patch_filename_old(F.col("s"), F.col("q"), "nersc_", F.col("i"), F.col("j")).alias("old"),
    )
    r = out.collect()[0]
    assert r["new"] == "20180410T084537_000007.npz"
    assert r["old"] == "20180410T084537_000007_nersc_-11_12.npz"
    i, j = parse_patch_loc(F.col("old"))
    back = out.select(i.alias("i"), j.alias("j")).collect()[0]
    assert (back["i"], back["j"]) == (11, 12)


def test_avg_pool_parity_matches_expression_when_dividable(spark):
    rng = np.random.RandomState(3)
    arr = rng.rand(8, 8)
    rows = [("s", i, j, float(v)) for i, r in enumerate(arr) for j, v in enumerate(r)]
    df = spark.createDataFrame(rows, "scene string, prow int, pcol int, value double")
    expr = {
        (r["prow"], r["pcol"]): r["value"]
        for r in avg_pool(df, 2, keys=["scene"], value_cols=["value"], height=8).collect()
    }
    par = {
        (r["prow"], r["pcol"]): r["value"]
        for r in avg_pool_parity(df, 2, ["scene"], 8, 8).collect()
    }
    assert set(expr) == set(par)
    for k in expr:
        assert expr[k] == pytest.approx(par[k], rel=1e-12)


def test_avg_pool_parity_nondividable_border(spark):
    """5x5 step 2 (reference pinned int case adapted to float): parity mode
    reproduces uniform_filter reflect borders + the edge-drop, where the
    plain block mean cannot."""
    arr = np.arange(25, dtype=float).reshape(5, 5)
    rows = [("s", i, j, float(v)) for i, r in enumerate(arr) for j, v in enumerate(r)]
    df = spark.createDataFrame(rows, "scene string, prow int, pcol int, value double")
    got = {
        (r["prow"], r["pcol"]): r["value"]
        for r in avg_pool_parity(df, 2, ["scene"], 5, 5).collect()
    }
    ref = uniform_filter_parity(arr, 2, -1)[::2, ::2][:-1, :-1]
    assert sorted(got) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    for (i, j), v in got.items():
        assert v == pytest.approx(ref[i, j], rel=1e-12)
