"""Operator unit tests pinning the reference's literal-array semantics
(/root/reference/asip_v2/tests/test_archive.py and friends)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.patching import (
    assign_sliding,
    assign_tumbling,
    clean_patches,
    patch_pixels,
)
from asid_v2_data_pipeline_spark.operators.resize import (
    any_pool_mask,
    avg_pool,
    centered_pads,
    decimate,
    uniform_filter_parity,
)
from asid_v2_data_pipeline_spark.operators.split import (
    drop_last_batches,
    fraction_split,
)
from asid_v2_data_pipeline_spark.operators.stitch import (
    reconstruction_size,
    stitch_full_image,
    stitch_pixels,
)


def _grid_df(spark, arr, scene="s"):
    rows = [
        (scene, i, j, float(v) if v is not None else None)
        for i, row in enumerate(arr)
        for j, v in enumerate(row)
    ]
    return spark.createDataFrame(
        rows, "scene string, line int, sample int, value double"
    )


def _to_array(rows, h, w):
    out = [[None] * w for _ in range(h)]
    for r in rows:
        out[r["line"]][r["sample"]] = r["value"]
    return out


def test_w3_decimation_quirk(spark):
    """tests/test_archive.py:27-44 — 5x5 step 2 -> [[0,2],[10,12]]."""
    arr = np.arange(25).reshape(5, 5)
    df = _grid_df(spark, arr.tolist())
    out = decimate(df, 2, 5, row="line", col="sample").collect()
    got = _to_array(out, 2, 2)
    assert got == [[0.0, 2.0], [10.0, 12.0]]


def test_w3_step1_identity(spark):
    df = _grid_df(spark, [[1, 2], [3, 4]])
    out = decimate(df, 1, 2, row="line", col="sample").collect()
    assert _to_array(out, 2, 2) == [[1.0, 2.0], [3.0, 4.0]]


def test_w4_uniform_filter_parity_replica():
    """tests/test_archive.py:79-97 — int 5x5, size 2, origin=-1, then
    [::2,::2] and edge-drop -> [[2,4],[12,14]]."""
    arr = np.arange(25).reshape(5, 5)
    filt = uniform_filter_parity(arr, 2, -1)
    sliced = filt[::2, ::2]
    assert sliced.shape[0] % 2  # non-dividable -> drop last row+col
    sliced = sliced[:-1, :-1]
    np.testing.assert_equal(sliced, np.array([[2, 4], [12, 14]]))


def test_w4_block_mean_matches_float_reference():
    """For step | window the engine's block mean equals the reference's
    uniform_filter(origin=-(s//2)) + decimate on float data (interior-only
    config)."""
    rng = np.random.RandomState(0)
    arr = rng.rand(8, 8).astype(np.float64)
    filt = uniform_filter_parity(arr, 2, -1)[::2, ::2]
    blocks = arr.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(filt, blocks, rtol=1e-12)


def test_w4_avg_pool_operator(spark):
    arr = np.arange(16, dtype=float).reshape(4, 4)
    df = _grid_df(spark, arr.tolist())
    out = avg_pool(
        df, 2, keys=["scene"], value_cols=["value"], height=4, row="line", col="sample"
    )
    got = _to_array(out.collect(), 2, 2)
    assert got == [[2.5, 4.5], [10.5, 12.5]]


def test_w4_avg_pool_edge_drop(spark):
    """ADVICE r1: window=8 step=4 -> sliced 2 rows, 2 % 4 != 0, so the
    reference drops the last row+col of the decimated result -> 1x1.
    Pinned against the NumPy parity path (uniform_filter + [::4,::4] +
    edge-drop), which is fully interior here."""
    rng = np.random.RandomState(7)
    arr = rng.rand(8, 8)
    filt = uniform_filter_parity(arr, 4, -2)[::4, ::4]
    assert filt.shape[0] % 4  # quirk fires
    expect = filt[:-1, :-1]
    assert expect.shape == (1, 1)

    df = _grid_df(spark, arr.tolist())
    out = avg_pool(
        df, 4, keys=["scene"], value_cols=["value"], height=8,
        row="line", col="sample",
    ).collect()
    assert len(out) == 1
    assert out[0]["line"] == 0 and out[0]["sample"] == 0
    np.testing.assert_allclose(out[0]["value"], expect[0, 0], rtol=1e-12)


def test_w4_avg_pool_rejects_nondividable_height(spark):
    """Reflect-mode borders (step does not divide the extent) must route to
    avg_pool_parity — expression mode refuses the config."""
    import pytest

    df = _grid_df(spark, np.arange(25, dtype=float).reshape(5, 5).tolist())
    with pytest.raises(ValueError, match="avg_pool_parity"):
        avg_pool(
            df, 2, keys=["scene"], value_cols=["value"], height=5,
            row="line", col="sample",
        )


def test_w6_any_pool_downsample(spark):
    """tests/test_archive.py:379-395 — 6x6 mask arange>18, block 2 ->
    [[F,F,F],[T,T,T],[T,T,T]]."""
    mask = (np.arange(36).reshape(6, 6) > 18).tolist()
    rows = [("s", i, j, bool(m)) for i, r in enumerate(mask) for j, m in enumerate(r)]
    df = spark.createDataFrame(rows, "scene string, line int, sample int, mask boolean")
    out = any_pool_mask(df, 2, keys=["scene"]).collect()
    got = [[None] * 3 for _ in range(3)]
    for r in out:
        got[r["line"]][r["sample"]] = r["mask"]
    assert got == [
        [False, False, False],
        [True, True, True],
        [True, True, True],
    ]


def test_w7_centered_pads():
    """tests/test_archive.py:345-375 — 2x3 in 6x6 -> (2,2,1,2);
    3x2 -> (1,2,2,2)."""
    assert centered_pads(2, 3, 6, 6) == (2, 2, 1, 2)
    assert centered_pads(3, 2, 6, 6) == (1, 2, 2, 2)


def test_w1_tumbling_and_f3(spark):
    """4x4 grid, window 2: patch (0,1) has a NULL -> dropped by F3."""
    arr = [[1, 2, 3, None], [5, 6, 7, 8], [9, 10, 11, 12], [13, 14, 15, 16]]
    df = assign_tumbling(_grid_df(spark, arr), 2)
    clean = clean_patches(df, 2, ["value"])
    keys = sorted((r["i"], r["j"]) for r in clean.collect())
    assert keys == [(0, 0), (1, 0), (1, 1)]


def test_w1_sliding_duplication(spark):
    """window 2, stride 1 on 3x3: interior pixel (1,1) lands in 4 patches."""
    arr = np.arange(9).reshape(3, 3)
    df = assign_sliding(_grid_df(spark, arr.tolist()), 2, 1, 3, 3)
    n = df.filter((F.col("line") == 1) & (F.col("sample") == 1)).count()
    assert n == 4
    # corner (0,0) only in patch (0,0)
    assert df.filter((F.col("line") == 0) & (F.col("sample") == 0)).count() == 1


def test_w8_stitch_pinned(spark):
    """tests/test_apply_model.py:49-72 — window 1, locs (0,0),(0,1),(1,0),
    (1,1), values 1..4 -> [[1,2],[3,4]]."""
    rows = [
        ("s", 0, 0, 0, 0, 1.0),
        ("s", 0, 1, 0, 0, 2.0),
        ("s", 1, 0, 0, 0, 3.0),
        ("s", 1, 1, 0, 0, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "scene string, i int, j int, prow int, pcol int, value double"
    )
    out = stitch_pixels(df, 1).collect()
    assert _to_array(out, 2, 2) == [[1.0, 2.0], [3.0, 4.0]]


def test_a3_reconstruction_size_pinned(spark):
    """tests/test_train_model.py:41-54 — max loc (5,9), window 2 -> 12x20
    per-axis; bug-compatible mode uses the lexicographic max tuple."""
    rows = [("s", 5, 9), ("s", 3, 2), ("s", 5, 1)]
    keys = spark.createDataFrame(rows, "scene string, i int, j int")
    r = reconstruction_size(keys, 2, bug_compatible=True).collect()[0]
    assert (r["height"], r["width"]) == (12, 20)
    # bug-compat: max(struct) picks (5,9) here; independent-axis mode same
    r2 = reconstruction_size(keys, 2, bug_compatible=False).collect()[0]
    assert (r2["height"], r2["width"]) == (12, 20)
    # divergence case: tuples (5,1) > (3,9) lexicographically
    keys2 = spark.createDataFrame([("s", 5, 1), ("s", 3, 9)], "scene string, i int, j int")
    rb = reconstruction_size(keys2, 2, bug_compatible=True).collect()[0]
    rf = reconstruction_size(keys2, 2, bug_compatible=False).collect()[0]
    assert (rb["height"], rb["width"]) == (12, 4)  # reference bug semantics
    assert (rf["height"], rf["width"]) == (12, 20)  # fixed semantics


def test_w8_full_image_fill(spark):
    rows = [("s", 1, 1, 0, 0, 7.0)]
    df = spark.createDataFrame(
        rows, "scene string, i int, j int, prow int, pcol int, value double"
    )
    out = stitch_full_image(df, 1, fill=0.0).collect()
    got = _to_array(out, 2, 2)
    assert got == [[0.0, 0.0], [0.0, 7.0]]


def test_patch_sequence_numbers_gap_parity(spark):
    """ADVICE r1 — strict mode reproduces archive.py:275,291 enumeration:
    index over the FIRST variable's loc list; unaligned locs are skipped
    but still consume an index (filename gaps)."""
    from asid_v2_data_pipeline_spark.operators.patching import (
        patch_sequence_numbers,
    )

    # first variable's clean locs, in (i, j) enumeration order
    first = [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0)]
    # second variable is missing (0, 1) and (1, 1)
    second = [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1)]
    aligned = [loc for loc in first if loc in second]

    # reference loop: enumerate(first), skip unaligned, keep index i
    expect = {loc: i for i, loc in enumerate(first) if loc in second}
    assert expect == {(0, 0): 0, (1, 0): 2, (1, 1): 3, (2, 0): 4}  # gaps

    mk = lambda locs: spark.createDataFrame(
        [("s", i, j) for i, j in locs], "scene string, i int, j int"
    )
    strict = patch_sequence_numbers(mk(aligned), first_var_keys=mk(first))
    got = {(r["i"], r["j"]): r["seq"] for r in strict.collect()}
    assert got == expect

    dense = patch_sequence_numbers(mk(aligned))
    got_dense = {(r["i"], r["j"]): r["seq"] for r in dense.collect()}
    assert got_dense == {(0, 0): 0, (1, 0): 1, (1, 1): 2, (2, 0): 3}


def test_patch_stitch_identity(spark):
    """Property: stitch(patch(x)) == x on clean grids (stride==window)."""
    arr = np.arange(16, dtype=float).reshape(4, 4)
    df = assign_tumbling(_grid_df(spark, arr.tolist()), 2)
    px = patch_pixels(df, 2, ["value"])
    back = stitch_pixels(px, 2).collect()
    np.testing.assert_equal(np.array(_to_array(back, 4, 4)), arr)


def test_o3_fraction_split_exact(spark):
    """tests/test_utility.py:108-116 — exact-count split."""
    df = spark.range(10).withColumnRenamed("id", "x")
    train, val = fraction_split(df, 0.7, seed=1)
    assert train.count() == 7 and val.count() == 3
    # deterministic: same seed -> same split
    train2, _ = fraction_split(df, 0.7, seed=1)
    assert sorted(r["x"] for r in train.collect()) == sorted(
        r["x"] for r in train2.collect()
    )


def test_o4_drop_last(spark):
    """data_generator.py:20-22 — remainder rows never served."""
    df = spark.range(10).withColumnRenamed("id", "x")
    out = drop_last_batches(df, 4, ["x"])
    assert out.count() == 8
    assert out.agg(F.max("batch_id")).collect()[0][0] == 1


def test_drop_last_string_order_col(spark):
    """Two-phase numbering's sample-based boundary path (non-numeric
    leading sort key) is exact: batch assignment matches the sorted
    order of the string keys."""
    rows = [(f"k{i:03d}",) for i in range(10)]
    df = spark.createDataFrame(rows, "name string").orderBy(F.rand(7))
    out = drop_last_batches(df, 3, ["name"])
    got = {r["name"]: r["batch_id"] for r in out.collect()}
    assert got == {f"k{i:03d}": i // 3 for i in range(9)}  # k009 dropped


def test_fraction_split_explicit_order_cols(spark):
    """order_cols path: exact head/tail split by the given key."""
    df = spark.range(10).withColumnRenamed("id", "x")
    train, val = fraction_split(df, 0.3, order_cols=["x"])
    assert sorted(r["x"] for r in train.collect()) == [0, 1, 2]
    assert sorted(r["x"] for r in val.collect()) == [3, 4, 5, 6, 7, 8, 9]


def test_anomaly_zscore_constant_type_emits_nothing(spark, tmp_path):
    """σ = 0 guard (ADVICE r5): a constant-valued event type has no
    outliers — without the guard z = 0/0 = NaN and NaN > 2.5 is TRUE in
    both engines' ordering, so every row of the constant stream would
    surface as an 'anomaly'.  Same for a single-event type."""
    import datetime

    from asid_v2_data_pipeline_spark.queries.temporal import t_anomaly_zscore

    t0 = datetime.datetime(2024, 1, 1)
    rows = (
        # constant type: 5 identical values -> sd = 0 -> no rows
        [(i, t0, 1, "const", 7.0, None) for i in range(5)]
        # singleton type: one event -> sd = 0 -> no rows
        + [(10, t0, 1, "single", 3.0, None)]
        # varied type with one 3-sigma outlier -> exactly that row
        + [(20 + i, t0, 1, "varied", float(v), None)
           for i, v in enumerate([10, 10, 10, 10, 10, 10, 10, 10, 10, 40])]
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = t_anomaly_zscore(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in out] == [29]
    assert all(r["event_type"] == "varied" for r in out)
