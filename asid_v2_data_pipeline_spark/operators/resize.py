"""Resize / downsample operators (SURVEY.md §2.4 W3-W7).

All are expressed over long-form pixel tables ``(…, prow, pcol, value)``
(patch-local or scene coordinates — the math is identical).  Everything is
key arithmetic + groupBy: map-side combinable, no data duplication, scales
linearly with pixel count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decimate(
    df: DataFrame,
    step: int,
    height: int,
    row: str = "prow",
    col: str = "pcol",
) -> DataFrame:
    """W3 — strided decimation ``arr[::step, ::step]`` with the reference's
    trailing-edge quirk (/root/reference/asip_v2/archive.py:40-48, pinned at
    tests/test_archive.py:27-44: 5x5 step 2 -> [[0,2],[10,12]]).

    The quirk: after slicing, if the *sliced* row count is not divisible by
    ``step``, the last row AND column of the sliced result are dropped —
    the remainder test uses the sliced shape, and only shape[0].
    ``height`` is the pre-slice row count (window size for patches).
    """
    if step == 1:
        return df
    out = df.filter((F.col(row) % step == 0) & (F.col(col) % step == 0))
    sliced_rows = -(-height // step)  # ceil
    if sliced_rows % step:
        # drop last row and last column of the *decimated* result
        out = out.filter(
            (F.col(row) / step < sliced_rows - 1)
            & (F.col(col) / step < sliced_rows - 1)
        )
    # re-index to the decimated grid
    return out.withColumn(row, (F.col(row) / step).cast("int")).withColumn(
        col, (F.col(col) / step).cast("int")
    )


def avg_pool(
    df: DataFrame,
    step: int,
    keys: list[str],
    value_cols: list[str],
    height: int,
    row: str = "prow",
    col: str = "pcol",
) -> DataFrame:
    """W4 — average-pool resize (SarBatches.resize, archive.py:88-104).

    The reference runs ``uniform_filter(size=step, origin=-(step//2))``
    (a *forward-looking* step×step box mean) then decimates at ``::step``
    with the same trailing-edge quirk as :func:`decimate`: if the *sliced*
    row count ``ceil(height/step)`` is not divisible by ``step``, the last
    row AND column of the decimated result are dropped (shape[0] only,
    applied to both axes — archive.py:40-48 runs after the filter).

    When ``step`` divides ``height`` every kept position's box is fully
    interior, so the filter+decimate is exactly a non-overlapping block
    mean — ``groupBy(floor(row/step), floor(col/step)).avg(value)`` with
    the edge-drop applied as a pre-shuffle filter.  When it does not,
    reflect-mode borders leak into the kept positions and the block-mean
    identity breaks: that config must go through ``avg_pool_parity``.

    ``height`` is the pre-slice row extent (the patch window size).
    """
    if step == 1:
        return df
    if height % step:
        raise ValueError(
            f"avg_pool expression mode requires step | height (got height="
            f"{height}, step={step}); use avg_pool_parity for reflect-mode "
            "borders"
        )
    sliced_rows = height // step
    if sliced_rows % step:
        # reference edge-drop: last row+col of the decimated result vanish;
        # filter BEFORE the groupBy so the dropped blocks never shuffle
        df = df.filter(
            (F.col(row) / step < sliced_rows - 1)
            & (F.col(col) / step < sliced_rows - 1)
        )
    gi = (F.col(row) / step).cast("int").alias(row)
    gj = (F.col(col) / step).cast("int").alias(col)
    aggs = [F.avg(c).alias(c) for c in value_cols]
    return df.groupBy(*[F.col(k) for k in keys], gi, gj).agg(*aggs)


def any_pool_mask(
    df: DataFrame,
    block: int,
    keys: list[str],
    mask_col: str = "mask",
    row: str = "line",
    col: str = "sample",
) -> DataFrame:
    """W6 (old API) — downsample a boolean mask: a block is masked if ANY
    member pixel is masked (downsample_mask_for_amsr2, pinned at
    tests/test_archive.py:379-395)."""
    gi = (F.col(row) / block).cast("int").alias(row)
    gj = (F.col(col) / block).cast("int").alias(col)
    return df.groupBy(*[F.col(k) for k in keys], gi, gj).agg(
        F.max(F.col(mask_col).cast("int")).cast("boolean").alias(mask_col)
    )


def centered_pads(in_h: int, in_w: int, out_h: int, out_w: int) -> tuple[int, int, int, int]:
    """W7 — centered pad widths (top, bottom, left, right).

    Odd-split rule pinned at tests/test_archive.py:345-375:
    top = floor(dh/2), bottom = ceil(dh/2); left = floor(dw/2),
    right = ceil(dw/2)  (2x3 in 6x6 -> (2,2,1,2); 3x2 -> (1,2,2,2))."""
    dh, dw = out_h - in_h, out_w - in_w
    return (dh // 2, dh - dh // 2, dw // 2, dw - dw // 2)


def pad_centered(
    df: DataFrame,
    spark,
    in_h: int,
    in_w: int,
    out_h: int,
    out_w: int,
    keys_df: DataFrame,
    value_cols: dict[str, object],
    row: str = "line",
    col: str = "sample",
) -> DataFrame:
    """W7 — pad each (keyed) grid to (out_h, out_w) with constant values,
    centered (calculate_pading, pinned tests/test_archive.py:46-57).

    Spark shape: shift existing pixels by (top, left), then union the pad
    ring generated with ``sequence``+``explode`` (one row per pad pixel per
    key) — no driver-side loops, scales with #keys × pad area.
    ``value_cols`` maps column name -> pad constant.
    """
    top, _bottom, left, _right = centered_pads(in_h, in_w, out_h, out_w)
    shifted = df.withColumn(row, F.col(row) + top).withColumn(col, F.col(col) + left)

    full = keys_df.withColumn(
        row, F.explode(F.sequence(F.lit(0), F.lit(out_h - 1)))
    ).withColumn(col, F.explode(F.sequence(F.lit(0), F.lit(out_w - 1))))
    inside = (
        (F.col(row) >= top)
        & (F.col(row) < top + in_h)
        & (F.col(col) >= left)
        & (F.col(col) < left + in_w)
    )
    pad_ring = full.filter(~inside)
    for c, const in value_cols.items():
        pad_ring = pad_ring.withColumn(c, F.lit(const))
    return shifted.select(pad_ring.columns).unionByName(pad_ring)


def avg_pool_parity(
    df: DataFrame,
    step: int,
    keys: list[str],
    height: int,
    width: int,
    value_col: str = "value",
    row: str = "prow",
    col: str = "pcol",
) -> DataFrame:
    """W4 parity mode — exact ``uniform_filter(size=step,
    origin=-(step//2))`` + decimation semantics per keyed grid, including
    reflect-mode borders when ``step`` does not divide the extent
    (archive.py:88-104).  Arrow-batched ``applyInPandas`` per grid; use the
    expression-mode ``avg_pool`` when step divides the window (identical
    result, no Python)."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = [df.schema[k] for k in keys] + [
        T.StructField(row, T.IntegerType(), False),
        T.StructField(col, T.IntegerType(), False),
        T.StructField(value_col, T.DoubleType(), True),
    ]
    schema = T.StructType(out_fields)

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        grid = np.full((height, width), np.nan)
        grid[pdf[row].to_numpy(), pdf[col].to_numpy()] = pdf[value_col].to_numpy()
        filt = uniform_filter_parity(grid, step, -(step // 2))
        dec = filt[::step, ::step]
        if dec.shape[0] % step:
            dec = dec[:-1, :-1]
        rr, cc = np.meshgrid(
            np.arange(dec.shape[0]), np.arange(dec.shape[1]), indexing="ij"
        )
        out = {k: pdf[k].iloc[0] for k in keys}
        out.update({row: rr.ravel(), col: cc.ravel(), value_col: dec.ravel()})
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(pool, schema)


def uniform_filter_parity(array, size: int, origin: int):
    """NumPy replica of ``scipy.ndimage.uniform_filter`` (separable box
    mean, reflect boundary, int truncation for integer dtypes) for the
    parity tests — scipy itself is not a dependency of this engine.

    Pinned against tests/test_archive.py:79-97 (5x5 int, size 2,
    origin=-1 -> after [::2,::2] and edge-drop: [[2,4],[12,14]]).
    """
    import numpy as np

    def axis_pass(a, axis):
        n = a.shape[axis]
        idx = np.arange(n)
        acc = None
        # window offsets: k - size//2 - origin for k in 0..size-1
        # (origin=-(size//2) makes the box forward-looking, per the pinned test)
        for k in range(size):
            off = k - size // 2 - origin
            src = idx + off
            # reflect mode (scipy default), (d c b a | a b c d | d c b a)
            src = np.where(src < 0, -src - 1, src)
            src = np.where(src >= n, 2 * n - src - 1, src)
            taken = np.take(a, src, axis=axis)
            if acc is None:
                acc = taken.astype(
                    np.int64 if np.issubdtype(a.dtype, np.integer) else np.float64
                )
            else:
                acc = acc + taken
        if np.issubdtype(a.dtype, np.integer):
            # scipy truncates per 1-D pass for integer dtypes
            return np.floor_divide(acc, size).astype(a.dtype)
        return (acc / size).astype(a.dtype)

    out = array
    for ax in range(array.ndim):
        out = axis_pass(out, ax)
    return out
