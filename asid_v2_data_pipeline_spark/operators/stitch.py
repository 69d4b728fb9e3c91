"""W8 — patch stitching / scene reconstruction (+ A3 sizing).

Inverse of tumbling patch extraction: place patch (i, j) at pixel offset
(i·w, j·w) (/root/reference/asip_v2/apply_model.py:58-83).  With long-form
patch pixels this is pure arithmetic — a narrow map, no shuffle.  Where
patches overlap (sliding strides), the reference's scatter loop lets the
*later* patch win; we reproduce that with a row_number over patch sequence
descending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stitch_pixels(
    patch_px: DataFrame,
    window: int,
    value_col: str = "value",
    dedupe_overlaps: bool = False,
    seq_col: str = "seq",
) -> DataFrame:
    """(scene, i, j, prow, pcol, value) -> (scene, line, sample, value).

    apply_model.py:70-77: offsets = loc × window, scatter into the image.
    """
    out = patch_px.select(
        "scene",
        (F.col("i") * window + F.col("prow")).alias("line"),
        (F.col("j") * window + F.col("pcol")).alias("sample"),
        F.col(value_col).alias("value"),
        *([F.col(seq_col)] if dedupe_overlaps else []),
    )
    if dedupe_overlaps:
        w = Window.partitionBy("scene", "line", "sample").orderBy(F.col(seq_col).desc())
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
    return out


def reconstruction_size(
    patch_keys: DataFrame, window: int, bug_compatible: bool = True
) -> DataFrame:
    """A3 — image size from max patch loc: ``(max+1)·w`` per axis
    (train_model.py:83-99, pinned tests/test_train_model.py:41-54).

    The reference takes ``max(patch_locs)`` of *tuples* — lexicographic —
    then uses that single tuple's [0] and [1] for both axes
    (train_model.py:96-99).  ``bug_compatible=True`` reproduces it via
    ``max(struct(i, j))``; ``False`` sizes axes independently
    (``max(i), max(j)`` — the fixed semantics)."""
    if bug_compatible:
        agg = patch_keys.groupBy("scene").agg(
            F.max(F.struct("i", "j")).alias("_m")
        )
        return agg.select(
            "scene",
            ((F.col("_m.i") + 1) * window).alias("height"),
            ((F.col("_m.j") + 1) * window).alias("width"),
        )
    agg = patch_keys.groupBy("scene").agg(F.max("i").alias("_mi"), F.max("j").alias("_mj"))
    return agg.select(
        "scene",
        ((F.col("_mi") + 1) * window).alias("height"),
        ((F.col("_mj") + 1) * window).alias("width"),
    )


def build_canvas(dims: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """The A3-size zeros canvas as rows: lines × samples per scene.

    ``salt_buckets=0``: plain join on ``scene`` — correct, but the
    canvas of a giant scene lands in ONE shuffle partition, and because
    ``dims`` is agg-DERIVED, AQE's OptimizeSkewedJoin cannot split it
    (it only matches SMJ(Sort(Shuffle), Sort(Shuffle)); the aggregate
    between sort and shuffle defeats the rule — SCALE.md).

    ``salt_buckets>0``: the explicit salted fallback for exactly that
    case — the line side carries a DETERMINISTIC salt
    ``pmod(line, B)``, the sample side replicates each row across all
    ``B`` salts, and the join key becomes ``(scene, _salt)``, spreading
    a giant scene's canvas across ``B`` partitions (pinned with
    partition-spread evidence in tests/test_skew.py).  Deterministic
    salting beats ``rand()``: replays and retries see the same
    distribution."""
    lines = dims.select(
        "scene",
        F.explode(F.sequence(F.lit(0), F.col("height") - 1)).alias("line"),
    )
    samples = dims.select(
        "scene",
        F.explode(F.sequence(F.lit(0), F.col("width") - 1)).alias("sample"),
    )
    if salt_buckets <= 0:
        return lines.join(samples, "scene")
    l_s = lines.withColumn("_salt", F.pmod(F.col("line"), F.lit(salt_buckets)))
    s_s = samples.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l_s.join(s_s, ["scene", "_salt"]).drop("_salt")


def stitch_full_image(
    patch_px: DataFrame,
    window: int,
    value_col: str = "value",
    fill: float = 0.0,
    bug_compatible_size: bool = True,
    salt_buckets: int = 0,
) -> DataFrame:
    """Full reconstruction: zeros canvas of A3 size, patches scattered in
    (apply_model.py:66-77).  Pixels not covered by any patch get ``fill``
    (np.zeros canvas).  Returns (scene, line, sample, value).
    ``salt_buckets`` > 0 salts the canvas build for giant-scene skew
    (see ``build_canvas``)."""
    keys = patch_px.select("scene", "i", "j").distinct()
    dims = reconstruction_size(keys, window, bug_compatible=bug_compatible_size)
    canvas = build_canvas(dims, salt_buckets)
    px = stitch_pixels(patch_px, window, value_col)
    return canvas.join(px, ["scene", "line", "sample"], "left").select(
        "scene",
        "line",
        "sample",
        F.coalesce(F.col("value"), F.lit(fill)).alias("value"),
    )
