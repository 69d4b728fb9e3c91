"""Raster/patch operator queries, oracle-checked.

A deterministic 64×64 "raster" is derived from lineitem (row_number over
the (l_orderkey, l_linenumber) key -> dense (line, sample) coords, NULLs
injected by a partkey rule), then the engine's *actual* patch operators
(asid_v2_data_pipeline_spark.operators) run over it.  The DuckDB oracle
recomputes the same semantics in plain SQL — so every declared query
checks the real operator implementation, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.patching import assign_tumbling, clean_patches, patch_pixels
from ..operators.resize import any_pool_mask, avg_pool, decimate
from ..operators.stitch import reconstruction_size, stitch_pixels
from ..schemas import load_table

N = 64  # grid side
W = 8  # patch window

# the full 6-column sort key is the minimal unique key of the synthetic
# lineitem — (l_orderkey, l_linenumber) alone has ties, which would make
# the rank (and thus pixel placement) engine-dependent
ORDER_KEY = "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice"

GRID_CTE = f"""
WITH px AS (
  SELECT CAST(rn // {N} AS INT) AS line,
         CAST(rn % {N} AS INT)  AS sample,
         CASE WHEN l_partkey % 97 = 0 THEN NULL ELSE l_quantity END AS value
  FROM (SELECT l_partkey, l_quantity,
               row_number() OVER (ORDER BY {ORDER_KEY}) - 1 AS rn
        FROM lineitem) t
  WHERE rn < {N * N}
)
"""


def pixel_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: measured, left WITHOUT the _parallel layout — repartitioning
    # 600K wide rows to parallelize the top-k cost more than the
    # single-core scan it saved (w4 0.41->0.79 s, w8 0.65->1.57 s in
    # the in-situ A/B; only w1 improved).  The single-row-group scan is
    # the floor here; at production scale inputs arrive in many splits.
    li = load_table(spark, sf_dir, "lineitem")
    # orderBy+limit compiles to TakeOrderedAndProject (parallel partial
    # top-k, no full single-partition sort); the row_number window then
    # ranks only N*N rows.  Same rows as ranking the full table.
    key = [
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
    ]
    top = li.select(*key).orderBy(*key).limit(N * N)
    w = Window.orderBy(*key)
    return (
        top.select("l_partkey", "l_quantity", (F.row_number().over(w) - 1).alias("rn"))
        .select(
            F.floor(F.col("rn") / N).cast("int").alias("line"),
            (F.col("rn") % N).cast("int").alias("sample"),
            F.when(F.col("l_partkey") % 97 == 0, F.lit(None))
            .otherwise(F.col("l_quantity"))
            .alias("value"),
        )
    )


def w1_tumbling_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 — tumbling patch stats: per-patch count + rounded sum."""
    g = assign_tumbling(pixel_grid(spark, sf_dir), W)
    return (
        g.groupBy("i", "j")
        .agg(
            F.count("value").alias("n_valid"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("i", "j")
    )


W1_SQL = GRID_CTE + f"""
SELECT CAST(line // {W} AS INT) AS i, CAST(sample // {W} AS INT) AS j,
       COUNT(value) AS n_valid, ROUND(SUM(value), 4) AS sum_value
FROM px
GROUP BY 1, 2
ORDER BY i, j
"""


def f3_clean_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — NaN-free patch keys via the engine's clean_patches operator."""
    g = assign_tumbling(
        pixel_grid(spark, sf_dir).withColumn("scene", F.lit("g")), W
    )
    return clean_patches(g, W, ["value"]).select("i", "j").orderBy("i", "j")


F3_SQL = GRID_CTE + f"""
SELECT CAST(line // {W} AS INT) AS i, CAST(sample // {W} AS INT) AS j
FROM px
GROUP BY 1, 2
HAVING COUNT(value) = {W * W}
ORDER BY i, j
"""


def w3_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — strided decimation with the reference's trailing-edge quirk
    (step 3 on a 64-grid: sliced 22 rows, 22 % 3 != 0 -> drop last
    row+col of the decimated result)."""
    g = pixel_grid(spark, sf_dir)
    out = decimate(g, 3, N, row="line", col="sample")
    return out.select("line", "sample", F.round("value", 4).alias("value")).orderBy(
        "line", "sample"
    )


_sliced = -(-N // 3)  # 22
_limit = (_sliced - 1) if _sliced % 3 else _sliced
W3_SQL = GRID_CTE + f"""
SELECT CAST(line // 3 AS INT) AS line, CAST(sample // 3 AS INT) AS sample,
       ROUND(value, 4) AS value
FROM px
WHERE line % 3 = 0 AND sample % 3 = 0
  AND line // 3 < {_limit} AND sample // 3 < {_limit}
ORDER BY line, sample
"""


def w4_avg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — average-pool resize (block mean, step 4)."""
    g = pixel_grid(spark, sf_dir).withColumn("scene", F.lit("g"))
    out = avg_pool(
        g, 4, keys=["scene"], value_cols=["value"], height=N, row="line", col="sample"
    )
    return out.select(
        "line", "sample", F.round("value", 6).alias("value")
    ).orderBy("line", "sample")


W4_SQL = GRID_CTE + """
SELECT CAST(line // 4 AS INT) AS line, CAST(sample // 4 AS INT) AS sample,
       ROUND(AVG(value), 6) AS value
FROM px
GROUP BY 1, 2
ORDER BY line, sample
"""


def w6_any_pool_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — any-pooling mask downsample (block 8): block masked iff any
    pixel masked."""
    g = pixel_grid(spark, sf_dir).withColumn(
        "mask", F.col("value").isNull()
    ).withColumn("scene", F.lit("g"))
    out = any_pool_mask(g, 8, keys=["scene"], mask_col="mask")
    return out.select("line", "sample", "mask").orderBy("line", "sample")


W6_SQL = GRID_CTE + """
SELECT CAST(line // 8 AS INT) AS line, CAST(sample // 8 AS INT) AS sample,
       MAX(value IS NULL) AS mask
FROM px
GROUP BY 1, 2
ORDER BY line, sample
"""


def w8_stitch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — patch∘stitch identity: extract tumbling patches from the grid
    with the engine operators, stitch them back, emit the reconstructed
    pixels.  The oracle is the *original* clean-patch pixels — stitching
    must be the exact inverse of patching."""
    g = assign_tumbling(
        pixel_grid(spark, sf_dir).withColumn("scene", F.lit("g")), W
    )
    px = patch_pixels(g, W, ["value"])
    stitched = stitch_pixels(px, W)
    return stitched.select(
        "line", "sample", F.round("value", 4).alias("value")
    ).orderBy("line", "sample")


W8_SQL = GRID_CTE + f"""
, clean AS (
  SELECT CAST(line // {W} AS INT) AS i, CAST(sample // {W} AS INT) AS j
  FROM px GROUP BY 1, 2 HAVING COUNT(value) = {W * W}
)
SELECT line, sample, ROUND(value, 4) AS value
FROM px
JOIN clean ON line // {W} = i AND sample // {W} = j
ORDER BY line, sample
"""


def a3_reconstruction_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — reconstruction sizing from max patch loc, bug-compatible
    lexicographic max(struct(i,j)) (train_model.py:96-99)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(
        F.col("l_returnflag").alias("scene"),
        (F.col("l_orderkey") % 17).cast("int").alias("i"),
        (F.col("l_partkey") % 13).cast("int").alias("j"),
    ).distinct()
    return reconstruction_size(keys, W, bug_compatible=True).orderBy("scene")


A3_SQL = f"""
WITH keys AS (
  SELECT DISTINCT l_returnflag AS scene,
         CAST(l_orderkey % 17 AS INT) AS i,
         CAST(l_partkey % 13 AS INT)  AS j
  FROM lineitem
), mx AS (
  SELECT scene, i, j,
         row_number() OVER (PARTITION BY scene ORDER BY i DESC, j DESC) AS rn
  FROM keys
)
SELECT scene, (i + 1) * {W} AS height, (j + 1) * {W} AS width
FROM mx WHERE rn = 1
ORDER BY scene
"""


def o3_fraction_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — exact-count fraction split (deterministic order by doc_id
    instead of the seeded shuffle so both engines agree): per-partition
    counts and checksums."""
    from ..operators.split import fraction_split

    d = load_table(spark, sf_dir, "documents")
    train, val = fraction_split(d, 0.7, order_cols=["doc_id"])
    tagged = train.withColumn("part", F.lit("train")).unionByName(
        val.withColumn("part", F.lit("val"))
    )
    return (
        tagged.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("part")
    )


O3_SQL = """
WITH ranked AS (
  SELECT doc_id, n_chars, row_number() OVER (ORDER BY doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT CASE WHEN rn <= CAST(FLOOR(n * 0.7) AS BIGINT) THEN 'train' ELSE 'val' END AS part,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ranked
GROUP BY 1
ORDER BY part
"""


def o4_drop_last_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/B1 — drop-last batching (batch_size=32): remainder rows never
    served (data_generator.py:20-22); per-batch counts + checksum."""
    from ..operators.split import drop_last_batches

    d = load_table(spark, sf_dir, "documents")
    b = drop_last_batches(d, 32, ["doc_id"])
    return (
        b.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("batch_id")
    )


O4_SQL = """
WITH ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT CAST(rn // 32 AS INT) AS batch_id, COUNT(*) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ranked
WHERE rn < (n // 32) * 32
GROUP BY 1
ORDER BY batch_id
"""


def w1_sliding_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sliding — overlapping patches (window 8, stride 4): per-patch
    valid-pixel counts.  Exercises the explode(sequence) duplication path."""
    from ..operators.patching import assign_sliding

    g = assign_sliding(pixel_grid(spark, sf_dir), W, 4, N, N)
    return (
        g.groupBy("i", "j")
        .agg(F.count("value").alias("n_valid"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("i", "j")
    )


_IMAX = (N - W) // 4
W1S_SQL = GRID_CTE + f"""
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       COUNT(value) AS n_valid, ROUND(SUM(value), 4) AS sum_value
FROM px,
     unnest(range(0, {_IMAX + 1})) AS ti(i),
     unnest(range(0, {_IMAX + 1})) AS tj(j)
WHERE line >= i * 4 AND line < i * 4 + {W}
  AND sample >= j * 4 AND sample < j * 4 + {W}
GROUP BY 1, 2
ORDER BY i, j
"""


def b2_batch_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/B2 — batch assembly end-to-end: tumbling patches of the grid,
    pivoted to matrices, stacked into (bs, w, w, 1) tensors executor-side;
    output per-batch checksums (drop-last, batch_size 4)."""
    from ..operators.batching import assemble_batches, pivot_patches
    from ..operators.patching import assign_tumbling, patch_pixels

    g = assign_tumbling(
        pixel_grid(spark, sf_dir).withColumn("scene", F.lit("g")), W
    )
    px = patch_pixels(g, W, ["value"]).withColumn("var", F.lit("value"))
    piv = pivot_patches(px, ["value"], W)
    out = assemble_batches(piv, ["value"], W, batch_size=4)
    return out.select(
        "batch_id", "n", F.round("checksum", 2).alias("checksum")
    ).orderBy("batch_id")


B2_SQL = GRID_CTE + f"""
, clean AS (
  SELECT CAST(line // {W} AS INT) AS i, CAST(sample // {W} AS INT) AS j,
         SUM(value) AS psum
  FROM px GROUP BY 1, 2 HAVING COUNT(value) = {W * W}
), ranked AS (
  SELECT i, j, psum, row_number() OVER (ORDER BY i, j) - 1 AS rn,
         COUNT(*) OVER () AS np
  FROM clean
)
SELECT CAST(rn // 4 AS INT) AS batch_id, CAST(COUNT(*) AS INT) AS n,
       ROUND(SUM(psum), 2) AS checksum
FROM ranked
WHERE rn < (np // 4) * 4
GROUP BY 1
ORDER BY batch_id
"""


def j4_bilinear_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — the engine's bilinear regrid operator over a synthetic regular
    16x16 coarse grid (centers 2+4k on a 64-grid), interpolated onto the
    32x32 target lattice 1+2k — includes extrapolation (target 63 > last
    center 62) and NULL propagation.  The oracle computes the closed-form
    bilinear formula with clamped edge segments."""
    from ..operators.regrid import bilinear_regrid, target_points

    li = load_table(spark, sf_dir, "lineitem")
    key = [
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
    ]
    top = li.select(*key).orderBy(*key).limit(16 * 16)
    w = Window.orderBy(*key)
    coarse = top.select(
        "l_partkey", "l_quantity", (F.row_number().over(w) - 1).alias("rn")
    ).select(
        F.lit("g").alias("scene"),
        F.lit("c0").alias("ch"),
        F.floor(F.col("rn") / 16).cast("int").alias("aline"),
        (F.col("rn") % 16).cast("int").alias("asample"),
        (2.0 + 4.0 * F.floor(F.col("rn") / 16)).alias("line"),
        (2.0 + 4.0 * (F.col("rn") % 16)).alias("sample"),
        F.when(F.col("l_partkey") % 89 == 0, None)
        .otherwise(F.col("l_quantity"))
        .cast("float")
        .alias("btemp"),
    )
    dims = spark.createDataFrame([("g", 64, 64)], "scene string, height int, width int")
    tgt = target_points(spark, dims, 2)
    out = bilinear_regrid(coarse, tgt)
    return out.select(
        "ti", "tj", F.round("value", 6).alias("value")
    ).orderBy("ti", "tj")


J4_SQL = f"""
WITH coarse AS (
  SELECT CAST(rn // 16 AS INT) AS aline, CAST(rn % 16 AS INT) AS asample,
         CASE WHEN l_partkey % 89 = 0 THEN NULL ELSE l_quantity END AS v
  FROM (SELECT l_partkey, l_quantity,
               row_number() OVER (ORDER BY {{KEY}}) - 1 AS rn
        FROM lineitem) t
  WHERE rn < 256
), tgt AS (
  SELECT ti.i AS ti, tj.j AS tj,
         1.0 + 2.0 * ti.i AS tline, 1.0 + 2.0 * tj.j AS tsample
  FROM unnest(range(0, 32)) AS ti(i), unnest(range(0, 32)) AS tj(j)
), seg AS (
  SELECT ti, tj, tline, tsample,
         LEAST(GREATEST(CAST(FLOOR((tline - 2.0) / 4.0) AS INT), 0), 14) AS lk,
         LEAST(GREATEST(CAST(FLOOR((tsample - 2.0) / 4.0) AS INT), 0), 14) AS sk
  FROM tgt
), wts AS (
  SELECT ti, tj, lk, sk,
         (tline - (2.0 + 4.0 * lk)) / 4.0 AS wl,
         (tsample - (2.0 + 4.0 * sk)) / 4.0 AS ws
  FROM seg
)
SELECT w.ti, w.tj,
       ROUND((1 - wl) * (1 - ws) * c00.v + (1 - wl) * ws * c01.v
             + wl * (1 - ws) * c10.v + wl * ws * c11.v, 6) AS value
FROM wts w
JOIN coarse c00 ON c00.aline = w.lk     AND c00.asample = w.sk
JOIN coarse c01 ON c01.aline = w.lk     AND c01.asample = w.sk + 1
JOIN coarse c10 ON c10.aline = w.lk + 1 AND c10.asample = w.sk
JOIN coarse c11 ON c11.aline = w.lk + 1 AND c11.asample = w.sk + 1
ORDER BY ti, tj
""".replace("{KEY}", ORDER_KEY)


def f4_distance_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5 — mask union: pixel masked if value NULL or a derived
    distance column is under threshold; per-patch masked counts."""
    from ..operators.masks import sar_size_mask

    g = pixel_grid(spark, sf_dir).withColumn(
        "distance_map", (F.col("line") * 3 + F.col("sample")) % 50
    ).withColumn("polygon_id", F.lit(1))
    m = g.select(
        "line",
        "sample",
        sar_size_mask(["value"], distance_threshold=10).alias("mask"),
    )
    return (
        m.groupBy((F.col("line") / W).cast("int").alias("i"))
        .agg(F.sum(F.col("mask").cast("int")).alias("n_masked"))
        .orderBy("i")
    )


F4_SQL = GRID_CTE + f"""
SELECT CAST(line // {W} AS INT) AS i,
       CAST(SUM(CASE WHEN value IS NULL OR ((line * 3 + sample) % 50) < 10
                THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
FROM px
GROUP BY 1
ORDER BY i
"""


def w7_centered_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — centered constant padding of a 16x16 crop to 24x28 (pads
    top=4,bottom=4,left=6,right=6); checksum rows per band prove both the
    shift and the constant ring."""
    from ..operators.resize import pad_centered

    crop = pixel_grid(spark, sf_dir).filter(
        (F.col("line") < 16) & (F.col("sample") < 16)
    ).withColumn("scene", F.lit("g"))
    keys = crop.select("scene").distinct()
    padded = pad_centered(crop, spark, 16, 16, 24, 28, keys, {"value": -1.0})
    return (
        padded.groupBy((F.col("line") / 4).cast("int").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("band")
    )


W7_SQL = GRID_CTE + """
, crop AS (
  SELECT line + 4 AS line, sample + 6 AS sample, value
  FROM px WHERE line < 16 AND sample < 16
), full_grid AS (
  SELECT l.line, s.sample
  FROM unnest(range(0, 24)) AS l(line), unnest(range(0, 28)) AS s(sample)
), padded AS (
  SELECT f.line, f.sample,
         CASE WHEN c.value IS NOT NULL OR
                   (f.line BETWEEN 4 AND 19 AND f.sample BETWEEN 6 AND 21)
              THEN c.value ELSE -1.0 END AS value
  FROM full_grid f LEFT JOIN crop c USING (line, sample)
)
SELECT CAST(line // 4 AS INT) AS band, COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM padded
GROUP BY 1 ORDER BY band
"""


def a1_class_pixel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — per-class pixel counts + weighting over a derived one-hot
    class (the analyze-notebook aggregation shape)."""
    g = pixel_grid(spark, sf_dir)
    cls = g.select(
        F.when(F.col("value").isNull(), None)
        .otherwise((F.col("value").cast("int") % 4))
        .alias("class_idx")
    )
    weights = {0: 1.0, 1: 2.0, 2: 0.5, 3: 4.0}
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    return (
        cls.filter(F.col("class_idx").isNotNull())
        .groupBy("class_idx")
        .agg(F.count(F.lit(1)).alias("n_pixels"))
        .select(
            "class_idx",
            "n_pixels",
            F.round(F.col("n_pixels") * wmap.getItem(F.col("class_idx")), 2).alias(
                "weighted"
            ),
        )
        .orderBy("class_idx")
    )


A1_SQL = GRID_CTE + """
SELECT CAST(CAST(FLOOR(value) AS BIGINT) % 4 AS INT) AS class_idx,
       COUNT(*) AS n_pixels,
       ROUND(CAST(COUNT(*) * (CASE CAST(CAST(FLOOR(value) AS BIGINT) % 4 AS INT)
                              WHEN 0 THEN 1.0 WHEN 1 THEN 2.0
                              WHEN 2 THEN 0.5 ELSE 4.0 END) AS DOUBLE), 2) AS weighted
FROM px
WHERE value IS NOT NULL
GROUP BY 1
ORDER BY class_idx
"""


REGISTRY = {
    "w1_tumbling_patches": (w1_tumbling_patches, W1_SQL),
    "w1_sliding_patches": (w1_sliding_patches, W1S_SQL),
    "b2_batch_checksums": (b2_batch_checksums, B2_SQL),
    "j4_bilinear_regrid": (j4_bilinear_regrid, J4_SQL),
    "f4_distance_mask": (f4_distance_mask, F4_SQL),
    "w7_centered_pad": (w7_centered_pad, W7_SQL),
    "a1_class_pixel_counts": (a1_class_pixel_counts, A1_SQL),
    "f3_clean_patches": (f3_clean_patches, F3_SQL),
    "w3_decimate": (w3_decimate, W3_SQL),
    "w4_avg_pool": (w4_avg_pool, W4_SQL),
    "w6_any_pool_mask": (w6_any_pool_mask, W6_SQL),
    "w8_stitch_roundtrip": (w8_stitch_roundtrip, W8_SQL),
    "a3_reconstruction_size": (a3_reconstruction_size, A3_SQL),
    "o3_fraction_split": (o3_fraction_split, O3_SQL),
    "o4_drop_last_batches": (o4_drop_last_batches, O4_SQL),
}
