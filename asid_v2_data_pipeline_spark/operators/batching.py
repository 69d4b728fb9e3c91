"""ML feeding surface (SURVEY.md §2.8): batch/tensor assembly and the
inference hook.

The reference's DataGenerator slices an id list into fixed batches, loads
each patch's arrays, and stacks them into ``(batch, h, w, channels)``
tensors (/root/reference/asip_v2/data_generator.py:24-64).  Spark shape:

- B1: ``drop_last_batches`` tags rows with ``batch_id`` (split.py);
- B2: ``assemble_batches`` pivots long-form patch pixels to per-patch
  matrices and stacks them per batch inside ``applyInPandas`` — the tensor
  only ever exists executor-side, Arrow-framed;
- B4: ``predict_batches`` maps a model function over the per-patch
  matrices (``predict_batch_udf``-style; the default model is identity —
  the reference ships no trained weights either, README.md:3).

At 100 TB, patches are already partitioned by scene; the batch groupBy is
the one shuffle and each Arrow batch holds ``batch_size`` patches.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pivot_patches(patch_px: DataFrame, variables: list[str], window: int) -> DataFrame:
    """Long-form patch pixels -> one row per patch with a flattened
    row-major matrix per variable (B2's stacking, minus the Python loop).

    ``array_agg`` ordered by (prow, pcol) via sort_array over structs —
    deterministic, no UDF."""
    keyed = patch_px.filter(F.col("var").isin(variables))
    return (
        keyed.groupBy("scene", "i", "j", "var")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("prow", "pcol", "value"))
                ),
                lambda s: s["value"],
            ).alias("flat")
        )
        .groupBy("scene", "i", "j")
        .pivot("var", variables)
        .agg(F.first("flat"))
    )


def batch_tensor_schema(variables: list[str]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("scene", T.StringType(), False),
            T.StructField("batch_id", T.IntegerType(), False),
            T.StructField("n", T.IntegerType(), False),
            *[
                T.StructField(f"{v}_shape", T.ArrayType(T.IntegerType()), False)
                for v in variables
            ],
            T.StructField("checksum", T.DoubleType(), False),
        ]
    )


def assemble_batches(
    pivoted: DataFrame,
    variables: list[str],
    window: int,
    batch_size: int,
) -> DataFrame:
    """B1+B2 — group patches into fixed batches and build the
    ``(batch, h, w, C)`` stack executor-side; returns per-batch metadata
    (shapes + checksum) since tensors themselves stay in the executors.

    Drop-last semantics: batches with fewer than ``batch_size`` patches are
    dropped (data_generator.py:20-22).

    Batch ids are assigned PER SCENE (``Window.partitionBy("scene")``):
    the reference processes one scene at a time anyway
    (apply_model.py:33-46), and a global ``Window.orderBy`` would funnel
    the entire patch corpus — data-scale, #patches ~ pixels/w² — through a
    single-partition sort.  Per-scene numbering keeps the window shuffle a
    plain hash exchange on ``scene`` that scales with executor count; the
    output key is the composite ``(scene, batch_id)``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("scene").orderBy("i", "j")
    tagged = pivoted.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / batch_size).cast("int")
    )

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < batch_size:
            return pd.DataFrame(
                columns=[f.name for f in batch_tensor_schema(variables)]
            )
        pdf = pdf.sort_values(["i", "j"])
        out = {"scene": [key[0]], "batch_id": [key[1]], "n": [len(pdf)]}
        checksum = 0.0
        for v in variables:
            stack = np.stack(
                [np.asarray(x, dtype=np.float32).reshape(window, window) for x in pdf[v]]
            )[..., np.newaxis]
            out[f"{v}_shape"] = [list(stack.shape)]
            checksum += float(np.nansum(stack, dtype=np.float64))
        out["checksum"] = [checksum]
        return pd.DataFrame(out)

    return tagged.groupBy("scene", "batch_id").applyInPandas(
        build, batch_tensor_schema(variables)
    )


def predict_batches(
    pivoted: DataFrame,
    input_vars: list[str],
    window: int,
    model_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> DataFrame:
    """B4 — inference over patches via Arrow-batched ``mapInPandas``.

    ``model_fn`` maps a ``(n, h, w, C)`` float array to ``(n, h, w)``
    predictions; the default is the channel-mean identity (a stand-in —
    the reference repo ships untrained models too).  Output is long-form
    prediction pixels, ready for ``stitch_pixels``."""

    if model_fn is None:

        def model_fn(x: np.ndarray) -> np.ndarray:
            return x.mean(axis=-1)

    out_schema = T.StructType(
        [
            T.StructField("scene", T.StringType(), False),
            T.StructField("i", T.IntegerType(), False),
            T.StructField("j", T.IntegerType(), False),
            T.StructField("prow", T.IntegerType(), False),
            T.StructField("pcol", T.IntegerType(), False),
            T.StructField("value", T.FloatType(), True),
        ]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [
                    np.stack(
                        [
                            np.asarray(pdf[v].iloc[r], dtype=np.float32).reshape(
                                window, window
                            )
                            for v in input_vars
                        ],
                        axis=-1,
                    )
                    for r in range(len(pdf))
                ]
            )
            y = model_fn(x)  # (n, h, w)
            rows = {
                "scene": np.repeat(pdf["scene"].values, window * window),
                "i": np.repeat(pdf["i"].values, window * window),
                "j": np.repeat(pdf["j"].values, window * window),
                "prow": np.tile(
                    np.repeat(np.arange(window), window), len(pdf)
                ),
                "pcol": np.tile(np.arange(window), window * len(pdf)),
                "value": y.reshape(-1),
            }
            yield pd.DataFrame(rows)

    return pivoted.mapInPandas(infer, out_schema)


def class_pixel_counts(patch_px: DataFrame, class_vars: list[str]) -> DataFrame:
    """A1 — per-class pixel counts across the patch corpus
    (notebooks/analyze_netcdfs.ipynb cells 2-3): count of pixels where the
    one-hot channel == 1."""
    return (
        patch_px.filter(F.col("var").isin(class_vars))
        .groupBy("var")
        .agg(F.sum(F.when(F.col("value") == 1, 1).otherwise(0)).alias("n_pixels"))
    )


def class_weights(counts: DataFrame, weights: dict[str, float]) -> DataFrame:
    """A2 — elementwise class weighting (ipynb cell 3)."""
    wcol = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    return counts.select(
        "var",
        "n_pixels",
        (F.col("n_pixels") * wcol.getItem(F.col("var"))).alias("weighted"),
    )
