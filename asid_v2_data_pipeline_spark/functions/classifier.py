"""Model-based quality filtering: hashed bag-of-words logistic
classifier (SURVEY.md §2.11 adjunct — the FineWeb-Edu / DCLM tier).

Heuristic quality scores (``functions.text.quality_score``, Gopher
rules) catch boilerplate; modern curation additionally filters by a
LEARNED classifier (educational-value, fasttext-style).  The serving
shape at 100 TB is what matters here:

- **Scoring** is a narrow map: token hashes → feature index
  (``pmod(th, dim)``) → weight gathered from a broadcast weight array →
  mean-pooled logit → sigmoid.  No shuffle, no Python, one fold per
  document — the same cost class as the heuristic scorers, so it slots
  into ``plans/curation.py`` as just another filter stage.
- **Training** is a driver-coordinated gradient loop where each step is
  ONE aggregation: per-feature gradient contributions groupBy(feature)
  — the exchange carries at most ``dim`` groups — and only the
  dim-sized gradient vector reaches the driver (the centroid-table
  carve-out, exactly like ``similarity.train_centroids_kmeans``).
  Corpus rows never leave the executors.

Weights are plain Python lists — persist them next to the other index
artifacts; scoring is deterministic integer/double arithmetic so the
DuckDB oracle reproduces it bit-for-bit (``tx_classifier_score``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import token_hashes


def lcg_weights(dim: int, seed: int = 17, scale: float = 0.01) -> list[float]:
    """Deterministic pseudo-random weight init (portable LCG — the
    repo's no-RNG-dependency discipline), symmetric around 0."""
    out, state = [], seed
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % (1 << 31)
        out.append(scale * ((state / float(1 << 31)) * 2.0 - 1.0))
    return out


def _mean_pooled_logit(
    text: Column, weights_col: Column, dim: int, bias: float
) -> Column:
    """bias + mean over tokens of w[pmod(token_hash, dim)] — the hashed
    linear model's logit, as one staged fold (token hashing runs once)."""
    th = token_hashes(text)
    s = F.aggregate(
        th,
        F.lit(0.0).cast("double"),
        lambda acc, h: acc
        + F.element_at(weights_col, F.pmod(h, F.lit(dim)).cast("int") + 1),
    )
    n = F.size(th)
    return F.lit(float(bias)) + F.when(n > 0, s / n).otherwise(F.lit(0.0))


def score_documents(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "clf_score",
) -> DataFrame:
    """Attach ``sigmoid(logit)`` as ``out_col``.  Scoring is a
    zero-shuffle narrow map.

    r13 optimization (guide §4.2): the tokenize + char-hash + weight-
    gather fold runs in the Arrow kernel
    (``functions/arrowhash.py::clf_token_sum``) — one vectorized
    crossing per batch, weights in the UDF closure (no broadcast row
    join needed) — instead of an interpreted Catalyst HOF fold per
    char + per token.  The double sum is accumulated in the same
    left-to-right IEEE order as the fold, so scores are bit-identical
    (pinned in tests/test_arrowhash.py); the HOF form stays as
    ``_mean_pooled_logit`` (the documented oracle contract, still used
    by the training loop)."""
    from .arrowhash import clf_token_sum

    sn = clf_token_sum(F.col(text_col), [float(w) for w in weights])
    z = F.lit(float(bias)) + F.when(
        sn["n"] > 0, sn["s"] / sn["n"]
    ).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def train_hashed_logreg(
    df: DataFrame,
    text_col: str,
    label_col: str,
    dim: int = 256,
    steps: int = 5,
    lr: float = 1.0,
    seed: int = 17,
) -> tuple[list[float], float]:
    """Distributed logistic regression on hashed mean-pooled BOW.

    Per step: score with the current weights (broadcast), compute the
    per-document residual ``sigmoid(z) - y``, explode token features and
    groupBy(feature) to sum gradient contributions — ONE exchange of at
    most ``dim`` groups; the driver applies the dim-sized update.  Full-
    batch, deterministic; at 100 TB swap the full pass for a per-step
    ``sample()`` (mini-batch) without changing the shape.

    Returns ``(weights, bias)``.
    """
    spark = df.sparkSession
    w = lcg_weights(dim, seed)
    b = 0.0
    base = df.select(
        F.col(label_col).cast("double").alias("_y"),
        token_hashes(F.col(text_col)).alias("_th"),
    ).localCheckpoint()  # hash once, reuse across steps
    n_docs = base.count()
    for _ in range(steps):
        one = spark.createDataFrame([([float(x) for x in w],)], "_w: array<double>")
        th = F.col("_th")
        s = F.aggregate(
            th,
            F.lit(0.0).cast("double"),
            lambda acc, h: acc
            + F.element_at(F.col("_w"), F.pmod(h, F.lit(dim)).cast("int") + 1),
        )
        nt = F.size(th)
        z = F.lit(float(b)) + F.when(nt > 0, s / nt).otherwise(F.lit(0.0))
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("_y")).alias("_r")
        scored = base.crossJoin(F.broadcast(one)).select(
            resid, nt.alias("_nt"), "_th"
        )
        grad_rows = (
            scored.filter(F.col("_nt") > 0)
            .select(
                (F.col("_r") / F.col("_nt")).alias("_g"),
                F.explode("_th").alias("_h"),
            )
            .select(F.pmod(F.col("_h"), F.lit(dim)).cast("int").alias("_f"), "_g")
            .groupBy("_f")
            .agg(F.sum("_g").alias("_gsum"))
            .collect()
        )
        bias_grad = scored.agg(F.sum("_r")).first()[0] or 0.0
        for r in grad_rows:
            w[r["_f"]] -= lr * r["_gsum"] / n_docs
        b -= lr * bias_grad / n_docs
    return w, b


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
