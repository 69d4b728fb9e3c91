"""DSIR-style data selection: hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — the standard cheap way to steer a raw crawl toward a
target distribution without training a classifier).

    weight(d) = Σ_{g ∈ features(d)} [ ln p_target(bucket(g))
                                     − ln p_raw(bucket(g)) ]

features = token unigrams + bigrams, hashed into ``buckets`` buckets
with the engine's portable 31-poly / COMBINE hashes (the same integers
the DuckDB oracles re-derive); bucket distributions are add-one
smoothed.  Select by taking the top-k weights, or feed the weights to
``operators/sampling.py::weighted_sample`` for importance RESAMPLING
proper.

Scale shape: the two distribution estimates are one explode + groupBy
per side whose key space is ``buckets`` (map-side combinable, metadata-
sized result).  The per-bucket log-ratio table (≤ ``buckets`` rows) is
collected and inlined — the same driver carve-out as the k-means
centroid table — so SCORING the corpus is a single narrow pass: zero
shuffle, zero join, the corpus read once.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import MASK31
from .dedup import COMBINE, token_hashes
from .split import SHUFFLE_M, shuffle_hash


def _feature_buckets(text: Column, buckets: int) -> Column:
    """Hashed unigram + bigram buckets of a document, in token order
    (unigrams first, then bigrams) — the exact list the oracle rebuilds,
    so per-doc sums fold in the same order in both engines."""
    th_arr = F.array(token_hashes(text))  # bind the token hashes once
    return F.element_at(
        F.transform(
            th_arr,
            lambda th: F.concat(
                F.transform(th, lambda h: h % buckets),
                F.when(
                    F.size(th) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(th) - 1),
                        lambda i: (
                            (F.element_at(th, i) * COMBINE + F.element_at(th, i + 1))
                            % F.lit(MASK31 + 1)
                        )
                        % buckets,
                    ),
                ).otherwise(F.array().cast("array<bigint>")),
            ),
        ),
        1,
    )


def with_feature_buckets(
    df: DataFrame, id_col: str, text_col: str, buckets: int = 256
) -> DataFrame:
    """(_id, _fb) — the hashed feature-bucket list per document."""
    return df.select(
        F.col(id_col).alias("_id"),
        _feature_buckets(F.col(text_col), buckets).alias("_fb"),
    )


def _bucket_counts(feats: DataFrame) -> dict[int, int]:
    rows = (
        feats.select(F.explode("_fb").alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    return {r["_b"]: r["_c"] for r in rows}


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Per-document importance weight of ``corpus`` docs toward the
    ``target`` distribution.  Returns ``(id, n_feats, weight)`` with the
    per-bucket log-ratios rounded to 6 decimals (so the oracle's
    independently-derived ratio table is the identical double) and the
    weight left unrounded (callers round for presentation).

    The corpus itself is the raw distribution — score only documents the
    raw estimate saw, or the smoothing denominators diverge from DSIR.
    """
    tc = _bucket_counts(with_feature_buckets(target, id_col, text_col, buckets))
    rc = _bucket_counts(with_feature_buckets(corpus, id_col, text_col, buckets))
    nt = sum(tc.values())
    nr = sum(rc.values())
    ratio = [
        round(
            math.log((tc.get(b, 0) + 1) / (nt + buckets))
            - math.log((rc.get(b, 0) + 1) / (nr + buckets)),
            6,
        )
        for b in range(buckets)
    ]
    rarr = F.array(*[F.lit(x) for x in ratio])
    feats = with_feature_buckets(corpus, id_col, text_col, buckets)
    # left fold in feature order — the oracle folds the same list the
    # same way, so the summed double is identical, not merely close
    weight = F.aggregate(
        F.transform("_fb", lambda b: F.element_at(rarr, (b + 1).cast("int"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return feats.select(
        F.col("_id").alias(id_col),
        F.size("_fb").alias("n_feats"),
        weight.alias("weight"),
    )


def _target_bigram_tables(
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
) -> tuple[list[float], list[float]]:
    """Hashed bigram-LM tables from the target slice: per bucket,
    ``lnum[b] = round(ln(bigram_count(b) + 1), 6)`` and
    ``lden[b] = round(ln(context_count(b) + buckets), 6)`` — add-one
    smoothing with the bucket space as the vocabulary.  Contexts are
    the unigram buckets at positions 1..n-1 (every token that HAS a
    successor).  Both aggregates are bucket-keyed (map-side combinable,
    ≤ ``buckets`` rows reach the driver) — the same metadata carve-out
    as the DSIR ratio table."""
    th_src = target.select(
        F.array(token_hashes(F.col(text_col))).alias("_tharr")
    ).select(F.element_at("_tharr", 1).alias("_th"))
    big = th_src.select(
        F.explode(
            F.when(
                F.size("_th") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_th") - 1),
                    lambda i: (
                        (
                            F.element_at("_th", i) * COMBINE
                            + F.element_at("_th", i + 1)
                        )
                        % F.lit(MASK31 + 1)
                    )
                    % buckets,
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_b")
    )
    ctx = th_src.select(
        F.explode(
            F.when(
                F.size("_th") >= 2,
                F.transform(
                    F.slice("_th", 1, F.size("_th") - 1),
                    lambda h: h % buckets,
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_b")
    )

    def counts(df: DataFrame) -> dict[int, int]:
        return {
            r["_b"]: r["_c"]
            for r in df.groupBy("_b").agg(F.count(F.lit(1)).alias("_c")).collect()
        }

    bc, cc = counts(big), counts(ctx)
    lnum = [round(math.log(bc.get(b, 0) + 1), 6) for b in range(buckets)]
    lden = [
        round(math.log(cc.get(b, 0) + buckets), 6) for b in range(buckets)
    ]
    return lnum, lden


def bigram_lm_scores(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """CCNet-style LM fluency scoring with an in-engine hashed bigram
    model (Wenzek et al. 2020 filter corpora by LM perplexity; KenLM
    isn't available in-engine, so the model is an add-one-smoothed
    bigram LM over hashed token buckets — trained on the ``target``
    slice by two bucket-keyed aggregates, applied in one zero-shuffle
    corpus pass with the two ``buckets``-entry log tables inlined).

    Per document: ``ll = Σ_i [lnum(bigram_i) − lden(context_i)]`` over
    its n−1 bigrams (see ``_target_bigram_tables``); returns
    ``(id, n_bigrams, ll)``; mean log-prob ``ll / n_bigrams`` is the
    perplexity proxy (higher = more target-like).  Per-bucket logs are
    rounded to 6 decimals so the DuckDB oracle folds the identical
    doubles."""
    lnum, lden = _target_bigram_tables(target, id_col, text_col, buckets)
    lnum_arr = F.array(*[F.lit(x) for x in lnum])
    lden_arr = F.array(*[F.lit(x) for x in lden])

    th_arr = F.array(token_hashes(F.col(text_col)))
    terms = F.element_at(
        F.transform(
            th_arr,
            lambda th: F.when(
                F.size(th) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(th) - 1),
                    lambda i: F.element_at(
                        lnum_arr,
                        (
                            (
                                (
                                    F.element_at(th, i) * COMBINE
                                    + F.element_at(th, i + 1)
                                )
                                % F.lit(MASK31 + 1)
                            )
                            % buckets
                            + 1
                        ).cast("int"),
                    )
                    - F.element_at(
                        lden_arr,
                        (F.element_at(th, i) % buckets + 1).cast("int"),
                    ),
                ),
            ).otherwise(F.array().cast("array<double>")),
        ),
        1,
    )
    staged = corpus.select(
        F.col(id_col), terms.alias("_terms")
    )
    return staged.select(
        F.col(id_col),
        F.size("_terms").alias("n_bigrams"),
        F.aggregate(
            "_terms", F.lit(0.0).cast("double"), lambda a, x: a + x
        ).alias("ll"),
    )


def gumbel_topk(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    seed: int = 41,
) -> DataFrame:
    """Importance RESAMPLING over log-weights: rank by
    ``weight + Gumbel(0,1)`` and keep the top ``k`` — the Gumbel-top-k
    trick, which samples WITHOUT replacement with inclusion probability
    proportional to ``exp(weight)`` (exactly what DSIR's log-ratio
    weights call for; equivalent to A-ES on ``exp(weight)`` but immune
    to exp overflow/underflow).

    The Gumbel draw keys on the portable LCG hash of the id —
    ``u = (h + 0.5) / 2³¹ ∈ (0,1)``, ``g = −ln(−ln u)`` — so any engine
    (and any rerun) selects the SAME rows.  Plan: narrow key +
    TakeOrderedAndProject; zero shuffle before the top-k.

    ``id_col`` must cast cleanly to long: a NULL cast (non-numeric
    string id) would make ``_gkey`` NULL and silently sort those rows
    last, so the draw raises per-row instead of dropping them."""
    from .split import checked_long_id

    idl = checked_long_id(id_col, "gumbel_topk")
    u = (
        shuffle_hash(idl, seed).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(SHUFFLE_M))
    key = F.col(weight_col) + -F.log(-F.log(u))
    return (
        weighted.withColumn("_gkey", F.round(key, 6))
        .orderBy(F.col("_gkey").desc(), id_col)
        .limit(k)
    )


def gumbel_topk_sql(
    src: str,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    seed: int = 41,
) -> str:
    """Oracle fragment: the same Gumbel key over a FROM-able ``src``
    exposing ``id_col``/``weight_col``; returns a full SELECT."""
    from .split import shuffle_hash_sql

    h = shuffle_hash_sql(id_col, seed)
    u = f"((({h}) + 0.5) / {float(SHUFFLE_M)!r})"
    key = f"ROUND({weight_col} + -ln(-ln({u})), 6)"
    return (
        f"SELECT *, {key} AS _gkey FROM {src} "
        f"ORDER BY _gkey DESC, {id_col} LIMIT {k}"
    )
