"""Differential tests: the Arrow-vectorized hash kernels
(functions/arrowhash.py) must be BIT-IDENTICAL to the Catalyst
higher-order-function forms they replace — same values, same array
order, same null/empty semantics.  The HOF forms stay the documented
oracle contract; the kernels are an execution detail, so any divergence
here is a correctness bug, not a perf trade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.functions import arrowhash as ah
from asid_v2_data_pipeline_spark.functions import text as tx
from asid_v2_data_pipeline_spark.operators.dedup import (
    _perm_constants,
    _perm_min,
    _shingle_hashes_from_token_hashes,
    fingerprint_from_token_hashes,
    token_hashes,
)

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),
    (3, "   ...!!!   "),  # no tokens
    (4, "a"),
    (5, "one two"),  # shorter than n=3 -> whole-doc fold
    (6, "repeat repeat repeat repeat repeat"),  # duplicate shingles
    (7, "Éclair ŒUF strasse ß Σίσυφος"),  # non-ASCII folds through lower()
    (8, "don't can't o'clock '' '"),
    (9, "MiXeD CaSe 123 abc123 '42'"),
    (10, None),
    (11, "x" * 5000),  # one long token
    (12, " ".join(str(i) for i in range(600))),  # many tokens
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id int, text string")


@pytest.fixture(scope="module")
def corpus_df(spark):
    from asid_v2_data_pipeline_spark.queries._shared import load_table

    return load_table(spark, SF, "documents")


def _collect_both(df, expr_col, arrow_col):
    rows = df.select(
        expr_col.alias("_e"), arrow_col.alias("_a")
    ).collect()
    return [(r["_e"], r["_a"]) for r in rows]


def _assert_identical(pairs, what):
    for e, a in pairs:
        assert e == a, f"{what}: expression={e!r} arrow={a!r}"


@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_token_hashes_identity(spark, edge_df, corpus_df, src):
    df = edge_df if src == "edge" else corpus_df
    _assert_identical(
        _collect_both(
            df,
            token_hashes(F.col("text")),
            ah.token_hashes_arrow(F.col("text")),
        ),
        "token_hashes",
    )


@pytest.mark.parametrize("n", [3, 8])
@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_shingle_hashes_identity(spark, edge_df, corpus_df, n, src):
    df = edge_df if src == "edge" else corpus_df
    _assert_identical(
        _collect_both(
            df,
            _shingle_hashes_from_token_hashes(
                token_hashes(F.col("text")), n
            ),
            ah.shingle_hashes_arrow(F.col("text"), n),
        ),
        f"shingle_hashes n={n}",
    )


@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_hash_block_identity(spark, edge_df, corpus_df, src):
    df = edge_df if src == "edge" else corpus_df
    th = token_hashes(F.col("text"))
    expr = F.struct(
        fingerprint_from_token_hashes(th).alias("fp"),
        _shingle_hashes_from_token_hashes(th, 3).alias("hs1"),
        _shingle_hashes_from_token_hashes(th, 8).alias("hs2"),
    )
    _assert_identical(
        _collect_both(df, expr, ah.hash_block(F.col("text"), 3, 8)),
        "hash_block",
    )


@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_minhash_sig_identity(spark, edge_df, corpus_df, src):
    df = edge_df if src == "edge" else corpus_df
    staged = df.select(
        _shingle_hashes_from_token_hashes(
            token_hashes(F.col("text")), 3
        ).alias("_hs")
    )
    hs = F.col("_hs")
    expr_sig = F.array(
        *[_perm_min(hs, a, b) for a, b in _perm_constants(16)]
    )
    _assert_identical(
        _collect_both(staged, expr_sig, ah.minhash_sig_arrow(hs, 16)),
        "minhash_sig",
    )


@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_clf_token_sum_identity(spark, edge_df, corpus_df, src):
    from asid_v2_data_pipeline_spark.functions.classifier import lcg_weights

    df = edge_df if src == "edge" else corpus_df
    w = lcg_weights(64, seed=17)
    one = df.sparkSession.createDataFrame(
        [([float(x) for x in w],)], "_w: array<double>"
    )
    th = token_hashes(F.col("text"))
    s = F.aggregate(
        th,
        F.lit(0.0).cast("double"),
        lambda acc, h: acc
        + F.element_at(F.col("_w"), F.pmod(h, F.lit(64)).cast("int") + 1),
    )
    expr = F.struct(s.alias("s"), F.size(th).alias("n"))
    joined = df.crossJoin(F.broadcast(one))
    pairs = _collect_both(joined, expr, ah.clf_token_sum(F.col("text"), w))
    for e, a in pairs:
        if e["n"] in (None, -1):  # size(NULL) = -1 under legacy conf, else NULL
            assert a["s"] is None and a["n"] is None
        else:
            # bit-identical double: sequential fold == cumsum tail
            assert e["s"] == a["s"] and e["n"] == a["n"], (e, a)


@pytest.mark.parametrize("k", [2, 5])
@pytest.mark.parametrize("src", ["edge", "corpus"])
def test_grams_identity(spark, edge_df, corpus_df, k, src):
    df = edge_df if src == "edge" else corpus_df
    toks = df.select(tx.tokens(F.col("text")).alias("_t"))
    starts = F.when(
        F.size("_t") >= k, F.sequence(F.lit(1), F.size("_t") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    expr = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice("_t", i, k))
    )
    _assert_identical(
        _collect_both(toks, expr, ah.grams_arrow(F.col("_t"), k)),
        f"grams k={k}",
    )


def test_tokens_py_matches_column_form(spark, edge_df, corpus_df):
    """The kernels tokenize with tokens_py — pin it against the column
    form on the edge corpus here (the declared-twin contract)."""
    from asid_v2_data_pipeline_spark.functions.text import tokens_py

    for df in (edge_df, corpus_df):
        rows = df.select("text", tx.tokens(F.col("text")).alias("_t")).collect()
        for r in rows:
            if r["text"] is None:
                assert r["_t"] is None
            else:
                assert list(r["_t"]) == tokens_py(r["text"]), r["text"]
