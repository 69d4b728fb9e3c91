"""Approximate-stats tier (VERDICT r2 task 7): the approx operators are
oracle-free by design, so their contract is a pinned error bound against
the EXACT operators at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.stats import (
    distinct_count_approx,
    group_quantiles_approx,
)
from asid_v2_data_pipeline_spark.schemas import load_table

SF = "/root/testdata/sf0.01"
ACCURACY = 10000


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def test_approx_quantile_rank_error_bound(spark, docs):
    """percentile_approx's contract: the returned value's RANK is within
    n/accuracy of the target rank, per group and per prob."""
    probs = [0.5, 0.9, 0.99]
    approx = {
        r["lang"]: [r["q0_5"], r["q0_9"], r["q0_99"]]
        for r in group_quantiles_approx(
            docs, "lang", "n_chars", probs, ACCURACY
        ).collect()
    }
    rows = docs.groupBy("lang").agg(
        F.sort_array(F.collect_list("n_chars")).alias("vals")
    ).collect()
    for r in rows:
        vals, n = r["vals"], len(r["vals"])
        tol = n / ACCURACY + 1  # sketch bound (+1: rank discretization)
        for p, av in zip(probs, approx[r["lang"]]):
            # rank window that the approx value actually occupies
            lo = next(i for i, v in enumerate(vals) if v >= av) + 1
            hi = n - next(i for i, v in enumerate(reversed(vals)) if v <= av)
            target = p * n
            assert lo - tol <= target <= hi + tol, (
                r["lang"], p, av, lo, hi, target, tol,
            )


def test_approx_distinct_error_bound(spark, docs):
    """HLL++ relative error stays within 3x the requested rsd (99.7%
    envelope) against the exact distinct counts."""
    rsd = 0.05
    approx = {
        r["lang"]: r["approx_distinct"]
        for r in distinct_count_approx(docs, "lang", "doc_id", rsd).collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, n in exact.items():
        rel = abs(approx[lang] - n) / n
        assert rel <= 3 * rsd, (lang, approx[lang], n, rel)
