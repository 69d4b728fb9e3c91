"""Bloom filter build/probe and the lossless decontamination prefilter."""

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.bloom import (
    bloom_params,
    bloom_prefilter,
    build_bloom,
    might_contain,
    with_bloom_words,
)
from asid_v2_data_pipeline_spark.operators.decontam import (
    contamination,
    contamination_bloom,
)

SF = "/root/testdata/sf0.001"


def test_bloom_params_sane():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0
    assert 9 * 10_000 < m < 11 * 10_000  # ~9.6 bits/item at 1%
    assert 5 <= k <= 9


def test_no_false_negatives_and_measured_fpp(spark):
    members = spark.range(0, 2_000).select((F.col("id") * 7 + 3).alias("v"))
    spec = build_bloom(members, "v", fpp=0.01)
    assert len(spec.words) == spec.n_words
    # every member must probe positive
    probed = with_bloom_words(spark, members, spec)
    neg = probed.filter(~might_contain(F.col("v"), spec)).count()
    assert neg == 0
    # disjoint non-members: measured fpp within 3x of target
    others = spark.range(0, 20_000).select((F.col("id") * 7 + 4).alias("v"))
    pos = bloom_prefilter(others, "v", spec).count()
    assert pos / 20_000 < 0.03


def test_contamination_bloom_equals_exact(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    exact = contamination(corpus, bench, "doc_id", "text", n=8)
    bloom = contamination_bloom(corpus, bench, "doc_id", "text", n=8)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, bloom.collect()))
    assert a == b and len(a) > 0


def test_prefilter_runs_before_join(spark):
    """The bloom probe must sit on the corpus scan side, below the join:
    the physical plan's BroadcastHashJoin stream side contains the
    getbit filter (i.e. rows drop before the join, not after)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).limit(50)
    plan = contamination_bloom(
        corpus, bench, "doc_id", "text", n=8
    )._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("BroadcastHashJoin")
    bit_at = plan.find("getbit")
    assert join_at != -1 and bit_at != -1
    # physical plans print operators top-down: a filter feeding the join
    # appears AFTER the join node in the string
    assert bit_at > join_at
