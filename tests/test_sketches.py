"""Count-Min Sketch and portable HyperLogLog: error bounds and the
merge laws that make them 100 TB-shaped."""

import math

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_estimate,
    hll_registers,
)


def _items(spark, spec):
    """spec: {hash_value: occurrences}"""
    rows = [(h,) for h, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "_h long")


def test_cms_never_underestimates_and_bounds_error(spark):
    spec = {i * 7 + 1: (50 if i < 3 else 2) for i in range(200)}
    items = _items(spark, spec)
    sketch = cms_build(items, "_h", width=256, depth=4)
    q = spark.createDataFrame([(h,) for h in spec], "_h long")
    est = {r["_h"]: r["est"] for r in cms_estimate(sketch, q, "_h", 256, 4).collect()}
    n_total = sum(spec.values())
    for h, exact in spec.items():
        assert est[h] >= exact  # one-sided
        assert est[h] <= exact + math.e / 256 * n_total * 4  # loose eps bound


def test_cms_merges_by_cell_addition(spark):
    a = _items(spark, {1: 5, 2: 3})
    b = _items(spark, {2: 4, 3: 7})
    merged = (
        cms_build(a, "_h", 64, 3)
        .unionByName(cms_build(b, "_h", 64, 3))
        .groupBy("_d", "_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), "_h", 64, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_accuracy_and_merge_by_register_max(spark):
    import random

    rng = random.Random(5)
    vals = [rng.randrange(1, 1 << 31) for _ in range(2000)]
    items = spark.createDataFrame([(v,) for v in vals], "_h long")
    est = hll_estimate(hll_registers(items, "_h", p=6), p=6).first()["estimate"]
    exact = len(set(vals))
    assert abs(est - exact) / exact < 0.35  # m=64 -> ~13% typical, 35% cap

    # merge law: max per register over halves == registers of the union
    a = spark.createDataFrame([(v,) for v in vals[:1000]], "_h long")
    b = spark.createDataFrame([(v,) for v in vals[1000:]], "_h long")
    merged = (
        hll_registers(a, "_h", 6)
        .unionByName(hll_registers(b, "_h", 6))
        .groupBy("_reg")
        .agg(F.max("_rank").alias("_rank"))
    )
    direct = hll_registers(items, "_h", 6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # duplicates cannot move the estimate
    dup = items.unionByName(items)
    est_dup = hll_estimate(hll_registers(dup, "_h", 6), 6).first()["estimate"]
    assert est_dup == est


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """Two micro-batches streamed through maintain_cms == cms_build
    over the union, and point estimates agree; restart over the
    consumed source changes nothing (merge_aggregate batch stamps)."""
    from asid_v2_data_pipeline_spark.sources.merge import read_aggregate
    from asid_v2_data_pipeline_spark.streaming.sketch_stream import (
        maintain_cms,
    )

    a = _items(spark, {1: 5, 2: 3, 9: 8})
    b = _items(spark, {2: 4, 3: 7})
    src = str(tmp_path / "src")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    tgt, ck = str(tmp_path / "cms"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("_h long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = maintain_cms(stream, tgt, "_h", ck, width=64, depth=3)
    q.awaitTermination(120)

    live = read_aggregate(spark, tgt).select("_d", "_bucket", "cnt")
    direct = cms_build(a.unionByName(b), "_h", 64, 3)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, direct.collect())
    )

    qr = spark.createDataFrame([(1,), (2,), (3,), (9,)], "_h long")
    est_live = sorted(
        map(tuple, cms_estimate(live, qr, "_h", 64, 3).collect())
    )
    est_direct = sorted(
        map(tuple, cms_estimate(direct, qr, "_h", 64, 3).collect())
    )
    assert est_live == est_direct

    # restart: fully-consumed source, no double-count
    stream2 = (
        spark.readStream.schema("_h long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q2 = maintain_cms(stream2, tgt, "_h", ck, width=64, depth=3)
    q2.awaitTermination(120)
    live2 = read_aggregate(spark, tgt).select("_d", "_bucket", "cnt")
    assert sorted(map(tuple, live2.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_build_is_partial_aggregated(spark):
    """The sketch build must map-side combine before its (bounded-key)
    exchange: two HashAggregates over (_d, _bucket) with one Exchange
    between them — the shape that keeps the shuffle at depth*width rows
    per partition regardless of corpus size."""
    items = _items(spark, {i: 2 for i in range(50)})
    plan = (
        cms_build(items, "_h", 64, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "merge_count" in plan or "count(1)" in plan
    assert "CartesianProduct" not in plan


def test_hll_large_m_and_empty_input(spark):
    """p=7 (m=128): the asymptotic alpha formula applies and the rank
    window shrinks to 24 bits — estimate still lands near exact; an
    EMPTY input estimates exactly 0.0, not NULL."""
    import random

    rng = random.Random(11)
    vals = [rng.randrange(1, 1 << 31) for _ in range(3000)]
    items = spark.createDataFrame([(v,) for v in vals], "_h long")
    est = hll_estimate(hll_registers(items, "_h", p=7), p=7).first()["estimate"]
    exact = len(set(vals))
    assert abs(est - exact) / exact < 0.3

    empty = spark.createDataFrame([], "_h long")
    e = hll_estimate(hll_registers(empty, "_h", p=6), p=6).first()["estimate"]
    assert e == 0.0


def test_streaming_hll_equals_batch_registers(spark, tmp_path):
    """Grouped-HLL stream: per-batch register partitions + MAX-merging
    read view == hll_registers_by over the union; estimates agree; a
    checkpointed restart over the consumed source changes nothing
    (append-only state, per-_bid dynamic overwrite)."""
    from asid_v2_data_pipeline_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )
    from asid_v2_data_pipeline_spark.streaming.sketch_stream import (
        maintain_hll,
        read_hll_registers,
    )

    a = spark.createDataFrame(
        [("click", i) for i in range(1, 40)] + [("view", i) for i in range(5, 20)],
        "etype string, _h long",
    )
    b = spark.createDataFrame(
        [("click", i) for i in range(30, 70)] + [("buy", i) for i in range(1, 9)],
        "etype string, _h long",
    )
    src = str(tmp_path / "src")
    a.coalesce(1).write.mode("append").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    tgt, ck = str(tmp_path / "hll"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("etype string, _h long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = maintain_hll(stream, tgt, ["etype"], "_h", ck, p=6)
    q.awaitTermination(120)

    live = read_hll_registers(spark, tgt, ["etype"])
    direct = hll_registers_by(a.unionByName(b), ["etype"], "_h", p=6)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_live = sorted(
        map(tuple, hll_estimate_by(live, ["etype"], 6).collect())
    )
    est_direct = sorted(
        map(tuple, hll_estimate_by(direct, ["etype"], 6).collect())
    )
    assert est_live == est_direct

    stream2 = (
        spark.readStream.schema("etype string, _h long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q2 = maintain_hll(stream2, tgt, ["etype"], "_h", ck, p=6)
    q2.awaitTermination(120)
    live2 = read_hll_registers(spark, tgt, ["etype"])
    assert sorted(map(tuple, live2.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_log_histogram_quantiles_accuracy_and_merge(spark):
    """Estimates stay within the power-of-two bucket bound of the true
    quantile (est/true in [0.5, 2.0] — one bucket of slack each way);
    histograms merge additively (streamed halves == direct)."""
    import random

    from asid_v2_data_pipeline_spark.operators.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    rng = random.Random(17)
    vals = [rng.lognormvariate(2.0, 1.0) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    hist = log_histogram(df, "value", scale=100)
    est = histogram_quantiles(hist, [0.5, 0.9, 0.99], scale=100).first()
    svals = sorted(vals)
    import math

    for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        true = svals[math.ceil(q * len(vals)) - 1]
        assert 0.5 <= est[col] / true <= 2.0, (q, est[col], true)

    a = spark.createDataFrame([(v,) for v in vals[:2000]], "value double")
    b = spark.createDataFrame([(v,) for v in vals[2000:]], "value double")
    merged = (
        log_histogram(a, "value", 100)
        .unionByName(log_histogram(b, "value", 100))
        .groupBy("_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, hist.collect())
    )


def test_log_histogram_overflow_raises_not_clamps(spark):
    """ADVICE r5: a value whose fixed point exceeds 2^HIST_MAX_BITS
    raises loudly instead of silently clamping into the top bucket
    (which would cap upper-tail quantiles with no warning)."""
    import pytest
    from pyspark.sql import functions as F

    from asid_v2_data_pipeline_spark.operators import sketches as sk

    ok = spark.createDataFrame(
        [(1.0,), (2.0e10,)], "v double"  # 2e10 * 100 = 2e12 < 2^41
    )
    assert sk.log_histogram(ok, "v", scale=100).count() == 2
    bad = spark.createDataFrame([(1.0,), (3.0e10,)], "v double")
    with pytest.raises(Exception, match="log_histogram overflow"):
        sk.log_histogram(bad, "v", scale=100).collect()
    with pytest.raises(Exception, match="log_histogram overflow"):
        sk.log_histogram_by(
            bad.withColumn("g", F.lit("a")), ["g"], "v", scale=100
        ).collect()
