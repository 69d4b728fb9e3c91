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
