#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once to force the full plan (count() on the result —
result sets are small aggregates, so this measures compute, not driver
transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: relational joins/aggs, patch ops, dedup, similarity,
# text, windows — one per operator family, the scale-sensitive ones
HEADLINE = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "q5_nation_revenue",
    "w1_tumbling_patches",
    "w4_avg_pool",
    "w8_stitch_roundtrip",
    "c2_one_hot_binary",
    "dd_exact",
    "dd_minhash_lsh",
    "sim_topk_cosine",
    "tx_token_stats",
    "t_tumbling_window",
]


def main() -> None:
    from asid_v2_data_pipeline_spark.queries import all_queries
    from asid_v2_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warmup so the first timed query doesn't pay boot costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
