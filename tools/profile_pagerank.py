"""Stage-wise profile of gr_pagerank_incremental (r13 opt, guide §1):
time each phase with the noop sink + labeled jobs."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def noop(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:40s} {dt:7.3f}s", flush=True)
    return dt


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    from asid_v2_data_pipeline_spark.queries.graph import (
        _PRI_OLD,
        _PRI_WARM,
    )
    from asid_v2_data_pipeline_spark.queries.media import (
        _PR_DAMP,
        _PR_OFF,
    )
    from asid_v2_data_pipeline_spark.schemas import load_table
    from asid_v2_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile-pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # warmup pass
    li.join(o, li.l_orderkey == o.o_orderkey).count()

    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    t0 = time.time()
    noop(pairs, "pairs: join+distinct (one evaluation)", spark)

    def _edges(p):
        return p.select(
            F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst")
        ).unionAll(
            p.select(
                (F.col("s") + _PR_OFF).alias("src"), F.col("c").alias("dst")
            )
        )

    from asid_v2_data_pipeline_spark.operators.graph import (
        _edges_and_degrees,
        _power_iterations,
    )

    old = pairs.filter((F.col("c") + F.col("s")) % 2 == 0)
    t = time.time()
    e1, deg1, n1 = _edges_and_degrees(_edges(old), "src", "dst", None)
    print(f"{'cold edges+deg checkpoint':40s} {time.time() - t:7.3f}s")
    print(f"  edges={e1.count()}, nodes={n1}")
    ranks0 = deg1.select(
        "src", (F.lit(1.0 / n1) / F.col("deg")).alias("contrib")
    )
    t = time.time()
    prev = _power_iterations(e1, deg1, ranks0, n1, _PR_DAMP, _PRI_OLD)
    noop(prev, f"cold {_PRI_OLD} rounds", spark)

    t = time.time()
    e2, deg2, n2 = _edges_and_degrees(_edges(pairs), "src", "dst", None)
    print(f"{'full edges+deg checkpoint':40s} {time.time() - t:7.3f}s")
    print(f"  edges={e2.count()}, nodes={n2}")
    seed = deg2.join(
        prev.select(F.col("node").alias("src"), "rank"), "src", "left"
    ).select(
        "src",
        (F.coalesce(F.col("rank"), F.lit(1.0 / n2)) / F.col("deg")).alias(
            "contrib"
        ),
    )
    warm = _power_iterations(e2, deg2, seed, n2, _PR_DAMP, _PRI_WARM)
    out = warm.select(
        F.col("src").alias("node"), F.round("rank", 6).alias("rank")
    ).orderBy("node")
    noop(out, f"seed + warm {_PRI_WARM} rounds + sort", spark)
    print(f"{'TOTAL':40s} {time.time() - t0:7.3f}s")

    # one power round in isolation, on the checkpointed full tables
    ranks = deg2.select(
        "src", (F.lit(1.0 / n2) / F.col("deg")).alias("contrib")
    ).localCheckpoint()
    t = time.time()
    one = (
        e2.join(ranks, "src")
        .groupBy("dst")
        .agg(F.sum(F.col("contrib")).alias("_in"))
    )
    noop(one, "ONE round: join+agg only", spark)
    one.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
