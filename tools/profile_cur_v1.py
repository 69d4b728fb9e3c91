"""Stage-level profile of cur_pipeline (curate v1), r13 — mirrors
plans/curation.py::curate stage by stage with the noop sink.

    python tools/profile_cur_v1.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asid_v2_data_pipeline_spark.functions import text as tx  # noqa: E402
from asid_v2_data_pipeline_spark.functions.arrowhash import hash_block  # noqa: E402
from asid_v2_data_pipeline_spark.operators.decontam import contamination  # noqa: E402
from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs_from_hashes,
)
from asid_v2_data_pipeline_spark.operators.sampling import (  # noqa: E402
    quota_per_group,
    weighted_repeat,
)
from asid_v2_data_pipeline_spark.queries._shared import _parallel, load_table  # noqa: E402
from asid_v2_data_pipeline_spark.queries.curation import _MIX_WEIGHTS  # noqa: E402
from asid_v2_data_pipeline_spark.session import get_spark  # noqa: E402


def noop(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:44s} {dt:7.3f}s", flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-cur-v1")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    d.count()  # warm scan

    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = _parallel(d.filter(F.col("doc_id") % 97 != 0))

    t_all = time.time()
    good = corpus.filter(tx.quality_score(F.col("text")) >= 0.5)
    gth = good.select("*", hash_block(F.col("text"), 3, 8).alias("_hb"))
    keyed = gth.withColumn("_fp", F.col("_hb.fp"))
    noop(keyed, "1: quality + hash_block", spark)

    t = time.time()
    uniq = (
        exact_dedup(keyed, ["_fp"], "doc_id")
        .select("*", F.col("_hb.hs1").alias("_hs3"), F.col("_hb.hs2").alias("_hsN"))
        .drop("_fp", "_hb")
        .localCheckpoint()
    )
    print(f"{'2: exact_dedup window + checkpoint':44s} {time.time() - t:7.3f}s")

    pairs = minhash_lsh_pairs_from_hashes(
        uniq.select(F.col("doc_id").alias("_id"), F.col("_hs3").alias("_hs")),
        num_perm=16,
        bands=4,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    noop(losers, "3: LSH pairs + losers", spark)

    t = time.time()
    neat = uniq.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint()
    print(f"{'4: anti-join + checkpoint':44s} {time.time() - t:7.3f}s")

    contaminated = contamination(
        neat, bench, "doc_id", "text", n=8,
        docs_hashed=neat.select(F.col("doc_id").alias("_id"), F.col("_hsN").alias("_hs")),
    ).select("doc_id")
    noop(contaminated, "5: decontam (bench hash + join)", spark)

    clean = neat.drop("_hs3", "_hsN").join(F.broadcast(contaminated), "doc_id", "left_anti")
    capped = quota_per_group(clean, ["source"], 30, "doc_id", seed=17)
    out = weighted_repeat(capped, "lang", _MIX_WEIGHTS, "doc_id", seed=29)
    final = out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")
    noop(final, "6: quota + mixture + sort", spark)
    print(f"{'TOTAL':44s} {time.time() - t_all:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
