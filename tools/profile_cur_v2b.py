"""r13 stage profile of the CURRENT cur_pipeline_v2 chain (post
arrowhash + checkpoint rewiring) — times each checkpoint/stage in the
order the real query materializes them.

    python tools/profile_cur_v2b.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asid_v2_data_pipeline_spark.functions import text as tx  # noqa: E402
from asid_v2_data_pipeline_spark.functions.arrowhash import hash_block  # noqa: E402
from asid_v2_data_pipeline_spark.functions.classifier import (  # noqa: E402
    lcg_weights,
    score_documents,
)
from asid_v2_data_pipeline_spark.operators.decontam import (  # noqa: E402
    contamination,
    fuzzy_contamination,
)
from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs_from_hashes,
    remove_duplicate_spans,
)
from asid_v2_data_pipeline_spark.operators.sampling import (  # noqa: E402
    quota_per_group,
    weighted_repeat,
)
from asid_v2_data_pipeline_spark.queries._shared import (  # noqa: E402
    _parallel,
    load_table,
)
from asid_v2_data_pipeline_spark.queries.curation import (  # noqa: E402
    _CLF_DIM,
    _CLF_GATE,
    _DC_FUZZY_T,
    _MIX_WEIGHTS,
)
from asid_v2_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-cur-v2b")
    spark.sparkContext.setLogLevel("ERROR")

    def stamp(label, t0):
        print(f"{label:46s} {time.time() - t0:7.3f}s", flush=True)

    d = load_table(spark, sf_dir, "documents")
    d.count()  # warm scan
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = _parallel(d.filter(F.col("doc_id") % 5 != 0))
    clf_w = lcg_weights(_CLF_DIM)

    t_all = time.time()
    gated = (
        score_documents(corpus, "text", clf_w, 0.0)
        .filter(F.col("clf_score") >= _CLF_GATE)
        .drop("clf_score")
    )
    passthrough = tuple(c for c in gated.columns if c not in ("doc_id", "text"))
    t = time.time()
    cleaned = remove_duplicate_spans(
        gated, "doc_id", "text", k=5, keep_cols=passthrough
    )
    rewritten = cleaned.select(
        "doc_id", *passthrough, F.col("clean_text").alias("text")
    ).localCheckpoint()
    stamp("1: clf gate + span removal + ckpt", t)

    t = time.time()
    good = rewritten.filter(tx.quality_score(F.col("text")) >= 0.5)
    gth = good.select("*", hash_block(F.col("text"), 3, 8).alias("_hb"))
    keyed = gth.withColumn("_fp", F.col("_hb.fp"))
    uniq = (
        exact_dedup(keyed, ["_fp"], "doc_id")
        .select("*", F.col("_hb.hs1").alias("_hs3"), F.col("_hb.hs2").alias("_hs8"))
        .drop("_fp", "_hb", "text")
        .localCheckpoint()
    )
    stamp("2: quality + hash_block + dedup ckpt", t)

    t = time.time()
    hashed3 = uniq.select(F.col("doc_id").alias("_id"), F.col("_hs3").alias("_hs"))
    pairs = minhash_lsh_pairs_from_hashes(hashed3, num_perm=16, bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    neat = uniq.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint()
    stamp("3: LSH + anti-join ckpt", t)

    t = time.time()
    bench_hs = (
        bench.select(
            F.col("doc_id").alias("_id"),
            hash_block(F.col("text"), 3, 8).alias("_hb"),
        )
        .select("_id", F.col("_hb.hs1").alias("_hs3"), F.col("_hb.hs2").alias("_hs8"))
        .localCheckpoint()
    )
    stamp("4: benchmark hash ckpt", t)

    t = time.time()
    contaminated = (
        contamination(
            neat, bench, "doc_id", "text", n=8,
            docs_hashed=neat.select(F.col("doc_id").alias("_id"), F.col("_hs8").alias("_hs")),
            bench_hashed=bench_hs.select("_id", F.col("_hs8").alias("_hs")),
        )
        .select("doc_id")
        .unionByName(
            fuzzy_contamination(
                neat, bench, "doc_id", "text", min_jaccard=_DC_FUZZY_T,
                docs_hashed=neat.select(F.col("doc_id").alias("_id"), F.col("_hs3").alias("_hs")),
                bench_hashed=bench_hs.select("_id", F.col("_hs3").alias("_hs")),
            ).select("doc_id")
        )
        .distinct()
    )
    clean = neat.join(F.broadcast(contaminated), "doc_id", "left_anti")
    capped = quota_per_group(clean, ["source"], 30, "doc_id", seed=17)
    out = weighted_repeat(capped, "lang", _MIX_WEIGHTS, "doc_id", seed=29)
    final = out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")
    spark.sparkContext.setJobDescription("tail")
    final.write.format("noop").mode("overwrite").save()
    stamp("5: decontam tiers + quota + mix + sort", t)
    stamp("TOTAL", t_all)
    spark.stop()


if __name__ == "__main__":
    main()
