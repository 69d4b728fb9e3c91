"""Sub-stage profile of cur_pipeline_v2's stage 3 (VERDICT r12 task 5).

Stage 3 — "rewrite join + quality + fingerprint + exact dedup + both
shingle folds, landing in the uniq checkpoint" — absorbed the single
token-hash pass in r12 and is now the second-largest stage (2.88 s at
sf0.1).  This tool splits it for attribution:

  3a  rewrite join: gated (classifier re-eval) ⋈ cleaned spans
  3b  quality regex filter over the rewritten text
  3c1 the ONE token_hashes char pass
  3c2 fingerprint fold + exact-dedup window
  3c3 n=3 + n=8 shingle folds + the uniq checkpoint write

Sub-stages are isolated with localCheckpoint barriers, so their sum
exceeds the fused stage (extra materializations) — the point is WHERE
the time goes, not the absolute total.  Stages 1-2 run un-instrumented
first to reproduce the real chain's inputs.

    python tools/profile_stage3.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from asid_v2_data_pipeline_spark.session import get_spark  # noqa: E402
from asid_v2_data_pipeline_spark.queries._shared import load_table  # noqa: E402
from asid_v2_data_pipeline_spark.queries.curation import (  # noqa: E402
    _CLF_DIM,
    _CLF_GATE,
)
from asid_v2_data_pipeline_spark.functions.classifier import (  # noqa: E402
    lcg_weights,
    score_documents,
)
from asid_v2_data_pipeline_spark.functions import text as tx  # noqa: E402
from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _shingle_hashes_from_token_hashes,
    exact_dedup,
    fingerprint_from_token_hashes,
    remove_duplicate_spans,
    token_hashes,
)


def profile(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}

    def mark(name, t0):
        times[name] = round(time.time() - t0, 3)
        print(f"#   {name}: {times[name]:.3f}s", file=sys.stderr)

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)  # noqa: F841 — chain shape
    corpus = d.filter(F.col("doc_id") % 5 != 0)

    gated = (
        score_documents(corpus, "text", lcg_weights(_CLF_DIM, seed=17), 0.1)
        .filter(F.col("clf_score") >= _CLF_GATE)
        .drop("clf_score")
    )
    cleaned = remove_duplicate_spans(gated, "doc_id", "text", k=5).localCheckpoint()

    t0 = time.time()
    rewritten = gated.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    ).localCheckpoint()
    mark("3a_rewrite_join", t0)

    t0 = time.time()
    good = rewritten.filter(
        tx.quality_score(F.col("text")) >= 0.5
    ).localCheckpoint()
    mark("3b_quality", t0)

    t0 = time.time()
    gth = good.select("*", token_hashes(F.col("text")).alias("_th")).localCheckpoint()
    mark("3c1_token_hashes", t0)

    t0 = time.time()
    keyed = gth.withColumn("_fp", fingerprint_from_token_hashes(F.col("_th")))
    deduped = exact_dedup(keyed, ["_fp"], "doc_id").localCheckpoint()
    mark("3c2_fp_exact_dedup", t0)

    t0 = time.time()
    uniq = (
        deduped.select(
            "*",
            _shingle_hashes_from_token_hashes(F.col("_th"), 3).alias("_hs3"),
            _shingle_hashes_from_token_hashes(F.col("_th"), 8).alias("_hs8"),
        )
        .drop("_fp", "_th", "text")
        .localCheckpoint()
    )
    uniq.count()
    mark("3c3_shingle_folds_ckpt", t0)

    times["sum_3"] = round(
        sum(v for k, v in times.items() if k.startswith("3")), 3
    )
    return times


def fused_stage3(spark, sf_dir: str) -> float:
    """The REAL (fused) stage 3, timed as profile_cur_v2.py times it."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    gated = (
        score_documents(corpus, "text", lcg_weights(_CLF_DIM, seed=17), 0.1)
        .filter(F.col("clf_score") >= _CLF_GATE)
        .drop("clf_score")
    )
    cleaned = remove_duplicate_spans(gated, "doc_id", "text", k=5).localCheckpoint()
    t0 = time.time()
    rewritten = gated.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )
    good = rewritten.filter(tx.quality_score(F.col("text")) >= 0.5)
    gth = good.select("*", token_hashes(F.col("text")).alias("_th"))
    keyed = gth.withColumn("_fp", fingerprint_from_token_hashes(F.col("_th")))
    uniq = (
        exact_dedup(keyed, ["_fp"], "doc_id")
        .select(
            "*",
            _shingle_hashes_from_token_hashes(F.col("_th"), 3).alias("_hs3"),
            _shingle_hashes_from_token_hashes(F.col("_th"), 8).alias("_hs8"),
        )
        .drop("_fp", "_th", "text")
        .localCheckpoint()
    )
    uniq.count()
    return round(time.time() - t0, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from asid_v2_data_pipeline_spark.queries.curation import cur_pipeline_v2

    cur_pipeline_v2(spark, sf_dir).count()  # warm
    runs = [profile(spark, sf_dir) for _ in range(passes)]
    fused = [fused_stage3(spark, sf_dir) for _ in range(passes)]
    best = {k: min(r[k] for r in runs) for k in runs[0]}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "per_substage_min": best,
                "fused_stage3_min": min(fused),
                "fused_all": fused,
                "runs": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
