"""Stage-level profile of cur_pipeline_v2 (r12, VERDICT r11 task 2).

Mirrors plans/curation.py::curate_v2 stage by stage, forcing each
stage with a count() and timing it in sequence inside one session —
the same chain the query runs, instrumented.  Because the plan's own
localCheckpoint() calls cut lineage exactly where the real query
does, the per-stage times sum to ~the end-to-end time (plus count
overhead).  Run:

    python tools/profile_cur_v2.py [sf_dir] [passes]
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
    _DC_FUZZY_T,
    _MIX_WEIGHTS,
)
from asid_v2_data_pipeline_spark.functions.classifier import (  # noqa: E402
    lcg_weights,
    score_documents,
)
from asid_v2_data_pipeline_spark.functions import text as tx  # noqa: E402
from asid_v2_data_pipeline_spark.operators.decontam import (  # noqa: E402
    contamination,
    fuzzy_contamination,
)
from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _shingle_hashes_from_token_hashes,
    exact_dedup,
    fingerprint_from_token_hashes,
    minhash_lsh_pairs_from_hashes,
    remove_duplicate_spans,
    token_hashes,
)
from asid_v2_data_pipeline_spark.operators.sampling import (  # noqa: E402
    quota_per_group,
    weighted_repeat,
)


def profile(spark, sf_dir: str) -> dict[str, float]:
    t_all0 = time.time()
    times: dict[str, float] = {}

    def mark(name, t0):
        times[name] = round(time.time() - t0, 3)
        print(f"#   {name}: {times[name]:.3f}s", file=sys.stderr)

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)

    t0 = time.time()
    gated = (
        score_documents(corpus, "text", lcg_weights(_CLF_DIM, seed=17), 0.1)
        .filter(F.col("clf_score") >= _CLF_GATE)
        .drop("clf_score")
    )
    gated.count()
    mark("1_classifier_gate", t0)

    t0 = time.time()
    cleaned = remove_duplicate_spans(gated, "doc_id", "text", k=5)
    cleaned = cleaned.localCheckpoint()  # isolate the span stage
    mark("2_span_removal", t0)

    t0 = time.time()
    rewritten = gated.drop("text").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )
    good = rewritten.filter(tx.quality_score(F.col("text")) >= 0.5)
    # r12 tokenize-once: ONE char pass feeds fingerprint + both
    # shingle widths, all landing in the uniq checkpoint
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
    mark("3_rewrite_quality_exact_hashes", t0)

    t0 = time.time()
    hashed3 = uniq.select(F.col("doc_id").alias("_id"), F.col("_hs3").alias("_hs"))
    pairs = minhash_lsh_pairs_from_hashes(hashed3, num_perm=16, bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    neat = uniq.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint()
    mark("5_minhash_neardup", t0)

    t0 = time.time()
    bench_hs = (
        bench.select(
            F.col("doc_id").alias("_id"), token_hashes(F.col("text")).alias("_th")
        )
        .select(
            "_id",
            _shingle_hashes_from_token_hashes(F.col("_th"), 3).alias("_hs3"),
            _shingle_hashes_from_token_hashes(F.col("_th"), 8).alias("_hs8"),
        )
        .localCheckpoint()
    )
    contaminated = (
        contamination(
            neat,
            bench,
            "doc_id",
            "text",
            n=8,
            docs_hashed=neat.select(
                F.col("doc_id").alias("_id"), F.col("_hs8").alias("_hs")
            ),
            bench_hashed=bench_hs.select("_id", F.col("_hs8").alias("_hs")),
        )
        .select("doc_id")
        .unionByName(
            fuzzy_contamination(
                neat,
                bench,
                "doc_id",
                "text",
                min_jaccard=_DC_FUZZY_T,
                docs_hashed=neat.select(
                    F.col("doc_id").alias("_id"), F.col("_hs3").alias("_hs")
                ),
                bench_hashed=bench_hs.select("_id", F.col("_hs3").alias("_hs")),
            ).select("doc_id")
        )
        .distinct()
    )
    clean = neat.select("doc_id", "source", "lang").join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )
    clean = clean.localCheckpoint()
    mark("6_decontam_exact_fuzzy", t0)

    t0 = time.time()
    capped = quota_per_group(clean, ["source"], 30, "doc_id", seed=17)
    out = weighted_repeat(capped, "lang", _MIX_WEIGHTS, "doc_id", seed=29)
    n = (
        out.select(
            "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
        )
        .orderBy("doc_id", "epoch")
        .count()
    )
    mark("7_quota_mixture_sort", t0)

    times["total"] = round(time.time() - t_all0, 3)
    times["rows_out"] = n
    return times


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    # untimed warm pass: JIT/codegen/scan caches, same as bench.py
    from asid_v2_data_pipeline_spark.queries.curation import cur_pipeline_v2

    cur_pipeline_v2(spark, sf_dir).count()
    runs = []
    for i in range(passes):
        print(f"# pass {i + 1}/{passes}", file=sys.stderr)
        runs.append(profile(spark, sf_dir))
    # also the un-instrumented end-to-end for the same session
    t0 = time.time()
    cur_pipeline_v2(spark, sf_dir).count()
    e2e = round(time.time() - t0, 3)
    best = {
        k: min(r[k] for r in runs) for k in runs[0] if k != "rows_out"
    }
    print(
        json.dumps(
            {"sf_dir": sf_dir, "per_stage_min": best, "e2e_plain": e2e,
             "rows_out": runs[0]["rows_out"], "runs": runs}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
