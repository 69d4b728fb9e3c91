"""Interleaved A/B: Catalyst-HOF hash kernels vs the Arrow twins at
sf0.1 (guide §1.4 noop-sink methodology, labeled jobs).  Run:

    python tools/ab_arrowhash.py [sf_dir] [passes]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from asid_v2_data_pipeline_spark.functions import arrowhash as ah  # noqa: E402
from asid_v2_data_pipeline_spark.functions import text as tx  # noqa: E402
from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _perm_constants,
    _perm_min,
    _shingle_hashes_from_token_hashes,
    fingerprint_from_token_hashes,
    token_hashes,
)
from asid_v2_data_pipeline_spark.queries._shared import load_table  # noqa: E402
from asid_v2_data_pipeline_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-arrowhash")
    spark.sparkContext.setLogLevel("ERROR")
    layout = sys.argv[3] if len(sys.argv) > 3 else "single"
    d = load_table(spark, sf_dir, "documents")
    if layout == "par":
        # the _parallel_docs layout: one small parquet file = one input
        # split, so without this every variant runs on ONE core
        d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = d.localCheckpoint()
    text = F.col("text")
    th = token_hashes(text)

    variants = {
        "token_hashes/expr": lambda: d.select(th.alias("x")),
        "token_hashes/arrow": lambda: d.select(
            ah.token_hashes_arrow(text).alias("x")
        ),
        "hash_block/expr": lambda: d.select(
            fingerprint_from_token_hashes(th).alias("fp"),
            _shingle_hashes_from_token_hashes(th, 3).alias("h3"),
            _shingle_hashes_from_token_hashes(th, 8).alias("h8"),
        ),
        "hash_block/arrow": lambda: d.select(
            ah.hash_block(text, 3, 8).alias("b")
        ),
        "sig16/expr": lambda: d.select(
            _shingle_hashes_from_token_hashes(th, 3).alias("_hs")
        ).select(
            F.array(
                *[
                    _perm_min(F.col("_hs"), a, b)
                    for a, b in _perm_constants(16)
                ]
            ).alias("sig")
        ),
        "sig16/arrow": lambda: d.select(
            ah.shingle_hashes_arrow(text, 3).alias("_hs")
        ).select(ah.minhash_sig_arrow(F.col("_hs"), 16).alias("sig")),
        "grams5/expr": lambda: d.select(tx.tokens(text).alias("_t")).select(
            F.explode(
                F.transform(
                    F.when(
                        F.size("_t") >= 5,
                        F.sequence(F.lit(1), F.size("_t") - 4),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.struct(
                        i.alias("_pos"),
                        F.concat_ws(" ", F.slice("_t", i, 5)).alias("_g"),
                    ),
                )
            ).alias("_w")
        ),
        "grams5/arrow": lambda: d.select(tx.tokens(text).alias("_t")).select(
            F.posexplode(ah.grams_arrow(F.col("_t"), 5)).alias("_p", "_g")
        ),
        "clf64/expr": lambda: _clf_expr(spark, d, text),
        "clf64/arrow": lambda: d.select(
            ah.clf_token_sum(text, _weights()).alias("sn")
        ),
    }

    for name, build in variants.items():
        noop(build())  # warm (codegen / worker spin-up)
    results: dict[str, float] = {k: float("inf") for k in variants}
    for _ in range(passes):
        for name, build in variants.items():
            spark.sparkContext.setJobDescription(f"ab {name}")
            t0 = time.time()
            noop(build())
            results[name] = min(results[name], time.time() - t0)
    for name, best in results.items():
        print(f"{name:22s} {best:7.3f}s")
    for base in sorted({k.rsplit('/', 1)[0] for k in results}):
        e, a = results[f"{base}/expr"], results[f"{base}/arrow"]
        print(f"# {base}: expr {e:.3f}s arrow {a:.3f}s  ({e / a:.2f}x)")
    spark.stop()


def _weights() -> list[float]:
    from asid_v2_data_pipeline_spark.functions.classifier import lcg_weights

    return lcg_weights(64, seed=17)


def _clf_expr(spark, d, text):
    w = _weights()
    one = spark.createDataFrame([([float(x) for x in w],)], "_w: array<double>")
    th = token_hashes(text)
    s = F.aggregate(
        th,
        F.lit(0.0).cast("double"),
        lambda acc, h: acc
        + F.element_at(F.col("_w"), F.pmod(h, F.lit(64)).cast("int") + 1),
    )
    return d.crossJoin(F.broadcast(one)).select(
        s.alias("s"), F.size(th).alias("n")
    )


if __name__ == "__main__":
    main()
