"""Span-detector exchange-layout crossover measurement (VERDICT r12
task 2).

The r12 A/B showed the gram-STRING groupBy beats the xxhash64+confirm
two-phase layout at sf0.1 (3.5 s vs 4.7 s inside cur_pipeline_v2) but
the at-scale claim — "flip ``hash_shuffle=True`` when the gram exchange
is TBs of strings" — was asserted, not measured.  This tool measures
the crossover on deterministic seeded synthetic corpora at several
sizes (sf0.1's 5k-doc shape scaled 10x-60x) and prints a table for
PLANS.md / SCALE.md.

Corpus shape mirrors the bench corpus where it matters for this
operator: ~60 tokens/doc, and ~30% of docs embed one of a small pool of
shared boilerplate spans (>= k tokens), so the duplicated-occurrence
fraction lands near the ~7% the bench corpus shows — that fraction
bounds the two-phase layout's confirm pass.

Both layouts are verified to return IDENTICAL span sets at every size
(the same equality the unit test pins), and the two layouts are timed
INTERLEAVED (string, hash, string, hash, ...) so a host burst degrades
both arms rather than biasing one.

Usage:  python tools/span_crossover.py [--long-tokens] [sizes...]
(doc counts; default 5000 50000 150000 300000)

``--long-tokens`` pads every token to ~20 chars so a k=5 gram is
~100 B against the fixed 8 B xxhash64 key (~12x byte ratio vs ~3x for
the short corpus) — isolating the byte-volume axis the 100 TB argument
rests on, independent of corpus row count.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from asid_v2_data_pipeline_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
)
from asid_v2_data_pipeline_spark.session import get_spark  # noqa: E402

K = 5
SEED = 20260816
VOCAB = 5000
DOC_TOKENS = 60
BOILER_POOL = 24
BOILER_LEN = (10, 21)  # half-open
BOILER_PROB = 0.30


def synth_corpus(n_docs: int, long_tokens: bool = False) -> pd.DataFrame:
    """Deterministic corpus: unique random-word bodies, ~30% of docs
    splice in one shared boilerplate span (the duplicated substring a
    real corpus carries as templated passages / quotes)."""
    rng = np.random.default_rng(SEED)
    fmt = (lambda t: f"w{t:016d}xx") if long_tokens else (lambda t: f"w{t}")
    boilers = [
        rng.integers(0, VOCAB, int(rng.integers(*BOILER_LEN)))
        for _ in range(BOILER_POOL)
    ]
    body = rng.integers(0, VOCAB, (n_docs, DOC_TOKENS))
    has_boiler = rng.random(n_docs) < BOILER_PROB
    which = rng.integers(0, BOILER_POOL, n_docs)
    at = rng.integers(0, DOC_TOKENS - max(len(b) for b in boilers), n_docs)
    texts = []
    for i in range(n_docs):
        toks = body[i].tolist()
        if has_boiler[i]:
            b = boilers[which[i]]
            toks[at[i] : at[i] + len(b)] = b.tolist()
        texts.append(" ".join(fmt(t) for t in toks))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})


def main() -> None:
    argv = sys.argv[1:]
    long_tokens = "--long-tokens" in argv
    argv = [a for a in argv if a != "--long-tokens"]
    sizes = [int(a) for a in argv] or [5000, 50000, 150000, 300000]
    spark = get_spark(app_name="span-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    rows_out = []
    for n in sizes:
        suffix = "_lt" if long_tokens else ""
        path = f"/tmp/span_xover_{n}{suffix}.parquet"
        import os

        if not os.path.exists(path):
            spark.createDataFrame(synth_corpus(n, long_tokens)).repartition(32).write.mode(
                "overwrite"
            ).parquet(path)
        docs = spark.read.parquet(path)

        def run(hash_shuffle: bool) -> float:
            t0 = time.monotonic()
            duplicate_spans(
                docs, "doc_id", "text", k=K, hash_shuffle=hash_shuffle
            ).count()
            return time.monotonic() - t0

        # equality first (also the warmup)
        a = duplicate_spans(docs, "doc_id", "text", k=K, hash_shuffle=False)
        b = duplicate_spans(docs, "doc_id", "text", k=K, hash_shuffle=True)
        sa = sorted(tuple(r) for r in a.collect())
        sb = sorted(tuple(r) for r in b.collect())
        assert sa == sb, f"layouts diverge at n={n}"
        # interleaved timing: 3 pairs, report min (host-burst immune-ish)
        ts, th = [], []
        for _ in range(3):
            ts.append(run(False))
            th.append(run(True))
        rec = {
            "n_docs": n,
            "long_tokens": long_tokens,
            "spans": len(sa),
            "string_sec": round(min(ts), 3),
            "hash_sec": round(min(th), 3),
            "string_all": [round(x, 3) for x in ts],
            "hash_all": [round(x, 3) for x in th],
            "ratio_hash_over_string": round(min(th) / min(ts), 3),
        }
        rows_out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"crossover_table": rows_out}))


if __name__ == "__main__":
    main()
