"""Benchmark decontamination (SURVEY.md §2.11 adjunct).

Training corpora must not contain evaluation data.  The standard check is
n-gram overlap: a document is contaminated if it shares at least one
n-gram with any benchmark document (GPT-3 used 13-grams; n is a knob).

Spark-first shape: the benchmark side is SMALL (eval sets are thousands
of documents), so its distinct n-gram hash set is **broadcast** — the
100 TB corpus side is scanned once, its shingle hashes exploded and
matched map-side with no shuffle of corpus data; only matching (rare)
rows reach the per-document count aggregation.

Hashing reuses the deterministic 31-poly/COMBINE shingle arithmetic from
``operators.dedup`` so the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingle_hashes


def _warn_if_lazy_hashed(df: DataFrame, arg: str) -> None:
    """Guard the ``docs_hashed`` / ``bench_hashed`` contract (ADVICE
    r12): the ``_hs`` array must come from a MATERIALIZED relation
    (checkpoint / cache / table), never a lazy fold expression —
    exploding a lazy higher-order fold re-evaluates it per output row
    inside the Generate stage (measured ~140× at sf0.1, see
    :func:`contamination`).  Detection is a plan-string heuristic: a
    checkpointed/cached/table-backed side optimizes to LogicalRDD /
    InMemoryRelation / a file relation with NO higher-order functions
    left in the plan, so ``aggregate(``/``transform(`` surviving in the
    optimized plan means the shingle fold would run inside the explode.
    Warns (not raises): the caller may knowingly accept the cost on a
    tiny side, and Spark Connect has no ``_jdf`` (silently skipped)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return
    if (
        "aggregate(" in plan
        or "transform(" in plan
        or "arrowhash_" in plan  # r13: an unmaterialized Arrow-kernel side
    ):
        import warnings

        warnings.warn(
            f"{arg} carries a lazy higher-order fold in its plan; "
            "materialize it (localCheckpoint/cache/table) before passing "
            "or the explode re-evaluates the fold per output row "
            "(~140x regression — see contamination() docstring)",
            RuntimeWarning,
            stacklevel=3,
        )


def benchmark_ngram_set(
    benchmark: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Distinct n-gram hash set (``_sh``) of the benchmark corpus.

    Documents shorter than ``n`` tokens contribute their whole-document
    fold (same convention as the dedup shinglers).
    """
    return (
        with_shingle_hashes(benchmark, id_col, text_col, n)
        .localCheckpoint()  # materialize BEFORE exploding — see contamination()
        .select(F.explode("_hs").alias("_sh"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    docs_hashed: DataFrame | None = None,
    bench_hashed: DataFrame | None = None,
) -> DataFrame:
    """Per-document contamination counts vs a benchmark set.

    Returns ``(id_col, n_grams, n_hits, rate)`` for every document with
    at least one benchmark n-gram, where ``n_grams`` is the document's
    distinct n-gram count, ``n_hits`` how many of those appear in the
    benchmark set, and ``rate = n_hits / n_grams``.

    Scale profile: benchmark gram set broadcast (eval sets are tiny next
    to the corpus); corpus scanned once; the only exchange is the
    groupBy over *matching* gram rows — a vanishing fraction at 100 TB.
    Downstream: anti-join the corpus against this output to drop or
    flag contaminated documents.

    ``docs_hashed`` / ``bench_hashed``: optional pre-computed
    (_id, _hs) shingle tables at the same ``n`` for either side —
    pass them when a surrounding pipeline already paid the char-hash
    pass (curate_v2 derives both n-gram widths from one token-hash
    array).  BOTH must be MATERIALIZED relations (checkpointed /
    persisted), never lazy fold expressions: this function explodes
    ``_hs``, and exploding an expensive array expression re-evaluates
    it per output row inside the Generate stage (see below).
    """
    if bench_hashed is not None:
        _warn_if_lazy_hashed(bench_hashed, "bench_hashed")
    if docs_hashed is not None:
        _warn_if_lazy_hashed(docs_hashed, "docs_hashed")
    bench = (
        benchmark_ngram_set(benchmark, id_col, text_col, n)
        if bench_hashed is None
        else bench_hashed.select(F.explode("_hs").alias("_sh")).distinct()
    )
    # Materialize the shingle arrays BEFORE the explode: exploding an
    # expensive array EXPRESSION re-evaluates it inside the Generate
    # stage, where whole-stage codegen's common-subexpression
    # elimination does not reach — measured 185 s vs 1.3 s at sf0.1 for
    # this exact explode.  localCheckpoint locally; at 100 TB this is
    # the persisted shingle table every dedup/decontam pipeline keeps.
    hashed = (
        docs_hashed
        if docs_hashed is not None
        else with_shingle_hashes(docs, id_col, text_col, n).localCheckpoint()
    )
    grams = hashed.select(
        "_id", F.size("_hs").alias("_ng"), F.explode("_hs").alias("_sh")
    )
    return (
        grams.join(F.broadcast(bench), "_sh")
        .groupBy("_id", "_ng")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_ng").alias("n_grams"),
            F.col("n_hits"),
            F.round(F.col("n_hits") / F.col("_ng"), 6).alias("rate"),
        )
    )


def fuzzy_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    min_jaccard: float = 0.5,
    docs_hashed: DataFrame | None = None,
    bench_hashed: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate contamination: corpus documents MinHash-colliding
    with a benchmark document, verified by exact shingle Jaccard.

    Exact n-gram overlap (:func:`contamination`) misses paraphrased or
    lightly-edited eval leakage; banded MinHash catches documents that
    are mostly-the-same without an all-pairs corpus×benchmark product.

    Scale profile: both sides are shingle-hashed ONCE (checkpointed);
    the benchmark's band rows and shingle sets are broadcast (eval sets
    are tiny); the corpus is scanned once and only bucket-colliding
    candidates reach the Jaccard verify, which joins hash ARRAYS by id —
    never exploded grams.  No corpus shuffle anywhere.

    Returns distinct ``(id_col, bench_id, jaccard)`` with
    ``jaccard >= min_jaccard``, jaccard rounded to 6 places.

    ``docs_hashed`` / ``bench_hashed``: optional pre-computed
    (_id, _hs) shingle tables for either side (must be hashed at the
    same ``n``, and MATERIALIZED — see ``contamination``) — pass them
    when a surrounding pipeline already paid the shingle pass
    (curate_v2 shares one checkpointed table between the MinHash dedup
    and this tier, and one benchmark token-hash pass between the exact
    and fuzzy tiers).
    """
    from .dedup import band_rows_from_hashes

    if bench_hashed is not None:
        _warn_if_lazy_hashed(bench_hashed, "bench_hashed")
    if docs_hashed is not None:
        _warn_if_lazy_hashed(docs_hashed, "docs_hashed")
    if bench_hashed is None:
        bench_hashed = with_shingle_hashes(
            benchmark, id_col, text_col, n
        ).localCheckpoint()
    corpus_hashed = (
        docs_hashed
        if docs_hashed is not None
        else with_shingle_hashes(docs, id_col, text_col, n).localCheckpoint()
    )
    bench_rows = band_rows_from_hashes(bench_hashed, num_perm, bands)
    corpus_rows = band_rows_from_hashes(corpus_hashed, num_perm, bands)
    cands = (
        corpus_rows.join(
            F.broadcast(
                bench_rows.select(
                    F.col("_id").alias("_bid"), "_band", "_bucket"
                )
            ),
            ["_band", "_bucket"],
        )
        .select("_id", "_bid")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("_hs"), F.col("_bhs")))
    union = F.size("_hs") + F.size("_bhs") - inter
    return (
        cands.join(corpus_hashed, "_id")
        .join(
            F.broadcast(
                bench_hashed.select(
                    F.col("_id").alias("_bid"), F.col("_hs").alias("_bhs")
                )
            ),
            "_bid",
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_bid").alias("bench_id"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def contamination_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    fpp: float = 0.01,
) -> DataFrame:
    """:func:`contamination` with a Bloom semi-join prefilter — the
    at-scale form for when the benchmark gram set outgrows the broadcast
    threshold (a 1 B-gram eval suite is an ~8 GB hash table but a
    ~1.2 GB word array at 1 % fpp, and the array is data, not a plan).

    Lossless: the bloom has no false negatives and the exact join still
    runs behind it, so the output is identical to :func:`contamination`
    — but only bloom-positive corpus grams (true hits + ~fpp of the
    rest) ever reach the join exchange.  At 100 TB that turns a
    corpus-sized shuffle into a hits-sized one.
    """
    from .bloom import bloom_prefilter, build_bloom

    bench = benchmark_ngram_set(benchmark, id_col, text_col, n).localCheckpoint()
    spec = build_bloom(bench, "_sh", fpp=fpp)
    hashed = with_shingle_hashes(docs, id_col, text_col, n).localCheckpoint()
    grams = hashed.select(
        "_id", F.size("_hs").alias("_ng"), F.explode("_hs").alias("_sh")
    )
    survivors = bloom_prefilter(grams, "_sh", spec)
    return (
        survivors.join(F.broadcast(bench), "_sh")
        .groupBy("_id", "_ng")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_ng").alias("n_grams"),
            F.col("n_hits"),
            F.round(F.col("n_hits") / F.col("_ng"), 6).alias("rate"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_hits: int = 0,
) -> DataFrame:
    """Drop documents whose benchmark n-gram hit count exceeds
    ``max_hits`` (default 0: any overlap removes the document).

    One broadcast join + one left-anti join; the corpus never shuffles.
    """
    bad = contamination(docs, benchmark, id_col, text_col, n).filter(
        F.col("n_hits") > max_hits
    )
    return docs.join(bad.select(id_col), id_col, "left_anti")
