"""End-to-end corpus curation plan (SURVEY.md §2.11 composition).

The full curation chain a training-data pipeline runs over raw documents,
composed from the engine's operators into ONE declarative DataFrame plan
(Catalyst sees the whole lineage — filters push to the scan, the narrow
stages fuse into the scan's codegen stage):

    quality filter → exact dedup → near-dup dedup (MinHash-LSH) →
    benchmark decontamination → per-source quota → language mixture

Shuffle census at 100 TB (in order): exact-dedup window (hash on
fingerprint), LSH band groupBy + pair distinct, decontam hit groupBy
(matching rows only), quota window (hash on source), mixture explode
(narrow).  Everything else — quality scoring, fingerprinting, the
benchmark join (broadcast), the survivor anti-joins (broadcast: losers
are small) — stays in map stages.

At 100 TB a production run persists the intermediate corpus stages
(quality-filtered set, exact-dedup survivors, the near-dup-free set) as
parquet tables between phases instead of re-deriving them through the
lineage — each stage output is a fraction of its input and every
downstream consumer (including the decontam shingle materialization,
which already checkpoints) then reads a table, not a recomputation.
Locally the composed lazy plan is the point: Catalyst sees the whole
chain, and the oracle checks it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators.decontam import contamination
from ..operators.dedup import exact_dedup, minhash_lsh_pairs
from ..operators.sampling import quota_per_group, weighted_repeat
from ..session import release_checkpoint


def _background(build):
    """Materialize ``build()`` on a driver thread (guide §2.6 — Spark's
    scheduler happily runs several jobs at once; actions are sequential
    only because driver code calls them sequentially).  The curation
    chains use it for the BENCHMARK-side hash checkpoint, which depends
    on nothing in the corpus chain: its job back-fills executor slots
    freed by the chain's own checkpoint jobs instead of running serially
    after them.  Returns a zero-arg ``result()`` that joins the thread
    and returns the built DataFrame (re-raising any build error)."""
    import threading

    box: list = []

    def run():
        try:
            box.append((None, build()))
        except BaseException as exc:  # propagate on join, never swallow
            box.append((exc, None))

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def result():
        t.join()
        exc, val = box[0]
        if exc is not None:
            raise exc
        return val

    return result


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    decontam_n: int = 8,
    quota: int = 30,
    quota_col: str = "source",
    mix_col: str = "lang",
    quota_seed: int = 17,
    mix_seed: int = 29,
) -> DataFrame:
    """Run the curation chain; returns the mixed corpus (FULL input
    rows, text included — unlike ``curate_v2``, whose extended chain
    drops text at its checkpoint) with an ``epoch`` column (one row per
    training epoch of each admitted document).

    Tokenize-once (r13, extending the r12 curate_v2 rewiring to the
    flagship v1 chain): the surviving corpus pays the char-level
    tokenize+hash pass EXACTLY ONCE — ``token_hashes`` feeds the
    exact-dedup fingerprint, the n=3 MinHash shingles and the
    n=``decontam_n`` decontam grams as arithmetic folds landing in the
    one ``uniq`` checkpoint (fold≡text identities pinned in
    tests/test_fuzzy_decontam.py).  Pre-r13 this was three corpus char
    passes.  The benchmark side still hashes inside ``contamination``
    (one pass — v1 has a single decontam tier)."""
    from ..functions.arrowhash import hash_block
    from ..operators.dedup import (
        minhash_lsh_pairs_from_hashes,
        with_shingle_hashes,
    )

    # r14 (guide §2.6): the benchmark-side shingle checkpoint depends on
    # nothing in the corpus chain — start it NOW on a driver thread so
    # its job overlaps the uniq/neat checkpoints (it used to run
    # serially inside contamination(), after neat materialized).
    bench_hs_r = _background(
        lambda: with_shingle_hashes(
            benchmark, id_col, text_col, decontam_n
        ).localCheckpoint()
    )

    good = docs.filter(tx.quality_score(F.col(text_col)) >= quality_min)
    # r13 (guide §4.2): the tokenize-once block — fingerprint + n=3 +
    # n=decontam_n folds — computed by the fused Arrow kernel in ONE
    # JVM→Python crossing (bit-identical to the HOF forms, pinned in
    # tests/test_arrowhash.py); pre-r13 the same three values were
    # interpreted Catalyst HOF folds (CodegenFallback, per-char cost).
    gth = good.select(
        "*", hash_block(F.col(text_col), 3, decontam_n).alias("_hb")
    )
    keyed = gth.withColumn("_fp", F.col("_hb.fp"))
    # uniq feeds BOTH the LSH pair generation and the survivor anti-join;
    # localCheckpoint = the in-memory analogue of the stage tables
    # curate_staged persists — same rows, derived once.
    uniq = (
        exact_dedup(keyed, ["_fp"], id_col)
        .select(
            "*",
            F.col("_hb.hs1").alias("_hs3"),
            F.col("_hb.hs2").alias("_hsN"),
        )
        .drop("_fp", "_hb")
        .localCheckpoint()
    )

    pairs = minhash_lsh_pairs_from_hashes(
        uniq.select(F.col(id_col).alias("_id"), F.col("_hs3").alias("_hs")),
        num_perm=16,
        bands=4,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # neat likewise feeds decontamination AND the final anti-join
    neat = uniq.join(F.broadcast(losers), id_col, "left_anti").localCheckpoint()
    release_checkpoint(uniq)  # superseded by neat (r13 opt, guide §5)

    contaminated = contamination(
        neat,
        benchmark,
        id_col,
        text_col,
        n=decontam_n,
        docs_hashed=neat.select(
            F.col(id_col).alias("_id"), F.col("_hsN").alias("_hs")
        ),
        bench_hashed=bench_hs_r(),
    ).select(id_col)
    clean = neat.drop("_hs3", "_hsN").join(
        F.broadcast(contaminated), id_col, "left_anti"
    )

    capped = quota_per_group(clean, [quota_col], quota, id_col, seed=quota_seed)
    return weighted_repeat(capped, mix_col, weights, id_col, seed=mix_seed)


def curate_v2(
    docs: DataFrame,
    benchmark: DataFrame,
    weights: dict[str, float],
    clf_weights: list[float],
    clf_bias: float = 0.0,
    clf_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    span_k: int = 5,
    decontam_n: int = 8,
    fuzzy_jaccard: float = 0.4,
    quota: int = 30,
    quota_col: str = "source",
    mix_col: str = "lang",
    quota_seed: int = 17,
    mix_seed: int = 29,
) -> DataFrame:
    """The round-5 curation chain — ``curate`` plus the three learned /
    content-rewriting tiers a modern pipeline runs:

        classifier gate → duplicate-SPAN removal (rewrites text) →
        quality filter → exact dedup → MinHash near-dup dedup →
        decontamination (exact n-gram ∪ FUZZY MinHash-banded) →
        per-source quota → language mixture

    Everything downstream of span removal operates on the REWRITTEN
    text (``clean_text``) — fingerprints, shingles and decontam grams
    see what a tokenizer would see after boilerplate excision, which is
    the point of running removal early.

    Added shuffle census vs ``curate``: the span detector's two keyed
    exchanges + one id-keyed span collect/join (all on the
    classifier-gated subset), and the fuzzy decontam band join
    (benchmark side broadcast, candidates only).  The classifier gate
    itself is free — a broadcast weight row + fold fused into the scan
    stage.

    Tokenize-once discipline (r12 stage profile, PLANS.md): the
    rewritten corpus pays the char-level tokenize+hash pass EXACTLY
    ONCE — ``token_hashes`` feeds the exact-dedup fingerprint (same
    fold, pinned vs ``tx.fingerprint``), the n=3 shingle set (MinHash
    dedup + fuzzy decontam) and the n=``decontam_n`` gram set (exact
    decontam) as pure arithmetic folds, all landing in ONE checkpoint.
    The benchmark side likewise hashes once for both decontam tiers.
    Pre-r12 this was four corpus char passes (fingerprint, n=3, n=8)
    plus two benchmark passes; the derived arrays are materialized
    before any explode (the Generate re-evaluation trap, see
    ``operators/decontam.py::contamination``).

    Returns ``(id_col, quota_col, mix_col, epoch)`` — text and all
    other passthrough columns are dropped at the tokenize-once
    checkpoint; ``curate_v2_staged`` returns the identical schema (its
    'rewritten' stage persists the full text for callers that need it).
    """
    from ..functions.arrowhash import hash_block
    from ..functions.classifier import score_documents
    from ..operators.decontam import fuzzy_contamination
    from ..operators.dedup import (
        minhash_lsh_pairs_from_hashes,
        remove_duplicate_spans,
    )

    # benchmark side: one char pass feeds both decontam tiers (r13: the
    # fused Arrow kernel).  r14 (guide §2.6): it depends on nothing in
    # the corpus chain, so it materializes on a driver thread whose job
    # overlaps the chain's rewritten/uniq/neat checkpoints — it used to
    # run serially between the neat checkpoint and the final job.
    bench_hs_r = _background(
        lambda: benchmark.select(
            F.col(id_col).alias("_id"),
            hash_block(F.col(text_col), 3, decontam_n).alias("_hb"),
        )
        .select(
            "_id",
            F.col("_hb.hs1").alias("_hs3"),
            F.col("_hb.hs2").alias("_hs8"),
        )
        .localCheckpoint()
    )

    gated = (
        score_documents(docs, text_col, clf_weights, clf_bias)
        .filter(F.col("clf_score") >= clf_min)
        .drop("clf_score")
    )
    # r13 (stage-3 profile, PLANS.md): the span detector CARRIES the
    # passthrough columns through its internal token checkpoint
    # (keep_cols), so `gated` has exactly ONE consumer — the old
    # rewrite layout re-derived gated (classifier re-scan) and joined
    # clean_text back by id, 1.68 s of the 3.45 s stage at sf0.1.
    # Rewritten rows are identical (every input doc comes back;
    # equivalence pinned in tests/test_fuzzy_decontam.py).
    passthrough = tuple(
        c for c in gated.columns if c not in (id_col, text_col)
    )
    _spent: list = []
    cleaned = remove_duplicate_spans(
        gated, id_col, text_col, k=span_k, keep_cols=passthrough, spent=_spent
    )
    # r13: checkpoint the rewritten corpus — the in-memory analogue of
    # curate_v2_staged's persisted 'rewritten' stage.  Downstream,
    # clean_text was re-derived per consumer (the quality filter AND
    # the hash kernel each re-ran the interpreted span-excision lambda
    # over every token), and feeding the Arrow kernel a giant
    # reassembly expression instead of a plain column is also what
    # exposed the Project-with-PythonUDF interpreter fallback.
    rewritten = cleaned.select(
        id_col, *passthrough, F.col("clean_text").alias(text_col)
    ).localCheckpoint()
    # r13 opt (guide §5): each checkpoint supersedes the one(s) it was
    # derived from — release the spent blocks NOW instead of stranding
    # them until a driver GC (the span token table and the full
    # rewritten text are the two largest blocks of the chain; measured
    # accumulation degraded back-to-back runs 9.0 -> 25.6 s).
    for _df in _spent:
        release_checkpoint(_df)

    good = rewritten.filter(tx.quality_score(F.col(text_col)) >= quality_min)
    # the one char-level pass over the surviving corpus — r13: the
    # fused Arrow kernel (fingerprint + both shingle widths in ONE
    # crossing; bit-identical, pinned in tests/test_arrowhash.py)
    gth = good.select(
        "*", hash_block(F.col(text_col), 3, decontam_n).alias("_hb")
    )
    keyed = gth.withColumn("_fp", F.col("_hb.fp"))
    uniq = (
        exact_dedup(keyed, ["_fp"], id_col)
        .select(
            "*",
            F.col("_hb.hs1").alias("_hs3"),
            F.col("_hb.hs2").alias("_hs8"),
        )
        .drop("_fp", "_hb", text_col)
        .localCheckpoint()
    )
    release_checkpoint(rewritten)  # superseded by uniq (guide §5)

    hashed3 = uniq.select(F.col(id_col).alias("_id"), F.col("_hs3").alias("_hs"))
    pairs = minhash_lsh_pairs_from_hashes(hashed3, num_perm=16, bands=4)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    neat = uniq.join(F.broadcast(losers), id_col, "left_anti").localCheckpoint()
    release_checkpoint(uniq)  # superseded by neat (guide §5)
    # Output schema contract (shared with curate_v2_staged, pinned in
    # tests/test_curation_staged.py): (id_col, quota_col, mix_col, epoch).
    # The text column was dropped at the uniq checkpoint by design — the
    # admitted-id set + epochs IS the product; callers re-join text from
    # the source table (or read the staged twin's 'rewritten' stage).

    bench_hs = bench_hs_r()  # §2.6 overlap — submitted at function top

    # r13 opt (guide §2.4): the two decontam tiers used to be unioned +
    # DISTINCT-ed into one removal set before a single anti-join — but
    # anti-join semantics ignore duplicates on the right side, so the
    # distinct was a pure extra exchange and the union a pure extra
    # subtree in the broadcast build.  Two chained broadcast anti-joins
    # drop the exact same id set (A ∪ B removed ≡ remove A then remove
    # B), one fewer Exchange, rows identical (parity-pinned).
    exact_ids = contamination(
        neat,
        benchmark,
        id_col,
        text_col,
        n=decontam_n,
        docs_hashed=neat.select(
            F.col(id_col).alias("_id"), F.col("_hs8").alias("_hs")
        ),
        bench_hashed=bench_hs.select("_id", F.col("_hs8").alias("_hs")),
    ).select(id_col)
    fuzzy_ids = fuzzy_contamination(
        neat,
        benchmark,
        id_col,
        text_col,
        min_jaccard=fuzzy_jaccard,
        docs_hashed=neat.select(
            F.col(id_col).alias("_id"), F.col("_hs3").alias("_hs")
        ),
        bench_hashed=bench_hs.select("_id", F.col("_hs3").alias("_hs")),
    ).select(id_col)
    clean = (
        neat.select(id_col, quota_col, mix_col)
        .join(F.broadcast(exact_ids), id_col, "left_anti")
        .join(F.broadcast(fuzzy_ids), id_col, "left_anti")
    )

    capped = quota_per_group(clean, [quota_col], quota, id_col, seed=quota_seed)
    return weighted_repeat(capped, mix_col, weights, id_col, seed=mix_seed)


# staged materialization (the production shape the module docstring
# describes): stage name -> subdirectory under the run's stage_dir
STAGES = ("quality", "exact", "neardup", "clean", "mixed")


def _materialize_stage(sp: SparkSession, stage_dir: str, name: str, build) -> DataFrame:
    """Compute-or-resume one stage: a directory with a ``_SUCCESS``
    marker is trusted and read back; anything else is (re)built with
    ``mode=overwrite``.  ONE definition of the resume contract, shared
    by ``curate_staged`` and ``curate_v2_staged``."""
    path = f"{stage_dir}/{name}"
    if not _stage_complete(sp, path):
        build().write.mode("overwrite").parquet(path)
    sp.catalog.refreshByPath(path)
    return sp.read.parquet(path)


def _stage_complete(spark: SparkSession, path: str) -> bool:
    """A stage is complete iff its commit marker exists — checked via
    the filesystem shim (sources/fsio.py: Hadoop FS on classic PySpark,
    local fallback under Spark Connect; portable to HDFS/S3).  A crashed
    write leaves no ``_SUCCESS``, so partial output is recomputed, never
    trusted."""
    from ..sources.fsio import get_fs

    return get_fs(spark, path).exists(f"{path}/_SUCCESS")


def curate_staged(
    docs: DataFrame,
    benchmark: DataFrame,
    weights: dict[str, float],
    stage_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    decontam_n: int = 8,
    quota: int = 30,
    quota_col: str = "source",
    mix_col: str = "lang",
    quota_seed: int = 17,
    mix_seed: int = 29,
) -> DataFrame:
    """The same curation chain as ``curate``, with each stage PERSISTED as
    a parquet table under ``stage_dir`` and resumed idempotently.

    Production rationale (100 TB): each stage's output is a fraction of
    its input, and every downstream consumer reads a table instead of
    re-deriving the lineage; a crashed run resumes from the last
    committed stage for free.  Resume contract: a stage directory with a
    ``_SUCCESS`` marker is trusted and skipped; anything else (absent or
    partial after a kill) is recomputed with ``mode=overwrite``.  Every
    operator in the chain is deterministic (portable seeded hashes), so a
    resumed run admits the SAME set + epochs as the single lazy ``curate``
    plan — equivalence is pinned in tests/test_curation_staged.py.

    Returns the final mixed corpus read back from its stage table.
    """
    sp = docs.sparkSession

    def _materialize(name: str, build) -> DataFrame:
        return _materialize_stage(sp, stage_dir, name, build)

    good = _materialize(
        "quality",
        lambda: docs.filter(tx.quality_score(F.col(text_col)) >= quality_min),
    )
    uniq = _materialize(
        "exact",
        lambda: exact_dedup(
            good.withColumn("_fp", tx.fingerprint(F.col(text_col))),
            ["_fp"],
            id_col,
        ).drop("_fp"),
    )

    def _neardup() -> DataFrame:
        pairs = minhash_lsh_pairs(uniq, id_col, text_col, num_perm=16, bands=4)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return uniq.join(F.broadcast(losers), id_col, "left_anti")

    neat = _materialize("neardup", _neardup)

    def _clean() -> DataFrame:
        contaminated = contamination(
            neat, benchmark, id_col, text_col, n=decontam_n
        ).select(id_col)
        return neat.join(F.broadcast(contaminated), id_col, "left_anti")

    clean = _materialize("clean", _clean)
    return _materialize(
        "mixed",
        lambda: weighted_repeat(
            quota_per_group(clean, [quota_col], quota, id_col, seed=quota_seed),
            mix_col,
            weights,
            id_col,
            seed=mix_seed,
        ),
    )


STAGES_V2 = ("gated", "rewritten", "quality", "exact", "neardup", "clean", "mixed")


def curate_v2_staged(
    docs: DataFrame,
    benchmark: DataFrame,
    weights: dict[str, float],
    clf_weights: list[float],
    stage_dir: str,
    clf_bias: float = 0.0,
    clf_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.5,
    span_k: int = 5,
    decontam_n: int = 8,
    fuzzy_jaccard: float = 0.4,
    quota: int = 30,
    quota_col: str = "source",
    mix_col: str = "lang",
    quota_seed: int = 17,
    mix_seed: int = 29,
) -> DataFrame:
    """``curate_v2`` with every stage PERSISTED and idempotently
    resumed — the production shape for the extended chain (same
    ``_SUCCESS``-gated contract as ``curate_staged``; every stage is
    deterministic, so a resumed run equals the single lazy plan —
    equivalence pinned in tests/test_curation_staged.py).

    Two stages are new vs the v1 ladder: ``gated`` (classifier scores
    are recomputed on resume — the weight vector is part of the job
    config, so a changed model means a new stage_dir) and ``rewritten``
    (the span-rewritten text — persisting it is the 100 TB form of the
    tokenize-once discipline: every downstream consumer reads rewritten
    text from a table instead of re-running span detection).

    Returns ``(id_col, quota_col, mix_col, epoch)`` — the SAME final
    projection as the lazy ``curate_v2`` (full-schema equivalence
    pinned in tests/test_curation_staged.py); callers that need text
    read the persisted 'rewritten' stage."""
    from ..functions.classifier import score_documents
    from ..operators.decontam import fuzzy_contamination
    from ..operators.dedup import remove_duplicate_spans

    sp = docs.sparkSession

    def _materialize(name: str, build) -> DataFrame:
        return _materialize_stage(sp, stage_dir, name, build)

    gated = _materialize(
        "gated",
        lambda: score_documents(docs, text_col, clf_weights, clf_bias)
        .filter(F.col("clf_score") >= clf_min)
        .drop("clf_score"),
    )

    def _rewritten() -> DataFrame:
        # same keep_cols layout as the lazy curate_v2 (r13): the span
        # detector carries the row, no join-back / classifier re-scan
        passthrough = tuple(
            c for c in gated.columns if c not in (id_col, text_col)
        )
        cleaned = remove_duplicate_spans(
            gated, id_col, text_col, k=span_k, keep_cols=passthrough
        )
        return cleaned.select(
            id_col, *passthrough, F.col("clean_text").alias(text_col)
        )

    rewritten = _materialize("rewritten", _rewritten)
    good = _materialize(
        "quality",
        lambda: rewritten.filter(
            tx.quality_score(F.col(text_col)) >= quality_min
        ),
    )
    uniq = _materialize(
        "exact",
        lambda: exact_dedup(
            good.withColumn("_fp", tx.fingerprint(F.col(text_col))),
            ["_fp"],
            id_col,
        ).drop("_fp"),
    )

    def _neardup() -> DataFrame:
        pairs = minhash_lsh_pairs(uniq, id_col, text_col, num_perm=16, bands=4)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return uniq.join(F.broadcast(losers), id_col, "left_anti")

    neat = _materialize("neardup", _neardup)

    def _clean() -> DataFrame:
        # tokenize-once inside the stage (r12, mirrors curate_v2): one
        # char pass per side feeds both decontam widths — r13: the
        # fused Arrow kernel (bit-identical, test_arrowhash)
        from ..functions.arrowhash import hash_block

        def _two_width(df: DataFrame) -> DataFrame:
            return (
                df.select(
                    F.col(id_col).alias("_id"),
                    hash_block(F.col(text_col), 3, decontam_n).alias("_hb"),
                )
                .select(
                    "_id",
                    F.col("_hb.hs1").alias("_hs3"),
                    F.col("_hb.hs2").alias("_hsn"),
                )
                .localCheckpoint()
            )

        neat_hs, bench_hs = _two_width(neat), _two_width(benchmark)
        # r13 opt: two chained broadcast anti-joins instead of
        # union+distinct+one anti-join — same removal set, one fewer
        # Exchange (see the lazy curate_v2)
        exact_ids = contamination(
            neat,
            benchmark,
            id_col,
            text_col,
            n=decontam_n,
            docs_hashed=neat_hs.select("_id", F.col("_hsn").alias("_hs")),
            bench_hashed=bench_hs.select("_id", F.col("_hsn").alias("_hs")),
        ).select(id_col)
        fuzzy_ids = fuzzy_contamination(
            neat,
            benchmark,
            id_col,
            text_col,
            min_jaccard=fuzzy_jaccard,
            docs_hashed=neat_hs.select("_id", F.col("_hs3").alias("_hs")),
            bench_hashed=bench_hs.select("_id", F.col("_hs3").alias("_hs")),
        ).select(id_col)
        return neat.join(F.broadcast(exact_ids), id_col, "left_anti").join(
            F.broadcast(fuzzy_ids), id_col, "left_anti"
        )

    clean = _materialize("clean", _clean)
    # same final projection as the lazy curate_v2 — the two documented-
    # as-equivalent paths must agree on SCHEMA, not just the admitted set
    return _materialize(
        "mixed",
        lambda: weighted_repeat(
            quota_per_group(
                clean.select(id_col, quota_col, mix_col),
                [quota_col],
                quota,
                id_col,
                seed=quota_seed,
            ),
            mix_col,
            weights,
            id_col,
            seed=mix_seed,
        ),
    )
