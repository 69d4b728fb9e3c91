"""Text analysis, sampling, decontamination and the end-to-end
curation pipelines (v1/v2/funnel) with DuckDB oracles.  Split out of
the former queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions import text as tx
from ..operators import dedup as dd
from ..schemas import load_table
from ._shared import TOKENS_SQL, _char_hash_sql, _parallel, _quality_expr_sql
from .dedup_sim import _TOKEN_HASHES_SQL, _span_removal_ctes



# --- text analysis ------------------------------------------------------------


def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: measured, left WITHOUT the _parallel layout — token_count is
    # one native split per row; the exchange doubled the query
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.token_count(F.col("text")).alias("ntok"), "n_chars")
        .groupBy("lang")
        .agg(
            F.round(F.avg("ntok"), 6).alias("avg_tokens"),
            F.sum("n_chars").alias("sum_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


TX_TOKEN_SQL = f"""
SELECT lang,
       ROUND(AVG(len({TOKENS_SQL})), 6) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang ORDER BY lang
"""


def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(tx.tokens(F.col("text")).alias("_t"))
        .select(tx.detect_language_from_tokens(F.col("_t")).alias("detected"))
        .groupBy("detected")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("detected").asc_nulls_first())
    )


def _langid_sql() -> str:
    hit_exprs = {
        lang: (
            f"len(list_filter(t, x -> list_contains({words!r}, x)))"
        )
        for lang, words in tx.STOPWORDS.items()
    }
    best = "GREATEST(" + ", ".join(f"h_{la}" for la in tx.STOPWORDS) + ")"
    chain = " ".join(
        f"WHEN h_{la} = {best} AND {best} > 0 THEN '{la}'" for la in tx.STOPWORDS
    )
    hits_sel = ", ".join(f"{e} AS h_{la}" for la, e in hit_exprs.items())
    return f"""
WITH toks AS (SELECT {TOKENS_SQL} AS t FROM documents),
hits AS (SELECT {hits_sel} FROM toks)
SELECT (CASE {chain} ELSE NULL END) AS detected, COUNT(*) AS n
FROM hits GROUP BY 1 ORDER BY detected ASC NULLS FIRST
"""


def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.quality_score(F.col("text")).alias("q"))
        .groupBy("lang")
        .agg(F.round(F.sum("q"), 4).alias("sum_quality"), F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


TX_QUALITY_SQL = f"""
WITH d AS (
  SELECT lang,
         LENGTH(text) AS n,
         LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         len({TOKENS_SQL}) AS ntok
  FROM documents
), q AS (
  SELECT lang,
         (CASE WHEN n > 0 THEN alpha * 1.0 / n ELSE 0.0 END) * 0.5
         + (1 - LEAST((CASE WHEN n > 0 THEN punct * 1.0 / n ELSE 0.0 END) * 5, 1.0)) * 0.25
         + (CASE WHEN ntok >= 5 AND ntok <= 5000 THEN 1.0 ELSE 0.5 END) * 0.25 AS q
  FROM d
)
SELECT lang, ROUND(SUM(q), 4) AS sum_quality, COUNT(*) AS n
FROM q GROUP BY lang ORDER BY lang
"""


def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", tx.fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


TX_FP_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
th AS (
  SELECT doc_id,
         list_transform(t, s ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(s) + 1), i -> ascii(substr(s, i, 1)))),
             (a, b) -> (a * 31 + b) % 2147483648)) AS hs
  FROM toks
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                   (a, b) -> (a * 1000003 + b) % 2147483648) AS fp
FROM th ORDER BY doc_id
"""


# --- sampling -----------------------------------------------------------------


def sp_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: at most 30 docs per source, selected by the
    portable keyed shuffle hash — the 'no domain dominates' corpus rule,
    reproducible across engines and reruns."""
    from ..operators.sampling import quota_per_group

    d = load_table(spark, sf_dir, "documents")
    kept = quota_per_group(d, ["source"], 30, "doc_id", seed=17)
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


def _sp_quota_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("doc_id", 17)
    return f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source FROM ranked WHERE rn <= 30 ORDER BY doc_id
"""


_STRAT_FRACS = {"en": 0.1, "de": 0.5, "es": 0.25, "fr": 0.5, "zh": 0.2}


def sp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Bernoulli sampling by hash threshold (deterministic
    sampleBy): rebalances the lang mix without a shuffle — the predicate
    pushes to the scan."""
    from ..operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", _STRAT_FRACS, "doc_id", seed=23)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _sp_strat_sql() -> str:
    from ..operators.sampling import stratified_sample_sql

    pred = stratified_sample_sql("lang", _STRAT_FRACS, "doc_id", 23)
    return f"SELECT doc_id, lang FROM documents WHERE {pred} ORDER BY doc_id"


_MIX_WEIGHTS = {"en": 2.25, "de": 1.0, "es": 0.5, "fr": 1.5, "zh": 0.25}


def sp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing with fractional epoch weights: languages are up/
    down-sampled to their mixture weight (en×2.25, es×0.5, …) with the
    stochastic extra epoch keyed on the portable id hash — the LLM
    data-mixture operator, reproducible across engines."""
    from ..operators.sampling import weighted_repeat

    d = load_table(spark, sf_dir, "documents")
    out = weighted_repeat(d, "lang", _MIX_WEIGHTS, "doc_id", seed=29)
    return out.select(
        "doc_id", "lang", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _sp_mix_sql() -> str:
    from ..operators.sampling import weighted_repeat_sql

    body = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29)
    return f"SELECT doc_id, lang, epoch FROM ({body}) ORDER BY doc_id, epoch"


# --- decontamination ----------------------------------------------------------

_DC_N = 8  # n-gram length for benchmark-overlap checks


def _shingle_fold_sql(n: int) -> str:
    expr = "CAST(0 AS BIGINT)"
    for d in range(n):
        expr = f"(({expr}) * 1000003 + th[i + {d + 1}]) % 2147483648"
    return expr


def _shingle_cte_sql(n: int, src: str = "documents", tag: str | None = None) -> str:
    """Generic twin of _SHINGLE_HASHES_SQL over any source CTE/table
    (CTEs ``toks{tag}``/``shing{tag}``, tag defaults to n)."""
    tag = str(n) if tag is None else tag
    fold = _shingle_fold_sql(n)
    return f"""
toks{tag} AS (SELECT doc_id, {_TOKEN_HASHES_SQL} AS th FROM {src}),
shing{tag} AS (
  SELECT doc_id,
         CASE WHEN len(th) >= {n} THEN
           list_distinct(list_transform(range(0, len(th) - {n - 1}), i -> {fold}))
         ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                           (a, b) -> (a * 1000003 + b) % 2147483648)]
         END AS hs
  FROM toks{tag}
)"""


def dc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 97th document plays the held-out
    eval set; corpus documents sharing any 8-gram with it are reported
    with hit counts — the benchmark side is broadcast, so the corpus
    never shuffles."""
    from ..operators.decontam import contamination

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    # corpus side only: the tiny benchmark side would shatter into
    # 32 near-empty partitions (per-batch kernel overhead, no gain)
    corpus = _parallel(d.filter(F.col("doc_id") % 97 != 0), cols=("doc_id", "text"))
    return contamination(corpus, bench, "doc_id", "text", n=_DC_N).orderBy(
        "doc_id"
    )


def _dc_sql() -> str:
    return f"""
WITH {_shingle_cte_sql(_DC_N)},
bench AS (SELECT DISTINCT unnest(hs) AS sh FROM shing{_DC_N} WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, CAST(len(hs) AS INT) AS ng, unnest(hs) AS sh
           FROM shing{_DC_N} WHERE doc_id % 97 <> 0)
SELECT c.doc_id, ng AS n_grams, COUNT(*) AS n_hits,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ng, 6) AS rate
FROM corpus c JOIN bench b ON c.sh = b.sh
GROUP BY c.doc_id, ng
ORDER BY c.doc_id
"""


_CLF_DIM = 64


def tx_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (the FineWeb-Edu tier): hashed
    mean-pooled BOW logit under deterministic LCG weights → sigmoid.
    Zero-shuffle narrow map with the weight vector as one broadcast row;
    the oracle inlines the identical weights and fold."""
    from ..functions.classifier import lcg_weights, score_documents

    d = load_table(spark, sf_dir, "documents")
    w = lcg_weights(_CLF_DIM, seed=17)
    out = score_documents(d, "text", w, bias=0.1)
    return out.select(
        "doc_id", F.round("clf_score", 6).alias("clf_score")
    ).orderBy("doc_id")


def _clf_sql() -> str:
    from ..functions.classifier import lcg_weights

    w = lcg_weights(_CLF_DIM, seed=17)
    wlit = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    z = (
        "0.1 + (CASE WHEN len(th) > 0 THEN "
        f"list_sum(list_transform(th, h -> w[CAST(h % {_CLF_DIM} AS INT) + 1])) / len(th) "
        "ELSE 0.0 END)"
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKEN_HASHES_SQL} AS th FROM documents),
ws AS (SELECT doc_id, th, {wlit} AS w FROM t)
SELECT doc_id, ROUND(1.0 / (1.0 + exp(-({z}))), 6) AS clf_score
FROM ws ORDER BY doc_id
"""


def dc_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase-robust decontamination: corpus docs MinHash-banded
    against the held-out slice, exact-Jaccard-verified — benchmark side
    broadcast, corpus hashed once, candidates only at the verify."""
    from ..operators.decontam import fuzzy_contamination

    d = load_table(spark, sf_dir, "documents")
    # %5 split (not the %97 one): the synthetic near-dup clusters must
    # straddle the corpus/benchmark boundary for the query to exercise
    # the fuzzy path on >0 rows
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = _parallel(d.filter(F.col("doc_id") % 5 != 0), cols=("doc_id", "text"))
    return fuzzy_contamination(
        corpus, bench, "doc_id", "text", min_jaccard=_DC_FUZZY_T
    ).orderBy("doc_id", "bench_id")


_DC_FUZZY_T = 0.4


def _dc_fuzzy_sql() -> str:
    jac = "CAST(len(list_intersect(sc.hs, sb.hs)) AS DOUBLE) / (len(sc.hs) + len(sb.hs) - len(list_intersect(sc.hs, sb.hs)))"
    return f"""
WITH {_shingle_cte_sql(3, "documents", "f")}, {_minhash_pair_ctes_from("shingf", "f")},
cand AS (
  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
  FROM (SELECT * FROM bandrowsf WHERE doc_id % 5 <> 0) c
  JOIN (SELECT * FROM bandrowsf WHERE doc_id % 5 = 0) b
    ON c.band = b.band AND c.bucket = b.bucket
)
SELECT cand.doc_id, cand.bench_id, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN shingf sc ON sc.doc_id = cand.doc_id
JOIN shingf sb ON sb.doc_id = cand.bench_id
WHERE ROUND({jac}, 6) >= {_DC_FUZZY_T}
ORDER BY cand.doc_id, cand.bench_id
"""


def dc_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc_contamination through the Bloom semi-join prefilter — the
    at-scale form for benchmark gram sets past the broadcast threshold.
    Lossless by construction (no false negatives + exact join behind the
    bloom), so it shares dc_contamination's oracle verbatim."""
    from ..operators.decontam import contamination_bloom

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_bloom(corpus, bench, "doc_id", "text", n=_DC_N).orderBy(
        "doc_id"
    )


# --- end-to-end curation ------------------------------------------------------


def cur_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report — per-stage survivor counts through the
    flagship chain (corpus → quality → exact-dedup → near-dup-free →
    decontaminated → quota-capped): the audit artifact every production
    pipeline publishes alongside its output.  Each stage is one count
    over the same lazy chain ``curate`` runs; the mixture stage is
    excluded (it multiplies rows, not documents)."""
    from ..operators.decontam import contamination
    from ..operators.sampling import quota_per_group

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    good = corpus.filter(tx.quality_score(F.col("text")) >= 0.5)
    keyed = good.withColumn("_fp", tx.fingerprint(F.col("text")))
    uniq = dd.exact_dedup(keyed, ["_fp"], "doc_id").drop("_fp").localCheckpoint()
    pairs = dd.minhash_lsh_pairs(uniq, "doc_id", "text", num_perm=16, bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    neat = uniq.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint()
    contaminated = contamination(neat, bench, "doc_id", "text", n=_DC_N).select(
        "doc_id"
    )
    clean = neat.join(F.broadcast(contaminated), "doc_id", "left_anti")
    capped = quota_per_group(clean, ["source"], 30, "doc_id", seed=17)

    stages = [
        ("corpus", corpus),
        ("quality", good),
        ("exact", uniq),
        ("neardup", neat),
        ("decontam", clean),
        ("quota", capped),
    ]
    out = None
    for i, (name, df_) in enumerate(stages):
        row = df_.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).alias("stage_ord"),
            F.lit(name).alias("stage"),
            "n_docs",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_ord")


def _cur_funnel_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 97 <> 0
), good AS (
  SELECT doc_id, lang, source, text FROM corpus0
  WHERE {_quality_expr_sql()} >= 0.5
), fpth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good
), fp AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth
), uniq AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq", "u")}, {_minhash_pair_ctes_from("shingu", "u")},
neat AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM pairsu)
), {_shingle_cte_sql(8, "(SELECT * FROM documents WHERE doc_id % 97 = 0)", "b")},
bgrams AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb),
{_shingle_cte_sql(8, "neat", "n")},
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn) g JOIN bgrams USING (sh)
), clean AS (
  SELECT * FROM neat WHERE doc_id NOT IN (SELECT doc_id FROM contam)
), capped AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean
  ) WHERE rn <= 30
)
SELECT 0 AS stage_ord, 'corpus' AS stage, COUNT(*) AS n_docs FROM corpus0
UNION ALL SELECT 1, 'quality', COUNT(*) FROM good
UNION ALL SELECT 2, 'exact', COUNT(*) FROM uniq
UNION ALL SELECT 3, 'neardup', COUNT(*) FROM neat
UNION ALL SELECT 4, 'decontam', COUNT(*) FROM clean
UNION ALL SELECT 5, 'quota', COUNT(*) FROM capped
ORDER BY stage_ord
"""


def cur_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composition: quality filter → exact dedup → MinHash
    near-dup dedup → benchmark decontamination → per-source quota →
    language mixture, as one DataFrame plan (see plans/curation.py for
    the shuffle census)."""
    from ..plans.curation import curate

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = _parallel(
        d.filter(F.col("doc_id") % 97 != 0),
        cols=("doc_id", "lang", "source", "text"),
    )
    out = curate(corpus, bench, _MIX_WEIGHTS)
    return out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _minhash_pair_ctes_from(
    shing: str, tag: str, num_perm: int = 16, bands: int = 4
) -> str:
    """sigs/bandrows/pairs CTEs over an existing shingle-hash CTE."""
    consts = dd._perm_constants(num_perm)
    rows = num_perm // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {a} + {b}) % 2147483647)) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_exprs = []
    for bband in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for r in range(rows):
            expr = f"(({expr}) * 31 + m{bband * rows + r}) % 2147483648"
        band_exprs.append(f"({bband}, {expr})")
    return f"""sigs{tag} AS (
  SELECT doc_id, {mins} FROM {shing}
), bandrows{tag} AS (
  SELECT doc_id, b.band, b.bucket
  FROM sigs{tag}, LATERAL (VALUES {', '.join(band_exprs)}) AS b(band, bucket)
), pairs{tag} AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandrows{tag} a JOIN bandrows{tag} b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _cur_sql() -> str:
    from ..operators.sampling import weighted_repeat_sql
    from ..operators.split import shuffle_hash_sql

    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    mix = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29, src="capped")
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 97 <> 0
), good AS (
  SELECT doc_id, lang, source, text FROM corpus0
  WHERE {_quality_expr_sql()} >= 0.5
), fpth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good
), fp AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth
), uniq AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq", "u")}, {_minhash_pair_ctes_from("shingu", "u")},
neat AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM pairsu)
), {_shingle_cte_sql(8, "(SELECT * FROM documents WHERE doc_id % 97 = 0)", "b")},
bgrams AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb),
{_shingle_cte_sql(8, "neat", "n")},
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn) g JOIN bgrams USING (sh)
), clean AS (
  SELECT * FROM neat WHERE doc_id NOT IN (SELECT doc_id FROM contam)
), capped AS (
  SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean
  ) WHERE rn <= 30
)
SELECT doc_id, lang, source, epoch FROM ({mix}) ORDER BY doc_id, epoch
"""


_CLF_GATE = 0.5249  # ~30th percentile of corpus scores — a real gate


def cur_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 flagship composition: classifier gate → duplicate-
    span removal (text REWRITTEN) → quality → exact dedup → MinHash
    near-dup → decontamination (exact ∪ fuzzy) → quota → mixture, as
    one plan (plans/curation.py::curate_v2).  %5 split so the fuzzy
    decontam tier has cross-boundary near-dups to catch."""
    from ..functions.classifier import lcg_weights
    from ..plans.curation import curate_v2

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = _parallel(
        d.filter(F.col("doc_id") % 5 != 0),
        cols=("doc_id", "lang", "source", "text"),
    )
    out = curate_v2(
        corpus,
        bench,
        _MIX_WEIGHTS,
        clf_weights=lcg_weights(_CLF_DIM, seed=17),
        clf_bias=0.1,
        clf_min=_CLF_GATE,
        fuzzy_jaccard=_DC_FUZZY_T,
    )
    return out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _cur_v2_sql() -> str:
    from ..functions.classifier import lcg_weights
    from ..operators.sampling import weighted_repeat_sql
    from ..operators.split import shuffle_hash_sql

    w = lcg_weights(_CLF_DIM, seed=17)
    wlit = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    clf_z = (
        "0.1 + (CASE WHEN len(th) > 0 THEN "
        f"list_sum(list_transform(th, h -> w[CAST(h % {_CLF_DIM} AS INT) + 1])) / len(th) "
        "ELSE 0.0 END)"
    )
    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    jac = (
        "CAST(len(list_intersect(sc.hs, sb.hs)) AS DOUBLE) / "
        "(len(sc.hs) + len(sb.hs) - len(list_intersect(sc.hs, sb.hs)))"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    mix = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29, src="capped2")
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 5 <> 0
), bench0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 5 = 0
), gth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th, {wlit} AS w
  FROM corpus0
), gated AS (
  SELECT doc_id, lang, source, text FROM gth
  WHERE 1.0 / (1.0 + exp(-({clf_z}))) >= {_CLF_GATE}
), {_span_removal_ctes("gated", "v")},
rewritten AS (
  SELECT g.doc_id, g.lang, g.source, s.clean_text AS text
  FROM gated g JOIN sroutv s ON s.doc_id = g.doc_id
), good2 AS (
  SELECT doc_id, lang, source, text FROM rewritten
  WHERE {_quality_expr_sql()} >= 0.5
), fpth2 AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good2
), fp2 AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth2
), uniq2 AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp2
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq2", "u2")}, {_minhash_pair_ctes_from("shingu2", "u2")},
neat2 AS (
  SELECT * FROM uniq2 WHERE doc_id NOT IN (SELECT id_b FROM pairsu2)
), {_shingle_cte_sql(8, "bench0", "b2")},
bgrams2 AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb2),
{_shingle_cte_sql(8, "neat2", "n2")},
contam_exact AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn2) g JOIN bgrams2 USING (sh)
), {_shingle_cte_sql(3, "bench0", "f2b")}, {_minhash_pair_ctes_from("shingf2b", "f2b")},
fcand AS (
  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
  FROM (SELECT * FROM bandrowsu2
        WHERE doc_id IN (SELECT doc_id FROM neat2)) c
  JOIN bandrowsf2b b ON c.band = b.band AND c.bucket = b.bucket
),
contam_fuzzy AS (
  SELECT DISTINCT fcand.doc_id
  FROM fcand
  JOIN shingu2 sc ON sc.doc_id = fcand.doc_id
  JOIN shingf2b sb ON sb.doc_id = fcand.bench_id
  WHERE ROUND({jac}, 6) >= {_DC_FUZZY_T}
),
clean2 AS (
  SELECT * FROM neat2 WHERE doc_id NOT IN (
    SELECT doc_id FROM contam_exact UNION SELECT doc_id FROM contam_fuzzy)
), capped2 AS (
  SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean2
  ) WHERE rn <= 30
)
SELECT doc_id, lang, source, epoch FROM ({mix}) ORDER BY doc_id, epoch
"""


# --- corpus statistics --------------------------------------------------------

_QUANTS = [(1, 2), (9, 10), (99, 100)]  # p50 / p90 / p99


def tx_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank token-length quantiles per language — integer
    rank arithmetic, portable across engines (no float interpolation)."""
    from ..operators.stats import group_quantiles_exact

    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", tx.token_count(F.col("text")).alias("ntok"), "doc_id")
    return group_quantiles_exact(t, "lang", "ntok", _QUANTS, "doc_id").orderBy(
        "lang"
    )


def _tx_quant_sql() -> str:
    from ..operators.stats import group_quantiles_sql

    return (
        group_quantiles_sql(
            "lang", f"CAST(len({TOKENS_SQL}) AS INT)", _QUANTS, "doc_id"
        )
        + " ORDER BY lang"
    )


def tx_normalize_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + redaction audit: per language, how many documents
    change under canonicalization / digit redaction, and a portable
    checksum of the transformed text (strongest per-row check that both
    engines produced byte-identical strings)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        tx.normalize_text(F.col("text")).alias("_norm"),
        tx.redact(F.col("text")).alias("_red"),
        "text",
    )
    return (
        t.groupBy("lang")
        .agg(
            F.sum((F.col("_norm") != F.col("text")).cast("int")).alias(
                "n_norm_changed"
            ),
            F.sum((F.col("_red") != F.col("text")).cast("int")).alias(
                "n_redacted"
            ),
            F.sum(tx.char_poly_hash(F.col("_norm"))).alias("norm_checksum"),
            F.sum(F.length("_red")).alias("sum_red_len"),
        )
        .orderBy("lang")
    )


def _tx_norm_sql() -> str:
    ch = _char_hash_sql("_norm")
    return f"""
WITH t AS (
  SELECT lang, text,
         trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')) AS _norm,
         regexp_replace(text, '[0-9]+', '#', 'g') AS _red
  FROM documents
)
SELECT lang,
       CAST(SUM(CASE WHEN _norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_changed,
       CAST(SUM(CASE WHEN _red <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
       CAST(SUM({ch}) AS BIGINT) AS norm_checksum,
       CAST(SUM(LENGTH(_red)) AS BIGINT) AS sum_red_len
FROM t GROUP BY lang ORDER BY lang
"""


def tx_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy hitters: the 20 most frequent tokens corpus-wide
    (map-side partial agg + TakeOrderedAndProject — no full sort)."""
    from ..operators.stats import top_k_by_count

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    return top_k_by_count(toks, ["token"], 20)


TX_TOP_SQL = f"""
WITH t AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
SELECT token, COUNT(*) AS n FROM t
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""

REGISTRY = {
    "sp_group_quota": (sp_group_quota, _sp_quota_sql()),
    "sp_stratified": (sp_stratified, _sp_strat_sql()),
    "sp_mixture": (sp_mixture, _sp_mix_sql()),
    "dc_contamination": (dc_contamination, _dc_sql()),
    "dc_bloom_prefilter": (dc_bloom_prefilter, _dc_sql()),
    "dc_fuzzy_contamination": (dc_fuzzy_contamination, _dc_fuzzy_sql()),
    "tx_classifier_score": (tx_classifier_score, _clf_sql()),
    "cur_pipeline": (cur_pipeline, _cur_sql()),
    "cur_pipeline_v2": (cur_pipeline_v2, _cur_v2_sql()),
    "cur_funnel": (cur_funnel, _cur_funnel_sql()),
    "tx_length_quantiles": (tx_length_quantiles, _tx_quant_sql()),
    "tx_top_tokens": (tx_top_tokens, TX_TOP_SQL),
    "tx_normalize_redact": (tx_normalize_redact, _tx_norm_sql()),
    "tx_token_stats": (tx_token_stats, TX_TOKEN_SQL),
    "tx_langid": (tx_langid, _langid_sql()),
    "tx_quality": (tx_quality, TX_QUALITY_SQL),
    "tx_fingerprint": (tx_fingerprint, TX_FP_SQL),
}
