"""Corpus-analysis queries: sketches (CMS/HLL/quantiles), BPE,
BM25 (query / indexed / served), embedding near-dup + duplicate
spans, semantic dedup, mixtures/budget sampling, frame sampling.
Split out of the former queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions import text as tx
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..schemas import load_table
from ._shared import (
    TOKENS_SQL,
    _cached_index,
    _index_cache_path,
    _parallel,
    _parallel_docs,
    _quality_expr_sql,
)
from .dedup_sim import _PACK_CAP, _TOKEN_HASHES_SQL, _span_removal_ctes
from .media import _CODES_CTE_SQL
from .audio import _FR_BYTES, _FR_MAX, _FR_STRIDE



def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: document bytes as concatenated 16-byte
    frames, every 2nd frame (max 8) emitted with its exact byte-sum."""
    from ..operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    out = sample_frames(media, _FR_BYTES, _FR_STRIDE, _FR_MAX)
    return out.select(
        F.col("media_id").alias("doc_id"), "frame_no", "f_sum"
    ).orderBy("doc_id", "frame_no")


def _mm_frames_sql() -> str:
    fb, stride, mx = _FR_BYTES, _FR_STRIDE, _FR_MAX
    return f"""
WITH {_CODES_CTE_SQL},
f AS (
  SELECT doc_id, cs, CAST(n_bytes // {fb} AS INT) AS nf FROM codes
), sampled AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, LEAST((nf + {stride - 1}) // {stride}, {mx})),
           j -> CAST(j * {stride} AS INT))) AS frame_no,
         cs
  FROM f WHERE nf > 0
)
SELECT doc_id, frame_no,
       CAST(list_sum(list_slice(cs, frame_no * {fb} + 1, frame_no * {fb} + {fb})) AS BIGINT) AS f_sum
FROM sampled ORDER BY doc_id, frame_no
"""


def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.9) over a bounded id
    range — the brute-force baseline the LSH path approximates."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", sim.cosine(F.col("_va"), F.col("_vb")).alias("_s")
    )
    return (
        pairs.filter(F.col("_s") >= 0.9)
        .select("id_a", "id_b", F.round("_s", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


DD_EMB_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
ORDER BY id_a, id_b
"""



def dd_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate spans (Lee et al. 2022 substring dedup,
    distributed k-gram form): maximal token spans whose every 5-gram also
    occurs in another document."""
    d = _parallel(load_table(spark, sf_dir, "documents"), cols=("doc_id", "text"))
    return dd.duplicate_spans(d, "doc_id", "text", k=5).orderBy(
        "doc_id", "span_start"
    )


DD_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 4), ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + 5 AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start
"""



def dd_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of substring dedup: duplicated spans excised
    from every carrier, surviving tokens re-joined — returns
    (doc_id, clean_text, n_removed) for the whole corpus."""
    # r13: measured WITHOUT the _parallel hop (interleaved A/B med
    # 1.11 s plain vs 1.39 s hopped) — the detector's own keyed
    # exchanges redistribute anyway, so the up-front repartition of
    # full text rows is a pure extra exchange here
    d = load_table(spark, sf_dir, "documents")
    return dd.remove_duplicate_spans(d, "doc_id", "text", k=5).orderBy("doc_id")


DD_SPAN_REMOVAL_SQL = f"""
WITH {_span_removal_ctes("documents")}
SELECT doc_id, clean_text, n_removed FROM srout ORDER BY doc_id
"""


def dd_semantic_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end from TEXT: deterministic hashed-BOW
    embeddings (dim 32) bridge the documents table into the embedding
    operators; clusters = lang (any partitioner works — pair cost stays
    Σ|cluster|²); threshold 0.995 sits far above the 0.93 p99 of
    unrelated-pair cosines on this corpus."""
    from ..functions.doc_embed import with_doc_embeddings

    d = load_table(spark, sf_dir, "documents")
    e = with_doc_embeddings(d, "text", dim=32)
    out = dd.semantic_dedup(
        e, 0.995, id_col="doc_id", vec_col="embedding", cluster_col="lang"
    )
    return out.select(
        "doc_id", "lang", "dup_of", F.round("cos", 6).alias("cos")
    ).orderBy("doc_id")


DD_SEMANTIC_TEXT_SQL = f"""
WITH t AS (SELECT doc_id, lang, {_TOKEN_HASHES_SQL} AS th FROM documents),
c AS (
  SELECT doc_id, lang,
         list_transform(range(0, 32),
           f -> CAST(len(list_filter(th, h -> h % 32 = f)) AS DOUBLE)) AS cnt
  FROM t
),
v AS (
  SELECT doc_id, lang,
         CASE WHEN sqrt(list_dot_product(cnt, cnt)) > 0
              THEN list_transform(cnt, x -> x / sqrt(list_dot_product(cnt, cnt)))
              ELSE list_transform(cnt, x -> 0.0) END AS v
  FROM c
),
p AS (
  SELECT b.doc_id AS doc_id, b.lang AS lang, a.doc_id AS dup_of,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM v a JOIN v b ON a.lang = b.lang AND a.doc_id < b.doc_id
),
h AS (SELECT * FROM p WHERE cos >= 0.995),
r AS (
  SELECT doc_id, lang, dup_of, cos,
         row_number() OVER (PARTITION BY lang, doc_id ORDER BY dup_of, cos) AS rn
  FROM h
)
SELECT doc_id, lang, dup_of, ROUND(cos, 6) AS cos FROM r WHERE rn = 1
ORDER BY doc_id
"""


_TOKHASH_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, len(token) + 1), i -> ascii(substr(token, i, 1)))), "
    "(a, b) -> (a * 31 + b) % 2147483648)"
)


def sk_cms_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch audit: estimate the top-10 tokens' frequencies
    from a 4×256-cell sketch next to their exact counts — the sketch's
    one-sided error is visible (est >= exact always), and every cell is
    re-derived by the oracle (value-checked, not tolerance-checked)."""
    from ..operators.dedup import token_hashes
    from ..operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    occ = toks.select(
        "token", F.element_at(token_hashes(F.col("token")), 1).alias("_h")
    )
    sketch = cms_build(occ, "_h", width=256, depth=4)
    top = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"), F.first("_h").alias("_h"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(10)
    )
    est = cms_estimate(sketch, top, "_h", width=256, depth=4)
    return est.select("token", "exact_cnt", "est").orderBy(
        F.col("exact_cnt").desc(), "token"
    )


def _sk_cms_sql() -> str:
    from ..operators.dedup import _perm_constants
    from ..operators.sketches import cms_sql, permuted_sql

    consts = _perm_constants(4, seed=97)
    probe_arms = " UNION ALL ".join(
        f"SELECT token, exact_cnt, {d} AS _d, "
        f"({permuted_sql('h', a, b)}) % 256 AS _bucket FROM tq"
        for d, (a, b) in enumerate(consts)
    )
    return f"""
WITH toksq AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
occ AS (SELECT token, {_TOKHASH_SQL} AS h FROM toksq),
{cms_sql("occ", "h", 256, 4)},
topq AS (
  SELECT token, COUNT(*) AS exact_cnt FROM toksq GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 10
),
tq AS (SELECT token, exact_cnt, {_TOKHASH_SQL} AS h FROM topq),
probes AS ({probe_arms})
SELECT token, exact_cnt, MIN(COALESCE(c.cnt, 0)) AS est
FROM probes p LEFT JOIN cms c USING (_d, _bucket)
GROUP BY token, exact_cnt
ORDER BY exact_cnt DESC, token
"""


def sk_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog: distinct-token estimate from 64 registers
    next to the exact count — registers, ranks, and the bias-corrected
    estimate are integer/closed-form arithmetic both engines re-derive
    bit-for-bit (unlike approx_count_distinct, whose sketch is
    engine-private)."""
    from ..operators.dedup import token_hashes
    from ..operators.sketches import hll_estimate, hll_registers

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    occ = toks.select(F.element_at(token_hashes(F.col("token")), 1).alias("_h"))
    est = hll_estimate(hll_registers(occ, "_h", p=6), p=6)
    exact = toks.agg(F.countDistinct("token").alias("exact_distinct"))
    return est.crossJoin(exact)


def _sk_hll_sql() -> str:
    from ..operators.sketches import hll_sql

    return f"""
WITH toksq AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
occ AS (SELECT {_TOKHASH_SQL} AS h FROM toksq),
{hll_sql("occ", "h", p=6)}
SELECT estimate, (SELECT COUNT(DISTINCT token) FROM toksq) AS exact_distinct
FROM hll
"""


def sk_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over event values: power-of-two
    fixed-point buckets (integer bit-length ladder — no float log) →
    nearest-rank quantile estimates from the cumulative histogram.
    ~42 cells of state regardless of cardinality; additive merge.
    Accuracy vs exact quantiles is pinned in tests/test_sketches.py."""
    from ..operators.sketches import histogram_quantiles, log_histogram

    e = load_table(spark, sf_dir, "events")
    hist = log_histogram(e.select("value"), "value", scale=100)
    return histogram_quantiles(hist, [0.5, 0.9, 0.99], scale=100)


def _sk_hist_sql() -> str:
    from ..operators.sketches import histogram_quantiles_sql, log_histogram_sql

    return f"""
WITH {log_histogram_sql("events", "value", 100)}
{histogram_quantiles_sql("hist", [0.5, 0.9, 0.99], 100)}
"""


def sk_quantile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile sketch: p50/p90/p99 of event values per event
    type from per-group log-bucket histograms (groups × ~42 cells —
    the cube form; every cell and estimate re-derived by the oracle)."""
    from ..operators.sketches import histogram_quantiles_by, log_histogram_by

    e = load_table(spark, sf_dir, "events")
    hist = log_histogram_by(
        e.select("event_type", "value"), ["event_type"], "value", scale=100
    )
    return histogram_quantiles_by(
        hist, ["event_type"], [0.5, 0.9, 0.99], scale=100
    ).orderBy("event_type")


def _sk_hist_by_sql() -> str:
    from ..operators.sketches import log_histogram_by_sql

    return f"""
WITH {log_histogram_by_sql("events", ["event_type"], "value", [0.5, 0.9, 0.99], 100)}
SELECT event_type, p50, p90, p99 FROM histq ORDER BY event_type
"""


def sk_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL: distinct users per event_type from per-group
    register tables (groups × 64 keys of state — the cube form) next to
    the exact distincts; both engines re-derive every register."""
    from ..operators.sketches import hll_estimate_by, hll_registers_by

    e = load_table(spark, sf_dir, "events")
    items = e.select("event_type", F.col("user_id").cast("long").alias("_h"))
    est = hll_estimate_by(
        hll_registers_by(items, ["event_type"], "_h", p=6), ["event_type"], p=6
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")


def _sk_hll_by_sql() -> str:
    from ..operators.sketches import hll_by_sql

    return f"""
WITH src AS (SELECT event_type, CAST(user_id AS BIGINT) AS h FROM events),
{hll_by_sql("src", ["event_type"], "h", p=6)}
SELECT g.event_type, g.estimate, x.exact_distinct
FROM hllg g JOIN (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
) x USING (event_type)
ORDER BY event_type
"""


def tx_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics per language: distinct token types, total
    tokens, type-token ratio — one explode + one two-level aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("tok").alias("n_types"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        )
        .orderBy("lang")
    )


TX_TTR_SQL = f"""
WITH toks AS (SELECT lang, unnest({TOKENS_SQL}) AS tok FROM documents)
SELECT lang, COUNT(DISTINCT tok) AS n_types, COUNT(*) AS n_tokens,
       ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS ttr
FROM toks GROUP BY lang ORDER BY lang
"""


def tx_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the top
    50 corpus tokens (rank by freq desc, token asc — deterministic).
    One token aggregate + a 50-row regression via covar/var aggregates;
    a healthy natural corpus sits near -1."""
    d = load_table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("freq").desc(), "tok")
    top = freqs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 50
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_points"),
    )


TX_ZIPF_SQL = f"""
WITH toks AS (SELECT unnest({TOKENS_SQL}) AS tok FROM documents),
freqs AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
top AS (
  SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM freqs QUALIFY rank <= 50
),
xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y FROM top)
SELECT ROUND(covar_pop(x, y) / var_pop(x), 6) AS zipf_slope,
       COUNT(*) AS n_points
FROM xy
"""


def tx_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training support: the first BPE step's adjacent
    char-pair counts over the word-frequency table (the only
    corpus-wide pass; the merge loop then runs on vocab only)."""
    from ..functions.bpe import pair_counts, with_symbols, word_frequencies

    d = load_table(spark, sf_dir, "documents")
    table = with_symbols(word_frequencies(d, "text"))
    return (
        pair_counts(table)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(15)
    )


TX_BPE_SQL = f"""
WITH words AS (SELECT unnest({TOKENS_SQL}) AS word FROM documents),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
pairs AS (
  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
         SUM(freq) AS cnt
  FROM wf, LATERAL (SELECT unnest(range(1, len(word))) AS i)
  GROUP BY 1, 2
)
SELECT a, b, cnt FROM pairs ORDER BY cnt DESC, a, b LIMIT 15
"""


def sp_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α=0.5) language mixing: rebalance the corpus
    toward low-resource languages, √-mass allocation, portable
    hash-threshold admission — the mT5/XLM-R mixing rule."""
    from ..operators.sampling import temperature_sample

    d = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(d, "lang", "doc_id", target_fraction_denom=2)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


def _sp_temp_sql() -> str:
    from ..operators.sampling import temperature_sample_sql

    return f"""
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ({temperature_sample_sql("lang", "doc_id", 2)})
GROUP BY lang ORDER BY lang
"""



def sp_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a (potentially hot-keyed) group:
    per event_type sum/count via (key, salt) partials then a merge — the
    result is salt-invariant, so the oracle is the plain GROUP BY."""
    from ..operators.skew import salted_sum

    e = load_table(spark, sf_dir, "events")
    out = salted_sum(e, ["event_type"], ["value"], salt_buckets=16)
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        F.col("n"),
    ).orderBy("event_type")


SP_SALTED_SQL = """
SELECT event_type, ROUND(SUM(value), 4) AS sum_value, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""



def tx_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-quantile gate: drop each language's
    bottom-quartile documents by quality score — thresholds derived from
    the data (two-phase: exact nearest-rank quantile per group, broadcast
    filter back; corpus never globally sorts)."""
    from ..operators.stats import quantile_gate

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", tx.quality_score(F.col("text")).alias("q")
    )
    kept = quantile_gate(scored, "lang", "q", (1, 4), "doc_id")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("q"), 4).alias("sum_q"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


TX_QGATE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         LENGTH(text) AS n,
         LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         len({TOKENS_SQL}) AS ntok
  FROM documents
), q AS (
  SELECT doc_id, lang,
         (CASE WHEN n > 0 THEN alpha * 1.0 / n ELSE 0.0 END) * 0.5
         + (1 - LEAST((CASE WHEN n > 0 THEN punct * 1.0 / n ELSE 0.0 END) * 5, 1.0)) * 0.25
         + (CASE WHEN ntok >= 5 AND ntok <= 5000 THEN 1.0 ELSE 0.5 END) * 0.25 AS q
  FROM d
), ranked AS (
  SELECT lang, q AS _v,
         row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS _rn,
         COUNT(*) OVER (PARTITION BY lang) AS _n
  FROM q
), thr AS (
  SELECT lang, MAX(CASE WHEN _rn = (1 * _n + 4 - 1) // 4 THEN _v END) AS t
  FROM ranked GROUP BY lang
)
SELECT q.lang, COUNT(*) AS n_kept, ROUND(SUM(q.q), 4) AS sum_q,
       CAST(SUM(q.doc_id) AS BIGINT) AS sum_ids
FROM q JOIN thr ON q.lang = thr.lang
WHERE q.q >= thr.t
GROUP BY q.lang ORDER BY q.lang
"""


def _cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-per-label-centroid assignment (k-means E-step), shared by
    ``sim_centroid_assign`` and ``dd_semantic``: centroids = rounded label
    means, distance = rounded L2², deterministic argmin (d2, then clabel).

    Round 4: the k·dim centroid table (5×64 doubles — metadata, the same
    driver carve-out as ``train_centroids_kmeans``) is collected and
    inlined as literals, so the assignment is a NARROW argmin fold over
    the corpus — the previous crossJoin(broadcast) + per-vector
    row_number window shuffled N·k rows through a corpus-sized exchange.
    The rounded-to-6 centroid values are bit-identical either way, so the
    DuckDB oracle (which re-derives them in SQL) still matches exactly.
    Shuffle census: one k·dim-key exchange for the centroid aggregate;
    the assignment itself shuffles nothing.  Returns
    (vec_id, label, v, clabel)."""
    e = _parallel(load_table(spark, sf_dir, "embeddings"), "vec_id").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    cents = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    by_label: dict = {}
    for r in cents.collect():
        by_label.setdefault(r["label"], {})[r["dim"]] = r["c"]
    centroids = [
        (lbl, [m[d] for d in sorted(m)]) for lbl, m in sorted(by_label.items())
    ]

    def _d2(cvec: list[float]):
        return F.round(
            F.aggregate(
                F.zip_with(
                    "v",
                    F.array(*[F.lit(float(x)) for x in cvec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    # stage every d2 as a named column FIRST (bind-once discipline): the
    # zip_with/aggregate HOFs are interpreted, so folding raw d2
    # expressions through a when-chain would re-evaluate earlier
    # distances exponentially (measured 17s vs 1.5s at sf0.1)
    staged = e.select(
        "vec_id",
        "label",
        "v",
        *[_d2(cvec).alias(f"_d{i}") for i, (_, cvec) in enumerate(centroids)],
    )
    best_c = None
    best_d = None
    # ascending clabel + strict < keeps the LOWEST label on d2 ties —
    # the same (d2, clabel) ordering the window form used
    for i, (lbl, _) in enumerate(centroids):
        d = F.col(f"_d{i}")
        if best_c is None:
            best_c, best_d = F.lit(lbl), d
        else:
            better = d < best_d
            best_c = F.when(better, F.lit(lbl)).otherwise(best_c)
            best_d = F.when(better, d).otherwise(best_d)
    return staged.select("vec_id", "label", "v", best_c.alias("clabel"))


def sim_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step as a declared query: assign every embedding to its
    nearest per-label centroid and report the label-vs-assigned confusion
    counts (see ``_cluster_assign`` for the plan shape)."""
    asg = _cluster_assign(spark, sf_dir)
    return (
        asg.groupBy(F.col("label"), F.col("clabel").alias("assigned"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "assigned")
    )


def dd_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) as a declared query: cluster by
    nearest label-centroid, then drop any vector dominated by an
    earlier-id cluster-mate with cosine >= τ.  The pair join is an
    equi-join on the cluster id — candidates bounded per cluster, never
    N² (``operators/dedup.py::semantic_dedup``).

    τ=0.35 is a *demonstration* threshold: the synthetic embeddings carry
    no planted near-dups (max pairwise cos ≈ 0.5), so production-realistic
    τ≈0.95 would return the empty set and verify nothing.  0.35 sits at
    the ~99.5th percentile of the pair distribution — a small, non-trivial
    removed set whose every row the oracle re-derives."""
    asg = _cluster_assign(spark, sf_dir).select(
        "vec_id", "v", F.col("clabel").alias("cluster")
    )
    removed = dd.semantic_dedup(asg, threshold=0.35)
    return removed.select(
        "vec_id",
        "cluster",
        "dup_of",
        F.round("cos", 6).alias("cos"),
    ).orderBy("vec_id")


DD_SEMANTIC_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cents AS (
  SELECT label AS clabel, i, ROUND(AVG(x), 6) AS c
  FROM ex GROUP BY 1, 2
), carr AS (
  SELECT clabel, list(c ORDER BY i) AS cv FROM cents GROUP BY clabel
), scored AS (
  SELECT e.vec_id, e.v, carr.clabel,
         ROUND(list_reduce(list_prepend(
             0.0,
             list_transform(range(1, 65),
                            i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           (a, b) -> a + b), 6) AS d2
  FROM e CROSS JOIN carr
), asg AS (
  SELECT vec_id, v, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM scored
), cl AS (
  SELECT vec_id, v, clabel AS cluster FROM asg WHERE rn = 1
), hits AS (
  SELECT * FROM (
    SELECT b.vec_id, b.cluster, a.vec_id AS ida,
           list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
    FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  ) WHERE s >= 0.35
), best AS (
  SELECT vec_id, cluster, ida, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY ida, s) AS rn2
  FROM hits
)
SELECT vec_id, cluster, ida AS dup_of, ROUND(s, 6) AS cos
FROM best WHERE rn2 = 1 ORDER BY vec_id
"""


def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64→16 as a declared
    query: deterministic ±1 projection (``similarity.random_project``),
    reporting the first four reduced components and the input/output norms
    per vector — the norm columns audit the JL contraction the projection
    promises, the component columns pin the exact arithmetic."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    proj = e.select(
        "vec_id", "v", sim.random_project(F.col("v"), 64, 16).alias("_r")
    )
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at("_r", j + 1), 6).alias(f"r{j}")
            for j in range(4)
        ],
        F.round(sim.norm(F.col("v")), 6).alias("norm_in"),
        F.round(sim.norm(F.col("_r")), 6).alias("norm_out"),
    ).orderBy("vec_id")


def tx_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 highest-quality documents per language.
    Spark 4 plans the rank-filter as WindowGroupLimit — each partition
    keeps only k rows per group BEFORE the window sort's shuffle, so the
    exchange carries k·#groups·#partitions rows, not the corpus
    (plan-asserted)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        "doc_id",
        F.round(tx.quality_score(F.col("text")), 6).alias("q"),
    )
    from pyspark.sql.window import Window as W

    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= 3)
        .orderBy("lang", "rank")
    )


def _top_quality_sql() -> str:
    q = _quality_expr_sql("text")
    return f"""
WITH scored AS (
  SELECT lang, doc_id, ROUND({q}, 6) AS q FROM documents
), ranked AS (
  SELECT lang, doc_id, q,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS INT) AS rank
  FROM scored
)
SELECT lang, doc_id, q, rank FROM ranked WHERE rank <= 3
ORDER BY lang, rank
"""


_TB_BUDGETS = {"en": 3000, "de": 1500, "fr": 800}


def sp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix selection: per language, keep the seeded-hash
    prefix of documents whose running token total fits the language's
    budget (``operators/sampling.py::select_to_token_budget`` — how a
    pretraining mix is carved when sources are allotted tokens, not
    document counts).  Languages without a budget drop entirely."""
    from ..operators.sampling import select_to_token_budget

    d = load_table(spark, sf_dir, "documents")
    out = select_to_token_budget(d, "lang", _TB_BUDGETS, seed=31)
    return out.select(
        "doc_id", "lang", "n_tokens", "cum_tokens"
    ).orderBy("lang", "doc_id")


def _sp_token_budget_sql(seed: int = 31) -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("doc_id", seed)
    budget = "CASE " + " ".join(
        f"WHEN lang = '{g}' THEN {b}" for g, b in _TB_BUDGETS.items()
    ) + " ELSE 0 END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, CAST(len({TOKENS_SQL}) AS INT) AS n_tokens,
         {h} AS _h
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY _h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= {budget}
ORDER BY lang, doc_id
"""


def sp_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-ES): 200 documents drawn
    with probability ∝ length — the fixed-k weight-proportional variant
    completing the sampling tier (`operators/sampling.py:weighted_sample`)."""
    from ..operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    s = weighted_sample(d, "n_chars", 200, "doc_id")
    return s.select(
        "doc_id", "lang", "n_chars", F.round("_wkey", 6).alias("wkey")
    ).orderBy(F.col("wkey").desc(), "doc_id")


def _sp_weighted_sql() -> str:
    from ..operators.sampling import weighted_sample_sql

    inner = weighted_sample_sql("documents", "n_chars", 200, "doc_id")
    return (
        f"SELECT doc_id, lang, n_chars, ROUND(_wkey, 6) AS wkey "
        f"FROM ({inner}) ORDER BY wkey DESC, doc_id"
    )


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the 4× storage /
    bandwidth cut for the 100 TB embedding tier (codes travel as int8;
    one float scale per vector reconstructs).  Pure column algebra: the
    scale is materialized behind a projection boundary first (bind-once
    HOF discipline), then codes and reconstruction-MSE are narrow
    expressions; zero shuffle before the presentation orderBy.  The query
    audits the quantizer: per-vector scale, code checksum, and MSE —
    every value re-derived exactly by the oracle."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    sc = e.select(
        "vec_id",
        "v",
        (
            F.greatest(
                F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
            )
            / F.lit(127.0)
        ).alias("_sc"),
    )
    q = sc.select(
        "vec_id",
        "v",
        "_sc",
        F.transform(
            "v",
            lambda x: F.least(
                F.lit(127),
                F.greatest(F.lit(-127), F.round(x / F.col("_sc")).cast("int")),
            ),
        ).alias("_q"),
    )
    mse = (
        F.aggregate(
            F.zip_with(
                "v",
                "_q",
                lambda x, c: (x - c * F.col("_sc")) * (x - c * F.col("_sc")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size("v")
    )
    return q.select(
        "vec_id",
        F.round("_sc", 8).alias("scale"),
        F.aggregate("_q", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.round(mse, 10).alias("mse"),
    ).orderBy("vec_id")


SIM_QUANT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (
  SELECT vec_id, v,
         greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS s
  FROM e
), q AS (
  SELECT vec_id, v, s,
         list_transform(v, x -> least(127, greatest(-127, CAST(round(x / s) AS INT)))) AS c
  FROM sc
)
SELECT vec_id,
       ROUND(s, 8) AS scale,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), c), (a, x) -> a + x) AS BIGINT) AS code_sum,
       ROUND(list_reduce(list_prepend(0.0,
               list_transform(range(1, len(v) + 1), i -> (v[i] - c[i] * s) * (v[i] - c[i] * s))),
             (a, x) -> a + x) / len(v), 10) AS mse
FROM q ORDER BY vec_id
"""


_BM25_TERMS = ("vector", "hash", "stream")


def tx_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-10 for a fixed query term set
    (`operators/retrieval.py` — query-term counting inside each doc's own
    token array: narrow map, zero shuffle; corpus stats are ONE broadcast
    aggregate row; ranking is TakeOrderedAndProject)."""
    from ..operators.retrieval import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    s = bm25_scores(d, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


def _bm25_sql(
    terms: tuple = _BM25_TERMS, k1: float = 1.2, b: float = 0.75
) -> str:
    idx = range(len(terms))
    tfs = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in idx
    )
    parts = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
        f"(tf{i} * {k1 + 1.0!r} / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))"
        for i in idx
    )
    return f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
f AS (SELECT doc_id, len(t) AS dl, {tfs} FROM d),
s AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {dfs} FROM f)
SELECT doc_id, ROUND({parts}, 4) AS score
FROM f CROSS JOIN s
ORDER BY score DESC, doc_id LIMIT 10
"""


def tx_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 via the prebuilt inverted index
    (``operators/retrieval.py::build_bm25_index`` +
    ``bm25_scores_indexed``): query terms broadcast-equi-join the
    denormalized posting table (partition-prunable on token at scale);
    per-doc scores are identical to ``tx_bm25_search``'s no-explode path
    on every matching doc (pinned in tests/test_retrieval_index.py), so
    the two declared queries cross-check each other through the same
    oracle arithmetic."""
    from ..operators.retrieval import bm25_scores_indexed, build_bm25_index

    # r14 (VERDICT r13 item 1): the r13 full-row `_parallel` hop was this
    # round's one regression (plan 10→12 Exchanges, both paid ~twice:
    # once under the `matched` checkpoint job, again when the stats agg
    # re-scanned the repartitioned docs).  Now the hop carries ONLY the
    # projected (doc_id, text) — `_parallel_docs` — and the index build
    # tokenizes ONCE into a checkpointed (id, _dl, _toks) projection
    # (materialize=True), so the shuffle + tokenize are paid exactly once
    # and both consumers (postings, stats) read materialized rows.
    d = _parallel_docs(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    postings, stats = build_bm25_index(d, materialize=True)
    s = bm25_scores_indexed(postings, stats, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


def _bm25_indexed_sql(
    terms: tuple = _BM25_TERMS, k1: float = 1.2, b: float = 0.75
) -> str:
    """Oracle for the index path: the same BM25 arithmetic restricted to
    docs matching >= 1 query term (the index path never surfaces
    zero-score docs)."""
    idx = range(len(terms))
    tfs = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in idx
    )
    parts = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
        f"(tf{i} * {k1 + 1.0!r} / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))"
        for i in idx
    )
    matched = " + ".join(f"tf{i}" for i in idx)
    return f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
f AS (SELECT doc_id, len(t) AS dl, {tfs} FROM d),
s AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {dfs} FROM f)
SELECT doc_id, ROUND({parts}, 4) AS score
FROM f CROSS JOIN s
WHERE {matched} > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


def tx_bm25_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of ``tx_bm25_indexed`` (VERDICT r5 task 6): the
    identical query answered from the PERSISTED token-bucketed index
    (``write_bm25_index`` + ``bm25_scores_persisted``).  The tokenize +
    posting build runs once per testdata fingerprint (offline at
    scale); what this query times is the serving path — static
    ``_tb IN (...)`` partition pruning to the query terms' buckets,
    then the broadcast equi-join scoring.  Scores are identical to the
    in-query index build, so the oracle is shared."""
    from ..operators.retrieval import bm25_scores_persisted, write_bm25_index

    path = _index_cache_path(sf_dir, "documents.parquet", "bm25")

    def _build():
        write_bm25_index(load_table(spark, sf_dir, "documents"), path)

    _cached_index(path, _build)
    s = bm25_scores_persisted(spark, path, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# fixed BPE merge table (ranked, applied in order) — a production
# tokenizer ships a frozen vocab; applying it is the scale operation
# (training is tx_bpe_pairs).  Common English digraph/trigraph merges.
_BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("in", "g"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("an", "d"), ("t", "o"), ("o", "f"), ("e", "s"),
    ("s", "t"),
)


def tx_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every token with a frozen, ranked
    BPE merge table and count the resulting subword units (top 30).

    Pure string algebra, zero Python: each token becomes a
    ``|``-delimited symbol string (``that`` → ``|t||h||a||t|``) and
    each ranked merge is one literal ``replace`` (``|t||h|`` →
    ``|th|``) — the delimiters make symbol boundaries unambiguous, so
    ``replace`` IS the left-to-right all-occurrences merge of the
    Sennrich algorithm.  16 chained replaces stay inside whole-stage
    codegen; the only shuffle is the final count.  The oracle applies
    the identical replace chain in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
    s = F.concat(
        F.lit("|"), F.concat_ws("||", F.split(F.col("tok"), "")), F.lit("|")
    )
    for x, y in _BPE_MERGES:
        s = F.replace(s, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    sub = F.explode(
        F.split(F.expr(f"trim(BOTH '|' FROM {'_enc'})"), r"\|\|")
    ).alias("subword")
    return (
        toks.select(s.alias("_enc"))
        .select(sub)
        .groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "subword")
        .limit(30)
    )


def _bpe_encode_sql() -> str:
    chars = (
        "'|' || array_to_string(list_transform(range(1, len(tok) + 1), "
        "i -> substr(tok, i, 1)), '||') || '|'"
    )
    expr = chars
    for x, y in _BPE_MERGES:
        expr = f"replace({expr}, '|{x}||{y}|', '|{x}{y}|')"
    return f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS tok FROM documents
),
enc AS (SELECT {expr} AS e FROM toks),
subs AS (SELECT unnest(string_split(trim(e, '|'), '||')) AS subword FROM enc)
SELECT subword, COUNT(*) AS n FROM subs
GROUP BY subword ORDER BY n DESC, subword LIMIT 30
"""


def _subword_count(tok):
    """Column expr: number of frozen-vocab BPE subwords in one token —
    the tx_bpe_encode replace chain, then counted as ``size(split(s,
    '||'))`` (symbol boundaries are exactly the double delimiters; no
    trim needed: the outer single pipes never form a segment)."""
    s = F.concat(F.lit("|"), F.concat_ws("||", F.split(tok, "")), F.lit("|"))
    for x, y in _BPE_MERGES:
        s = F.replace(s, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    return F.size(F.split(s, r"\|\|"))


def tx_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end TRAINING-FEED bridge: tokenize every document
    with the frozen BPE vocab (``tx_bpe_encode``'s replace chain),
    count SUBWORD units — the number a token budget actually meters,
    not whitespace words — then greedily pack documents into
    128-subword sequences per source shard and report per-bin fill.
    Tokenization is pure string algebra fused into the scan; packing is
    the sequential-per-shard applyInPandas recurrence; the oracle
    replays subword counting AND the packing recurrence (recursive
    CTE) end-to-end."""
    from ..operators.packing import pack_greedy

    d = _parallel(load_table(spark, sf_dir, "documents"), cols=("doc_id", "source", "text"))
    toks = tx.tokens(F.col("text"))
    # r13 opt note (guide §1.2, measured and REVERTED): an Arrow kernel
    # twin of this fold (tokenize + the 16-merge replace chain as
    # vectorized pyarrow.compute passes, one crossing) was built,
    # differential-pinned and A/B'd interleaved at sf0.1 — expression
    # form min 1.11 s / clean med ~1.2 vs kernel min 1.22 s / med ~1.6:
    # the extra ArrowEvalPython stage costs more than the interpreted
    # per-token replaces it removes at this row count, so the HOF form
    # (also the documented oracle contract) stays.
    per_tok = F.transform(toks, _subword_count)
    n_sub = F.aggregate(
        per_tok, F.lit(0), lambda acc, x: acc + x
    ).alias("n_sub")
    t = d.select("source", "doc_id", n_sub)
    packed = pack_greedy(t, "source", "doc_id", "n_sub", _PACK_CAP)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sub").alias("fill_subwords"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("source", "bin_id")
    )


def _tokenize_pack_sql() -> str:
    from ..operators.packing import pack_recurrence_sql

    chars = (
        "'|' || array_to_string(list_transform(range(1, len(tok) + 1), "
        "i -> substr(tok, i, 1)), '||') || '|'"
    )
    expr = chars
    for x, y in _BPE_MERGES:
        expr = f"replace({expr}, '|{x}||{y}|', '|{x}{y}|')"
    inner = (
        "SELECT source, doc_id, COALESCE(list_sum(list_transform("
        f"{TOKENS_SQL}, tok -> len(string_split(trim({expr}, '|'), '||'))"
        ")), 0) AS n_sub FROM documents"
    )
    body = pack_recurrence_sql(inner, "source", "doc_id", "n_sub", _PACK_CAP)
    return f"""
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_sub) AS BIGINT) AS fill_subwords,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ({body})
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


def _rand_proj_sql(in_dim: int = 64, out_dim: int = 16, seed: int = 23) -> str:
    rows = sim._hyperplanes(in_dim, out_dim, seed)
    scale = out_dim ** -0.5  # exact binary double for power-of-4 out_dim
    comps = ",\n           ".join(
        f"list_dot_product(v, {row!r}::DOUBLE[]) * {scale!r}" for row in rows
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v, list_value({comps}) AS r FROM e)
SELECT vec_id,
       ROUND(r[1], 6) AS r0, ROUND(r[2], 6) AS r1,
       ROUND(r[3], 6) AS r2, ROUND(r[4], 6) AS r3,
       ROUND(sqrt(list_dot_product(v, v)), 6) AS norm_in,
       ROUND(sqrt(list_dot_product(r, r)), 6) AS norm_out
FROM p ORDER BY vec_id
"""


SIM_ASSIGN_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cents AS (
  SELECT label AS clabel, i, ROUND(AVG(x), 6) AS c
  FROM ex GROUP BY 1, 2
), carr AS (
  SELECT clabel, list(c ORDER BY i) AS cv FROM cents GROUP BY clabel
), scored AS (
  SELECT e.vec_id, e.label, carr.clabel,
         ROUND(list_reduce(list_prepend(
             0.0,
             list_transform(range(1, 65),
                            i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           (a, b) -> a + b), 6) AS d2
  FROM e CROSS JOIN carr
), asg AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM scored
)
SELECT label, clabel AS assigned, COUNT(*) AS n
FROM asg WHERE rn = 1
GROUP BY label, clabel ORDER BY label, assigned
"""

REGISTRY = {
    "dd_duplicate_spans": (dd_duplicate_spans, DD_SPANS_SQL),
    "dd_span_removal": (dd_span_removal, DD_SPAN_REMOVAL_SQL),
    "tx_bpe_pairs": (tx_bpe_pairs, TX_BPE_SQL),
    "tx_bpe_encode": (tx_bpe_encode, _bpe_encode_sql()),
    "tx_tokenize_pack": (tx_tokenize_pack, _tokenize_pack_sql()),
    "tx_type_token_ratio": (tx_type_token_ratio, TX_TTR_SQL),
    "sk_cms_top_tokens": (sk_cms_top_tokens, _sk_cms_sql()),
    "sk_hll_distinct": (sk_hll_distinct, _sk_hll_sql()),
    "sk_hll_by_group": (sk_hll_by_group, _sk_hll_by_sql()),
    "sk_quantile_histogram": (sk_quantile_histogram, _sk_hist_sql()),
    "sk_quantile_by_group": (sk_quantile_by_group, _sk_hist_by_sql()),
    "tx_zipf_slope": (tx_zipf_slope, TX_ZIPF_SQL),
    "dd_semantic_text": (dd_semantic_text, DD_SEMANTIC_TEXT_SQL),
    "dd_embedding_neardup": (dd_embedding_neardup, DD_EMB_SQL),
    "sp_temperature_mixture": (sp_temperature_mixture, _sp_temp_sql()),
    "sp_salted_agg": (sp_salted_agg, SP_SALTED_SQL),
    "sim_centroid_assign": (sim_centroid_assign, SIM_ASSIGN_SQL),
    "sim_random_projection": (sim_random_projection, _rand_proj_sql()),
    "tx_bm25_search": (tx_bm25_search, _bm25_sql()),
    "tx_bm25_indexed": (tx_bm25_indexed, _bm25_indexed_sql()),
    "tx_bm25_serve": (tx_bm25_serve, _bm25_indexed_sql()),
    "sim_quantize_int8": (sim_quantize_int8, SIM_QUANT_SQL),
    "sp_weighted_sample": (sp_weighted_sample, _sp_weighted_sql()),
    "sp_token_budget": (sp_token_budget, _sp_token_budget_sql()),
    "tx_top_quality_per_lang": (tx_top_quality_per_lang, _top_quality_sql()),
    "dd_semantic": (dd_semantic, DD_SEMANTIC_SQL),
    "tx_quality_gate": (tx_quality_gate, TX_QGATE_SQL),
    "mm_frame_sample": (mm_frame_sample, _mm_frames_sql()),
}
