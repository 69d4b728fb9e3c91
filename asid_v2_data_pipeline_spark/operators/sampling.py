"""Deterministic sampling operators for training-data pipelines
(SURVEY.md §2.11 adjunct).

LLM corpus curation needs reproducible, engine-portable sampling — a
rerun (or an audit in another engine) must select the SAME rows.  Both
operators therefore key on the portable LCG ``shuffle_hash`` from
``operators.split`` instead of ``rand()``/``sampleBy`` (whose output
depends on partition layout and engine RNG):

- **quota_per_group** — cap every group (domain, source, lang) at N
  rows: the standard "no domain may dominate the corpus" rule.
- **stratified_sample** — per-stratum Bernoulli sampling by hash
  threshold: the deterministic ``sampleBy`` analogue, selecting the same
  id set in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .split import SHUFFLE_M, shuffle_hash, shuffle_hash_sql


def quota_per_group(
    df: DataFrame,
    group_cols: list[str],
    quota: int,
    id_col: str,
    seed: int = 17,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by the portable keyed
    shuffle hash (ties broken by id — fully deterministic).

    Scale: one hash exchange on the group key; the within-group
    row_number sort is bounded by group size.  For pathologically hot
    groups use :func:`quota_per_group_scalable` — the two-phase variant
    (count, hash pre-filter, verified fallback) that provably returns
    the identical selection while sorting ~safety·quota rows per group
    instead of |g|.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        shuffle_hash(F.col(id_col).cast("long"), seed), id_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def quota_per_group_scalable(
    df: DataFrame,
    group_cols: list[str],
    quota: int,
    id_col: str,
    seed: int = 17,
    safety: float = 4.0,
) -> DataFrame:
    """Exact twin of :func:`quota_per_group` for corpora with
    pathologically hot groups (a domain with 10⁹ rows would otherwise
    sort 10⁹ rows inside one window partition).

    Two phases, provably identical results:

    1. group counts (map-side combinable agg).  Groups with
       ``count ≤ quota`` pass through whole — no window at all.
    2. big groups pre-filter to ``hash < safety·quota/count · 2³¹``
       before the exact window — the window then sorts ~safety·quota
       rows per group instead of the full group.  Because the window
       selects the quota smallest hashes and the pre-filter keeps a
       hash-PREFIX (everything below a threshold), the selection is
       unchanged — PROVIDED at least ``quota`` rows survive.  That holds
       with overwhelming probability (Chernoff: safety=4 means the
       survivor count would have to fall 4× below its mean), and is
       VERIFIED per group; the rare under-admitted group falls back to
       the plain windowed path.  Exactness never depends on luck.

    Driver coordination (counts/fallback keys) touches only group-level
    metadata, never corpus rows — same carve-out as every two-phase
    distributed algorithm.
    """
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_gn"))
    joined = df.join(counts, group_cols)
    small = joined.filter(F.col("_gn") <= quota).drop("_gn")

    big = joined.filter(F.col("_gn") > quota)
    tau_num = F.lit(int(safety * quota * SHUFFLE_M))
    tau = F.least(F.lit(SHUFFLE_M), (tau_num / F.col("_gn")).cast("long"))
    h = shuffle_hash(F.col(id_col).cast("long"), seed)
    pre = big.filter(h < tau).drop("_gn")

    # verify: every big group must still have >= quota survivors
    ok = pre.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_pn"))
    short = (
        counts.filter(F.col("_gn") > quota)
        .join(ok, group_cols, "left")
        .filter(F.coalesce(F.col("_pn"), F.lit(0)) < quota)
        .select(*group_cols)
        .collect()
    )
    capped = quota_per_group(pre, group_cols, quota, id_col, seed)
    if short:  # rare fallback: exact path for under-admitted groups only
        from functools import reduce

        cond = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda a, b: a & b,
                    [F.col(c) == F.lit(r[c]) for c in group_cols],
                )
                for r in short
            ],
        )
        redo = quota_per_group(df.filter(cond), group_cols, quota, id_col, seed)
        capped = capped.filter(~cond).unionByName(redo)
    return small.unionByName(capped)


def _thresholds(fractions: dict[str, float]) -> dict[str, int]:
    # integer thresholds computed ONCE driver-side: both engines then
    # compare the same integers — no float-boundary divergence
    return {k: int(v * SHUFFLE_M) for k, v in fractions.items()}


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: int = 17,
) -> DataFrame:
    """Per-stratum Bernoulli sampling: keep a row iff
    ``shuffle_hash(id) < fraction[stratum] · 2³¹``.  Strata absent from
    ``fractions`` get fraction 0 (``sampleBy`` semantics).

    Scale: a pure filter — NO shuffle, no per-stratum pass; the strata→
    threshold map is a literal expression (dozens of entries at most),
    evaluated inside the scan stage's codegen before anything shuffles
    (plan-asserted: zero Exchange).
    """
    th = _thresholds(fractions)
    pairs = [x for k, v in th.items() for x in (F.lit(k), F.lit(v))]
    thresh = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(0),
    )
    return df.filter(
        shuffle_hash(F.col(id_col).cast("long"), seed) < thresh
    )


def stratified_sample_sql(
    strata_col: str, fractions: dict[str, float], id_col: str, seed: int = 17
) -> str:
    """Oracle-side predicate: the identical integer comparison as SQL."""
    th = _thresholds(fractions)
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in th.items())
    h = shuffle_hash_sql(id_col, seed)
    return f"{h} < CASE {strata_col} {cases} ELSE 0 END"


def weighted_repeat(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 17,
) -> DataFrame:
    """Corpus mixing with fractional epoch weights: a row in group g with
    weight ``w`` appears ``floor(w)`` times, plus once more with
    probability ``frac(w)`` — so each group's expected row count is
    exactly ``w × |g|`` (the "epochs per source" knob of LLM data
    mixtures; w<1 downsamples, w>1 upsamples with repetition).

    The stochastic extra copy keys on the portable LCG hash of the id, so
    the SAME rows get the extra epoch in any engine and on any rerun.
    Output adds an ``epoch`` column (0..n-1 per row); groups absent from
    ``weights`` get weight 0 (dropped).

    Scale: pure narrow ops — a literal map lookup, one comparison, one
    ``explode(sequence(...))`` — all inside the scan stage; NO shuffle
    and no skew risk beyond the output size itself.
    """
    floors = {k: int(w) for k, w in weights.items()}
    fracs = _thresholds({k: w - int(w) for k, w in weights.items()})
    fl_pairs = [x for k, v in floors.items() for x in (F.lit(k), F.lit(v))]
    fr_pairs = [x for k, v in fracs.items() for x in (F.lit(k), F.lit(v))]
    fl = F.coalesce(
        F.element_at(F.create_map(*fl_pairs), F.col(group_col)), F.lit(0)
    )
    fr = F.coalesce(
        F.element_at(F.create_map(*fr_pairs), F.col(group_col)), F.lit(0)
    )
    extra = (
        shuffle_hash(F.col(id_col).cast("long"), seed) < fr
    ).cast("int")
    n = (fl + extra).alias("_n")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def weighted_repeat_sql(
    group_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 17,
    src: str = "documents",
) -> str:
    """Oracle: ``(src rows) × generate_series`` with the identical integer
    floor/threshold arithmetic; returns a FROM-able derived-table body
    exposing ``src.*`` plus ``epoch``."""
    floors = {k: int(w) for k, w in weights.items()}
    fracs = _thresholds({k: w - int(w) for k, w in weights.items()})
    fl_cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in floors.items())
    fr_cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in fracs.items())
    h = shuffle_hash_sql(id_col, seed)
    return f"""
WITH counted AS (
  SELECT *,
         (CASE {group_col} {fl_cases} ELSE 0 END)
         + (CASE WHEN {h} < (CASE {group_col} {fr_cases} ELSE 0 END)
            THEN 1 ELSE 0 END) AS _n
  FROM {src}
)
SELECT counted.*, CAST(e.epoch AS BIGINT) AS epoch
FROM counted, LATERAL unnest(range(0, _n)) AS e(epoch)
WHERE _n > 0
"""


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_fraction_denom: int = 2,
    seed: int = 29,
) -> DataFrame:
    """Temperature-scaled domain sampling (α = 0.5): sample each domain
    with probability ∝ ``n_d^α / n_d``, i.e. rebalance a skewed corpus
    toward its small domains — the multilingual-LM mixing rule of
    Conneau & Lample 2019 / Xue et al. 2021 (mT5), where low-resource
    languages are upsampled *relatively* by exponentiating domain mass.

    Overall budget: ``total/target_fraction_denom`` rows, allocated to
    domain d as ``t_d = N · √n_d / Σ√n``; each domain then keeps rows by
    the portable hash-threshold rule ``shuffle_hash(id) < t_d·2³¹/n_d``.

    α is fixed at 0.5 because ``sqrt`` is IEEE-correctly-rounded in every
    engine — the whole computation (count → weight → integer thresholds)
    is reproducible bit-for-bit in the DuckDB oracle.  General-α needs
    ``pow``, whose last-ulp behavior is libm-specific; layer it on
    ``stratified_sample`` with driver-computed fractions instead.

    Scale: one metadata-size groupBy on the domain, a 1-row broadcast for
    the global sums, and a broadcast join back — the corpus itself never
    shuffles and is filtered in the scan stage.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # weight = floor(sqrt(n) * 1e6): sqrt + one double multiply, both
    # correctly rounded IEEE ops -> identical in Spark and DuckDB
    weights = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n")) * F.lit(1000000.0)).cast("long")
    )
    tot = weights.agg(
        F.sum("_w").alias("_sw"), F.sum("_n").alias("_tn")
    )
    thr = (
        weights.crossJoin(F.broadcast(tot))
        .withColumn(
            "_tgt",
            F.expr(f"((_tn div {int(target_fraction_denom)}) * _w) div _sw"),
        )
        .withColumn(
            "_thr",
            F.least(
                F.expr(f"(_tgt * CAST({SHUFFLE_M} AS BIGINT)) div _n"),
                F.lit(SHUFFLE_M).cast("long"),
            ),
        )
        .select(group_col, "_thr")
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(shuffle_hash(F.col(id_col).cast("long"), seed) < F.col("_thr"))
        .drop("_thr")
    )


def temperature_sample_sql(
    group_col: str,
    id_col: str,
    target_fraction_denom: int = 2,
    seed: int = 29,
    src: str = "documents",
) -> str:
    """Oracle: the identical integer/IEEE arithmetic as a FROM-able
    derived table exposing the admitted rows of ``src``."""
    h = shuffle_hash_sql(id_col, seed)
    return f"""
WITH _counts AS (
  SELECT {group_col} AS _g, COUNT(*) AS _n FROM {src} GROUP BY {group_col}
), _w AS (
  SELECT _g, _n, CAST(FLOOR(SQRT(_n) * 1000000.0) AS BIGINT) AS _wgt
  FROM _counts
), _tot AS (
  SELECT SUM(_wgt) AS _sw, SUM(_n) AS _tn FROM _w
), _thr AS (
  SELECT _g,
         LEAST((((_tn // {int(target_fraction_denom)}) * _wgt // _sw)
                * {SHUFFLE_M}) // _n,
               {SHUFFLE_M}) AS _t
  FROM _w, _tot
)
SELECT {src}.* FROM {src} JOIN _thr ON {src}.{group_col} = _thr._g
WHERE {h} < _thr._t
"""


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    seed: int = 41,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    A-ES): rank every row by ``ln(u) / w`` with ``u`` uniform on (0,1]
    and keep the k largest — exactly equivalent to drawing k items
    sequentially with probability ∝ weight, but embarrassingly parallel
    and single-pass.  Completes the sampling tier next to per-group
    quotas (uniform) and hash-threshold Bernoulli (independent): this is
    the "fixed k, weight-proportional" variant.

    ``u = (lcg_hash(id, seed) + 1) / 2³¹`` — the portable keyed LCG, so
    the oracle reproduces the draw bit-for-bit; natural log and division
    are IEEE-identical across engines (same discipline as the BM25 idf).
    Non-positive weights are rejected rows (never sampled), matching the
    sequential algorithm's domain.

    Plan shape: narrow key computation in the scan stage, then
    TakeOrderedAndProject — no global sort, no shuffle of the corpus.
    """
    u = (shuffle_hash(F.col(id_col).cast("long"), seed) + 1) / F.lit(
        float(SHUFFLE_M)
    )
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), id_col)
        .limit(k)
    )


def weighted_sample_sql(
    table: str, weight_col: str, k: int, id_col: str, seed: int = 41
) -> str:
    """The same draw as ANSI/DuckDB SQL (oracle side)."""
    h = shuffle_hash_sql(id_col, seed)
    key = f"ln((({h}) + 1) / {float(SHUFFLE_M)!r}) / {weight_col}"
    return (
        f"SELECT *, {key} AS _wkey FROM {table} WHERE {weight_col} > 0 "
        f"ORDER BY _wkey DESC, {id_col} LIMIT {k}"
    )


def select_to_token_budget(
    df: DataFrame,
    group_col: str,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 31,
) -> DataFrame:
    """Pretraining-mix selection under per-group TOKEN budgets: within
    each group, documents are ranked by the portable seeded hash (the
    same deterministic order every sampler here uses) and kept while
    the group's RUNNING token total stays ≤ its budget — the greedy
    prefix; the document that would cross the budget is dropped, so the
    selection always fits.  Groups absent from ``budgets`` are dropped
    entirely (budget 0).

    This is the budget-denominated twin of ``weighted_repeat``: mixes
    are specified in tokens, not documents, when feeding a trainer with
    a fixed token count per source/language.

    Scale: one hash exchange on ``group_col`` + a bounded running-sum
    window per group; no joins, no Python.  Returns the kept rows with
    ``n_tokens`` and the running ``cum_tokens``.

    ``id_col`` must cast cleanly to long (same contract as
    ``selection.gumbel_topk``): a NULL cast would hash to NULL and sort
    FIRST under the window order, silently handing those rows the
    budget prefix — so the rank key raises per-row instead."""
    from ..functions.text import token_count

    budget_expr = None
    for g, b in budgets.items():
        c = F.when(F.col(group_col) == g, F.lit(int(b)))
        budget_expr = c if budget_expr is None else budget_expr.when(
            F.col(group_col) == g, F.lit(int(b))
        )
    budget_expr = (
        budget_expr.otherwise(F.lit(0)) if budget_expr is not None else F.lit(0)
    )
    from .split import checked_long_id

    idl = checked_long_id(id_col, "select_to_token_budget")
    w = (
        Window.partitionBy(group_col)
        .orderBy(shuffle_hash(idl, seed), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return staged.filter(F.col("cum_tokens") <= budget_expr)
