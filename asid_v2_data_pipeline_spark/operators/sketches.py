"""Mergeable sketches for 100 TB aggregation (SURVEY.md §2.11 adjunct).

Exact `groupBy(token)` over a 100 TB corpus shuffles the full token
stream; the sketch tier trades bounded error for bounded state:

- **Count-Min Sketch**: ``depth`` hashed count rows of ``width``
  buckets — a (depth·width)-cell table that answers point frequency
  queries with one-sided error ≤ ε·N (ε = e/width) at confidence
  1−δ (δ = e^−depth).  The build is ONE map-side-combinable groupBy
  whose key space is depth·width (bounded, unlike the token space);
  sketches MERGE by cell-wise addition, so per-partition / per-day
  sketches roll up without touching raw data again.
- **HyperLogLog**: ``m = 2^p`` registers of max leading-zero ranks —
  approximate distinct counts with ~1.04/√m relative error in
  m·6 bits of state.  The build is one groupBy over ≤ m register
  groups; merge = register-wise MAX.

Both use the repo's PORTABLE integer hashing (31-poly char fold +
LCG-constant universal permutations — the MinHash discipline), so the
DuckDB oracles re-derive every cell and register bit-for-bit: the
sketches are value-checked, not just tolerance-checked.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MERSENNE31, _perm_constants

MASK31 = (1 << 31) - 1


def _permuted(h: Column, a: int, b: int) -> Column:
    """Universal permutation h -> (a·h + b) mod p (p = 2³¹−1), the same
    family MinHash uses — engine-portable integer arithmetic."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def permuted_sql(h: str, a: int, b: int) -> str:
    return f"(({h}) * {a} + {b}) % {MERSENNE31}"


# --- Count-Min Sketch ---------------------------------------------------------


def cms_build(
    items: DataFrame, hash_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build the sketch table ``(_d, _bucket, cnt)`` from a column of
    non-negative item hashes (one row per item OCCURRENCE).

    One exchange, key space ``depth·width`` — at 100 TB this is the
    whole point: the shuffle carries bounded keys regardless of corpus
    vocabulary.  Merge two sketches (same width/depth/seeds) by
    unioning and summing ``cnt`` per cell."""
    consts = _perm_constants(depth, seed=97)
    h = F.col(hash_col)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("_d"),
                        (_permuted(h, a, b) % F.lit(width)).alias("_bucket"),
                    )
                    for d, (a, b) in enumerate(consts)
                ]
            )
        ).alias("_c")
    )
    return (
        rows.select("_c._d", "_c._bucket")
        .groupBy("_d", "_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    hash_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for the query items: per item, the MIN
    over the ``depth`` cells its hash lands in (missing cell = 0).
    The query side fans out ``depth`` rows per item and broadcast-joins
    the (bounded) sketch — never the raw data."""
    consts = _perm_constants(depth, seed=97)
    h = F.col(hash_col)
    probes = queries.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("_d"),
                        (_permuted(h, a, b) % F.lit(width)).alias("_bucket"),
                    )
                    for d, (a, b) in enumerate(consts)
                ]
            )
        ).alias("_c"),
    ).select("*", "_c._d", "_c._bucket").drop("_c")
    qcols = [c for c in queries.columns]
    joined = probes.join(F.broadcast(sketch), ["_d", "_bucket"], "left")
    return (
        joined.withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(*qcols)
        .agg(F.min("cnt").alias("est"))
    )


def cms_sql(
    src: str, hash_expr: str, width: int, depth: int, tag: str = ""
) -> str:
    """CTE twin of cms_build over ``src`` (one row per occurrence):
    final CTE ``cms{tag}(_d, _bucket, cnt)``."""
    consts = _perm_constants(depth, seed=97)
    arms = " UNION ALL ".join(
        f"SELECT {d} AS _d, ({permuted_sql('h', a, b)}) % {width} AS _bucket "
        f"FROM h{tag}"
        for d, (a, b) in enumerate(consts)
    )
    return f"""
h{tag} AS (SELECT {hash_expr} AS h FROM {src}),
cmsrows{tag} AS ({arms}),
cms{tag} AS (
  SELECT _d, _bucket, COUNT(*) AS cnt FROM cmsrows{tag} GROUP BY _d, _bucket
)"""


# --- log-bucket histogram (mergeable approximate quantiles) -------------------

HIST_MAX_BITS = 41  # values up to ~2.2e12 scaled units


def _fixed_point(value: Column, scale: int) -> Column:
    """Non-negative double -> scaled long (floor).  Integer from here
    on: bucketing never touches float log, so both engines agree at
    every power-of-two boundary (the HLL rank-ladder lesson)."""
    return F.floor(value * F.lit(scale)).cast("long")


def _hist_bucket(v: Column, value_col: str) -> Column:
    """Power-of-two bucket of the fixed-point value, with a LOUD
    overflow guard (ADVICE r5): a value whose fixed point exceeds the
    rank ladder's 2^HIST_MAX_BITS range must raise, not silently clamp
    into the top bucket — clamping caps upper-tail quantiles of
    wide-range data at ~2^40/scale with no warning.  Out-of-range data
    wants a larger HIST_MAX_BITS or a smaller ``scale``, both explicit
    choices.  (Negatives raise upstream contracts — filter first; the
    bucket for them here is 0 like zero, kept for NULL-safety of the
    when-ladder.)"""
    return (
        F.when(
            v >= F.lit(1 << HIST_MAX_BITS),
            F.raise_error(
                F.concat(
                    F.lit(
                        "log_histogram overflow: floor(value*scale) >= "
                        f"2^{HIST_MAX_BITS} for value="
                    ),
                    F.col(value_col).cast("string"),
                    F.lit("; lower scale= or raise HIST_MAX_BITS"),
                )
            ).cast("int"),
        )
        .when(v <= 0, F.lit(0))
        .otherwise(F.lit(HIST_MAX_BITS + 1) - _rank_expr(v, HIST_MAX_BITS))
    )


def log_histogram(
    items: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Mergeable quantile sketch: count per power-of-two bucket of the
    fixed-point value — ``_bucket = bit_length(floor(v*scale))`` via
    the integer CASE ladder (bucket 0 = value 0; negatives raise
    upstream contracts — filter first).  ≤ ``HIST_MAX_BITS`` + 1 groups
    total, additive merge (cell-wise sum — composes with
    ``maintain_rollup`` exactly like the CMS), so per-day / per-source
    histograms roll up without raw retention."""
    v = _fixed_point(F.col(value_col), scale)
    # bit_length via the rank ladder: rank r means leftmost 1 at
    # position r (1-based from the TOP of a HIST_MAX_BITS window), so
    # bit_length = HIST_MAX_BITS + 1 - r; v == 0 -> bucket 0
    bucket = _hist_bucket(v, value_col)
    return (
        items.select(bucket.alias("_bucket"))
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, quantiles: list[float], scale: int = 100
) -> DataFrame:
    """Quantile estimates from a log-bucket histogram: nearest-rank
    over the cumulative bucket counts, estimate = the bucket's
    geometric midpoint ``1.5 * 2^(b-1) / scale`` (0 for bucket 0).
    Relative error is bounded by the bucket ratio (×2 buckets → ≤ ~50%
    of the true value; tighten with a larger log base at more state).
    Closed-form integer/double arithmetic — portable."""
    from pyspark.sql.window import Window

    w = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = hist.withColumn("_cum", F.sum("cnt").over(w))
    total = hist.agg(F.sum("cnt").alias("_n"))
    cc = c.crossJoin(F.broadcast(total))
    mid = F.when(F.col("_bucket") == 0, F.lit(0.0)).otherwise(
        F.lit(1.5) * F.pow(F.lit(2.0), F.col("_bucket") - 1) / F.lit(float(scale))
    )
    aggs = []
    for q in quantiles:
        rank = F.ceil(F.lit(float(q)) * F.col("_n"))
        aggs.append(
            F.round(
                F.min(F.when(F.col("_cum") >= rank, mid)), 6
            ).alias(f"p{int(q * 100)}")
        )
    return cc.agg(*aggs)


def log_histogram_by(
    items: DataFrame, group_cols: list[str], value_col: str, scale: int = 100
) -> DataFrame:
    """Per-group log-bucket histograms: ``groups × ~42`` cells — the
    cube form; merge across time/partitions by cell-wise addition
    within the group."""
    v = _fixed_point(F.col(value_col), scale)
    bucket = _hist_bucket(v, value_col)
    return (
        items.select(*group_cols, bucket.alias("_bucket"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles_by(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    scale: int = 100,
) -> DataFrame:
    """Per-group quantile estimates from grouped histograms (same
    nearest-rank / geometric-midpoint arithmetic as the global form)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    c = hist.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_n", F.sum("cnt").over(wt)
    )
    mid = F.when(F.col("_bucket") == 0, F.lit(0.0)).otherwise(
        F.lit(1.5) * F.pow(F.lit(2.0), F.col("_bucket") - 1) / F.lit(float(scale))
    )
    aggs = [
        F.round(
            F.min(
                F.when(F.col("_cum") >= F.ceil(F.lit(float(q)) * F.col("_n")), mid)
            ),
            6,
        ).alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return c.groupBy(*group_cols).agg(*aggs)


def log_histogram_by_sql(
    src: str,
    group_cols: list[str],
    value_expr: str,
    quantiles: list[float],
    scale: int = 100,
    tag: str = "",
) -> str:
    """CTE twin of the grouped histogram + quantiles: final CTE
    ``histq{tag}(*group_cols, p..)``."""
    rank = _rank_sql("fx", HIST_MAX_BITS)
    g = ", ".join(group_cols)
    mid = (
        "CASE WHEN _bucket = 0 THEN 0.0 "
        f"ELSE 1.5 * POWER(2.0, _bucket - 1) / {float(scale)} END"
    )
    cols = ", ".join(
        f"ROUND(MIN(CASE WHEN _cum >= CEIL({float(q)} * _n) THEN {mid} END), 6)"
        f" AS p{int(q * 100)}"
        for q in quantiles
    )
    return f"""
ghfx{tag} AS (
  SELECT {g}, CAST(FLOOR(({value_expr}) * {scale}) AS BIGINT) AS fx FROM {src}
),
ghbk{tag} AS (
  SELECT {g}, CASE WHEN fx <= 0 THEN 0
                   ELSE {HIST_MAX_BITS + 1} - {rank} END AS _bucket
  FROM ghfx{tag}
),
ghist{tag} AS (
  SELECT {g}, _bucket, COUNT(*) AS cnt FROM ghbk{tag} GROUP BY {g}, _bucket
),
ghcum{tag} AS (
  SELECT {g}, _bucket, cnt,
         SUM(cnt) OVER (PARTITION BY {g} ORDER BY _bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         SUM(cnt) OVER (PARTITION BY {g}) AS _n
  FROM ghist{tag}
),
histq{tag} AS (SELECT {g}, {cols} FROM ghcum{tag} GROUP BY {g})"""


def log_histogram_sql(
    src: str, value_expr: str, scale: int = 100, tag: str = ""
) -> str:
    """CTE twin: final CTE ``hist{tag}(_bucket, cnt)``."""
    rank = _rank_sql("fx", HIST_MAX_BITS)
    return f"""
hfx{tag} AS (
  SELECT CAST(FLOOR(({value_expr}) * {scale}) AS BIGINT) AS fx FROM {src}
),
hbk{tag} AS (
  SELECT CASE WHEN fx <= 0 THEN 0
              ELSE {HIST_MAX_BITS + 1} - {rank} END AS _bucket
  FROM hfx{tag}
),
hist{tag} AS (SELECT _bucket, COUNT(*) AS cnt FROM hbk{tag} GROUP BY _bucket)"""


def histogram_quantiles_sql(
    hist_cte: str, quantiles: list[float], scale: int = 100
) -> str:
    """SELECT twin of histogram_quantiles over a hist CTE."""
    mid = (
        "CASE WHEN _bucket = 0 THEN 0.0 "
        f"ELSE 1.5 * POWER(2.0, _bucket - 1) / {float(scale)} END"
    )
    cols = ", ".join(
        f"ROUND(MIN(CASE WHEN _cum >= CEIL({float(q)} * _n) THEN {mid} END), 6)"
        f" AS p{int(q * 100)}"
        for q in quantiles
    )
    return f"""
SELECT {cols} FROM (
  SELECT _bucket, cnt,
         SUM(cnt) OVER (ORDER BY _bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
         SUM(cnt) OVER () AS _n
  FROM {hist_cte}
)"""


# --- HyperLogLog --------------------------------------------------------------

HLL_RANK_BITS = 25  # rank window for the default p=6 (31-bit hash - p)


def _hll_rank_bits(p: int) -> int:
    """Rank window for register-index width ``p``: the portable hash is
    31 bits, the register consumes ``p`` of them."""
    return 31 - p


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constants: fixed values for the small register
    counts, the asymptotic formula for m >= 128."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def _rank_expr(w: Column, maxbits: int) -> Column:
    """ρ(w) = position of the leftmost 1-bit in a ``maxbits``-wide
    word (1-based); all-zero → maxbits + 1.  Integer CASE ladder — no
    float log2, so both engines agree at every power-of-two boundary."""
    expr = F.lit(maxbits + 1)
    # build from the smallest threshold upward so higher bits win
    for r in range(maxbits, 0, -1):
        expr = F.when(w >= F.lit(1 << (maxbits - r)), F.lit(r)).otherwise(expr)
    return expr


def _rank_sql(w: str, maxbits: int) -> str:
    arms = " ".join(
        f"WHEN ({w}) >= {1 << (maxbits - r)} THEN {r}"
        for r in range(1, maxbits + 1)
    )
    return f"(CASE {arms} ELSE {maxbits + 1} END)"


def hll_registers(items: DataFrame, hash_col: str, p: int = 6) -> DataFrame:
    """Register table ``(_reg, _rank)``: register = low ``p`` bits of
    the (permuted) hash, rank = leftmost-1 position of the remaining
    ``HLL_RANK_BITS`` bits.  One groupBy over ≤ 2^p groups; merge two
    sketches by register-wise MAX."""
    h = _permuted(F.col(hash_col), *_perm_constants(1, seed=131)[0])
    reg = (h % F.lit(1 << p)).alias("_reg")
    rb = _hll_rank_bits(p)
    # shiftright, not float division: double-div + cast truncates in
    # Spark but ROUNDS in a DuckDB double->BIGINT cast — integer ops
    # only, so both engines floor identically
    w = F.shiftright(h, p) % F.lit(1 << rb)
    return (
        items.select(reg, _rank_expr(w, rb).alias("_r"))
        .groupBy("_reg")
        .agg(F.max("_r").alias("_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Bias-corrected HLL estimate from a register table: harmonic mean
    with the standard small-range (linear-counting) correction.  All
    closed-form double arithmetic — portable."""
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = registers.agg(
        # coalesce: an EMPTY register table (no items) must estimate 0,
        # not NULL — with _s=0 and zeros=m the linear-counting branch
        # yields exactly 0
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("_rank"))), F.lit(0.0)
        ).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nz")))
    zeros = F.lit(m) - F.col("_nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(F.round(est, 6).alias("estimate"))


def hll_registers_by(
    items: DataFrame, group_cols: list[str], hash_col: str, p: int = 6
) -> DataFrame:
    """Per-group register tables: ``(*group_cols, _reg, _rank)`` — one
    groupBy over at most ``groups × 2^p`` keys.  The per-group sketch
    state is what a 100 TB cube keeps instead of per-group distinct
    sets; merge across time/partitions by register-wise MAX within the
    group."""
    h = _permuted(F.col(hash_col), *_perm_constants(1, seed=131)[0])
    rb = _hll_rank_bits(p)
    w = F.shiftright(h, p) % F.lit(1 << rb)
    return (
        items.select(
            *group_cols,
            (h % F.lit(1 << p)).alias("_reg"),
            _rank_expr(w, rb).alias("_r"),
        )
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_r").alias("_rank"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group estimates from grouped registers (same bias/linear
    correction as :func:`hll_estimate`)."""
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("_rank"))), F.lit(0.0)
        ).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nz")))
    zeros = F.lit(m) - F.col("_nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("estimate"))


def hll_by_sql(
    src: str, group_cols: list[str], hash_expr: str, p: int = 6, tag: str = ""
) -> str:
    """CTE twin of the grouped form: final CTE ``hllg{tag}``
    with ``(*group_cols, estimate)``."""
    m = 1 << p
    alpha = _hll_alpha(m)
    rb = _hll_rank_bits(p)
    a, b = _perm_constants(1, seed=131)[0]
    perm = permuted_sql("h", a, b)
    rank = _rank_sql("w", rb)
    g = ", ".join(group_cols)
    return f"""
ghh{tag} AS (SELECT {g}, {hash_expr} AS h FROM {src}),
ghp{tag} AS (SELECT {g}, {perm} AS ph FROM ghh{tag}),
ghr{tag} AS (
  SELECT {g}, ph % {m} AS _reg, (ph // {m}) % {1 << rb} AS w FROM ghp{tag}
),
ghregs{tag} AS (
  SELECT {g}, _reg, MAX({rank}) AS _rank FROM ghr{tag} GROUP BY {g}, _reg
),
ghagg{tag} AS (
  SELECT {g}, COALESCE(SUM(POWER(2.0, -_rank)), 0.0) AS s, COUNT(*) AS nz
  FROM ghregs{tag} GROUP BY {g}
),
hllg{tag} AS (
  SELECT {g}, ROUND(
    CASE WHEN ({alpha} * {m} * {m}) / (s + ({m} - nz)) <= {2.5 * m}
              AND ({m} - nz) > 0
         THEN {float(m)} * ln({float(m)} / ({m} - nz))
         ELSE ({alpha} * {m} * {m}) / (s + ({m} - nz)) END, 6) AS estimate
  FROM ghagg{tag}
)"""


def hll_sql(src: str, hash_expr: str, p: int = 6, tag: str = "") -> str:
    """CTE twin: final CTE ``hll{tag}(estimate)``."""
    m = 1 << p
    alpha = _hll_alpha(m)
    rb = _hll_rank_bits(p)
    a, b = _perm_constants(1, seed=131)[0]
    perm = permuted_sql("h", a, b)
    rank = _rank_sql("w", rb)
    return f"""
hh{tag} AS (SELECT {hash_expr} AS h FROM {src}),
hp{tag} AS (SELECT {perm} AS ph FROM hh{tag}),
hr{tag} AS (
  SELECT ph % {m} AS _reg,
         (ph // {m}) % {1 << rb} AS w
  FROM hp{tag}
),
hregs{tag} AS (
  SELECT _reg, MAX({rank}) AS _rank FROM hr{tag} GROUP BY _reg
),
hagg{tag} AS (
  SELECT COALESCE(SUM(POWER(2.0, -_rank)), 0.0) AS s, COUNT(*) AS nz
  FROM hregs{tag}
),
hll{tag} AS (
  SELECT ROUND(
    CASE WHEN ({alpha} * {m} * {m}) / (s + ({m} - nz)) <= {2.5 * m}
              AND ({m} - nz) > 0
         THEN {float(m)} * ln({float(m)} / ({m} - nz))
         ELSE ({alpha} * {m} * {m}) / (s + ({m} - nz)) END, 6) AS estimate
  FROM hagg{tag}
)"""
