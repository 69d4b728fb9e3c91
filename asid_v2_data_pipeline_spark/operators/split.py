"""Shuffle / split / batching operators (SURVEY.md §2.7 O2-O4, §2.8 B1).

The reference shuffles an id list and slices it ``[:int(n*p)]``
(/root/reference/asip_v2/utility.py:167-179, pinned
tests/test_utility.py:108-116) — an *exact-count* split, unlike Spark's
probabilistic ``randomSplit``.  We provide the deterministic analogue so
oracle hashes are stable, plus drop-last batch numbering
(data_generator.py:20-22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# Two LCG rounds mod 2^31 (glibc constants).  Max intermediate is
# (2^31-1)*1103515245 < 2^62 — no 64-bit overflow in Spark OR DuckDB, so
# the identical arithmetic runs in both engines (seeded rand() does not:
# it is engine- and partitioning-specific).
SHUFFLE_A = 1103515245
SHUFFLE_C = 12345
SHUFFLE_M = 1 << 31


def shuffle_hash(key, seed: int):
    """Portable keyed shuffle hash: deterministic permutation key for a
    non-negative integer id, reproducible in ANSI SQL —
    ``h = lcg(lcg(id + seed))`` with ``lcg(x) = (x*A + C) mod 2^31``.

    The reference only requires *a* deterministic permutation of the id
    list (utility.py:172-175, random.seed + random.shuffle), not
    Mersenne-Twister specifically."""
    h1 = (key % SHUFFLE_M + F.lit(seed)) % SHUFFLE_M
    h1 = (h1 * SHUFFLE_A + SHUFFLE_C) % SHUFFLE_M
    return (h1 * SHUFFLE_A + SHUFFLE_C) % SHUFFLE_M


def checked_long_id(id_col: str, context: str):
    """``id_col`` as a long, raising PER-ROW on NULL or non-castable
    values — the guard every seeded-hash consumer needs: a NULL key
    would make ``shuffle_hash`` NULL and those rows silently sort
    first (ascending) or last (descending) instead of erroring.
    Shared by ``selection.gumbel_topk`` and
    ``sampling.select_to_token_budget``."""
    idl = F.col(id_col).try_cast("long")
    return F.when(
        F.col(id_col).isNull() | idl.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{context}: {id_col} must be numeric "
                    "(long-castable) and non-NULL; got "
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(idl)


def shuffle_hash_sql(key_expr: str, seed: int) -> str:
    """The same permutation key as ANSI/DuckDB SQL text (oracle side)."""
    h1 = f"(({key_expr}) % {SHUFFLE_M} + {seed}) % {SHUFFLE_M}"
    h1 = f"(({h1}) * {SHUFFLE_A} + {SHUFFLE_C}) % {SHUFFLE_M}"
    return f"(({h1}) * {SHUFFLE_A} + {SHUFFLE_C}) % {SHUFFLE_M}"


def shuffled(df: DataFrame, seed: int, id_col: str | None = None) -> DataFrame:
    """O2 — deterministic shuffle; re-invoke with a new seed for epoch-end
    reshuffle (data_generator.py:43-47).

    With ``id_col``: order by the portable ``shuffle_hash`` of the id —
    engine-independent, so the DuckDB oracle reproduces it exactly.
    Without: order by ``xxhash64(all columns, seed)`` — still fully
    deterministic (unlike ``rand(seed)``, whose output depends on the
    partition layout), just not oracle-portable."""
    if id_col is not None:
        return df.orderBy(
            shuffle_hash(F.col(id_col).cast("long"), seed), id_col, *df.columns
        )
    return df.orderBy(F.xxhash64(*df.columns, F.lit(seed)), *df.columns)


_NUMERIC_TYPES = ("byte", "short", "int", "bigint", "float", "double", "long")


def _order_boundaries(
    df: DataFrame, col: str, n_buckets: int = 64, sample_rows: int = 4096
) -> list:
    """Order-aligned bucket boundaries for an arbitrary sort key, returned
    as plain Python values to embed as literals.

    Accuracy is irrelevant to correctness — any monotone bucketing yields
    the same global numbering (skewed boundaries only cost parallelism) —
    so approximate quantiles (numeric) or a bounded sample (other
    orderable types) are exact-safe here."""
    dtype = dict(df.dtypes)[col]
    if dtype in _NUMERIC_TYPES or dtype.startswith("decimal"):
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.stat.approxQuantile(col, probs, 0.01)
    else:
        vals = sorted(
            r[0]
            for r in df.select(col).dropna().sample(False, 0.5, seed=7)
            .limit(sample_rows).collect()
        )
        step = max(1, len(vals) // n_buckets)
        bounds = vals[step::step]
    out: list = []
    for b in bounds:  # dedupe, keep order
        if b is not None and (not out or b > out[-1]):
            out.append(b)
    return out


def _bucket_of(key, boundaries: list):
    """#boundaries <= key — a pure, deterministic, monotone bucket id.
    NULL keys compare NULL against every boundary and land in bucket 0,
    matching Spark's default ASC NULLS FIRST sort position."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.aggregate(
        arr, F.lit(0), lambda acc, b: acc + F.when(key >= b, 1).otherwise(0)
    )


def _global_row_number(df: DataFrame, order_exprs: list, bucket):
    """Two-phase global row numbering (VERDICT r2 task 1) — the
    zipWithIndex pattern in DataFrame algebra, replacing the former
    single-partition ``Window.orderBy`` funnel.

    Phase 1: count rows per order-aligned bucket — one parallel aggregate
    whose result is <= #buckets rows, collected driver-side (the same
    metadata-scale carve-out as the sampling/centroid two-phase ops).
    Phase 2: ``row_number`` within each bucket (a *partitioned* window —
    ``Exchange hashpartitioning(_bucket)``, never ``SinglePartition``)
    plus the bucket's literal offset.

    The bucket id is a pure expression of the row, so both phases see
    identical assignments and the numbering is bit-identical to a global
    sort.  Returns ``(df with 1-based _rn, total row count)``."""
    b = df.withColumn("_bucket", bucket.cast("int"))
    counts = {
        r["_bucket"]: r["_n"]
        for r in b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    n_buckets = (max(counts) + 1) if counts else 1
    offsets, acc = [], 0
    for i in range(n_buckets):
        offsets.append(acc)
        acc += counts.get(i, 0)
    off = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), F.col("_bucket") + 1
    )
    w = Window.partitionBy("_bucket").orderBy(*order_exprs)
    out = (
        b.withColumn("_rn", (F.row_number().over(w) + off).cast("long"))
        .drop("_bucket")
    )
    return out, acc


def fraction_split(
    df: DataFrame,
    fraction: float,
    seed: int = 0,
    id_col: str | None = None,
    order_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """O3 — exact-count head/tail split: first ``floor(n * fraction)`` rows
    train, rest validation (utility.py:174-175), over either a seeded
    shuffle order (default) or explicit ``order_cols``.

    Numbering is two-phase (``_global_row_number``): the uniform hash keys
    bucket statically by their top bits; explicit sort keys bucket by
    literal approx-quantile boundaries.  Exact and deterministic either
    way — no single-partition sort anywhere in the plan."""
    if order_cols:
        order_exprs = [F.col(c) for c in order_cols]
        bucket = _bucket_of(
            F.col(order_cols[0]), _order_boundaries(df, order_cols[0])
        )
    elif id_col is not None:
        h = shuffle_hash(F.col(id_col).cast("long"), seed)
        order_exprs = [h, F.col(id_col), *[F.col(c) for c in df.columns]]
        bucket = F.shiftright(h, 23)  # hash < 2^31 -> 256 aligned buckets
    else:
        h = F.xxhash64(*df.columns, F.lit(seed))
        order_exprs = [h, *[F.col(c) for c in df.columns]]
        bucket = F.shiftright(h, 56) + F.lit(128)  # signed int64 -> 256
    ranked, n = _global_row_number(df, order_exprs, bucket)
    k = int(n * fraction)
    train = ranked.filter(F.col("_rn") <= k).drop("_rn")
    val = ranked.filter(F.col("_rn") > k).drop("_rn")
    return train, val


def drop_last_batches(df: DataFrame, batch_size: int, order_cols: list[str]) -> DataFrame:
    """O4/B1 — keep only full batches (``floor(n/bs)`` of them; remainder
    rows never served — data_generator.py:20-22) and tag each row with its
    batch index.  Global numbering is two-phase (see
    ``_global_row_number``) — no single-partition sort."""
    order_exprs = [F.col(c) for c in order_cols]
    bucket = _bucket_of(F.col(order_cols[0]), _order_boundaries(df, order_cols[0]))
    ranked, n = _global_row_number(df, order_exprs, bucket)
    keep = (n // batch_size) * batch_size
    return (
        ranked.withColumn("_rn0", F.col("_rn") - 1)
        .filter(F.col("_rn0") < keep)
        .withColumn("batch_id", (F.col("_rn0") / batch_size).cast("int"))
        .drop("_rn", "_rn0")
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    val_pct: int = 20,
    seed: int = 23,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Group-aware train/val split with a NEAR-DUP LEAKAGE GUARD: a
    plain per-document split puts near-duplicates of training docs into
    the eval set (Lee et al. 2022 measure the resulting eval
    contamination), so the split key here is the document's near-dup
    CLUSTER, not the document — MinHash-LSH pairs → connected
    components → every doc keyed by its cluster's canonical (minimum)
    id, singletons by their own id — and the side is
    ``shuffle_hash(root, seed) % 100 < val_pct``.  Whole clusters land
    on one side by construction (invariant-tested).

    Returns ``(id, cluster_id, split)``.  Scale shape: pair generation
    is the banded LSH equi-join, components are O(log d) pointer-jump
    rounds, the root join hash-partitions on the id, and the split
    itself is a narrow map — nothing new shuffles beyond the dedup
    machinery this engine already runs."""
    from .dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_perm, bands, shingle_n
    )
    cc = connected_components(pairs).withColumnRenamed("node", id_col)
    rooted = docs.select(id_col).join(cc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("label", F.col(id_col)).alias("cluster_id"),
    )
    side = F.when(
        shuffle_hash(F.col("cluster_id"), seed) % 100 < F.lit(val_pct),
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return rooted.select(id_col, "cluster_id", side.alias("split"))
