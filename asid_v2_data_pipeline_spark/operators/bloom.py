"""Pure-Spark Bloom filter: build as an aggregation, probe as a column
expression (SURVEY.md §2.11 adjunct — semi-join pruning at 100 TB).

Why not ``df.stat.bloomFilter``: that returns a JVM sketch object on the
driver that can only be probed through py4j (driver-side, row-at-a-time)
or a jar UDF — neither survives a 1000-executor plan.  Here both sides
stay in the SQL engine:

- **build**: each item emits ``k`` bit positions (``pmod(xxhash64(item,
  seed_i), m)``); positions group by 64-bit word index and ``bit_or``
  into words — one keyed exchange over at most ``m/64`` groups, then a
  driver collect of exactly ``ceil(m/64)`` longs (metadata-sized: 1 %
  fpp over 100 M items is ~114 MB of words, over 10 k benchmark grams
  ~12 kB).  This is the standard bounded driver carve-out, same as the
  k-means centroid tables.
- **probe**: the word array ships as ONE broadcast row (cross-join with
  a single-row DataFrame — BroadcastNestedLoopJoin over one row is
  free), and membership is ``k`` ``element_at`` + shift/AND expressions —
  whole-stage codegen, no Python, no shuffle.  A probe that fails drops
  the row BEFORE any downstream exchange: that is the point.

Use case (see ``operators.decontam.contamination_bloom``): when the
benchmark n-gram set outgrows the broadcast-hash-join threshold, the
corpus⋈benchmark equi-join becomes a shuffle join whose corpus side is
~the whole corpus, exploded.  A Bloom prefilter keeps the exact join —
no false negatives, identical results — but only bloom-positive corpus
grams (true hits + ~fpp of the rest) reach the exchange.

Spark's own runtime bloom (``spark.sql.optimizer.runtime.bloomFilter``)
does this automatically ONLY for joins whose creation side is under
``creationSideThreshold`` and it cannot persist the filter across jobs;
this one is explicit, sizable, and reusable (the word array is a value —
persist it next to the index tables).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomSpec:
    """A built Bloom filter: ``m`` bits in ``ceil(m/64)`` words, ``k``
    probe seeds.  ``words`` is dense (zero-filled where no bit is set)."""

    m: int
    k: int
    words: tuple[int, ...]

    @property
    def n_words(self) -> int:
        return (self.m + 63) // 64


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m, k) for ``n_items`` at target ``fpp`` (standard
    formulas; m rounded up to a multiple of 64)."""
    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(item: Column, m: int, k: int) -> list[Column]:
    """k bit positions per item: pmod(xxhash64(item, seed), m).  The
    seed rides as a second hashed column — xxhash64 mixes all args."""
    return [F.pmod(F.xxhash64(item, F.lit(i)), F.lit(m)) for i in range(k)]


def build_bloom(
    df: DataFrame, col: str, n_items: int | None = None, fpp: float = 0.01
) -> BloomSpec:
    """Aggregate a column into a BloomSpec.

    ``n_items`` sizes the filter; when None a count() pass measures it
    (one extra job — pass the known cardinality at scale).  The build is
    one explode (k rows per item) + one groupBy(word) bit_or — the only
    exchange carries ≤ m/64 groups — then a bounded collect.
    """
    if n_items is None:
        n_items = df.select(col).distinct().count()
    m, k = bloom_params(n_items, fpp)
    item = F.col(col)
    pos = F.explode(F.array(*_positions(item, m, k))).alias("_pos")
    rows = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))").alias(
                "_b"
            ),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_word"))
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for r in rows:
        words[int(r["_w"])] = int(r["_word"])
    return BloomSpec(m=m, k=k, words=tuple(words))


def with_bloom_words(spark: SparkSession, df: DataFrame, spec: BloomSpec) -> DataFrame:
    """Attach the word array as ONE broadcast row (column ``_bloom``).

    At 100 TB the array is data, not plan: a literal array would inline
    ``m/64`` longs into every serialized plan fragment; a broadcast
    single-row cross join ships it once per executor."""
    one = spark.createDataFrame([(list(spec.words),)], "_bloom: array<bigint>")
    return df.crossJoin(F.broadcast(one))


def might_contain(item: Column, spec: BloomSpec, words_col: str = "_bloom") -> Column:
    """Membership test column (AND of k bit probes) against the word
    array attached by :func:`with_bloom_words`.  No false negatives.

    ``getbit(word, pos)`` keeps the probe in whole-stage codegen with a
    column-valued bit position (shiftright* in the Python API only takes
    literal shift amounts)."""
    cond = F.lit(True)
    for p in _positions(item, spec.m, spec.k):
        word = F.element_at(F.col(words_col), (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return cond


def bloom_prefilter(
    df: DataFrame, col: str, spec: BloomSpec, spark: SparkSession | None = None
) -> DataFrame:
    """Keep rows whose ``col`` is bloom-positive (true members plus
    ~fpp of non-members).  Original columns preserved."""
    spark = spark or df.sparkSession
    attached = with_bloom_words(spark, df, spec)
    return attached.filter(might_contain(F.col(col), spec)).drop("_bloom")
