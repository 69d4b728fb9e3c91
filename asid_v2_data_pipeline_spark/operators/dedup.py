"""Deduplication operators for 100 TB training corpora (SURVEY.md §2.11).

Four tiers, cheapest first:

- **exact**: hash-groupBy on a normalized key — one shuffle, map-side
  combinable.
- **MinHash + LSH**: shingle → k permutation-hash minima → band buckets →
  candidate pairs only within buckets (no all-pairs O(n²) join).  The
  band-bucket groupBy is the only shuffle; skewed buckets are AQE-split.
- **SimHash**: 32-bit weighted-sign fingerprint; near-dups = small Hamming
  distance (bit_count(xor)).
- **n-gram Jaccard**: exact set similarity via shingle explode +
  equi-join on shingle — the verifier for MinHash candidates.

All hashing is deterministic integer arithmetic (portable to the DuckDB
oracle).  MinHash permutations: ``h_i(x) = (a_i·x + b_i) mod p`` with fixed
odd constants — standard universal hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import MASK31, shingles

MERSENNE31 = (1 << 31) - 1


def _perm_constants(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a small LCG (no RNG dependency)."""
    out, state = [], seed
    for _ in range(num_perm):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state | 1) % MERSENNE31 or 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % MERSENNE31
        out.append((a, b))
    return out


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Exact dedup: keep the first row (by ``order_col``) per key.

    row_number over the key — one shuffle on the dedup key; at scale
    prefer this over ``dropDuplicates`` for a deterministic survivor."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct shingle hash set (31-poly char hash per shingle)."""
    return F.array_distinct(
        F.transform(
            shingles(text, n),
            lambda s: F.aggregate(
                F.split(s, ""),
                F.lit(0).cast("long"),
                lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(MASK31 + 1),
            ),
        )
    )


def minhash_signature(text: Column, num_perm: int = 16, n: int = 3) -> Column:
    """MinHash signature: array of per-permutation minima over the shingle
    hash set."""
    hs = shingle_hashes(text, n)
    mins = [
        F.array_min(
            F.transform(hs, lambda x, a=a, b=b: (x * a + b) % F.lit(MERSENNE31))
        )
        for a, b in _perm_constants(num_perm)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs sharing any band bucket.

    Shuffle profile: one groupBy on (band, bucket_hash) — candidates only,
    never all pairs.  Returns distinct (id_a, id_b) with id_a < id_b.
    """
    rows = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"), minhash_signature(F.col(text_col), num_perm, n).alias("_sig")
    )
    band_rows = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.aggregate(
                        F.slice(F.col("_sig"), b * rows + 1, rows),
                        F.lit(0).cast("long"),
                        lambda acc, x: (acc * 31 + x) % F.lit(MASK31 + 1),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )
    a = band_rows.select(F.col("_id").alias("id_a"), "_band", "_bucket")
    b = band_rows.select(F.col("_id").alias("id_b"), "_band", "_bucket")
    pairs = (
        a.join(b, ["_band", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def simhash(text: Column, bits: int = 32, n: int = 3) -> Column:
    """SimHash fingerprint: sign of per-bit sums over shingle hashes.

    bit b of hash set {h}: popcount-style vote — bit set iff
    #{h: bit b of h set} > len/2."""
    hs = shingle_hashes(text, n)
    total = F.size(hs)
    bit_cols = []
    for b in range(bits):
        ones = F.size(F.filter(hs, lambda x: x.bitwiseAND(F.lit(1 << b)) != 0))
        bit_cols.append(F.when(ones * 2 > total, F.lit(1 << b)).otherwise(F.lit(0)).cast("long"))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Explode shingles → equi-join on shingle → |∩| per pair →
    |∪| = |A|+|B|-|∩|.  The shingle join only pairs docs that share
    content, so the blow-up is bounded by shingle frequency (cap hot
    shingles upstream if needed)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("_sh"),
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))
    a = sh.select(F.col("_id").alias("id_a"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_sz", "_sza"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_sz", "_szb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
