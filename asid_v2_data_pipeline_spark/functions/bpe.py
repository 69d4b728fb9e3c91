"""BPE tokenizer training support (SURVEY.md §2.11 adjunct).

Training a BPE vocabulary over a 100 TB corpus is two different scale
regimes, and the operator split mirrors that:

- **Corpus → word-frequency table**: the only pass that touches the
  corpus.  One explode + one map-side-combinable groupBy(word) — after
  it, everything operates on the VOCABULARY table (≤ ~10⁸ rows at web
  scale: a DataFrame, not driver state, but 6+ orders smaller than the
  corpus).
- **Merge loop over the vocabulary**: per merge step, one bounded
  aggregation (adjacent-pair counts weighted by word frequency; the
  key space is the live pair set) and a ONE-ROW driver collect (the
  argmax pair), then a narrow symbol-rewrite map.  The corpus is never
  touched again.

Greedy leftmost merge application and lexicographic tie-breaks make the
whole loop deterministic — pinned against a pure-Python reference in
tests/test_bpe.py; the first-step pair counts are oracle-checked
(``tx_bpe_pairs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent symbol pairs of a symbol array, as 'a b' strings."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_symbols(word_freqs: DataFrame) -> DataFrame:
    """Initial symbol table: each word split into single characters."""
    return word_freqs.withColumn(
        "syms", F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    )


def pair_counts(symbol_table: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair frequencies over the symbol table,
    weighted by word frequency.  The exchange's key space is the live
    pair set (alphabet² at step 0, shrinking as merges consume pairs)."""
    return (
        symbol_table.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("_p")
        )
        .groupBy("_p")
        .agg(F.sum("freq").alias("cnt"))
        .select(
            F.split_part(F.col("_p"), F.lit(" "), F.lit(1)).alias("a"),
            F.split_part(F.col("_p"), F.lit(" "), F.lit(2)).alias("b"),
            "cnt",
        )
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost merge of adjacent (a, b) -> 'ab' via a struct-
    accumulator fold: carry (emitted array, pending symbol); a pending
    ``a`` followed by ``b`` emits the merged token and clears."""
    merged = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("pend"),
        F.lit(False).alias("has"),
    )

    def step(acc, s):
        hit = acc["has"] & (acc["pend"] == a) & (s == b)
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit("").alias("pend"),
                F.lit(False).alias("has"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("pend"),
                F.lit(True).alias("has"),
            )
        )

    return F.aggregate(
        syms,
        acc0,
        step,
        lambda acc: F.when(
            acc["has"], F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"]),
    )


def train_bpe_merges(
    df: DataFrame, text_col: str, num_merges: int
) -> list[tuple[str, str]]:
    """The BPE merge list: ``num_merges`` iterations of (bounded pair
    aggregate → one-row argmax collect → narrow symbol rewrite) over the
    vocabulary table.  Ties break by (count desc, a, b) — deterministic.
    The symbol table is localCheckpointed per step (at scale: a
    persisted vocab table) so lineage stays flat."""
    table = with_symbols(word_frequencies(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            pair_counts(table)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        table = table.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint()
    return merges


def encode_words(
    df: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a trained merge list to a word column: chars → merges in
    training order → ``syms`` array.  A narrow map (merge list rides in
    the plan; at production vocab sizes encode via a pandas UDF with the
    merge ranks in the closure)."""
    syms = F.filter(F.split(F.col(word_col), ""), lambda c: c != "")
    for a, b in merges:
        syms = _apply_merge(syms, a, b)
    return df.withColumn("syms", syms)
