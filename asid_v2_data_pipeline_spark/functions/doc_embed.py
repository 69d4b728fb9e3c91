"""Deterministic document embeddings from text (SURVEY.md §2.11 glue).

The embedding-side operators (semantic dedup, ANN, clustering) take an
``array<double>`` column from wherever it comes; real pipelines get it
from a neural encoder (not available in-engine).  This module provides
the classical in-engine fallback — L2-normalized hashed bag-of-words —
so the text table can flow into every embedding operator end-to-end,
deterministically, with a DuckDB-expressible definition
(``dd_semantic_text`` is the oracle-checked composition).

Shape: a zero-shuffle narrow map.  The fold is O(ntok·dim) in
expression form — fine at dim ≤ 64; production swaps in the Arrow
pandas-UDF kernel (same values, NumPy scatter-add) past that, exactly
like the ``ivf_assign`` form ladder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import token_hashes


def hashed_bow_embedding(text: Column, dim: int = 32) -> Column:
    """L2-normalized hashed token-count vector: counts over
    ``pmod(token_hash, dim)``, then divided by the vector norm (all-zero
    for empty text)."""
    th = token_hashes(text)
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda f: F.size(F.filter(th, lambda h: F.pmod(h, F.lit(dim)) == f))
        .cast("double"),
    )
    # bind counts once, then the norm once (nested single-element
    # transform bindings — the repo's bind-once HOF discipline), so the
    # dim filters and the norm fold each evaluate exactly once per row
    def _normalized(c: Column) -> Column:
        n = F.sqrt(
            F.aggregate(c, F.lit(0.0).cast("double"), lambda a, x: a + x * x)
        )
        return F.element_at(
            F.transform(
                F.array(n),
                lambda nn: F.transform(
                    c,
                    lambda v: F.when(nn > 0, v / nn).otherwise(F.lit(0.0)),
                ),
            ),
            1,
        )

    return F.element_at(F.transform(F.array(counts), _normalized), 1)


def with_doc_embeddings(
    df: DataFrame, text_col: str, dim: int = 32, out_col: str = "embedding"
) -> DataFrame:
    return df.withColumn(out_col, hashed_bow_embedding(F.col(text_col), dim))
