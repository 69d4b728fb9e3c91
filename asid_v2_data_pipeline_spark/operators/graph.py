"""Graph centrality over edge tables — PageRank by fixed-iteration
power method.

The corpus-curation use: link-graph centrality is a standard document-
quality prior at web scale (the original PageRank use case; harmonic/
centrality filtering appears in CommonCrawl-derived corpus pipelines),
and the engine already owns the other graph half (connected components
via pointer jumping in ``operators/dedup.py``).  This module adds the
iterative-algorithm shape: K joined aggregation rounds over an edge
table, the plan Spark's own GraphX/Pregel lowers to.

Scale shape: each iteration is ONE equi-join of the edge table with the
current rank table (both keyed on the source node) plus ONE keyed
aggregation on the destination — shuffle bytes per iteration are
O(|E| + |N|), never quadratic.  The edge and degree tables are
``localCheckpoint``-ed once and reused by every iteration (the
multiply-referenced-subtree rule from PLANS.md; at 100 TB these are the
persisted tables an offline job would write).  Ranks stay a DataFrame
end-to-end — no driver-side vectors, so |N| is unbounded.

Reference parity note: the reference pipeline has no graph operators
(its surface is raster scenes — /root/reference/asip_v2/archive.py);
this is SURVEY §2.11 large-scale-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Power-method PageRank: ``r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/deg(u)``
    for ``iters`` rounds from the uniform vector, over the node set
    {nodes with ≥1 out-edge}.  With ``weight`` set, a WEIGHTED walk:
    mass leaves ``u`` along each edge proportionally to its weight
    (``deg`` becomes the out-weight sum) — the standard weighted-
    PageRank form for graphs where edge multiplicity means something
    (transaction counts, link counts, co-occurrence strength).

    General directed input is supported: a node with out-edges but NO
    in-edges never appears as a ``dst``, so each round LEFT-joins the
    aggregated in-mass back onto the degree table and fills the missing
    rows with ``rank = (1-d)/N`` — those source-only nodes keep
    contributing their residual mass every round and appear in the
    output (they'd otherwise silently vanish after round one).

    Precondition (documented, not scanned-for): every node reachable by
    an in-edge must also carry an out-edge — i.e. the caller hands a
    dangling-free graph, e.g. by symmetrizing (undirected graphs have
    none).  With dangling (in-edge-only) nodes the leaked mass would
    need a per-iteration global scalar (a driver round-trip per round);
    the symmetrized form keeps the whole computation one lazy plan.

    Fixed iteration count (not convergence-tested) on purpose: it makes
    the result exactly reproducible AND lets an independent SQL oracle
    unroll the identical K rounds.
    """
    w = (
        F.col(weight).cast("double") if weight else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).localCheckpoint()  # reused by every iteration — materialize once
    deg = (
        e.groupBy("src")
        .agg(F.sum("w").alias("deg"))
        .localCheckpoint()
    )
    n = deg.count()  # |N| — one metadata-sized action
    base = (1.0 - damping) / n

    # contribution table carries rank/deg so each round is join + sum
    ranks = deg.select("src", (F.lit(1.0 / n) / F.col("deg")).alias("contrib"))
    for _ in range(iters):
        in_mass = (
            e.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("contrib")).alias("_in"))
            .withColumnRenamed("dst", "src")
        )
        # LEFT join keeps source-only nodes (no in-edges) alive at the
        # residual rank (1-d)/N so their mass propagates every round.
        rank_col = F.lit(base) + F.lit(damping) * F.coalesce(
            F.col("_in"), F.lit(0.0)
        )
        ranks = deg.join(in_mass, "src", "left").select(
            "src",
            rank_col.alias("rank"),
            (rank_col / F.col("deg")).alias("contrib"),
        )
    return ranks.select(F.col("src").alias("node"), "rank")
