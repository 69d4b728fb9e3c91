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
    e, deg, n = _edges_and_degrees(edges, src, dst, weight)
    # contribution table carries rank/deg so each round is join + sum
    ranks = deg.select("src", (F.lit(1.0 / n) / F.col("deg")).alias("contrib"))
    return _power_iterations(e, deg, ranks, n, damping, iters)


def _edges_and_degrees(
    edges: DataFrame, src: str, dst: str, weight: str | None
) -> tuple[DataFrame, DataFrame, int]:
    """Normalized edge table + out-degree table (both checkpointed —
    every iteration reuses them) + |N|.

    r13 note (guide §2.4, measured): checkpointing ``e`` pre-partitioned
    on ``src`` WOULD let every round's ``e ⋈ ranks`` skip re-exchanging
    |E| rows — ``localCheckpoint`` does preserve ``hashpartitioning`` in
    the LogicalRDD and with AQE off the plan shows 0 extra Exchanges —
    but with AQE ON (required: skew-join splitting + scale-adaptive
    coalescing) EnsureRequirements re-inserts the exchange anyway
    (probed in this round: AQE=false → 0, AQE=true → 1).  So the
    repartition would be pure extra cost here; at runtime AQE instead
    converts the tiny-ranks-side joins to broadcast with a local
    shuffle read.  The 100 TB layout is a bucketed edge table
    (``bucketBy(src)``), which survives AQE — noted in
    OPTIMIZATION_r13.md rather than coded, since the query contract
    reads unbucketed parquet."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).localCheckpoint()
    deg = e.groupBy("src").agg(F.sum("w").alias("deg")).localCheckpoint()
    return e, deg, deg.count()


def _power_iterations(
    e: DataFrame,
    deg: DataFrame,
    ranks: DataFrame,
    n: int,
    damping: float,
    iters: int,
    checkpoint_every: int = 8,
) -> DataFrame:
    """The shared power-method loop: ``ranks`` is a (src, contrib)
    seed; each round is ONE edge-keyed equi-join + ONE dst-keyed
    aggregation, LEFT-joined back onto ``deg`` so source-only nodes
    stay at the residual (1-d)/N.

    Every ``checkpoint_every`` rounds the rank table is
    ``localCheckpoint``-ed: an unbounded join chain makes Catalyst's
    optimization time itself superlinear (measured: 60 chained rounds
    stall planning) — exactly the lineage-truncation every iterative
    Spark algorithm needs; short chains (the 6-round queries) stay one
    lazy plan."""
    base = (1.0 - damping) / n
    for i in range(iters):
        if i and i % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
        in_mass = (
            e.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("contrib")).alias("_in"))
            .withColumnRenamed("dst", "src")
        )
        rank_col = F.lit(base) + F.lit(damping) * F.coalesce(
            F.col("_in"), F.lit(0.0)
        )
        ranks = deg.join(in_mass, "src", "left").select(
            "src",
            rank_col.alias("rank"),
            (rank_col / F.col("deg")).alias("contrib"),
        )
    return ranks.select(F.col("src").alias("node"), "rank")


def pagerank_incremental(
    edges: DataFrame,
    prev_ranks: DataFrame,
    damping: float = 0.85,
    iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """WARM-START PageRank over an UPDATED edge table (VERDICT r7
    task 7 — the graph member of the engine's incremental-maintenance
    family): degrees are recomputed from the full current edge set
    (folding any delta in), and the power method runs ``iters`` rounds
    seeded from ``prev_ranks`` (``(node, rank)``, e.g. the persisted
    output of the previous run) instead of the uniform vector.  Nodes
    new to the graph seed at 1/N.

    Semantics, exactly: with an EMPTY delta, ``iters`` warm rounds from
    a ``k``-round cold start equal a ``k + iters``-round cold start
    BIT-FOR-BIT (the seed contrib is the same rank/deg division the
    loop would compute — pinned in tests).  With a real delta, the
    power method's unique fixed point makes warm and cold starts
    converge to the same vector; the warm start just begins ~‖prev −
    uniform‖ closer, which is the entire point of incremental
    maintenance at 100 TB: K rounds over the delta-extended graph
    instead of a from-scratch schedule.  Same dangling-free
    precondition and plan shape as :func:`pagerank`."""
    e, deg, n = _edges_and_degrees(edges, src, dst, weight)
    seed = deg.join(
        prev_ranks.select(F.col("node").alias("src"), "rank"),
        "src",
        "left",
    ).select(
        "src",
        (
            F.coalesce(F.col("rank"), F.lit(1.0 / n)) / F.col("deg")
        ).alias("contrib"),
    )
    return _power_iterations(e, deg, seed, n, damping, iters)
