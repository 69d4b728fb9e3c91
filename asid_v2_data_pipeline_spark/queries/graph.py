"""Crawl-graph PageRank queries (unweighted / weighted /
warm-start incremental) with DuckDB oracles.  Split out of the former
queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..schemas import load_table
from ..session import release_checkpoint
from .media import _PR_DAMP, _PR_ITERS, _PR_OFF



def gr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality — the document-quality prior of web-corpus
    curation (PageRank's original use), by fixed-iteration power method
    over the symmetrized customer↔supplier transaction graph (an edge
    per distinct (customer, supplier) trading pair; supplier nodes
    offset into their own id space).  Symmetrizing removes dangling
    nodes, so all ``_PR_ITERS`` rounds stay one lazy plan — each round
    is one |E|-keyed equi-join + one |N|-keyed aggregation, no global
    scalar round-trips (see ``operators/graph.py``).  The oracle
    unrolls the identical six rounds in SQL; doubles rounded to 6
    (parallel summation order differs between engines)."""
    from ..operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (guide §2.4): checkpoint the pair table — the symmetrizing
    # unionAll references it twice, so the lineitem⋈orders join +
    # distinct evaluated TWICE before; now once (rows unchanged)
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    edges = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") + _PR_OFF).alias("src"), F.col("c").alias("dst")
        )
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS)
    # pagerank() has checkpointed its own edge+degree tables by now, so
    # the pair table is superseded — release it (r13 opt, guide §5)
    release_checkpoint(pairs)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def gr_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the same trading graph: edge weight =
    lineitem count between the (customer, supplier) pair, so mass
    leaves a node proportionally to transaction volume — the form used
    when link multiplicity carries signal (co-occurrence strength,
    citation counts).  Same plan shape as ``gr_pagerank``; only the
    degree table becomes an out-weight sum."""
    from ..operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (guide §2.4): checkpointed — the unionAll references the
    # aggregated pair table twice (see gr_pagerank)
    pw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    edges = pw.select(
        F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst"), "w"
    ).unionAll(
        pw.select(
            (F.col("s") + _PR_OFF).alias("src"),
            F.col("c").alias("dst"),
            "w",
        )
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS, weight="w")
    release_checkpoint(pw)  # superseded (r13 opt, guide §5)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


_PRI_OLD = 4  # cold rounds over the "already-ranked" edge subset
_PRI_WARM = 4  # warm rounds after the delta folds in


def gr_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL graph maintenance (VERDICT r7 task 7): the trading
    graph splits into an already-ranked subset (pairs with even
    ``c + s`` — the persisted state of a previous run) and an arriving
    delta; ``pagerank_incremental`` folds the delta into the degree
    table and runs ``_PRI_WARM`` warm rounds seeded from the old ranks
    (new nodes at 1/N).  The oracle unrolls BOTH phases — the cold
    rounds on the old graph, the seed join, the warm rounds on the full
    graph — as one CTE chain, so the warm-start semantics themselves
    are value-hashed, not just the final fixed point.  Plan shape per
    round is identical to ``gr_pagerank``; the warm start is the whole
    scale story (K rounds instead of a from-scratch schedule)."""
    from ..operators.graph import pagerank, pagerank_incremental

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (guide §2.4): checkpointed — referenced FOUR times before
    # (two unionAll branches × two phases), so the lineitem⋈orders
    # join + distinct evaluated 4×; now once (rows unchanged)
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )

    def _edges(p):
        return p.select(
            F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst")
        ).unionAll(
            p.select(
                (F.col("s") + _PR_OFF).alias("src"), F.col("c").alias("dst")
            )
        )

    old = pairs.filter((F.col("c") + F.col("s")) % 2 == 0)
    prev = pagerank(_edges(old), damping=_PR_DAMP, iters=_PRI_OLD)
    ranks = pagerank_incremental(
        _edges(pairs), prev, damping=_PR_DAMP, iters=_PRI_WARM
    )
    # both phases' edge+degree tables are checkpointed by now (the cold
    # ones stay live — `prev` is a lazy plan over them); only the pair
    # table is superseded (r13 opt, guide §5)
    release_checkpoint(pairs)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def _gr_pagerank_incr_sql() -> str:
    """Both phases unrolled: ``a0..a{_PRI_OLD}`` cold rounds over the
    even-(c+s) subgraph, the warm-seed LEFT join (new nodes at 1/N),
    then ``w1..w{_PRI_WARM}`` rounds over the full graph — mirroring
    operators/graph.py's warm-start definition round for round."""
    d, off = _PR_DAMP, _PR_OFF

    def _round(name, prevn, edges, deg, nn):
        return f"""{name} AS (
  SELECT g.src, g.rank, g.rank / {deg}.deg AS contrib
  FROM (
    SELECT e.dst AS src,
           (1 - {d}) / {nn}.n + {d} * sum(r.contrib) AS rank
    FROM {edges} e JOIN {prevn} r ON e.src = r.src, {nn}
    GROUP BY e.dst, {nn}.n
  ) g JOIN {deg} ON {deg}.src = g.src
)"""

    parts = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
op AS (SELECT c, s FROM pairs WHERE (c + s) % 2 = 0),
eo AS (
  SELECT c AS src, s + {off} AS dst FROM op
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM op
),
dego AS (SELECT src, count(*) AS deg FROM eo GROUP BY src),
no AS (SELECT count(*) AS n FROM dego),
a0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM dego, no)"""
    ]
    for k in range(1, _PRI_OLD + 1):
        parts.append(_round(f"a{k}", f"a{k - 1}", "eo", "dego", "no"))
    parts.append(
        f"""ef AS (
  SELECT c AS src, s + {off} AS dst FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM pairs
),
degf AS (SELECT src, count(*) AS deg FROM ef GROUP BY src),
nf AS (SELECT count(*) AS n FROM degf),
w0 AS (
  SELECT dd.src, coalesce(a{_PRI_OLD}.rank, 1.0 / nf.n) / dd.deg AS contrib
  FROM degf dd LEFT JOIN a{_PRI_OLD} ON a{_PRI_OLD}.src = dd.src, nf
)"""
    )
    for k in range(1, _PRI_WARM + 1):
        parts.append(_round(f"w{k}", f"w{k - 1}", "ef", "degf", "nf"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM w{_PRI_WARM}"
        + " ORDER BY node"
    )


def _gr_pagerank_sql(weighted: bool = False) -> str:
    """The same six power-method rounds unrolled as chained CTEs
    (weighted: edge weight = pair lineitem count, degree = out-weight
    sum, contributions weight-scaled — mirroring operators/graph.py)."""
    d, off = _PR_DAMP, _PR_OFF
    if weighted:
        pairs = f"""pairs AS (
  SELECT o_custkey AS c, l_suppkey AS s,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
),
edges AS (
  SELECT c AS src, s + {off} AS dst, w FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst, w FROM pairs
),
deg AS (SELECT src, sum(w) AS deg FROM edges GROUP BY src)"""
        contrib_sum = "sum(e.w * r.contrib)"
    else:
        pairs = f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s + {off} AS dst FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)"""
        contrib_sum = "sum(r.contrib)"
    parts = [
        f"""{pairs},
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM deg, nn)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        parts.append(
            f"""r{k} AS (
  SELECT g.src, g.rank, g.rank / deg.deg AS contrib
  FROM (
    SELECT e.dst AS src,
           (1 - {d}) / nn.n + {d} * {contrib_sum} AS rank
    FROM edges e JOIN r{k - 1} r ON e.src = r.src, nn
    GROUP BY e.dst, nn.n
  ) g JOIN deg ON deg.src = g.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM r{_PR_ITERS}"
        + " ORDER BY node"
    )


_FLAC_W = 16  # samples per RMS window
_FLAC_RATE = 16000
_FLAC_BLOCK = 16  # FLAC frame block size for the MKV variant (multi-block)

REGISTRY = {
    "gr_pagerank": (gr_pagerank, _gr_pagerank_sql()),
    "gr_pagerank_weighted": (gr_pagerank_weighted, _gr_pagerank_sql(True)),
    "gr_pagerank_incremental": (
        gr_pagerank_incremental,
        _gr_pagerank_incr_sql(),
    ),
}
