"""PageRank operator: exact agreement with a dense NumPy power
iteration on small graphs, stochasticity, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping, iters):
    """Dense reference: same formula, same iteration count."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for u, v in edges:
            nxt[idx[v]] += damping * r[idx[u]] / deg[idx[u]]
        r = nxt
    return dict(zip(nodes, r))


def _sym(pairs):
    return [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]


@pytest.mark.parametrize("iters", [1, 6])
def test_matches_dense_reference(spark, iters):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, iters).collect()}
    want = _numpy_pagerank(edges, 0.85, iters)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_rank_is_stochastic_and_orders_hubs_first(spark):
    # star: hub 0 touches 1..5 — hub must out-rank every leaf, total = 1
    edges = _sym([(0, i) for i in range(1, 6)])
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 8).collect()}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(rows[0] > rows[i] for i in range(1, 6))
    # leaves are symmetric -> identical ranks
    leaf = {round(rows[i], 12) for i in range(1, 6)}
    assert len(leaf) == 1


def test_single_lazy_plan_no_cartesian(spark):
    edges = _sym([(1, 2), (2, 3)])
    df = spark.createDataFrame(edges, "src long, dst long")
    plan = (
        pagerank(df, 0.85, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_weighted_matches_dense_reference(spark):
    edges = [(1, 2, 3.0), (2, 1, 3.0), (1, 3, 1.0), (3, 1, 1.0),
             (2, 3, 2.0), (3, 2, 2.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, 0.85, 6, weight="w").collect()
    }
    # dense reference with weighted degree
    nodes = sorted({u for u, _, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    import numpy as np

    deg = np.zeros(3)
    for u, _v, w in edges:
        deg[idx[u]] += w
    r = np.full(3, 1 / 3)
    for _ in range(6):
        nxt = np.full(3, 0.15 / 3)
        for u, v, w in edges:
            nxt[idx[v]] += 0.85 * w * r[idx[u]] / deg[idx[u]]
        r = nxt
    for v, i in idx.items():
        assert got[v] == pytest.approx(r[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_source_only_nodes_survive_every_round(spark):
    """A node with out-edges but no in-edges (ADVICE r7): it must stay
    in the rank table at the residual (1-d)/N each round, keep feeding
    its successors, and appear in the output — not vanish after the
    first dst-keyed aggregation."""
    # 10 and 11 are pure sources; 1<->2 is a cycle they feed into.
    edges = [(10, 1), (11, 2), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3, 6):
        got = {
            r["node"]: r["rank"] for r in pagerank(df, 0.85, iters).collect()
        }
        want = _numpy_pagerank(edges, 0.85, iters)
        assert set(got) == {1, 2, 10, 11}
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        # source-only nodes sit exactly at the residual mass
        assert got[10] == pytest.approx(0.15 / 4, abs=1e-12)


def test_hub_skew_star_graph(spark):
    """A 5000-leaf star concentrates every round's aggregation on one
    hot key — the AQE skew path must still produce the exact stochastic
    vector (hub absorbs the damped mass, leaves split the rest)."""
    n_leaves = 5000
    edges = [(0, i) for i in range(1, n_leaves + 1)] + [
        (i, 0) for i in range(1, n_leaves + 1)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 4).collect()}
    assert len(rows) == n_leaves + 1
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-6)
    # closed form after convergence-ish: leaves identical, hub dominant
    leaf_vals = {round(rows[i], 15) for i in range(1, n_leaves + 1)}
    assert len(leaf_vals) == 1
    assert rows[0] > 100 * rows[1]


def test_incremental_empty_delta_is_exactly_continuation(spark):
    """Warm-starting K2 rounds from a K1-round cold start over the SAME
    graph must equal a (K1+K2)-round cold start BIT-FOR-BIT — the seed
    contrib is the identical rank/deg division the loop computes."""
    from asid_v2_data_pipeline_spark.operators.graph import (
        pagerank_incremental,
    )

    edges = _sym([(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)])
    df = spark.createDataFrame(edges, "src long, dst long")
    prev = pagerank(df, 0.85, 3)
    warm = {
        r["node"]: r["rank"]
        for r in pagerank_incremental(df, prev, 0.85, 4).collect()
    }
    cold = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 7).collect()}
    assert warm == cold  # exact float equality, not approx


def test_incremental_folds_delta_and_converges_to_cold_start(spark):
    """New edges (and NEW nodes) fold into the degree table; after
    enough warm rounds the result matches a long cold start on the full
    graph (unique fixed point), and matches the dense NumPy model of
    the warm-start definition exactly at low round counts."""
    from asid_v2_data_pipeline_spark.operators.graph import (
        pagerank_incremental,
    )

    old = _sym([(1, 2), (2, 3), (1, 3)])
    delta = _sym([(3, 4), (4, 5), (5, 1)])  # nodes 4, 5 are new
    full = old + delta
    df_old = spark.createDataFrame(old, "src long, dst long")
    df_full = spark.createDataFrame(full, "src long, dst long")
    prev = pagerank(df_old, 0.85, 6)

    # exact: 2 warm rounds == dense model of the same definition
    got = {
        r["node"]: r["rank"]
        for r in pagerank_incremental(df_full, prev, 0.85, 2).collect()
    }
    prev_d = {r["node"]: r["rank"] for r in prev.collect()}
    nodes = sorted({u for u, _ in full})
    n = len(nodes)
    deg = {v: sum(1 for u, _ in full if u == v) for v in nodes}
    r = {v: prev_d.get(v, 1.0 / n) for v in nodes}
    for _ in range(2):
        nxt = {v: 0.15 / n for v in nodes}
        for u, v in full:
            nxt[v] += 0.85 * r[u] / deg[u]
        r = nxt
    for v in nodes:
        assert got[v] == pytest.approx(r[v], abs=1e-12)

    # convergence: the seed difference contracts by the damping factor
    # each round (0.85^80 * ||prev - uniform|| ~ 4e-7), so 80 warm
    # rounds and 80 cold rounds agree to 1e-6 — same fixed point
    warm = {
        r["node"]: r["rank"]
        for r in pagerank_incremental(df_full, prev, 0.85, 80).collect()
    }
    cold = {
        r["node"]: r["rank"] for r in pagerank(df_full, 0.85, 80).collect()
    }
    assert set(warm) == set(cold)
    for v in cold:
        assert warm[v] == pytest.approx(cold[v], abs=1e-6)
    # the warm seed is not exactly stochastic (prev sums to 1, new
    # nodes add 1/N each); the excess decays at damping^k ~ 9e-7
    assert sum(warm.values()) == pytest.approx(1.0, abs=1e-5)
