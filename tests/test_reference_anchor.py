"""Anchors against the reference's published results *shape*.

The reference pins semantic outputs for the graph workloads on the
reddit 1G tier: PageRank converges EARLY (3 of max 20 iterations, with
the convergence probe on by default at sample size 10000 / tol 1e-6)
and reports a descending top-10
(analysis/results/3-nodes/1GB/pagerank_spark_results_data_reddit_1G_1757691200.txt:7,20-30);
triangle counting reports one grand total
(.../triangles_spark_results_data_reddit_1G_1757692113.txt:9).

We cannot replay the reddit CSV itself (not shipped), so these tests
anchor the same *behaviors* on a scaled synthetic hub graph: the
default-on probe must stop at exactly the iteration a full-precision
numpy replay of the reference update rule stops at, well before
max_iter, and the top-10 ordering must match the replay.
"""

from __future__ import annotations

import pytest

from big_data_hdfs_ray_vs_spark_spark.plans import graph as G

N_NODES = 400
N_HUBS = 5


def _hub_edges() -> list[tuple[str, str]]:
    """Deterministic reddit-shaped graph: every node links to one of a
    few hubs (power-law-ish in-degree), plus a chain for mixing."""
    edges = []
    for i in range(N_NODES):
        edges.append((f"n{i}", f"n{i % N_HUBS}"))  # hub link
        edges.append((f"n{i}", f"n{(i + 1) % N_NODES}"))  # chain link
    return edges


def _numpy_pagerank_until(tol: float, damping: float = 0.85, max_iter: int = 20):
    """Full-precision replay of the reference update rule + exact L2²
    stop (what the Spark probe computes at sample_fraction=1.0)."""
    dedup = sorted(set(_hub_edges()))
    nodes = sorted({u for e in dedup for u in e})
    n = len(nodes)
    outdeg: dict[str, int] = {}
    for u, _v in dedup:
        outdeg[u] = outdeg.get(u, 0) + 1
    score = {v: 1.0 / n for v in nodes}
    iters = 0
    for _ in range(max_iter):
        contrib = {v: 0.0 for v in nodes}
        for u, v in dedup:
            contrib[v] += damping * score[u] / outdeg[u]
        new = {v: (1 - damping) / n + contrib[v] for v in nodes}
        diff = sum((new[v] - score[v]) ** 2 for v in nodes)
        score = new
        iters += 1
        if diff < tol:
            break
    return score, iters


def test_pagerank_converges_early_with_default_probe(spark):
    """Reference anchor: probe ON by default (CLI sample size 10000 ≥ N
    here → exact), stops at the replay's iteration, well before max_iter
    — the '3 of 20 iterations' behavior in the published report."""
    edges_df = spark.createDataFrame(_hub_edges(), "src string, dst string")
    scores_df, iters = G.pagerank(edges_df, max_iter=20, tol=1e-6)
    want_scores, want_iters = _numpy_pagerank_until(tol=1e-6, max_iter=20)
    assert iters == want_iters
    assert iters < 20
    got = {r["node"]: r["score"] for r in scores_df.collect()}
    assert set(got) == set(want_scores)
    for node, s in want_scores.items():
        assert got[node] == pytest.approx(s, abs=1e-12), node


def test_pagerank_top10_ordering_matches_replay(spark):
    """Reference anchor: the report's 'Top 10 Nodes' is a strict
    descending ordering — hubs first, exactly as the replay ranks them."""
    edges_df = spark.createDataFrame(_hub_edges(), "src string, dst string")
    scores_df, _ = G.pagerank(edges_df, max_iter=20, tol=1e-6)
    top10 = [(r["node"], r["score"]) for r in G.pagerank_topk(scores_df, 10).collect()]
    want_scores, _ = _numpy_pagerank_until(tol=1e-6, max_iter=20)
    want_top10 = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [n for n, _ in top10] == [n for n, _ in want_top10]
    assert all(a[1] >= b[1] for a, b in zip(top10, top10[1:]))
    # The hub nodes must dominate, like the subreddit hubs in the
    # published report.
    assert set(n for n, _ in top10[:N_HUBS]) == {f"n{i}" for i in range(N_HUBS)}


def test_pagerank_opt_out_runs_fixed_iterations(spark):
    """tol=None is the explicit opt-out: exactly max_iter iterations
    (the unrolled recurrence the DuckDB oracle replays for q13)."""
    edges_df = spark.createDataFrame(_hub_edges(), "src string, dst string")
    _scores, iters = G.pagerank(edges_df, max_iter=3, tol=None)
    assert iters == 3
