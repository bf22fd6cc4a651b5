"""Round-10 optimization internals.

The r10 fixpoint probes detect convergence ON the round that reaches
it (star-forest test for cc_two_star, under-degree test for
kcore_peel) instead of comparing consecutive states — one fewer full
round per query. These tests pin the round count via the
iterate_until seam (both operators import it per call), and pin that
results stay identical to the interchangeable strategies.
"""

from __future__ import annotations

import pytest

import big_data_hdfs_ray_vs_spark_spark.plans.iterate as it
from big_data_hdfs_ray_vs_spark_spark.operators.dedup import (
    cc_two_star,
    dup_clusters,
)
from big_data_hdfs_ray_vs_spark_spark.plans.graph import kcore_peel


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _count_iters(monkeypatch):
    seen = {}
    orig = it.iterate_until

    def counting(state, step, should_stop, **kw):
        out, iters = orig(state, step, should_stop, **kw)
        seen["iters"] = iters
        return out, iters

    monkeypatch.setattr(it, "iterate_until", counting)
    return seen


def test_cc_two_star_detects_fixpoint_on_reaching_round(spark, monkeypatch):
    # A star-forest input (every edge max→min, sources disjoint from
    # targets) is ALREADY the fixpoint: one round maps it to itself
    # and the star-forest probe must stop there — the old fingerprint
    # comparison needed a second confirming round.
    seen = _count_iters(monkeypatch)
    pairs = spark.createDataFrame(
        [(5, 1), (3, 1), (7, 2)], "id_a long, id_b long"
    )
    got = _rows(cc_two_star(pairs))
    assert seen["iters"] == 1
    want = _rows(dup_clusters(spark.createDataFrame(
        [(5, 1), (3, 1), (7, 2)], "id_a long, id_b long"
    )))
    assert got == want


def test_cc_two_star_multi_round_still_exact(spark, monkeypatch):
    # A chain needs >1 two-star round; the early-fixpoint probe must
    # not stop before the true star forest forms.
    seen = _count_iters(monkeypatch)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in cc_two_star(pairs).collect()}
    assert seen["iters"] > 1
    assert len(out) == 13
    assert all(r["cluster"] == 0 and r["cluster_size"] == 13 for r in out.values())
    assert out[0]["is_rep"] and sum(r["is_rep"] for r in out.values()) == 1


def test_kcore_detects_fixpoint_on_reaching_round(spark, monkeypatch):
    # A pure 2-core (triangle): peel round 1 keeps everything, and the
    # under-degree probe must detect the fixpoint there — the old
    # count-unchanged check needed a second confirming round.
    seen = _count_iters(monkeypatch)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    out = {r["node"]: r["core_degree"] for r in kcore_peel(df, k=2).collect()}
    assert seen["iters"] == 1
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_input_stable_first_round(spark, monkeypatch):
    seen = _count_iters(monkeypatch)
    df = spark.createDataFrame([], "src long, dst long")
    assert kcore_peel(df, k=2).count() == 0
    assert seen["iters"] == 1
