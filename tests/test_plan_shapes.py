"""Plan-shape regression guards for the scale properties the new
operators were designed around: exchange counts, no nested-loop
fallbacks, pushed filters. These are the 100 TB invariants — a code
change that silently reintroduces a cross product or an extra shuffle
fails here, long before a benchmark would notice."""

import re

from big_data_hdfs_ray_vs_spark_spark import queries
from big_data_hdfs_ray_vs_spark_spark.sources.layout import physical_plan

SF = "/root/testdata/sf0.001"


def n_exchanges(plan: str) -> int:
    # formatted-explain detail headers: one "(N) Exchange" per operator
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


def test_asof_join_is_one_shuffle(spark):
    plan = physical_plan(queries.q43_asof_join(spark, SF))
    assert n_exchanges(plan) == 1  # hash by user_id; the window sort rides it
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # both event scans keep their pushed event_type filters
    assert plan.count("PushedFilters: [IsNotNull(event_type)") == 2


def test_interval_join_avoids_nested_loop(spark):
    plan = physical_plan(queries.q44_interval_join(spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # the bin equi-key makes it a hash-joinable plan
    assert "Join" in plan


def test_funnel_is_two_shuffles(spark):
    plan = physical_plan(queries.q45_funnel(spark, SF))
    # one hash(user_id) feeding both windows AND the per-user reduce,
    # plus the single-partition final aggregate — never one per stage
    assert n_exchanges(plan) <= 2
    assert "Join" not in plan  # the staged-join formulation is the oracle's


def test_tfidf_no_cartesian_and_small_term_join(spark):
    plan = physical_plan(queries.q47_tfidf_top_terms(spark, SF))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_salted_join_joins_on_composite_key(spark):
    plan = physical_plan(queries.q50_salted_join(spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "__salt" in plan  # the salt actually reaches the join key


def test_kmv_single_partition_only_at_the_end(spark):
    plan = physical_plan(queries.q46_kmv_distinct(spark, SF))
    # distinct-hash pass must keep map-side partial aggregation
    assert "partial_" in plan.lower() or "HashAggregate" in plan
