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
    # both event scans keep their pushed event_type filters (order-
    # agnostic: the ingest-boundary IsNotNull(ts/user_id/event_type)
    # trio now rides in the same pushed list)
    # match to end of line, not to "]": Spark truncates long pushed
    # lists at spark.sql.maxMetadataStringLength (no closing bracket),
    # and a bracket-bounded match would then span unrelated plan text
    pushed = re.findall(r"PushedFilters: \[[^\n]*", plan)
    assert sum("IsNotNull(event_type)" in p for p in pushed) == 2, pushed


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


def test_pricing_summary_pushes_scan_filter(spark):
    plan = physical_plan(queries.q01_pricing_summary(spark, SF))
    # the shipdate predicate must reach the parquet scan, and the scan
    # must not read the full 16-column lineitem schema
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schema and len(read_schema.group(1).split(",")) <= 7


def test_region_revenue_broadcasts_dimensions(spark):
    plan = physical_plan(queries.q02_region_revenue(spark, SF))
    # region/nation/customer/orders are the small sides — at least the
    # dimension chain must broadcast, never cartesian
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_minhash_candidates_join_is_bucketed(spark):
    plan = physical_plan(queries.q17_minhash_pairs(spark, SF))
    # the candidate self-join must be an equi-join on (band, band_key),
    # never an all-pairs fallback
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "band_key" in plan


def test_bloom_prune_stays_broadcast_and_one_exchange(spark):
    plan = physical_plan(queries.q58_bloom_prune(spark, SF))
    # dim audit join broadcasts; exchanges are the dim-side distinct,
    # the final 1-row aggregate, and the guarded small-input spread
    # (a no-op past 256 MB) — the probe itself stays a map-side
    # expression, so the FACT side never shuffles ON A KEY pre-join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert n_exchanges(plan) <= 3


def test_sparse_cosine_is_postings_equi_join(spark):
    plan = physical_plan(queries.q79_sparse_cosine(spark, SF))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_entity_resolution_blocks_never_cross_join(spark):
    plan = physical_plan(queries.q85_entity_resolution(spark, SF))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_embedding_neardup_is_bucketed(spark):
    plan = physical_plan(queries.q27_embedding_neardup(spark, SF))
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_char_entropy_keeps_partial_aggregation(spark):
    plan = physical_plan(queries.q70_char_entropy(spark, SF))
    # both groupBys must map-side combine (explode feeds codegen hash
    # aggregate — the measured-fastest formulation, see operators/text.py)
    assert plan.count("HashAggregate") >= 4
    assert "Cartesian" not in plan
