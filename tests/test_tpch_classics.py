"""Property tests for the TPC-H-classic join queries (q125-q128).

The gate oracle pins exact values; these pin the semantic invariants
that survive testdata regeneration (filters honored, ranks ordered,
HAVING threshold respected).
"""

from big_data_hdfs_ray_vs_spark_spark.queries import (
    q125_shipping_priority,
    q126_local_supplier_volume,
    q127_large_volume_customers,
    q128_returned_items,
)

SF = "/root/testdata/sf0.001"


def test_shipping_priority_top10_ordered(spark):
    rows = q125_shipping_priority(spark, SF).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # unshipped-as-of-cutoff: order placed before the cutoff
    assert all(r.order_date < "1998-03-15" for r in rows)


def test_local_supplier_volume_nations_bounded(spark):
    rows = q126_local_supplier_volume(spark, SF).collect()
    # ASIA has at most 5 nations; revenue is positive by construction
    assert 0 < len(rows) <= 5
    assert all(r.revenue > 0 for r in rows)
    assert len({r.n_name for r in rows}) == len(rows)


def test_large_volume_customers_threshold(spark):
    rows = q127_large_volume_customers(spark, SF).collect()
    assert all(r.total_qty > 300 for r in rows)
    # one row per qualifying order
    assert len({r.o_orderkey for r in rows}) == len(rows)


def test_returned_items_top20_ordered(spark):
    rows = q128_returned_items(spark, SF).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)
