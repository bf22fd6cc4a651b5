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


# ------------------------- r9 completion block (q193-q200) invariants
def test_forecast_revenue_consistent_with_manual_filter(spark):
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.queries import q193_forecast_revenue
    from big_data_hdfs_ray_vs_spark_spark.sources import load_table

    row = q193_forecast_revenue(spark, SF).first()
    li = load_table(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    assert row.n_lines == li.count()


def test_customer_order_distribution_conserves_customers(spark):
    from big_data_hdfs_ray_vs_spark_spark.queries import (
        q196_customer_order_distribution,
    )
    from big_data_hdfs_ray_vs_spark_spark.sources import load_table

    rows = q196_customer_order_distribution(spark, SF).collect()
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    # ordered by custdist desc then c_count desc
    keys = [(r.custdist, r.c_count) for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_min_cost_supplier_is_the_minimum(spark):
    from collections import defaultdict

    from big_data_hdfs_ray_vs_spark_spark.queries import q198_min_cost_supplier

    rows = q198_min_cost_supplier(spark, SF).collect()
    by_part = defaultdict(set)
    for r in rows:
        by_part[r.p_partkey].add(r.min_avg_price)
    # one minimum price per part (ties share it), never two distinct prices
    assert all(len(v) == 1 for v in by_part.values())


def test_dominant_supplier_share_bar(spark):
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.queries import q199_supplier_part_promotion
    from big_data_hdfs_ray_vs_spark_spark.sources import load_table

    out = {r.s_suppkey for r in q199_supplier_part_promotion(spark, SF).collect()}
    # replay the dominance bar manually: every emitted supplier ships
    # >20% of at least one red-prefixed part's total quantity
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part").filter(F.col("p_name").startswith("red"))
    flow = li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
    per_ps = flow.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    per_p = flow.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("tq")
    )
    manual = {
        r.l_suppkey
        for r in per_ps.join(per_p, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("sq") * 5 > F.col("tq"))
        .collect()
    }
    assert out == manual


def test_sales_opportunity_above_average_and_dormant(spark):
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.queries import q200_sales_opportunity
    from big_data_hdfs_ray_vs_spark_spark.sources import load_table

    rows = q200_sales_opportunity(spark, SF).collect()
    cust = load_table(spark, SF, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum("c_acctbal") / F.count(F.lit(1))).alias("a"))
        .first()["a"]
    )
    # totals only over above-average balances => per-segment total
    # exceeds numcust * avg_bal
    for r in rows:
        assert r.totacctbal > r.numcust * avg_bal
