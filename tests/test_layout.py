"""Physical layout: bucketed co-located joins (no Exchange) and
partition-pruned scans (PartitionFilters)."""

from pyspark.sql import functions as F

from big_data_hdfs_ray_vs_spark_spark.sources import load_table
from big_data_hdfs_ray_vs_spark_spark.sources.layout import (
    physical_plan,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, str(tmp_path / "ob"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", "o_orderkey", 8, str(tmp_path / "lb"),
    )
    a = spark.table("t_orders_b")
    b = spark.table("t_lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, on="o_orderkey").groupBy("o_orderstatus").count()
        plan = physical_plan(joined)
        # co-located: the join itself needs no shuffle of either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_part")
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path)
    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = physical_plan(q)
    assert "PartitionFilters" in plan and "isnotnull(lang" in plan
    # pruned scan reads only the lang=en directory; result matches a full filter
    want = docs.filter(F.col("lang") == "en").count()
    assert q.count() == want and want > 0


def test_lsh_index_probe_is_partition_pruned(spark, tmp_path):
    """VERDICT r1: the ANN probe path must read a bucket-partitioned
    layout, not filter in-plan — assert PartitionFilters on lsh_bucket."""
    from big_data_hdfs_ray_vs_spark_spark.operators import similarity as S

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "lsh_idx")
    S.write_lsh_index(emb, path, planes=4, dim=8)
    idx = S.read_lsh_index(spark, path)
    query = [float(x) for x in
             emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = S.lsh_topk(idx, query, k=5, planes=4)
    plan = physical_plan(top)
    assert "PartitionFilters" in plan and "lsh_bucket" in plan
    # the pruned probe returns the same rows as the unpartitioned path
    want = [r["vec_id"] for r in
            S.lsh_topk(S.lsh_bucket(emb, planes=4, dim=8), query, k=5, planes=4).collect()]
    got = [r["vec_id"] for r in top.collect()]
    assert got == want and len(got) > 0


def test_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.operators import similarity as S

    emb = load_table(spark, SF, "embeddings")
    indexed, centroids = S.ivf_index(emb, n_lists=4)
    path = str(tmp_path / "ivf_idx")
    S.write_ivf_index(indexed, path)
    idx = S.read_ivf_index(spark, path)
    query = [float(x) for x in
             emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = S.ivf_topk(idx, centroids, query, k=5, nprobe=2)
    plan = physical_plan(top)
    assert "PartitionFilters" in plan and "ivf_list" in plan
    want = [r["vec_id"] for r in S.ivf_topk(indexed, centroids, query, k=5, nprobe=2).collect()]
    assert [r["vec_id"] for r in top.collect()] == want


def test_compact_files_merges_small_files(spark, tmp_path):
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import compact_files

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "fragmented")
    docs.repartition(32).write.parquet(src)  # 32 tiny files
    stats = compact_files(spark, src, str(tmp_path / "compacted"), target_bytes=1 << 30)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1  # everything fits one 1 GiB target
    a = spark.read.parquet(src).count()
    b = spark.read.parquet(str(tmp_path / "compacted")).count()
    assert a == b


def test_overwrite_partitions_is_dynamic(spark, tmp_path):
    """Re-writing one partition leaves the others intact (the
    idempotent-backfill contract); static overwrite would truncate
    them. Session conf is restored afterwards."""
    from pyspark.sql import functions as F

    from big_data_hdfs_ray_vs_spark_spark.sources.layout import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "days")
    base = spark.range(6).select(
        "id", (F.col("id") % 3).cast("string").alias("day")
    )
    write_partitioned(base, path, ["day"])
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")

    redo = spark.createDataFrame([(100, "1"), (101, "1")], "id long, day string")
    overwrite_partitions(redo, path, ["day"])

    got = spark.read.parquet(path)
    assert got.filter(F.col("day") == "1").count() == 2          # replaced
    assert sorted(
        r["id"] for r in got.filter(F.col("day") == "1").collect()
    ) == [100, 101]
    assert got.filter(F.col("day") != "1").count() == 4          # untouched
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == prev_mode
