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


def test_morton_key_matches_python_and_duckdb():
    """The three morton implementations (Spark column, oracle SQL
    generator, pure-Python replay) agree on a value sweep — the pin
    that lets q108's oracle claim single-source equivalence."""
    import duckdb

    from big_data_hdfs_ray_vs_spark_spark.oracles import _morton_sql
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import morton_py

    samples = [(0, 0), (1, 0), (0, 1), (3, 5), (149, 19752), (65535, 65535),
               (1 << 20, 3), (-1, -7), (2**40, 2**40)]
    sql = "SELECT " + _morton_sql("x", "y") + " AS z FROM t"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", samples)
    duck = [r[0] for r in con.execute(sql).fetchall()]
    py = [morton_py(x, y) for x, y in samples]
    assert duck == py


def test_morton_key_spark_matches_python(spark):
    from big_data_hdfs_ray_vs_spark_spark.functions import morton_key
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import morton_py

    samples = [(0, 0), (1, 0), (0, 1), (3, 5), (149, 19752), (65535, 65535),
               (1 << 20, 3), (-1, -7), (2**40, 2**40)]
    df = spark.createDataFrame(samples, "x long, y long")
    got = [r["z"] for r in
           df.select(morton_key(F.col("x"), F.col("y")).alias("z")).collect()]
    assert got == [morton_py(x, y) for x, y in samples]


def test_zordered_rectangle_query_prunes_and_is_exact(spark, tmp_path):
    """write_zordered + zorder_rectangle_buckets: the rectangle read
    (a) shows PartitionFilters on zbucket (directory pruning, not an
    in-plan filter), (b) touches a strict subset of buckets, and
    (c) returns exactly the brute-force rectangle rows."""
    from big_data_hdfs_ray_vs_spark_spark.sources.layout import (
        write_zordered,
        zorder_rectangle_buckets,
    )

    rows = [(x, y, x * 1000 + y) for x in range(0, 64, 3) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    path = str(tmp_path / "zlayout")
    write_zordered(df, path, "x", "y", shift=4)

    buckets = zorder_rectangle_buckets(10, 20, 30, 40, shift=4)
    all_buckets = zorder_rectangle_buckets(0, 63, 0, 63, shift=4)
    assert 0 < len(buckets) < len(all_buckets)

    layout = spark.read.parquet(path)
    got = (
        layout.filter(F.col("zbucket").isin(buckets))
        .filter(F.col("x").between(10, 20) & F.col("y").between(30, 40))
    )
    plan = physical_plan(got)
    assert "PartitionFilters" in plan and "zbucket" in plan
    want = sorted(
        p for x, y, p in rows if 10 <= x <= 20 and 30 <= y <= 40
    )
    assert sorted(r["payload"] for r in got.collect()) == want and want
