"""Salted-join equivalence and bucketed-join exchange elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.fixtures import load_table
from spark_cdc_replication_spark.operators.skew import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # simulate skew: all of orders' keys also joined via a hot constant
    right = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(right, on="l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    salted = salted_join(li, right, on=["l_orderkey"], n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    assert plain.collect() == salted.collect()


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0)], "k int, w double")
    rows = {r.k: r.w for r in salted_join(left, right, on=["k"], how="left").collect()}
    assert rows == {1: 10.0, 2: None}


def test_salted_join_spreads_identical_hot_rows(spark):
    # The case salting exists for: one hot key whose 10k rows are
    # BYTE-IDENTICAL (e.g. a null-FK default row).  Content-hash
    # salting puts them all on ONE salt; the row-counter salt must
    # spread them, and the join output must still equal the plain join.
    from spark_cdc_replication_spark.operators.skew import _SALT

    hot = spark.range(10_000).select(
        F.lit(42).alias("k"), F.lit("same-payload").alias("v")
    )
    cold = spark.range(100).select(
        (F.col("id") + 100).cast("int").alias("k"), F.lit("x").alias("v")
    )
    left = hot.unionByName(cold)
    right = spark.createDataFrame([(42, 1.0), (100, 2.0)], "k int, w double")

    n_salts = 8
    salted = left.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    hot_salts = salted.filter(F.col("k") == 42).select(_SALT).distinct().count()
    assert hot_salts > 1, "identical hot rows all landed on one salt"

    out = salted_join(left, right, on=["k"], n_salts=n_salts)
    plain = left.join(right, on="k")
    assert out.count() == plain.count() == 10_001
    assert out.groupBy("k").count().orderBy("k").collect() == \
        plain.groupBy("k").count().orderBy("k").collect()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    for t in ("bt_orders", "bt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "key"),
        "bt_orders",
        ["key"],
        num_buckets=8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "key"),
        "bt_lineitem",
        ["key"],
        num_buckets=8,
    )
    # disable auto-broadcast so the test observes the bucketed SMJ path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_orders").join(spark.table("bt_lineitem"), on="key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
