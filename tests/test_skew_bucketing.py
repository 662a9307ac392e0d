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
