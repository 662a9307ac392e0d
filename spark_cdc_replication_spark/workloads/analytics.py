"""Analytic query surface (joins / aggregations / windows / top-k).

The reference composes Spark primitives but never exposes sum/avg/
grouping/inner-join queries (SURVEY.md §2.5 "our engine gets them for
free from Spark SQL and exposes them in the query surface §7").  These
TPC-H-style queries over the driver's fixtures ARE that surface, and
double as the bench.py headline workload.

Float policy: a double SUM is not reproducible across engines (IEEE
addition is non-associative and Spark/DuckDB sum in different orders),
so every money sum goes through ``sum(cast(x as decimal(27,8)))``:
the per-row double product is bit-identical in both engines, the
double->decimal(…,8) rounding is deterministic, and decimal summation
is exact — therefore order-independent.  The result is cast back to
double and rounded for stable hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures import load_table


def dsum(col: Column, round_to: int = 2) -> Column:
    """Order-independent cross-engine-reproducible money sum.

    Round while still DECIMAL (exact half-up in both engines), cast to
    double LAST: the exact sum frequently lands on a half-up boundary
    (…x.195), where round-after-double-cast flips per engine depending
    on which neighbor double the cast picked (observed at sf0.1).
    SQL twin: ``CAST(round(sum(CAST(x AS DECIMAL(27,8))), r) AS DOUBLE)``.
    """
    return F.round(F.sum(col.cast("decimal(27,8)")), round_to).cast("double")


def _dsum_sql(expr: str, round_to: int = 2) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(27,8))), {round_to}) AS DOUBLE)"


def davg(col: Column, round_to: int = 6) -> Column:
    """Deterministic mean: exact decimal sum / count, rounded in
    decimal space.  SQL twin: :func:`_davg_sql`."""
    return F.round(
        F.sum(col.cast("decimal(27,8)")) / F.count(F.lit(1)), round_to
    ).cast("double")


def _davg_sql(expr: str, round_to: int = 6) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(27,8))) / count(*), {round_to}) AS DOUBLE)"


# --------------------------------------------------------------------------
# q1: pricing summary — full-scan groupBy aggregate (map-side partials,
# single shuffle on a 6-value grouping key; filter pushed to parquet)
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum_sql('l_quantity')} AS sum_qty,
       {_dsum_sql('l_extendedprice')} AS sum_base_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_davg_sql('l_quantity')} AS avg_qty,
       {_davg_sql('l_extendedprice')} AS avg_price,
       {_davg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3: shipping priority — selective dim filter, 3-way join, agg, top-10.
# customer is small relative to lineitem but grows with the scale
# factor, so no broadcast hint: AQE broadcasts it when the filtered
# side fits and degrades to shuffle join when it doesn't (at 100 TB a
# forced hint would be a driver OOM).  The rounded revenue is computed
# BEFORE ordering so the top-k cut is deterministic.
# --------------------------------------------------------------------------

_Q3_DATE = "1999-03-15"


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _Q3_DATE)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _Q3_DATE)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


ORACLE_SHIPPING_PRIORITY = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5-style: revenue by nation — 6-table snowflake join.  nation (25
# rows) and region (5) are bounded by the data model, so they carry
# explicit broadcast hints; customer/supplier grow with scale and are
# left to AQE, which broadcasts them at test scale and shuffle-joins
# them at 100 TB.  The only unavoidable big shuffle is orders<->lineitem.
# --------------------------------------------------------------------------

def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = f"""
SELECT r_name, n_name,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q10-style: returned-item losers — join + agg + per-group stats
# --------------------------------------------------------------------------

def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return joined.groupBy("c_custkey", "c_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lost_revenue"),
        F.count(F.lit(1)).alias("n_returned"),
    )


ORACLE_RETURNED_REVENUE = f"""
SELECT c_custkey, c_name, n_name,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS lost_revenue,
       count(*) AS n_returned
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
"""


# --------------------------------------------------------------------------
# Window analytics: top-3 orders per customer by totalprice (rank + filter)
# --------------------------------------------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


ORACLE_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# q4-style: order-priority check — LEFT SEMI join (EXISTS).  The probe
# side is deduplicated by the semi-join itself; no fan-out, one shuffle
# (or broadcast of the filtered orders under AQE).
# --------------------------------------------------------------------------

def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    exists = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return exists.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q6-style: forecast revenue — the pushdown showcase: all three
# predicates reach the parquet scan (PushedFilters), projection prunes
# to 4 columns, aggregate is a single partial+final with no join.
# --------------------------------------------------------------------------

def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_REVENUE_FORECAST = f"""
SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue, count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q14-style: promo revenue share — fact-dim join + conditional aggregate.
# part is dim << fact but scales with sf, so AQE decides the broadcast;
# the CASE folds into the aggregate so there is exactly one pass over
# the joined rows.
# --------------------------------------------------------------------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)).cast("decimal(27,8)"))
            * 100
            / F.sum(rev.cast("decimal(27,8)")),
            6,
        ).cast("double").alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_PROMO_REVENUE = """
SELECT CAST(round(
         sum(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                  AS DECIMAL(27,8))) * 100
         / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))),
       6) AS DOUBLE) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --------------------------------------------------------------------------
# q16-style: supplier diversity per brand/type — COUNT(DISTINCT) over a
# join.  Spark plans distinct-agg as a two-phase expand+agg; the join
# key (partkey) and the grouping keys differ, so this is the canonical
# "two shuffles, both necessary" query.
# --------------------------------------------------------------------------

def q_brand_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE_BRAND_SUPPLIER_COUNT = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9, 13)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q18-style: large-volume orders — HAVING over a fact aggregate, then
# join back to orders.  The aggregate output is small after the HAVING
# cut but is still derived FROM the fact table, so the broadcast is
# AQE's call at runtime (it sees the post-filter size), never a hint.
# --------------------------------------------------------------------------

def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(27,8)")), 2).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty"
    )


ORACLE_LARGE_ORDERS = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(round(sum(CAST(l_quantity AS DECIMAL(27,8))), 2) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) big ON o_orderkey = big.l_orderkey
"""


# --------------------------------------------------------------------------
# q19-style: bracketed revenue — OR-of-ANDs predicate across the join.
# The shared conjunct (the join key) stays in the join condition; the
# disjunction is a post-join filter Catalyst pushes partially into both
# scans (brand/size to part, quantity bounds to lineitem).
# --------------------------------------------------------------------------

def q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#11") & (F.col("p_size").between(1, 20)) & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#21") & (F.col("p_size").between(1, 30)) & (F.col("l_quantity").between(20, 35)))
    )
    return j.filter(bracket).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_BRACKET_REVENUE = f"""
SELECT {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
"""


# --------------------------------------------------------------------------
# Multi-level aggregate: ROLLUP(region, nation) — grouping sets in one
# pass (Catalyst Expand), with grouping_id disambiguating NULL-as-total
# from NULL-in-data.
# --------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(dsum(F.col("o_totalprice")).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
    )


ORACLE_ROLLUP_REVENUE = f"""
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       {_dsum_sql('o_totalprice')} AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --------------------------------------------------------------------------
# Window breadth: day-over-day revenue delta (lag) + trailing-7-day
# moving average (rows frame).  Both windows share the same global
# ORDER BY day — Catalyst plans one sort.  The moving average divides
# an exact decimal frame-sum by the frame count, so the result is
# independent of partitioning/execution order in both engines.
# --------------------------------------------------------------------------

def q_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,8)")).alias("__rev")
    )
    # Deliberate global window (WindowExec warns): lag/trailing-MA need
    # a total order over days, and the input is the per-day AGGREGATE —
    # one row per calendar day (≤ ~36.5k/century) whatever the corpus
    # size, so the single partition is bounded.  See SCALE.md §Analytics.
    w = Window.orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    return daily.select(
        "day",
        F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        F.round(F.col("__rev") - F.lag("__rev").over(w), 2)
        .cast("double")
        .alias("delta_prev_day"),
        F.round(F.sum("__rev").over(w7) / F.count(F.lit(1)).over(w7), 6)
        .cast("double")
        .alias("ma7"),
    )


ORACLE_DAILY_REVENUE_TREND = """
WITH daily AS (
  SELECT o_orderdate AS day, sum(CAST(o_totalprice AS DECIMAL(27,8))) AS rev
  FROM orders GROUP BY 1
)
SELECT day,
  CAST(round(rev, 2) AS DOUBLE) AS revenue,
  CAST(round(rev - lag(rev) OVER (ORDER BY day), 2) AS DOUBLE) AS delta_prev_day,
  CAST(round(sum(rev) OVER w7 / count(*) OVER w7, 6) AS DOUBLE) AS ma7
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q2-style: best supplier per part — per-group argmax (window rank over
# a join).  lineitem stands in for partsupp; part/supplier scale with
# sf, so broadcasting them is AQE's runtime decision.
# --------------------------------------------------------------------------

def q_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    sup = load_table(spark, sf_dir, "supplier")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        j.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name",
                F.round("s_acctbal", 2).alias("s_acctbal"))
    )


ORACLE_BEST_SUPPLIER_PER_PART = """
SELECT p_partkey, p_brand, s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS r
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size < 10
) WHERE r = 1
"""


# --------------------------------------------------------------------------
# q22-style: rich customers who never ordered — scalar aggregate
# subquery (broadcast single row) + LEFT ANTI join against orders.
# --------------------------------------------------------------------------

def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(27,8)")) / F.count(F.lit(1)), 6
        ).cast("double").alias("__avg")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__avg"))
    # "lapsed": no order since 2000 (the fixture's every-customer-orders
    # density makes a strict never-ordered set empty)
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    never_ordered = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
    )


ORACLE_SALES_OPPORTUNITY = f"""
SELECT c_nationkey, count(*) AS n_cust, {_dsum_sql('c_acctbal')} AS total_bal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(27,8))) / count(*), 6) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q7-style: volume shipping between two nations — double-dimension join
# (nation joined twice under different roles), direction-pair filter,
# per-year trend.  Both nation copies are bounded -> explicit broadcast.
# --------------------------------------------------------------------------

def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("__sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("__cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


ORACLE_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q8-style: national market share — conditional-aggregate ratio (the
# proven q14 decimal pattern) over a 7-table snowflake, per year.
# --------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_regionkey").alias("__cr_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("__cn_key"))
        .join(F.broadcast(region), F.col("__cr_key") == region.r_regionkey)
        .join(F.broadcast(n_supp), sup.s_nationkey == F.col("__sn_key"))
    )
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev)
                .otherwise(F.lit(0.0))
                .cast("decimal(27,8)")
            )
            * 100
            / F.sum(rev.cast("decimal(27,8)")),
            6,
        ).cast("double").alias("mkt_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       CAST(round(
         sum(CAST(CASE WHEN n2.n_name = 'NATION_3'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                  AS DECIMAL(27,8))) * 100
         / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))),
       6) AS DOUBLE) AS mkt_share_pct,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q9-style: product-type profit by nation and year.  The fixture has no
# partsupp, so supply cost is modeled as 10% of p_retailprice — the
# plan shape (part filter, 4-way join, negative term in the aggregate)
# is q9's.
# --------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
    ).agg(dsum(amount).alias("sum_profit"))


ORACLE_PRODUCT_PROFIT = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {_dsum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity')} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q13-style: customer order-count distribution — LEFT OUTER join so
# zero-order customers count, then a second aggregate over the first
# (distribution of a distribution).  Two shuffles, both necessary.
# --------------------------------------------------------------------------

def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_outer"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q15-style: top supplier(s) by quarterly revenue — aggregate, scalar
# max over the aggregate (single-row broadcast), equality join-back.
# Revenue stays DECIMAL until after the equality test, so the max
# comparison is exact in both engines.
# --------------------------------------------------------------------------

def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,8)"))
        .alias("__total")
    )
    # Deliberate global window (WindowExec warns): the max runs over
    # the POST-AGGREGATE relation — 3 narrow columns, one row per
    # supplier (~0.01% of lineitem) — instead of the scalar-aggregate
    # join-back that scans lineitem twice (Spark does not reuse the
    # duplicated subtree; measured: 2 full fact scans).  The fact table
    # is read once; the bounded single-partition pass is the strictly
    # cheaper side of that trade at 100 TB.  See SCALE.md §Analytics.
    top = rev.withColumn("__max", F.max("__total").over(Window.partitionBy()))
    return (
        top.filter(F.col("__total") == F.col("__max"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("__total", 2).cast("double").alias("total_revenue"),
        )
    )


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(total, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total = (SELECT max(total) FROM rev)
"""


# --------------------------------------------------------------------------
# q17-style: small-quantity revenue — correlated per-part average
# subquery, decorrelated into a groupBy + join-back.  The threshold
# comparison is rearranged to stay in exact arithmetic
# (qty * 5 * n < sum  <=>  qty < 0.2 * avg), so no engine ever divides.
# --------------------------------------------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 5)
    )
    # Per-part stats via ONE window over the part-joined relation, not
    # a second lineitem aggregate joined back (which duplicates the
    # fact scan — measured, no subtree reuse).  The inner part join
    # only drops WHOLE parts (its predicates are part-level), so
    # within-part sums/counts are unchanged, and only the ~1/brand
    # fraction of lineitem rides the window exchange.  Both window
    # functions share partitioning -> one exchange.
    w_part = Window.partitionBy("l_partkey")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .withColumn(
            "__qty_sum",
            F.sum(F.col("l_quantity").cast("decimal(27,8)")).over(w_part),
        )
        .withColumn("__n", F.count(F.lit(1)).over(w_part))
        .filter(
            F.col("l_quantity").cast("decimal(27,8)") * 5 * F.col("__n")
            < F.col("__qty_sum")
        )
    )
    return j.agg(
        dsum(F.col("l_extendedprice")).alias("total_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_SMALL_QUANTITY_REVENUE = f"""
SELECT {_dsum_sql('l_extendedprice')} AS total_price, count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(27,8))) AS qty_sum,
         count(*) AS n
  FROM lineitem GROUP BY l_partkey
) pp ON l_partkey = pp.pk
WHERE p_brand = 'Brand#1' AND p_size < 5
  AND CAST(l_quantity AS DECIMAL(27,8)) * 5 * n < qty_sum
"""


# --------------------------------------------------------------------------
# q11-style: important part values — per-group aggregate kept only when
# it exceeds a multiple of the MEAN per-group aggregate (scalar-
# subquery HAVING).  Unlike TPC-H q11's fixed fraction-of-total
# threshold — which vacuously filters everything once the part count
# grows (0 rows at sf0.1) — the 2x-mean cut is scale-invariant.
# Both sums are exact decimals, identical in both engines; the
# threshold comparison is done in double space (identical decimal ->
# identical double -> identical comparison; the divisor is an exact
# integer count).  The fixture has no partsupp table (TESTDATA.md),
# so "stock value" is shipped revenue per part from NATION_3's
# suppliers — same plan shape as TPC-H q11: agg, single-row
# broadcast, filter.
# --------------------------------------------------------------------------

def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    j = li.join(sup, li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    )
    val = j.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,8)")
        ).alias("__val")
    )
    total = val.agg(
        F.sum("__val").alias("__total"), F.count(F.lit(1)).alias("__cnt")
    )
    return (
        val.join(F.broadcast(total))
        .filter(
            F.col("__val").cast("double")
            > F.col("__total").cast("double") / F.col("__cnt") * 2.0
        )
        .select(
            "l_partkey", F.round("__val", 2).cast("double").alias("part_value")
        )
    )


ORACLE_IMPORTANT_PART_VALUE = """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,8))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
FROM val
WHERE CAST(v AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) / count(*) * 2.0 FROM val)
"""


# --------------------------------------------------------------------------
# q12-style: shipping-delay priority distribution — derived grouping
# key (CASE over datediff; the fixture has no l_shipmode, TESTDATA.md)
# + conditional-aggregate pivot, the TPC-H q12 shape.  Counts stay
# BIGINT on both engines (the round-1 HUGEINT lesson).
# --------------------------------------------------------------------------

def q_ship_priority_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_SHIP_PRIORITY_DIST = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q20-style: dominant part suppliers — suppliers who shipped more than
# a tenth of a small part's total shipped quantity, semi-joined into
# the supplier dim (no partsupp availqty in the fixture; same shape as
# TPC-H q20's nested-aggregate + IN).  Share test is exact decimal
# arithmetic (qty*10 > total), no division; 10% is the largest
# threshold that yields non-empty results at both sf0.01 and sf0.1
# (each part has ~30+ supplier lines in the fixture).
# --------------------------------------------------------------------------

def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 3)
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    # ONE lineitem scan: the per-part total is a window SUM over the
    # (part, supplier) pre-aggregate — exact decimal sums nest
    # losslessly — not a second aggregate joined back (which would
    # duplicate the scan subtree; Spark does not reuse it).  The part
    # semi-join runs BEFORE the window: it drops whole l_partkey
    # partitions, so within-part totals are unchanged and only small
    # parts' rows ride the window exchange.
    base = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,8)")).alias("__ps_qty")
    )
    ps = base.join(part, base.l_partkey == part.p_partkey, "left_semi")
    dominant = (
        ps.withColumn(
            "__p_qty", F.sum("__ps_qty").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("__ps_qty") * 10 > F.col("__p_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


ORACLE_DOMINANT_SUPPLIERS = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
  AND s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(27,8))) AS ps_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 3)
      GROUP BY 1, 2
    ) a
    JOIN (
      SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(27,8))) AS p_qty
      FROM lineitem GROUP BY 1
    ) b ON a.l_partkey = b.pk
    WHERE ps_qty * 10 > p_qty
  )
"""


# --------------------------------------------------------------------------
# q21-style: the supplier who held up the order — finished multi-
# supplier orders where exactly ONE supplier attains the latest ship
# date and that date is >60 days past the order date; count per
# supplier.  TPC-H q21's EXISTS / NOT-EXISTS pair becomes one window
# pass over (order, supplier) aggregates: a single shuffle on
# l_orderkey instead of two correlated re-scans of lineitem — the
# formulation that survives 100 TB (no receiptdate/commitdate in the
# fixture; lateness is ship-vs-order-date, TESTDATA.md).
# --------------------------------------------------------------------------

def q_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    # ONE exchange serves both the (orderkey, suppkey) aggregate and
    # the per-orderkey windows (r17, guide §2.4): hash-partitioning on
    # l_orderkey satisfies the aggregate's clustered distribution (its
    # keys are a superset) AND the window's, so the explicit
    # repartition replaces the former agg exchange + window re-exchange
    # pair.  Trade: the repartition moves raw (pruned, 3-column) rows
    # where the agg exchange moved map-side partials — at ~1.07
    # lineitems per (orderkey, suppkey) in TPC-H shape the partial
    # reduction is negligible, and one shuffle pass beats two
    # (measured 1.08 -> 0.83 s interleaved at sf0.1; same rows, oracle
    # hash unchanged).
    per = li.repartition("l_orderkey").groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("__s_max")
    )
    w = Window.partitionBy("l_orderkey")
    per = (
        per.withColumn("__o_max", F.max("__s_max").over(w))
        .withColumn("__n_sup", F.count(F.lit(1)).over(w))
        .withColumn(
            "__n_latest",
            F.sum(
                F.when(F.col("__s_max") == F.col("__o_max"), 1).otherwise(0)
            ).over(w),
        )
    )
    culprit = per.filter(
        (F.col("__s_max") == F.col("__o_max"))
        & (F.col("__n_sup") > 1)
        & (F.col("__n_latest") == 1)
    )
    j = culprit.join(orders, culprit.l_orderkey == orders.o_orderkey).filter(
        F.col("__o_max") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        j.join(sup, j.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_WAITING_SUPPLIER = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
  FROM lineitem GROUP BY 1, 2
), win AS (
  SELECT *, max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
         count(*) OVER (PARTITION BY l_orderkey) AS n_sup
  FROM per
), win2 AS (
  SELECT *, CAST(sum(CASE WHEN s_max = o_max THEN 1 ELSE 0 END)
                 OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_latest
  FROM win
)
SELECT s_name, count(*) AS numwait
FROM win2
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_max = o_max AND n_sup > 1 AND n_latest = 1
  AND o_orderstatus = 'F'
  AND s_max > o_orderdate + INTERVAL 60 DAY
GROUP BY s_name
"""


# --------------------------------------------------------------------------
# CUBE: multi-dimensional rollup over (status, priority) — all four
# grouping sets in ONE pass (Spark Expand + single hash aggregate;
# partial aggregation still applies, so the shuffle carries one row
# per (grouping-set, key) per map partition, not the fact table).
# --------------------------------------------------------------------------

def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


ORACLE_CUBE_REVENUE = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       {_dsum_sql('o_totalprice')} AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# PIVOT: long->wide reshaping with an explicit value list (explicit so
# the plan needs no extra distinct-values job and the output schema is
# static — the only pivot formulation that scales: values come from the
# data model, not a collect()).  Same single hash aggregate as a
# conditional-agg rewrite — which is exactly the oracle.
# --------------------------------------------------------------------------

def q_pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
        .withColumnsRenamed({"F": "f_total", "O": "o_total", "P": "p_total"})
    )


ORACLE_PIVOT_STATUS_REVENUE = f"""
SELECT o_orderpriority,
       {_dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS f_total,
       {_dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS o_total,
       {_dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS p_total
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# ntile decile bucketing per market segment — rank-based quantile
# assignment (the feature-bucketing primitive).  Total order within
# each partition via (acctbal, custkey) tie-break makes ntile
# deterministic.  Scale note: ntile needs a full sort per PARTITION BY
# group; parallelism = number of segments (bounded here).  For GLOBAL
# rank bucketing at 100 TB use the corpus_stats percentile path
# (sampled cut points + codegen'd range filter) instead of one window.
# --------------------------------------------------------------------------

def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


ORACLE_CUSTOMER_DECILES = f"""
WITH d AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer
)
SELECT c_mktsegment, decile, count(*) AS n,
       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
       {_dsum_sql('c_acctbal')} AS total_bal
FROM d GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT (distinct semantics) — customer
# retention between two years.  Spark plans both as aggregates +
# left-semi/left-anti joins on the deduped key sets, so the shuffled
# payload is distinct customer keys, never order rows.  UNION ALL of
# the two tagged branches completes the set-op family (U1 covers
# unionByName).  Scan note: orders is read twice (once per year
# branch) — the single-scan rewrite is a conditional-agg
# (max(year=1996), max(year=1997)) groupBy, but this query exists to
# exercise INTERSECT/EXCEPT themselves; both filters push to parquet
# so each scan reads only its year's row groups.
# --------------------------------------------------------------------------

def q_customer_retention_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
    )
    y97 = (
        orders.filter(F.year("o_orderdate") == 1997)
        .select("o_custkey")
        .distinct()
    )
    retained = y96.intersect(y97).withColumn("status", F.lit("retained"))
    churned = y96.subtract(y97).withColumn("status", F.lit("churned"))
    return retained.unionByName(churned)


ORACLE_CUSTOMER_RETENTION_SETOPS = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
),
y97 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
SELECT o_custkey, 'retained' AS status FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT o_custkey, 'churned' AS status FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
"""


# --------------------------------------------------------------------------
# Data profiling: per-column quality report over one scan (operator in
# operators/profile.py — single aggregate, executor-side stack
# unpivot).  String/integer columns only: double min/max would render
# differently per engine.
# --------------------------------------------------------------------------

def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


ORACLE_PROFILE_ORDERS = """
SELECT 'o_orderkey' AS column, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


# --------------------------------------------------------------------------
# FULL OUTER diff: per-customer yearly revenue 1996 vs 1997 through
# the generic table_diff operator (operators/diff.py) — the snapshot-
# reconciliation primitive, here as year-over-year churn analytics.
# --------------------------------------------------------------------------

def q_yoy_customer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")

    def year_rev(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(dsum(F.col("o_totalprice")).alias("rev"))
        )

    return table_diff(year_rev(1996), year_rev(1997), ["o_custkey"], ["rev"])


ORACLE_YOY_CUSTOMER_DIFF = f"""
WITH a AS (
  SELECT o_custkey, {_dsum_sql('o_totalprice')} AS rev_left
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
),
b AS (
  SELECT o_custkey, {_dsum_sql('o_totalprice')} AS rev_right
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
)
SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
       CASE WHEN a.o_custkey IS NULL THEN 'added'
            WHEN b.o_custkey IS NULL THEN 'removed'
            WHEN a.rev_left = b.rev_right THEN 'unchanged'
            ELSE 'changed' END AS diff_status,
       a.rev_left, b.rev_right
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""


# --------------------------------------------------------------------------
# Declarative data-quality validation (operators/validate.py — the
# Deequ/dbt-test shape): row rules in ONE aggregate over ONE scan,
# uniqueness as count - count(distinct), referential integrity as a
# counted anti-join.  Violations are PLANTED deterministically (dup
# keys, negated prices, orphaned custkeys, nulled dates) so every rule
# reports a nonzero, oracle-checkable count.
# --------------------------------------------------------------------------

def q_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import validate

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer")
    dirty = orders.unionByName(
        orders.filter(F.col("o_orderkey") % 100 == 0)
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 97 == 0).select(
            "o_orderkey",
            (-F.col("o_custkey")).alias("o_custkey"),
            (-F.col("o_totalprice")).alias("o_totalprice"),
            F.lit(None).cast("date").alias("o_orderdate"),
        )
    )
    return validate(
        dirty,
        row_rules=[
            ("totalprice_nonneg", F.col("o_totalprice") < 0),
            ("orderdate_not_null", F.col("o_orderdate").isNull()),
        ],
        unique_keys=[["o_orderkey"]],
        foreign_keys=[(["o_custkey"], customer, ["c_custkey"])],
    )


ORACLE_VALIDATE_ORDERS = """
WITH dirty AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
  WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, -o_custkey, -o_totalprice, CAST(NULL AS DATE) FROM orders
  WHERE o_orderkey % 97 = 0
)
SELECT 'totalprice_nonneg' AS rule,
       CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) AS violations
FROM dirty
UNION ALL
SELECT 'orderdate_not_null',
       CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) FROM dirty
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM dirty
UNION ALL
SELECT 'fk(o_custkey)', CAST(count(*) AS BIGINT) FROM dirty
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


# --------------------------------------------------------------------------
# Entity resolution: blocked approximate string join
# (operators/stringmatch.py).  Two planted typo shapes, both of which
# the default (first token, last token) multi-key blocking must
# recover: every 50th part name loses its LAST character (last-token
# typo, caught by the first-token key) and every 50th-offset-7 name
# loses its FIRST character (first-token typo — the hole the old
# single-key default missed, caught by the last-token key), plus any
# other part name within 2 edits.  The oracle replays the blocking as
# an OR of the two position-aligned keys (one row per qualifying pair
# — same set as Spark's emit-at-first-agreeing-position rule) and the
# same distance predicate; both engines implement textbook
# Levenshtein.
# --------------------------------------------------------------------------

def q_fuzzy_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stringmatch import fuzzy_join

    part = load_table(spark, sf_dir, "part")
    tail_typo = part.filter(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.expr("substring(p_name, 1, length(p_name) - 1)").alias("probe_name"),
    )
    head_typo = part.filter(F.col("p_partkey") % 50 == 7).select(
        F.col("p_partkey").alias("probe_id"),
        F.expr("substring(p_name, 2)").alias("probe_name"),
    )
    return fuzzy_join(
        tail_typo.unionByName(head_typo),
        part.select("p_partkey", "p_name"),
        "probe_name",
        "p_name",
        max_distance=2,
    ).select("probe_id", "p_partkey", "probe_name", "p_name", "distance")


ORACLE_FUZZY_JOIN_PARTS = """
WITH probe AS (
  SELECT p_partkey AS probe_id,
         substring(p_name, 1, length(p_name) - 1) AS probe_name
  FROM part WHERE p_partkey % 50 = 0
  UNION ALL
  SELECT p_partkey AS probe_id, substring(p_name, 2) AS probe_name
  FROM part WHERE p_partkey % 50 = 7
)
SELECT probe_id, p.p_partkey, probe_name, p_name,
       levenshtein(probe_name, p_name) AS distance
FROM probe JOIN part p
  ON (string_split_regex(regexp_replace(probe_name, '^\\s+|\\s+$', '', 'g'), '\\s+')[1] = string_split_regex(regexp_replace(p_name, '^\\s+|\\s+$', '', 'g'), '\\s+')[1]
      OR string_split_regex(regexp_replace(probe_name, '^\\s+|\\s+$', '', 'g'), '\\s+')[-1] = string_split_regex(regexp_replace(p_name, '^\\s+|\\s+$', '', 'g'), '\\s+')[-1])
 AND abs(length(probe_name) - length(p_name)) <= 2
WHERE levenshtein(probe_name, p_name) <= 2
"""


QUERIES = {
    "q1_pricing_summary": q_pricing_summary,
    "q3_shipping_priority": q_shipping_priority,
    "q4_order_priority": q_order_priority,
    "q5_local_supplier_volume": q_local_supplier_volume,
    "q6_revenue_forecast": q_revenue_forecast,
    "q7_volume_shipping": q_volume_shipping,
    "q8_market_share": q_market_share,
    "q9_product_profit": q_product_profit,
    "q10_returned_revenue": q_returned_revenue,
    "q11_important_part_value": q_important_part_value,
    "q12_ship_priority_dist": q_ship_priority_dist,
    "q13_customer_distribution": q_customer_distribution,
    "q15_top_supplier": q_top_supplier,
    "q17_small_quantity_revenue": q_small_quantity_revenue,
    "q20_dominant_suppliers": q_dominant_suppliers,
    "q21_waiting_supplier": q_waiting_supplier,
    "q14_promo_revenue": q_promo_revenue,
    "q16_brand_supplier_count": q_brand_supplier_count,
    "q18_large_orders": q_large_orders,
    "q19_bracket_revenue": q_bracket_revenue,
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "pivot_status_revenue": q_pivot_status_revenue,
    "customer_deciles": q_customer_deciles,
    "customer_retention_setops": q_customer_retention_setops,
    "yoy_customer_diff": q_yoy_customer_diff,
    "profile_orders": q_profile_orders,
    "fuzzy_join_parts": q_fuzzy_join_parts,
    "validate_orders": q_validate_orders,
    "top_orders_per_customer": q_top_orders_per_customer,
    "daily_revenue_trend": q_daily_revenue_trend,
    "q2_best_supplier_per_part": q_best_supplier_per_part,
    "q22_sales_opportunity": q_sales_opportunity,
}

ORACLE = {
    "daily_revenue_trend": ORACLE_DAILY_REVENUE_TREND,
    "q2_best_supplier_per_part": ORACLE_BEST_SUPPLIER_PER_PART,
    "q22_sales_opportunity": ORACLE_SALES_OPPORTUNITY,
    "q1_pricing_summary": ORACLE_PRICING_SUMMARY,
    "q3_shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "q4_order_priority": ORACLE_ORDER_PRIORITY,
    "q5_local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "q6_revenue_forecast": ORACLE_REVENUE_FORECAST,
    "q7_volume_shipping": ORACLE_VOLUME_SHIPPING,
    "q8_market_share": ORACLE_MARKET_SHARE,
    "q9_product_profit": ORACLE_PRODUCT_PROFIT,
    "q10_returned_revenue": ORACLE_RETURNED_REVENUE,
    "q11_important_part_value": ORACLE_IMPORTANT_PART_VALUE,
    "q12_ship_priority_dist": ORACLE_SHIP_PRIORITY_DIST,
    "q13_customer_distribution": ORACLE_CUSTOMER_DISTRIBUTION,
    "q15_top_supplier": ORACLE_TOP_SUPPLIER,
    "q17_small_quantity_revenue": ORACLE_SMALL_QUANTITY_REVENUE,
    "q20_dominant_suppliers": ORACLE_DOMINANT_SUPPLIERS,
    "q21_waiting_supplier": ORACLE_WAITING_SUPPLIER,
    "q14_promo_revenue": ORACLE_PROMO_REVENUE,
    "q16_brand_supplier_count": ORACLE_BRAND_SUPPLIER_COUNT,
    "q18_large_orders": ORACLE_LARGE_ORDERS,
    "q19_bracket_revenue": ORACLE_BRACKET_REVENUE,
    "rollup_revenue": ORACLE_ROLLUP_REVENUE,
    "cube_revenue": ORACLE_CUBE_REVENUE,
    "pivot_status_revenue": ORACLE_PIVOT_STATUS_REVENUE,
    "customer_deciles": ORACLE_CUSTOMER_DECILES,
    "customer_retention_setops": ORACLE_CUSTOMER_RETENTION_SETOPS,
    "yoy_customer_diff": ORACLE_YOY_CUSTOMER_DIFF,
    "profile_orders": ORACLE_PROFILE_ORDERS,
    "fuzzy_join_parts": ORACLE_FUZZY_JOIN_PARTS,
    "validate_orders": ORACLE_VALIDATE_ORDERS,
    "top_orders_per_customer": ORACLE_TOP_ORDERS_PER_CUSTOMER,
}
