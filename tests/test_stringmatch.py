"""Blocked fuzzy join (operators/stringmatch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.stringmatch import first_token, fuzzy_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "golden lace"), (2, "navy spring"), (3, "rose metalic")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [
            (10, "golden lace"),      # exact (d=0 to lid 1)
            (11, "golden lacy"),      # d=1 to lid 1
            (12, "golden brocade"),   # same block, d>2
            (13, "navy sprint"),      # d=1 to lid 2
            (14, "wavy spring"),      # d=1 to lid 2 BUT block differs
            (15, "rose metallic"),    # d=1 to lid 3
        ],
        "rid long, rname string",
    )
    return left, right


def test_matches_and_distances(spark):
    left, right = _sides(spark)
    out = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    got = {(r.lid, r.rid): r.distance for r in out.collect()}
    assert got == {(1, 10): 0, (1, 11): 1, (2, 13): 1, (3, 15): 1}


def test_block_miss_is_the_documented_contract(spark):
    """'wavy spring' is 1 edit from 'navy spring' but its first token
    differs — blocked out by design; loosening the block recovers it."""
    left, right = _sides(spark)
    strict = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    assert (14 not in {r.rid for r in strict.collect()})
    loose = fuzzy_join(
        left, right, "lname", "rname", max_distance=2,
        block=lambda c: F.length(c) * 0 + 1,  # degenerate: one block
    )
    assert (2, 14) in {(r.lid, r.rid) for r in loose.collect()}


def test_plan_is_single_equi_join(spark):
    left, right = _sides(spark)
    out = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
