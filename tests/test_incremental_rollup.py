"""Incremental view maintenance (operators/incremental.py).

Core invariant (counting IVM): for ANY change log and ANY chain of
time-ordered batch splits,

    fold maintain_rollup over the batches
        == additive_rollup(apply_changes(whole log))

— the maintained aggregate is indistinguishable from a from-scratch
GROUP BY of the final snapshot, including groups that vanish when
deletes empty them.  Model: plain-Python dict replay.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.incremental import (
    additive_rollup,
    maintain_rollup,
)
from spark_cdc_replication_spark.operators.merge import apply_changes, merge_snapshot

KEYS = ["k1", "k2", "k3", "k4"]
DIMS = ["a", "b", None]  # None: NULL dimension value is a group too
OPS = ["c", "u", "d"]

# (key, op, dim, tick)
changes_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(OPS),
        st.sampled_from(DIMS),
        st.integers(0, 99),
    ),
    min_size=0,
    max_size=30,
)

PK, ORDER = ["id"], ["timestamp", "seq"]


def to_df(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (key, op, dim, base + dt.timedelta(minutes=tick), seq, float(tick))
        for (key, op, dim, tick, seq) in rows
    ]
    return spark.createDataFrame(
        data,
        "id string, __op string, dim string, timestamp timestamp, seq long, value double",
    )


def model_rollup(log):
    """Replay ordered by (tick, arrival); delete kills; then GROUP BY dim."""
    state = {}
    for i, (key, op, dim, tick) in sorted(enumerate(log), key=lambda x: (x[1][3], x[0])):
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = (dim, float(tick))
    groups: dict = {}
    for dim, value in state.values():
        n, s = groups.get(dim, (0, 0.0))
        groups[dim] = (n + 1, s + value)
    return {(dim, n, s) for dim, (n, s) in groups.items()}


def collect_rollup(df):
    return {(r.dim, r.n_rows, r.sum_value) for r in df.collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(log=changes_strategy, cuts=st.sets(st.integers(1, 99), max_size=2))
def test_maintained_rollup_equals_recompute(spark, log, cuts):
    seq_log = [(key, op, dim, tick, i) for i, (key, op, dim, tick) in enumerate(log)]
    expected = model_rollup(log)

    # Time-ordered batch chain (same contract as merge_snapshot: a
    # batch holds everything at-or-after the snapshot's horizon).
    bounds = [0, *sorted(cuts), 100]
    batches = [
        [r for r in seq_log if lo <= r[3] < hi]
        for lo, hi in zip(bounds, bounds[1:])
    ]

    snapshot = apply_changes(to_df(spark, batches[0]), PK, ORDER)
    rollup = additive_rollup(snapshot, ["dim"], ["value"])
    for batch_rows in batches[1:]:
        batch = to_df(spark, batch_rows)
        rollup = maintain_rollup(rollup, snapshot, batch, PK, ORDER, ["dim"], ["value"])
        snapshot = merge_snapshot(snapshot, batch, PK, ORDER)

    assert collect_rollup(rollup) == expected
    # ... and the from-scratch rollup of the final snapshot agrees.
    assert collect_rollup(additive_rollup(snapshot, ["dim"], ["value"])) == expected


def test_emptied_group_vanishes(spark):
    """Deletes that empty a dimension group REMOVE the group row."""
    create = to_df(spark, [("k1", "c", "a", 1, 0), ("k2", "c", "b", 1, 1)])
    snapshot = apply_changes(create, PK, ORDER)
    rollup = additive_rollup(snapshot, ["dim"], ["value"])
    assert {r.dim for r in rollup.collect()} == {"a", "b"}

    kill_a = to_df(spark, [("k1", "d", "a", 2, 2)])
    rollup = maintain_rollup(rollup, snapshot, kill_a, PK, ORDER, ["dim"], ["value"])
    assert {r.dim for r in rollup.collect()} == {"b"}


def test_dim_move_retracts_old_group(spark):
    """An update that moves a key across dims retracts from the old
    group and adds to the new one — the two-sided delta."""
    create = to_df(spark, [("k1", "c", "a", 1, 0), ("k2", "c", "a", 1, 1)])
    snapshot = apply_changes(create, PK, ORDER)
    rollup = additive_rollup(snapshot, ["dim"], ["value"])

    move = to_df(spark, [("k1", "u", "b", 5, 2)])
    rollup = maintain_rollup(rollup, snapshot, move, PK, ORDER, ["dim"], ["value"])
    got = {(r.dim, r.n_rows, r.sum_value) for r in rollup.collect()}
    assert got == {("a", 1, 1.0), ("b", 1, 5.0)}


def test_snapshot_touched_only_via_semi_join(spark):
    """Plan shape: the snapshot feeds ONE LeftSemi join on the batch
    key set — the O(history)-work-free contract of incremental
    maintenance (broadcast when keys are hinted bounded)."""
    create = to_df(spark, [("k1", "c", "a", 1, 0), ("k2", "c", "b", 1, 1)])
    snapshot = apply_changes(create, PK, ORDER)
    rollup = additive_rollup(snapshot, ["dim"], ["value"])
    batch = to_df(spark, [("k1", "u", "b", 5, 2)])
    out = maintain_rollup(
        rollup, snapshot, batch, PK, ORDER, ["dim"], ["value"], broadcast_keys=True
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") == 1
    assert "rightHint=(strategy=broadcast)" in plan or "BROADCAST" in plan.upper()
