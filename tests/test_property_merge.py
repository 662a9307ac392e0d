"""Property-based check of the merge algebra (SURVEY.md §5.2 tier 4).

Invariant: for ANY change log and ANY split point, folding the whole
log equals merging the fold of the prefix (snapshot) with the suffix
(batch) — i.e. ``apply_changes`` is a monoid fold and
``merge_snapshot`` is its incremental step.  The model is a plain
Python dict replay (last-writer-wins, delete removes the key).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.merge import apply_changes, merge_snapshot

KEYS = ["k1", "k2", "k3"]
OPS = ["c", "u", "d"]

# (key, op, seq) — seq is both the timestamp tick and the tie-break id.
changes_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.sampled_from(OPS), st.integers(0, 99)),
    min_size=0,
    max_size=25,
)


def model_fold(log: list[tuple[str, str, int]]) -> dict[str, tuple]:
    """Reference semantics: replay ordered by (ts, seq); delete kills."""
    state: dict[str, tuple] = {}
    for i, (key, op, tick) in sorted(
        enumerate(log), key=lambda x: (x[1][2], x[0])
    ):
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = (key, tick, i)
    return state


def to_df(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (key, op, base + dt.timedelta(minutes=tick), seq, float(tick))
        for (key, op, tick, seq) in rows
    ]
    return spark.createDataFrame(
        data, "id string, __op string, timestamp timestamp, seq long, value double"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(log=changes_strategy, split_tick=st.integers(0, 99))
def test_incremental_merge_equals_full_fold(spark, log, split_tick):
    # Global sequence number = arrival order (the Kafka-offset tie-break).
    seq_log = [(key, op, tick, i) for i, (key, op, tick) in enumerate(log)]
    # CDC batches are time-partitioned (the reference merges whole raw
    # DAYS, daily_data_handler.py:51-58): the batch may only contain
    # changes at-or-after everything already in the snapshot.  An
    # arbitrary index split would let a stale batch overwrite newer
    # snapshot rows — by design (batch wins in CDC replication).
    prefix = [r for r in seq_log if r[2] < split_tick]
    suffix = [r for r in seq_log if r[2] >= split_tick]

    exp_vals = {(k, v[2]) for k, v in model_fold(log).items()}
    pk, order = ["id"], ["timestamp", "seq"]

    full = apply_changes(to_df(spark, seq_log), pk, order)
    assert {(r.id, r.seq) for r in full.collect()} == exp_vals

    snapshot = apply_changes(to_df(spark, prefix), pk, order)
    merged = merge_snapshot(snapshot, to_df(spark, suffix), pk, order)
    assert {(r.id, r.seq) for r in merged.collect()} == exp_vals
