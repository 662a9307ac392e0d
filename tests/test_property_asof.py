"""Property-based check of the as-of join against a direct model:
for every left row, the matched right row is exactly the latest right
row of the same key with ts <= left.ts (ties: any right row AT the
left ts is visible; among equal right timestamps the operator dedups
upstream, so the model sees unique (key, ts))."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.asofjoin import asof_join

BASE = dt.datetime(2024, 1, 1)

row = st.tuples(st.integers(0, 2), st.integers(0, 30))  # (key, tick)
left_rows = st.lists(row, min_size=1, max_size=12)
right_rows = st.lists(row, min_size=0, max_size=12, unique=True)


def ts(tick: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=tick)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(lefts=left_rows, rights=right_rows)
def test_asof_matches_model(spark, lefts, rights):
    left_df = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(lefts)],
        "k int, ts timestamp, lid int",
    )
    right_df = spark.createDataFrame(
        [(k, ts(t), float(t)) for (k, t) in rights],
        "k int, ts timestamp, feat double",
    )
    out = {
        r.lid: r.feat
        for r in asof_join(left_df, right_df, on=["k"], ts_col="ts").collect()
    }
    assert set(out) == set(range(len(lefts)))
    for i, (k, t) in enumerate(lefts):
        prior = [rt for (rk, rt) in rights if rk == k and rt <= t]
        expect = float(max(prior)) if prior else None
        assert out[i] == expect, f"left row {i} key {k} tick {t}"
