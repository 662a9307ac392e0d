"""Property-based check of gap sessionization against a direct model:
events of one key, sorted by (ts, id), start a new session exactly when
the gap from the previous event exceeds the threshold; session ids are
1-based and increase in event order."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.windows import sessionize

BASE = dt.datetime(2024, 1, 1)
GAP_MIN = 30

row = st.tuples(st.integers(0, 2), st.integers(0, 500))  # (key, minute tick)
events = st.lists(row, min_size=1, max_size=16)


def model(rows):
    """(key, tick, event_index) -> session id, by the definition."""
    by_key = defaultdict(list)
    for i, (k, t) in enumerate(rows):
        by_key[k].append((t, i))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = 0, None
        for t, i in evs:
            if prev is None or t - prev > GAP_MIN:
                sid += 1
            out[i] = sid
            prev = t
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=events)
def test_sessionize_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=t), i) for i, (k, t) in enumerate(rows)],
        "user_id int, ts timestamp, event_id int",
    )
    out = sessionize(
        df, ["user_id"], "ts", gap=f"{GAP_MIN} minutes", order_tiebreak=["event_id"]
    )
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == model(rows)
