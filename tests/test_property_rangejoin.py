"""Property-based check of the bucketized range join against a direct
model: (point, interval) pairs with equal key and start <= ts <= end —
exactly once each, including intervals spanning many buckets, endpoints
ON bucket boundaries, and zero-length intervals."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cdc_replication_spark.operators.rangejoin import range_join

BASE = dt.datetime(2024, 1, 1)


def ts(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


# minute ticks spanning several 1-hour buckets; endpoints frequently on
# exact boundaries (multiples of 60) thanks to the small domain
point = st.tuples(st.integers(0, 2), st.integers(0, 360))
interval = st.tuples(st.integers(0, 2), st.integers(0, 360), st.integers(0, 180))

points = st.lists(point, min_size=1, max_size=10)
intervals = st.lists(interval, min_size=0, max_size=8)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pts=points, ivs=intervals)
def test_range_join_matches_model(spark, pts, ivs):
    pdf = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(pts)],
        "k int, ts timestamp, pid int",
    )
    idf = spark.createDataFrame(
        [(k, ts(s), ts(s + length), j) for j, (k, s, length) in enumerate(ivs)],
        "k int, start_ts timestamp, end_ts timestamp, iid int",
    )
    out = range_join(pdf, idf, "ts", "start_ts", "end_ts", on=["k"], bucket="1 hour")
    got = sorted((r.pid, r.iid) for r in out.collect())
    expect = sorted(
        (i, j)
        for i, (pk, t) in enumerate(pts)
        for j, (ik, s, length) in enumerate(ivs)
        if pk == ik and s <= t <= s + length
    )
    assert got == expect
