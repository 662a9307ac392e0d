"""Unit tests: as-of join, sessionization, tumbling windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_cdc_replication_spark.operators.asofjoin import asof_join
from spark_cdc_replication_spark.operators.windows import sessionize, tumbling_counts


def ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(30), "p2"), (2, ts(5), "p3")],
        "k int, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 100.0), (1, ts(20), 200.0), (3, ts(0), 999.0)],
        "k int, ts timestamp, feat double",
    )
    out = {
        (r.k, r.name): (r.feat, r.ts_right)
        for r in asof_join(left, right, on=["k"], ts_col="ts").collect()
    }
    assert out[(1, "p1")] == (100.0, ts(0))   # latest right at-or-before 12:10
    assert out[(1, "p2")] == (200.0, ts(20))  # newer right wins
    assert out[(2, "p3")] == (None, None)     # no right rows for key 2


def test_asof_join_equal_ts_is_visible(spark):
    left = spark.createDataFrame([(1, ts(10), "p")], "k int, ts timestamp, name string")
    right = spark.createDataFrame([(1, ts(10), 7.0)], "k int, ts timestamp, feat double")
    [row] = asof_join(left, right, on=["k"], ts_col="ts").collect()
    assert row.feat == 7.0  # right row AT the left timestamp matches


def test_asof_join_suffixes_collisions(spark):
    left = spark.createDataFrame([(1, ts(10), 1.0)], "k int, ts timestamp, value double")
    right = spark.createDataFrame([(1, ts(5), 2.0)], "k int, ts timestamp, value double")
    [row] = asof_join(left, right, on=["k"], ts_col="ts").collect()
    assert row.value == 1.0 and row.value_right == 2.0


def test_asof_join_null_payload_is_not_backfilled(spark):
    # The nearest right row carries a NULL in one payload column; an
    # older right row holds a non-NULL there.  merge_asof semantics: the
    # matched row is carried ATOMICALLY, so the NULL must survive — no
    # per-column backfill from a different row ("chimera" match).
    left = spark.createDataFrame(
        [(1, ts(30), "p")], "k int, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [(1, ts(0), 100.0, "old"), (1, ts(20), None, "new")],
        "k int, ts timestamp, feat double, tag string",
    )
    [row] = asof_join(left, right, on=["k"], ts_col="ts").collect()
    assert row.tag == "new" and row.ts_right == ts(20)
    assert row.feat is None  # NOT 100.0 from the older row

    # Same atomicity under tolerance: the only in-tolerance row has a
    # NULL payload; the non-NULL value lives on an out-of-tolerance row
    # and must not leak through.
    [trow] = asof_join(
        left, right, on=["k"], ts_col="ts", tolerance="15 MINUTE"
    ).collect()
    assert trow.tag == "new" and trow.feat is None


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, ts(0), 1),   # session 1
        (1, ts(29), 2),  # 29 min gap -> same session
        (1, ts(59), 3),  # exactly 30 min gap -> same session (> gap starts new)
        (1, ts(59, 1), 4),
        (2, ts(0), 5),   # separate key -> own session numbering
    ]
    df = spark.createDataFrame(rows, "user int, ts timestamp, eid int")
    big_jump = spark.createDataFrame(
        [(1, ts(0) + dt.timedelta(hours=5), 9)], "user int, ts timestamp, eid int"
    )
    out = sessionize(
        df.unionByName(big_jump), ["user"], "ts", gap="30 minutes", order_tiebreak=["eid"]
    )
    got = {r.eid: r.session_id for r in out.collect()}
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[9] == 2
    assert got[5] == 1


def test_tumbling_alignment(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 5), "a", 1.0),
         (dt.datetime(2024, 1, 1, 5, 59), "a", 2.0),
         (dt.datetime(2024, 1, 1, 6, 0), "a", 4.0)],
        "ts timestamp, g string, value double",
    )
    out = {
        (r.bucket, r.g): (r.n, r.total)
        for r in tumbling_counts(df, "ts", "6 hours", ["g"], agg_col="value").collect()
    }
    assert out[(dt.datetime(2024, 1, 1, 0, 0), "a")] == (2, 3.0)
    assert out[(dt.datetime(2024, 1, 1, 6, 0), "a")] == (1, 4.0)


def test_asof_forward_and_tolerance(spark):
    from spark_cdc_replication_spark.operators.asofjoin import asof_join

    left = spark.createDataFrame(
        [("u", 100, "2024-01-01 10:00:00")], "k string, lid int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("u", 1, "2024-01-01 09:00:00"),
            ("u", 2, "2024-01-01 10:30:00"),
            ("u", 3, "2024-01-01 12:30:00"),
        ],
        "k string, rid int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    back = asof_join(left, right, on=["k"], ts_col="ts").collect()[0]
    assert back.rid == 1  # newest at-or-before 10:00

    fwd = asof_join(left, right, on=["k"], ts_col="ts", direction="forward").collect()[0]
    assert fwd.rid == 2  # earliest at-or-after 10:00

    # tolerance kills the backward match (1h away exactly keeps it; 30min drops it)
    tight = asof_join(
        left, right, on=["k"], ts_col="ts", tolerance="30 MINUTE"
    ).collect()[0]
    assert tight.rid is None
    keep = asof_join(
        left, right, on=["k"], ts_col="ts", tolerance="1 HOUR"
    ).collect()[0]
    assert keep.rid == 1
    # forward tolerance: 30min covers the 10:30 view
    fkeep = asof_join(
        left, right, on=["k"], ts_col="ts", direction="forward", tolerance="30 MINUTE"
    ).collect()[0]
    assert fkeep.rid == 2


def test_asof_equal_timestamp_visible_both_directions(spark):
    from spark_cdc_replication_spark.operators.asofjoin import asof_join

    left = spark.createDataFrame(
        [("u", 100, "2024-01-01 10:00:00")], "k string, lid int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u", 7, "2024-01-01 10:00:00")], "k string, rid int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    for direction in ("backward", "forward"):
        row = asof_join(
            left, right, on=["k"], ts_col="ts", direction=direction
        ).collect()[0]
        assert row.rid == 7, direction
