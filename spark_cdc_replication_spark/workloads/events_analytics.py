"""Event-stream analytics: sessionization, tumbling windows, as-of
join — the [EXT] stream-shaped surface over the ``events`` fixture.

The reference's only temporal operator is the LWW window
(``/root/reference/pipelines/daily_data_handler.py:106-109``); these
generalize it.  Every query here is batch DataFrame algebra that
transfers unchanged to Structured Streaming (``readStream`` +
``withWatermark``) because it uses only event-time columns.

Timestamp precision: the fixture's ``ts`` is parquet TIMESTAMP(NANOS);
Spark reads it truncated to microseconds (fixtures.load_table), so
every oracle CTE applies ``CAST(ts AS TIMESTAMP)`` to pin DuckDB to
the identical microsecond values before any comparison or bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from ..operators.asofjoin import asof_join
from ..operators.merge import latest_per_key
from ..operators.rangejoin import range_join
from ..operators.windows import sessionize, tumbling_counts

#: µs-pinned events relation for every oracle below.
_EV_US = "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"


# --------------------------------------------------------------------------
# Gap-based sessionization (lag + running sum; one shuffle, two frames)
# --------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sessionize(ev, ["user_id"], "ts", gap="30 minutes", order_tiebreak=["event_id"])
    return out.select("user_id", "event_id", "ts", "session_id")


ORACLE_SESSIONIZE = f"""
WITH {_EV_US},
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_id, ts,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM flagged
"""


# --------------------------------------------------------------------------
# Tumbling-window aggregate (epoch-aligned 6h buckets; F.window is the
# same operator Structured Streaming uses for windowed aggs)
# --------------------------------------------------------------------------

def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "ts", "6 hours", ["event_type"], agg_col="value")


ORACLE_TUMBLING = f"""
WITH {_EV_US}
SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(27,8))), 4) AS DOUBLE) AS total
FROM ev
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# As-of join: each purchase paired with the user's latest prior view
# (point-in-time feature lookup).  Merge/union plan — see
# operators/asofjoin.py; the oracle is DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------

def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    # One view per (user, µs-timestamp): ASOF ties are otherwise
    # engine-defined.  Keep the max event_id, same rule as the oracle.
    views = latest_per_key(views, ["user_id", "ts"], ["view_event_id"])
    out = asof_join(purchases, views, on=["user_id"], ts_col="ts")
    return out.select("user_id", "event_id", "ts", "value", "view_event_id", "view_value")


ORACLE_ASOF_PURCHASE_VIEW = f"""
WITH {_EV_US},
purchases AS (
  SELECT user_id, event_id, ts, value FROM ev WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts, event_id AS view_event_id, value AS view_value
  FROM ev WHERE event_type = 'view'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT p.user_id, p.event_id, p.ts, p.value, v.view_event_id, v.view_value
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase paired with the
    user's NEXT view within 1 hour (nulls beyond) — the pandas
    ``merge_asof(direction='forward', tolerance=...)`` contract, run as
    one distributed window pass."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
    )
    # One view per (user, µs): forward ties keep the MIN event_id (the
    # first row the scan meets), so pre-dedup to min like the oracle.
    w_min = F.min("view_event_id")
    views = views.groupBy("user_id", "ts").agg(w_min.alias("view_event_id"))
    out = asof_join(
        purchases, views, on=["user_id"], ts_col="ts",
        direction="forward", tolerance="1 HOUR",
    )
    return out.select("user_id", "event_id", "ts", "value", "view_event_id")


ORACLE_ASOF_FORWARD_TOLERANCE = f"""
WITH {_EV_US},
purchases AS (
  SELECT user_id, event_id, ts, value FROM ev WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts, min(event_id) AS view_event_id
  FROM ev WHERE event_type = 'view' GROUP BY user_id, ts
),
nearest AS (
  SELECT p.user_id, p.event_id, p.ts, p.value, v.view_event_id, v.ts AS v_ts,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY v.ts ASC NULLS LAST) AS rn
  FROM purchases p LEFT JOIN views v
    ON p.user_id = v.user_id AND v.ts >= p.ts
)
SELECT user_id, event_id, ts, value,
       CASE WHEN v_ts <= ts + INTERVAL 1 HOUR THEN view_event_id END AS view_event_id
FROM nearest WHERE rn = 1
"""


def q_range_join_signup_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment via the bucketized range join: views within
    1 hour of the same user's signup.  The plan is an EQUI-join on
    (user_id, hour-bucket) + in-bucket filter — never the
    BroadcastNestedLoopJoin Spark plans for a raw BETWEEN join (plan
    shape asserted in tests/test_plans.py)."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    )
    out = range_join(
        views, signups, point_ts="ts", start_col="start_ts", end_col="end_ts",
        on=["user_id"], bucket="1 hour",
    )
    return out.select("user_id", "signup_event_id", "view_event_id", "ts")


ORACLE_RANGE_JOIN_SIGNUP_VIEWS = f"""
WITH {_EV_US}
SELECT s.user_id, s.event_id AS signup_event_id, v.event_id AS view_event_id, v.ts
FROM ev s JOIN ev v
  ON s.user_id = v.user_id
 AND v.ts >= s.ts AND v.ts <= s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup' AND v.event_type = 'view'
"""


QUERIES = {
    "events_sessionize": q_sessionize,
    "events_tumbling_6h": q_tumbling,
    "asof_purchase_view": q_asof_purchase_view,
    "asof_forward_tolerance": q_asof_forward_tolerance,
    "range_join_signup_views": q_range_join_signup_views,
}

ORACLE = {
    "events_sessionize": ORACLE_SESSIONIZE,
    "events_tumbling_6h": ORACLE_TUMBLING,
    "asof_purchase_view": ORACLE_ASOF_PURCHASE_VIEW,
    "asof_forward_tolerance": ORACLE_ASOF_FORWARD_TOLERANCE,
    "range_join_signup_views": ORACLE_RANGE_JOIN_SIGNUP_VIEWS,
}
