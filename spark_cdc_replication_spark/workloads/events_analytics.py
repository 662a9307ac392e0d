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


QUERIES = {
    "events_sessionize": q_sessionize,
    "events_tumbling_6h": q_tumbling,
    "asof_purchase_view": q_asof_purchase_view,
}

ORACLE = {
    "events_sessionize": ORACLE_SESSIONIZE,
    "events_tumbling_6h": ORACLE_TUMBLING,
    "asof_purchase_view": ORACLE_ASOF_PURCHASE_VIEW,
}
