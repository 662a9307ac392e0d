"""SparkSession factory.

Replaces the reference's YARN/Hive-specific builder
(``/root/reference/utils/spark_session_creator.py:35-64``) with a
config-driven builder that works identically on ``local[N]`` and on a
real cluster.  Key deviations from the reference, all deliberate:

* **AQE on by default** — the reference disables auto-broadcast and
  pins shuffle width per stage from Airflow config
  (``history_load.py:40``, ``raw_load.py:19``).  We let adaptive query
  execution coalesce shuffle partitions, convert joins to broadcast at
  runtime, and split skewed partitions instead.
* **UTC session timezone** — deterministic date-part derivation
  (year/month/dayofmonth partition columns) regardless of host tz.
* **Arrow enabled** — all Python<->JVM data movement (pandas UDFs used
  by the [EXT] operators) is Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Tuned for correctness tests on local[N]; on a real cluster these are
#: starting points that AQE adjusts at runtime.
DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing,
    # dynamic broadcast-join selection, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / toPandas round-trips.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics (matches the DuckDB oracle).
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) (e.g. the driver's events.parquet) has no
    # Spark type; read as nanos-since-epoch long, converted at load
    # (fixtures.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Don't let tiny local files produce one giant partition.
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    "spark.sql.shuffle.partitions": "32",
    # local[N] runs everything in the driver JVM; the 1g default heap
    # OOMs on wide plans + 32 concurrent tasks.  (Effective only at JVM
    # launch — a no-op on an already-running external session.)
    "spark.driver.memory": "8g",
    # Keep driver logs usable in CI.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


#: Subset of DEFAULT_CONF that is runtime-settable and required for
#: correctness even on a SparkSession we did not build (the harness
#: driver passes its own session into ``entry(spark)``).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable correctness confs to an externally
    created session (idempotent; safe to call per query)."""
    for k, v in RUNTIME_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session factory already set it
    return spark


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "spark-cdc-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Unlike the reference there is no env-var IPC
    (``raw_load.py:7-9`` parses ``os.environ['settings']`` with
    ``ast.literal_eval``); configuration is explicit arguments.
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or default_master())
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
