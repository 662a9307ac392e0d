"""Stage driver CLIs — runnable equivalents of the reference's three
entry points (``/root/reference/raw_load.py:7-28``,
``daily_load.py:11-35``, ``history_load.py:11-47``), so a user of the
reference can drive land -> daily merge -> history promote without
writing glue.

Parity with deliberate differences:

* Config is an explicit JSON file (``--config``), not
  ``ast.literal_eval(os.environ['settings'])`` IPC — same fields, typed
  through :class:`~spark_cdc_replication_spark.config.TableSpec`.
* ``--mode airflow|manual`` matches ``history_load.py:12-22``: airflow
  mode reads the schedule date from the ``ds`` environment variable
  (Airflow's templated var), manual mode takes ``--date`` or prompts
  interactively exactly like the reference's ``input(...)``.  All three
  stages accept it (the reference only wires it into history_load).
* The payload schema comes from the
  :class:`~spark_cdc_replication_spark.schemas.SchemaRegistry` —
  the reference's dead static-schema path, resurrected — never from a
  per-run full-scan inference.

Usage::

    python -m spark_cdc_replication_spark.cli raw-load \
        --config events.json --source /data/incoming
    python -m spark_cdc_replication_spark.cli daily-load \
        --config events.json --mode manual --date 2024-01-05
    python -m spark_cdc_replication_spark.cli history-load \
        --config events.json --mode airflow

Config file fields (all TableSpec fields accepted)::

    {
      "name": "events_cdc",
      "primary_keys": ["id"],
      "order_by": ["timestamp", "event_id"],
      "mode": "merge",                      // or "increment"
      "data_dir": "/data/raw/events",
      "ckpt_dir": "/data/ckpt/events",
      "schema_dir": "json_schemas",         // SchemaRegistry root
      "kafka": {"brokers": "...", "topic": "..."}   // optional, raw-load
    }
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

from pyspark.sql import SparkSession

from .config import TableSpec
from .pipeline import CdcPipeline
from .schemas import SchemaRegistry
from .streaming.ingest import file_stream, kafka_stream


def load_config(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def build_pipeline(spark: SparkSession, cfg: dict) -> CdcPipeline:
    spec = TableSpec(
        name=cfg["name"],
        primary_keys=tuple(cfg["primary_keys"]),
        order_by=tuple(cfg.get("order_by", ("timestamp",))),
        mode=cfg.get("mode", "merge"),
        data_dir=cfg.get("data_dir"),
        ckpt_dir=cfg.get("ckpt_dir"),
        topic=(cfg.get("kafka") or {}).get("topic"),
        merge_policy=cfg.get("merge_policy", "lww"),
        fmt=cfg.get("fmt", "parquet"),
    )
    schema = SchemaRegistry(cfg.get("schema_dir", "json_schemas")).load(spec.name)
    return CdcPipeline(spark, spec, schema)


def resolve_ds(args: argparse.Namespace) -> dt.date:
    """Reference date-resolution rules (``history_load.py:12-24``)."""
    if args.mode == "airflow":
        ds = os.environ["ds"]
    elif getattr(args, "date", None):
        ds = args.date
    else:
        ds = input("Input calc_date in format 'YYYY-MM-DD': ")
    return dt.datetime.strptime(ds, "%Y-%m-%d").date()


def _spark(app_name: str) -> SparkSession:
    from .session import get_spark

    return get_spark(app_name)


def cmd_raw_load(args: argparse.Namespace, spark: SparkSession) -> int:
    """Stage 1: land the CDC envelope stream into the partitioned raw
    layer (``raw_load.py`` / RawHandler.kafka_sink equivalent)."""
    cfg = load_config(args.config)
    pipe = build_pipeline(spark, cfg)
    kafka = cfg.get("kafka")
    if args.source:
        envelope = file_stream(spark, args.source)
    elif kafka:
        envelope = kafka_stream(
            spark,
            brokers=kafka["brokers"],
            topic=kafka["topic"],
            starting_offsets=kafka.get("starting_offsets", "earliest"),
            extra_options=kafka.get("options"),
        )
    else:
        print("raw-load needs --source DIR or a 'kafka' config block", file=sys.stderr)
        return 2
    query = pipe.land(envelope)
    query.awaitTermination(args.timeout)
    print("Ingestion finished.")
    return 0


def cmd_daily_load(args: argparse.Namespace, spark: SparkSession) -> int:
    """Stage 2: merge one day of raw changes into the daily snapshot
    table (``daily_load.py`` / DailyHandler.merge_daily_table)."""
    cfg = load_config(args.config)
    pipe = build_pipeline(spark, cfg)
    day = resolve_ds(args)
    table = args.table or f"{pipe.spec.name}_daily"
    pipe.merge_day(day, table)
    print("Daily merge finished.")
    return 0


def cmd_history_load(args: argparse.Namespace, spark: SparkSession) -> int:
    """Stage 3: fold the day into history (merge mode: merge + truncate
    daily, exactly the reference lifecycle at
    ``history_data_handler.py:211-214``; increment mode: partitioned
    append, ``:143-157``)."""
    cfg = load_config(args.config)
    pipe = build_pipeline(spark, cfg)
    day = resolve_ds(args)
    daily_table = args.daily_table or f"{pipe.spec.name}_daily"
    history_table = args.history_table or f"{pipe.spec.name}_history"
    if pipe.spec.mode == "increment":
        pipe.increment(day, history_table)
    else:
        pipe.promote_history(day, daily_table, history_table)
    print("History merge finished.")
    return 0


def cmd_compact(args: argparse.Namespace, spark: SparkSession) -> int:
    """Maintenance: rewrite one raw day's micro-batch files into
    size-targeted files (no reference counterpart — its coalesce(1)
    increments are the opposite failure mode).  Run after the day's
    daily-load, e.g. from the same scheduler line."""
    from .sources.raw import compact_day

    cfg = load_config(args.config)
    day = resolve_ds(args)
    n = compact_day(
        spark,
        cfg["data_dir"],
        day,
        target_file_bytes=args.target_mb * 1024 * 1024,
        seal=args.seal,
        fmt=cfg.get("fmt", "parquet"),
    )
    print(f"Compaction finished: {n} file(s).")
    return 0


def cmd_tick(args: argparse.Namespace, spark: SparkSession) -> int:
    """One scheduler tick of the reference DAG's cadence
    (``airflow_dags/cdc_ingestion_dag.py:20-61``): every hour raw-load
    then daily-load; when the tick hour is 0, additionally history-load
    — the DAG's ``check_load_history_for_<t>_or_not`` branch as code.
    An hourly cron line ``python -m ...cli tick --config t.json
    --source DIR --mode airflow`` reproduces the whole DAG without an
    Airflow dependency (``--hour`` overrides the wall clock for tests
    and backfills)."""
    rc = cmd_raw_load(args, spark)
    if rc:
        return rc
    rc = cmd_daily_load(args, spark)
    if rc:
        return rc
    hour = args.hour if args.hour is not None else dt.datetime.now().hour
    if hour == 0:
        rc = cmd_history_load(args, spark)
    return rc


def cmd_validate(args: argparse.Namespace, spark: SparkSession) -> int:
    """Quality gate: run the config's declarative rules against a
    catalog table (the merged daily/history snapshot, typically) and
    fail the scheduler step on violations — the gate the reference
    lifecycle lacks entirely (a poisoned upstream lands silently).

    Config block (all fields optional)::

        "quality": {
          "not_null":     ["id", "timestamp"],
          "non_negative": ["value"],
          "unique":       [["id"]],
          "fk":           [{"cols": ["k"], "ref_table": "dim_k",
                            "ref_cols": ["k"]}]
        }

    Row rules share ONE scan; see operators/validate.py for the scale
    shape of each check."""
    from pyspark.sql import functions as F

    from .operators.validate import validate

    cfg = load_config(args.config)
    quality = cfg.get("quality") or {}
    if not quality:
        print("No 'quality' block in config; nothing to validate.")
        return 0
    table = args.table or f"{cfg['name']}_daily"
    df = spark.table(table)
    row_rules = [
        (f"not_null({c})", F.col(c).isNull()) for c in quality.get("not_null", ())
    ] + [
        (f"non_negative({c})", F.col(c) < 0)
        for c in quality.get("non_negative", ())
    ]
    fks = [
        (fk["cols"], spark.table(fk["ref_table"]), fk["ref_cols"])
        for fk in quality.get("fk", ())
    ]
    report = validate(
        df,
        row_rules=row_rules,
        unique_keys=quality.get("unique", ()),
        foreign_keys=fks,
    ).collect()
    bad = 0
    for r in report:
        print(f"{r.rule}: {r.violations}")
        bad += int(r.violations or 0)
    if bad and not args.warn_only:
        print(f"Quality gate FAILED: {bad} violation(s) in {table}.")
        return 1
    print(f"Quality gate passed for {table}.")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="spark-cdc-replication")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p: argparse.ArgumentParser) -> None:
        p.add_argument("--config", required=True, help="table config JSON")
        p.add_argument(
            "--mode",
            choices=("airflow", "manual"),
            default="manual",
            help="airflow: date from $ds; manual: --date or prompt",
        )
        p.add_argument("--date", help="calc date YYYY-MM-DD (manual mode)")

    p_raw = sub.add_parser("raw-load", help="stage 1: stream -> raw layer")
    common(p_raw)
    p_raw.add_argument("--source", help="envelope parquet dir (file-stream source)")
    p_raw.add_argument("--timeout", type=int, default=600, help="await seconds")
    p_raw.set_defaults(func=cmd_raw_load)

    p_daily = sub.add_parser("daily-load", help="stage 2: raw day -> daily table")
    common(p_daily)
    p_daily.add_argument("--table", help="daily table name (default <name>_daily)")
    p_daily.set_defaults(func=cmd_daily_load)

    p_hist = sub.add_parser("history-load", help="stage 3: daily -> history")
    common(p_hist)
    p_hist.add_argument("--daily-table", help="default <name>_daily")
    p_hist.add_argument("--history-table", help="default <name>_history")
    p_hist.set_defaults(func=cmd_history_load)

    p_cmp = sub.add_parser("compact", help="maintenance: compact one raw day")
    common(p_cmp)
    p_cmp.add_argument(
        "--target-mb", type=int, default=128, help="target file size (MiB)"
    )
    p_cmp.add_argument(
        "--seal",
        action="store_true",
        help="delete the retired stream's _spark_metadata log first "
        "(required for streaming-landed roots; see compact_day docs)",
    )
    p_cmp.set_defaults(func=cmd_compact)

    p_tick = sub.add_parser(
        "tick", help="one DAG tick: raw+daily hourly, +history at hour 0"
    )
    common(p_tick)
    p_tick.add_argument("--source", help="envelope parquet dir (file-stream source)")
    p_tick.add_argument("--timeout", type=int, default=600, help="await seconds")
    p_tick.add_argument(
        "--hour",
        type=int,
        default=None,
        help="tick hour (default: wall clock); hour 0 runs history-load",
    )
    p_tick.add_argument("--table", help="daily table name (default <name>_daily)")
    p_tick.add_argument("--daily-table", help="default <name>_daily")
    p_tick.add_argument("--history-table", help="default <name>_history")
    p_tick.set_defaults(func=cmd_tick)

    p_val = sub.add_parser(
        "validate", help="quality gate: run the config's rules on a table"
    )
    p_val.add_argument("--config", required=True, help="table config JSON")
    p_val.add_argument("--table", help="catalog table (default <name>_daily)")
    p_val.add_argument(
        "--warn-only",
        action="store_true",
        help="report violations but exit 0 (default: nonzero exit fails the scheduler step)",
    )
    p_val.set_defaults(func=cmd_validate)
    return parser


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = spark or _spark(f"cdc_{args.command}")
    return args.func(args, spark)


if __name__ == "__main__":
    raise SystemExit(main())
