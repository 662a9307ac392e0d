"""Stage-driver CLI e2e: land -> daily merge -> history promote through
the argparse entry points, reference ``--mode`` parity included."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from spark_cdc_replication_spark import cli
from spark_cdc_replication_spark.fixtures import CDC_PAYLOAD_SCHEMA, cdc_envelope
from spark_cdc_replication_spark.schemas import SchemaRegistry


@pytest.fixture()
def cfg_path(spark, sf_dir, tmp_path):
    SchemaRegistry(tmp_path / "schemas").save("events_cli", CDC_PAYLOAD_SCHEMA)
    cfg = {
        "name": "events_cli",
        "primary_keys": ["id"],
        "order_by": ["timestamp", "event_id"],
        "data_dir": str(tmp_path / "raw"),
        "ckpt_dir": str(tmp_path / "ckpt"),
        "schema_dir": str(tmp_path / "schemas"),
    }
    p = tmp_path / "events.json"
    p.write_text(json.dumps(cfg))
    cdc_envelope(spark, sf_dir).write.parquet(str(tmp_path / "incoming"))
    return p, tmp_path


def test_cli_land_merge_promote(spark, cfg_path, monkeypatch):
    cfg, tmp_path = cfg_path
    for t in ("events_cli_daily", "events_cli_history", "events_cli_history__staging"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    # stage 1: raw-load from the file-stream source
    rc = cli.main(
        ["raw-load", "--config", str(cfg), "--source", str(tmp_path / "incoming")],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "raw")).count() > 0

    # stage 2: daily-load, manual mode with explicit --date
    rc = cli.main(
        ["daily-load", "--config", str(cfg), "--mode", "manual", "--date", "2024-01-05"],
        spark=spark,
    )
    assert rc == 0
    n_daily = spark.table("events_cli_daily").count()
    assert n_daily > 0

    # stage 3: history-load, airflow mode (date from $ds like the
    # reference's history_load.py) — merges into history and truncates
    # the daily table per the reference lifecycle
    monkeypatch.setenv("ds", "2024-01-05")
    rc = cli.main(
        ["history-load", "--config", str(cfg), "--mode", "airflow"], spark=spark
    )
    assert rc == 0
    assert spark.table("events_cli_history").count() > 0
    assert spark.table("events_cli_daily").count() == 0


def test_cli_tick_reproduces_dag_cadence(spark, sf_dir, tmp_path, monkeypatch):
    """Two scheduler ticks through the `tick` subcommand — hour 23
    (raw+daily only) then hour 0 (plus history) — reproduce the
    reference DAG's hourly + hour-0 branch end-to-end: the second tick
    drains only the NEW envelope files (checkpointed file stream),
    re-merges the day, promotes it to history, and truncates daily."""
    SchemaRegistry(tmp_path / "schemas").save("events_tick", CDC_PAYLOAD_SCHEMA)
    cfg = {
        "name": "events_tick",
        "primary_keys": ["id"],
        "order_by": ["timestamp", "event_id"],
        "data_dir": str(tmp_path / "raw"),
        "ckpt_dir": str(tmp_path / "ckpt"),
        "schema_dir": str(tmp_path / "schemas"),
    }
    p = tmp_path / "events_tick.json"
    p.write_text(json.dumps(cfg))
    for t in ("events_tick_daily", "events_tick_history", "events_tick_history__staging"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    incoming = str(tmp_path / "incoming")
    split = "2024-01-05 12:00:00"
    day = ("ts >= '2024-01-05 00:00:00' AND ts < '2024-01-06 00:00:00'")
    cdc_envelope(spark, sf_dir, where=f"{day} AND ts < '{split}'").write.mode(
        "append"
    ).parquet(incoming)

    def tick(hour: int) -> int:
        return cli.main(
            [
                "tick", "--config", str(p), "--source", incoming,
                "--mode", "manual", "--date", "2024-01-05", "--hour", str(hour),
            ],
            spark=spark,
        )

    assert tick(23) == 0
    raw_after_1 = spark.read.parquet(str(tmp_path / "raw")).count()
    daily_after_1 = spark.table("events_tick_daily").count()
    assert raw_after_1 > 0 and daily_after_1 > 0
    assert not spark.catalog.tableExists("events_tick_history")

    # the next hour's drop arrives, and the hour-0 tick runs history
    cdc_envelope(spark, sf_dir, where=f"{day} AND ts >= '{split}'").write.mode(
        "append"
    ).parquet(incoming)
    assert tick(0) == 0
    raw_after_2 = spark.read.parquet(str(tmp_path / "raw")).count()
    assert raw_after_2 > raw_after_1  # second drop landed incrementally
    assert spark.table("events_tick_history").count() > 0
    assert spark.table("events_tick_daily").count() == 0  # truncated


def test_cli_tick_crash_between_daily_and_history_converges(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Exactly-once for the ORCHESTRATED sequence, not just each stage:
    an hour-0 tick dies after the daily promote but before the history
    merge (the process-kill window the per-stage retry tests don't
    cover); re-running the same tick must converge to the state an
    uninterrupted tick produces — no duplicated raw rows (checkpointed
    stream), no double-applied changes (staging-swap daily merge), and
    a history table identical to the single-run outcome."""
    SchemaRegistry(tmp_path / "schemas").save("events_crash", CDC_PAYLOAD_SCHEMA)
    cfg = {
        "name": "events_crash",
        "primary_keys": ["id"],
        "order_by": ["timestamp", "event_id"],
        "data_dir": str(tmp_path / "raw"),
        "ckpt_dir": str(tmp_path / "ckpt"),
        "schema_dir": str(tmp_path / "schemas"),
    }
    p = tmp_path / "events_crash.json"
    p.write_text(json.dumps(cfg))
    for t in (
        "events_crash_daily",
        "events_crash_history",
        "events_crash_history__staging",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    incoming = str(tmp_path / "incoming")
    day = "ts >= '2024-01-05 00:00:00' AND ts < '2024-01-06 00:00:00'"
    cdc_envelope(spark, sf_dir, where=day).write.mode("append").parquet(incoming)

    def tick() -> int:
        return cli.main(
            [
                "tick", "--config", str(p), "--source", incoming,
                "--mode", "manual", "--date", "2024-01-05", "--hour", "0",
            ],
            spark=spark,
        )

    # First attempt: the process dies between the daily promote and the
    # history merge — raw-load and daily-load have committed, the
    # history stage never ran.
    real_history_load = cli.cmd_history_load

    def killed(args, spark):
        raise RuntimeError("simulated process kill before history merge")

    monkeypatch.setattr(cli, "cmd_history_load", killed)
    with pytest.raises(RuntimeError, match="simulated process kill"):
        tick()
    raw_after_crash = spark.read.parquet(str(tmp_path / "raw")).count()
    daily_after_crash = spark.table("events_crash_daily").count()
    assert raw_after_crash > 0 and daily_after_crash > 0
    assert not spark.catalog.tableExists("events_crash_history")

    # The cron retries the SAME tick.  Raw must not re-land drained
    # files, daily must re-merge idempotently, history must promote.
    monkeypatch.setattr(cli, "cmd_history_load", real_history_load)
    assert tick() == 0
    assert spark.read.parquet(str(tmp_path / "raw")).count() == raw_after_crash
    assert spark.table("events_crash_daily").count() == 0  # truncated
    history = {
        tuple(r) for r in spark.table("events_crash_history").collect()
    }

    # Convergence oracle: an uninterrupted pipeline over the same
    # envelope produces byte-identical history content.
    from spark_cdc_replication_spark.operators.cdc_parse import parse_envelope
    from spark_cdc_replication_spark.operators.merge import apply_changes

    expected_df = apply_changes(
        parse_envelope(
            spark.read.parquet(incoming), CDC_PAYLOAD_SCHEMA
        ),
        ["id"],
        ["timestamp", "event_id"],
    )
    expected = {
        tuple(r)
        for r in expected_df.select(*spark.table("events_crash_history").columns).collect()
    }
    assert history == expected


def test_cli_raw_load_requires_source_or_kafka(spark, cfg_path):
    cfg, _ = cfg_path
    assert cli.main(["raw-load", "--config", str(cfg)], spark=spark) == 2


def test_cli_increment_mode(spark, cfg_path, tmp_path):
    cfg, base = cfg_path
    conf = json.loads(cfg.read_text())
    conf["mode"] = "increment"
    inc_cfg = base / "events_inc.json"
    inc_cfg.write_text(json.dumps(conf))
    spark.sql("DROP TABLE IF EXISTS events_cli_history_inc")
    cli.main(
        ["raw-load", "--config", str(inc_cfg), "--source", str(base / "incoming")],
        spark=spark,
    )
    rc = cli.main(
        [
            "history-load", "--config", str(inc_cfg),
            "--mode", "manual", "--date", "2024-01-05",
            "--history-table", "events_cli_history_inc",
        ],
        spark=spark,
    )
    assert rc == 0
    assert spark.table("events_cli_history_inc").count() > 0


def test_cli_compact_day(spark, cfg_path):
    import glob
    import os

    cfg, base = cfg_path
    cli.main(
        ["raw-load", "--config", str(cfg), "--source", str(base / "incoming")],
        spark=spark,
    )
    raw = json.loads(cfg.read_text())["data_dir"]
    day_rows = spark.read.parquet(raw).filter("op_day = 5").count()
    assert day_rows > 0
    # streaming-landed root: the sink's _spark_metadata log is the
    # authoritative file list, so compaction refuses without --seal
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seal"):
        cli.main(
            ["compact", "--config", str(cfg), "--mode", "manual", "--date", "2024-01-05"],
            spark=spark,
        )
    rc = cli.main(
        [
            "compact", "--config", str(cfg), "--mode", "manual",
            "--date", "2024-01-05", "--seal",
        ],
        spark=spark,
    )
    assert rc == 0
    files = glob.glob(os.path.join(raw, "op_year=*", "op_month=*", "op_day=5", "*.parquet"))
    assert len(files) == 1
    assert spark.read.parquet(raw).filter("op_day = 5").count() == day_rows


def test_cli_validate_quality_gate(spark, tmp_path):
    """The validate subcommand runs the config's declarative rules on
    a catalog table: clean table -> rc 0; planted violations -> rc 1
    (failing the scheduler step) unless --warn-only."""
    import json

    spark.sql("DROP TABLE IF EXISTS qa_dim")
    spark.sql("DROP TABLE IF EXISTS qa_tbl_daily")
    spark.createDataFrame([(1,), (2,)], "k long").write.saveAsTable("qa_dim")
    spark.createDataFrame(
        [(1, 1, 5.0), (2, 2, 3.0)], "id long, k long, value double"
    ).write.saveAsTable("qa_tbl_daily")

    cfg = tmp_path / "qa.json"
    cfg.write_text(
        json.dumps(
            {
                "name": "qa_tbl",
                "primary_keys": ["id"],
                "quality": {
                    "not_null": ["id"],
                    "non_negative": ["value"],
                    "unique": [["id"]],
                    "fk": [{"cols": ["k"], "ref_table": "qa_dim", "ref_cols": ["k"]}],
                },
            }
        )
    )
    assert cli.main(["validate", "--config", str(cfg)], spark=spark) == 0

    # plant: duplicate id, negative value, orphan k
    spark.createDataFrame(
        [(2, 99, -1.0)], "id long, k long, value double"
    ).write.insertInto("qa_tbl_daily")
    assert cli.main(["validate", "--config", str(cfg)], spark=spark) == 1
    assert (
        cli.main(["validate", "--config", str(cfg), "--warn-only"], spark=spark) == 0
    )
