"""Isolated bench-flag adjudication — the SCALE.md recipe as a command.

A REGRESSED/CREEP line in bench.py's stderr is a *candidate*, not a
conviction (calibrated ratios on this host over-correct by tens of
percent; see SCALE.md "Calibration-limit observation").  The standing
adjudication recipe — fresh session, bench-identical warm-up, own
calib, min-of-5 with a fresh query object per run, nothing else on the
machine — has been re-scripted ad hoc every round since r8; this tool
is that recipe, ending at a ready-to-paste markdown row per query.

    python tools/adjudicate.py cdc_snapshot_merge cdc_merge_incremental \
        [--sf-dir /root/testdata/sf0.1] [--baseline BENCH_r08.json] [--runs 5]

Baseline defaults to the newest BENCH_r*.json recorded at the SAME sf
(bench.py's sf-aware rule).  Ratios are host-calibrated: baseline
times are scaled by this session's calib / the baseline's calib before
comparing.  Never run Spark work concurrently with this.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pick_baseline(here: str, sf_val) -> str | None:
    def recorded_sf(path: str):
        try:
            with open(os.path.join(here, path)) as fh:
                d = json.load(fh)
            return (d.get("parsed") or d).get("sf")
        except (OSError, ValueError, AttributeError):
            return None

    def round_no(path: str) -> int:
        # sort by the PARSED round number, not the filename: lexicographic
        # order breaks on unpadded names (BENCH_r9.json > BENCH_r10.json)
        m = re.search(r"BENCH_r(\d+)", path)
        return int(m.group(1)) if m else -1

    same = sorted(
        (
            f
            for f in os.listdir(here)
            if f.startswith("BENCH_r")
            and f.endswith(".json")
            and recorded_sf(f) == sf_val
        ),
        key=round_no,
    )
    return same[-1] if same else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--baseline", default=None, help="BENCH_r*.json to compare against")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    baseline_path = args.baseline or _pick_baseline(here, sf_val)
    prev, prev_calib = {}, None
    if baseline_path:
        with open(os.path.join(here, baseline_path)) as fh:
            doc = json.load(fh)
        parsed = doc.get("parsed") or doc
        prev, prev_calib = parsed.get("queries", {}), parsed.get("calib_sec")

    from spark_cdc_replication_spark.session import get_spark
    from spark_cdc_replication_spark.workloads import collect_registry
    from spark_cdc_replication_spark.workloads.cdc import warm_changes
    from spark_cdc_replication_spark.workloads.llmdata import warm_indexes

    queries, _ = collect_registry()
    unknown = [q for q in args.queries if q not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("adjudicate")
    # bench-identical warm-up: JVM + Python worker pool + shared state
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(32).select(_warm(col("id"))).count()
    warm_changes(spark, args.sf_dir)
    warm_indexes(spark, args.sf_dir)

    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(2 * 10**8).selectExpr("sum(cast(hash(id) as bigint))").collect()
        spark.range(4_000_000).repartition(32, "id").selectExpr(
            "count(distinct id % 1000000)"
        ).collect()
        calib = min(calib, time.perf_counter() - t0)
    calib = round(calib, 3)

    print(f"isolated session: sf={sf_val} calib={calib} runs={args.runs} "
          f"baseline={baseline_path or 'none'} (calib {prev_calib})")
    print("| query | baseline | isolated | raw ratio | calibrated |")
    print("|---|---|---|---|---|")
    scale = (calib / prev_calib) if prev_calib else None
    for name in args.queries:
        fn = queries[name]
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()  # fresh query object per run
            best = min(best, time.perf_counter() - t0)
        best = round(best, 3)
        p = prev.get(name)
        if p and scale:
            print(
                f"| `{name}` | {p} s | {best} s | {best / p:.2f}x | "
                f"**{best / (p * scale):.2f}x** |"
            )
        elif p:
            print(f"| `{name}` | {p} s | {best} s | {best / p:.2f}x | (no calib) |")
        else:
            print(f"| `{name}` | — | {best} s | — | — |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
