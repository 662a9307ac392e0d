"""Plan-diff for the `decontaminate_corpus` bimodality (VERDICT r13
"What's wrong" #1): the r4-r13 record oscillates 1.3 <-> 2.4 s on
byte-unchanged code, and isolated adjudication reproduces the SLOW
mode (~2.1-2.3 s) while some full-bench sessions record the FAST mode
(~1.3 s).  Hypothesis to test: an AQE join decision flips on the
candidate/verify frames between sessions.  Method: capture the
POST-EXECUTION AQE final plan (isFinalPlan=true) in

  * ``cold``  — fresh session + bench-identical warm-up, nothing else
    run (the adjudicate.py context that reads ~2.1-2.3 s), and
  * ``warm``  — same, but first run the bench's preceding LSH
    siblings (``dedup_corpus`` exactly as bench.py orders them), the
    context in which fast records were taken,

then normalize expression/plan ids + runtime statistics out of both
trees and diff what remains.  Identical normalized trees = host/JIT
variance, not a plan flip.

    python tools/plandiff_decontaminate.py [--sf-dir /root/testdata/sf0.1]
                                           [--runs 3] [--out-dir /tmp]
"""

from __future__ import annotations

import argparse
import difflib
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def final_plan(df) -> str:
    """AQE final physical plan, post-execution."""
    return df._jdf.queryExecution().executedPlan().toString()


def normalize(plan: str) -> str:
    """Strip per-session noise so two plans diff on STRUCTURE only:
    expression ids (#123), plan ids, codegen ids, runtime row/size
    stats, temp paths."""
    p = re.sub(r"#\d+L?", "#x", plan)
    p = re.sub(r"lambda x_\d+", "lambda x_n", p)
    p = re.sub(r"plan_id=\d+", "plan_id=x", p)
    p = re.sub(r"\[id=#?x?\d*\]", "[id=x]", p)
    p = re.sub(r"\(\d+\)", "(n)", p)
    p = re.sub(r"size=\S+", "size=x", p)
    p = re.sub(r"rowCount=\S+", "rowCount=x", p)
    p = re.sub(r"/tmp/\S+", "/tmp/x", p)
    return p


def run_once(spark, sf_dir: str):
    from spark_cdc_replication_spark.workloads.llmdata import QUERIES

    df = QUERIES["decontaminate_corpus"](spark, sf_dir)
    t0 = time.time()
    df.collect()
    return time.time() - t0, final_plan(df)


def session(mode: str, sf_dir: str, runs: int):
    from pyspark.sql.functions import col, pandas_udf

    from spark_cdc_replication_spark.session import get_spark
    from spark_cdc_replication_spark.workloads.llmdata import QUERIES

    spark = get_spark(f"plandiff-{mode}")
    spark.range(1000).selectExpr("sum(id)").collect()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(32).select(_warm(col("id"))).count()

    if mode == "warm":
        # bench.py order: dedup_corpus runs immediately before
        # decontaminate_corpus (same LSH pipeline, warms codegen +
        # parquet footers the way the fast records were taken)
        QUERIES["dedup_corpus"](spark, sf_dir).collect()

    times, plans = [], []
    for _ in range(runs):
        t, p = run_once(spark, sf_dir)
        times.append(t)
        plans.append(p)
    spark.stop()
    return times, plans


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out-dir", default="/tmp")
    args = ap.parse_args()

    try:
        print(f"load1 at start: {os.getloadavg()[0]:.2f}")
    except OSError:
        pass

    results = {}
    for mode in ("cold", "warm"):
        times, plans = session(mode, args.sf_dir, args.runs)
        results[mode] = (times, plans)
        print(f"{mode}: times {[f'{t:.3f}' for t in times]}, min {min(times):.3f}s")
        path = os.path.join(args.out_dir, f"decontaminate_plan_{mode}.txt")
        with open(path, "w") as fh:
            fh.write(plans[0])
        print(f"  plan -> {path}")

    # intra-session stability first (a flip WITHIN a session would be
    # the strongest signal), then cold-vs-warm
    for mode, (_, plans) in results.items():
        norm = [normalize(p) for p in plans]
        if len(set(norm)) > 1:
            print(f"!! {mode}: plan CHANGED between runs within one session")
            d = list(difflib.unified_diff(
                norm[0].splitlines(keepends=True),
                norm[-1].splitlines(keepends=True),
                f"{mode} run1", f"{mode} run{len(norm)}", n=1))
            sys.stdout.writelines(d[:60])
        else:
            print(f"{mode}: plan stable across {len(plans)} runs")

    a = normalize(results["cold"][1][-1]).splitlines(keepends=True)
    b = normalize(results["warm"][1][-1]).splitlines(keepends=True)
    diff = list(difflib.unified_diff(a, b, "cold", "warm", n=2))
    if not diff:
        print("NORMALIZED PLANS IDENTICAL (cold vs warm) — no AQE flip; "
              "the 1.3<->2.4 s oscillation is host/JIT variance")
    else:
        print(f"PLANS DIFFER (cold vs warm), {len(diff)} diff lines:")
        sys.stdout.writelines(diff[:120])


if __name__ == "__main__":
    main()
