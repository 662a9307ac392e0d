"""Generic fast/slow plan-diff for any registered query — the
generalization of ``plandiff_decontaminate.py`` (which settled the r13
watch item and stays as the documented r14 adjudication artifact).

When a query's bench record oscillates across rounds on unchanged
code, the question is always the same: did the AQE final plan change,
or is it host/JIT variance?  This tool answers it in one run: capture
the POST-EXECUTION plan (``executedPlan()`` after ``collect()``,
``isFinalPlan=true``) N times in each of two fresh sessions —

  * ``cold``  — bench-identical warm-up only (the adjudicate.py
    context), and
  * ``warm``  — the same, after first running a caller-named sibling
    query (``--warm-with``, e.g. the query that precedes it in
    bench.py's HEADLINE order), reproducing the full-bench context —

then normalize expression/plan/lambda ids and runtime statistics out
of the trees and diff what remains.  Identical normalized trees =
variance, not a plan flip; a surviving diff names the flipping node.

    python tools/plandiff.py decontaminate_corpus \
        [--warm-with dedup_corpus] [--sf-dir /root/testdata/sf0.1]
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
    expression ids (#123), plan/codegen ids, lambda variable ids,
    runtime row/size stats, temp paths."""
    p = re.sub(r"#\d+L?", "#x", plan)
    p = re.sub(r"lambda [a-z]+_\d+", "lambda v_n", p)
    p = re.sub(r"plan_id=\d+", "plan_id=x", p)
    p = re.sub(r"\[id=#?x?\d*\]", "[id=x]", p)
    p = re.sub(r"\(\d+\)", "(n)", p)
    p = re.sub(r"size=\S+", "size=x", p)
    p = re.sub(r"rowCount=\S+", "rowCount=x", p)
    p = re.sub(r"/tmp/\S+", "/tmp/x", p)
    # Spark truncates long strings (DataFilters lists etc.) BEFORE we
    # substitute ids, so sessions with different raw id widths cut the
    # "..." at different points — collapse the truncated TAIL to bare
    # "..." so the cut point itself can't read as a plan diff.  Only
    # Spark's truncation idiom is collapsed; a mid-line token that
    # merely contains "..." (e.g. slice(arr, 1...5)) is a real plan
    # difference and must survive.  Two truncation shapes:
    #  * end-of-line tail, optionally ", N more fields" + closers;
    #  * a truncated FIRST list on a multi-list line (e.g.
    #    'Arguments: [..., 22 more fields], [x#x,...]') — same idiom
    #    but mid-line, recognizable because the cut sits IMMEDIATELY
    #    before a closing bracket (lookahead keeps the closer)
    p = re.sub(
        r"\S*\.\.\.(,? \d+ more fields)?[\])>]*$", "...", p, flags=re.M
    )
    p = re.sub(r"\S*\.\.\.(,? \d+ more fields)?(?=[\])>])", "...", p)
    return p


def session(query: str, warm_with: str | None, sf_dir: str, runs: int):
    from pyspark.sql.functions import col, pandas_udf

    from spark_cdc_replication_spark.session import get_spark
    from spark_cdc_replication_spark.workloads import collect_registry

    queries, _ = collect_registry()
    mode = "warm" if warm_with else "cold"
    spark = get_spark(f"plandiff-{mode}")
    spark.range(1000).selectExpr("sum(id)").collect()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(32).select(_warm(col("id"))).count()
    if warm_with:
        queries[warm_with](spark, sf_dir).collect()

    times, plans = [], []
    for _ in range(runs):
        df = queries[query](spark, sf_dir)
        t0 = time.time()
        df.collect()
        times.append(time.time() - t0)
        plans.append(final_plan(df))
    spark.stop()
    return times, plans


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--warm-with", default=None,
                    help="sibling query to run first in the warm session")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out-dir", default="/tmp")
    args = ap.parse_args()

    try:
        print(f"load1 at start: {os.getloadavg()[0]:.2f}")
    except OSError:
        pass

    sessions = [("cold", None)]
    if args.warm_with:
        sessions.append(("warm", args.warm_with))

    results = {}
    for mode, sibling in sessions:
        times, plans = session(args.query, sibling, args.sf_dir, args.runs)
        results[mode] = plans
        print(f"{mode}: times {[f'{t:.3f}' for t in times]}, min {min(times):.3f}s")
        path = os.path.join(args.out_dir, f"plandiff_{args.query}_{mode}.txt")
        with open(path, "w") as fh:
            fh.write(plans[-1])
        print(f"  plan -> {path}")

    for mode, plans in results.items():
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

    if len(results) == 2:
        a = normalize(results["cold"][-1]).splitlines(keepends=True)
        b = normalize(results["warm"][-1]).splitlines(keepends=True)
        diff = list(difflib.unified_diff(a, b, "cold", "warm", n=2))
        if not diff:
            raw = list(difflib.unified_diff(
                results["cold"][-1].splitlines(keepends=True),
                results["warm"][-1].splitlines(keepends=True),
                "cold raw", "warm raw", n=0))
            print("NORMALIZED PLANS IDENTICAL (cold vs warm) — no AQE flip; "
                  "the timing spread is host/JIT variance "
                  f"(raw plans differ on {len(raw)} lines — ids/stats noise "
                  "if small; inspect the saved raw plans if it looks large)")
        else:
            print(f"PLANS DIFFER (cold vs warm), {len(diff)} diff lines:")
            sys.stdout.writelines(diff[:120])


if __name__ == "__main__":
    main()
