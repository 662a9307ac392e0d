"""Capture the formatted physical plan of registered queries (r17 opt
round): ``python tools/capture_plan.py <query> <outfile> [sf_dir]``.

Uses the same engine session as bench.py; the plan is the PRE-execution
``explain("formatted")`` output (AdaptiveSparkPlan isFinalPlan=false),
which is what the plans/r17/ before/after artifacts pin.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    name, outfile = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from spark_cdc_replication_spark.session import get_spark
    from spark_cdc_replication_spark.workloads import collect_registry

    queries, _ = collect_registry()
    spark = get_spark("capture-plan")
    df = queries[name](spark, sf_dir)
    os.makedirs(os.path.dirname(outfile), exist_ok=True)
    with open(outfile, "w") as fh:
        fh.write(plan_text(df))
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
