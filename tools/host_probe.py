"""Quick host-speed probe (r17): bench.py's calibration workload in a
tiny session, printed as one number — used to find a quiet window for
the record runs (the sandbox shows 40% query-throughput swings with
load1 ~0 and calib drifting 1.15-1.61 within half an hour)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cdc_replication_spark.session import get_spark


def main() -> None:
    spark = get_spark("host-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(2 * 10**8).selectExpr("sum(cast(hash(id) as bigint))").collect()
        spark.range(4_000_000).repartition(32, "id").selectExpr(
            "count(distinct id % 1000000)"
        ).collect()
        calib = min(calib, time.perf_counter() - t0)
    print(f"calib {round(calib, 3)} load1 {round(os.getloadavg()[0], 2)}")


if __name__ == "__main__":
    main()
