"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given sf dir, compares row count, schema (column
names), and an order-insensitive value hash (values normalized to
strings, floats rounded).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_digest(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_value(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from spark_cdc_replication_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only and not any(o in name for o in only):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"      WARN: zero rows")
            continue
        try:
            # Fetch through pandas like the driver does: DuckDB HUGEINT
            # (bare integer sum()) becomes float64 there, so fetching via
            # .df() reproduces the driver's normalizer exactly —
            # fetchall() would hide that class of oracle-typing bug.
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            ddf = res.df()

            def _unnan(v):
                # The driver DOES normalize pandas missing values (NaN/
                # NaT) back to NULL — r1 proved it: asof_purchase_view
                # (left-join NULLs) hash-passed while HUGEINT floats
                # failed.  Mirror that: missing -> None, types kept.
                try:
                    import pandas as pd

                    if v is not None and not isinstance(v, (list, tuple)) and pd.isna(v):
                        return None
                except (TypeError, ValueError):
                    pass
                return v

            drows = [
                [_unnan(v) for v in r]
                for r in ddf.itertuples(index=False, name=None)
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if not problems:
            sh = table_digest([list(r) for r in srows], scols)
            dh = table_digest(drows, dcols)
            if sh != dh:
                problems.append("value hash mismatch")
                # show a diff sample
                sset = {
                    tuple(
                        norm_value(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in ([list(r) for r in srows])
                }
                dset = {
                    tuple(
                        norm_value(r[i])
                        for i in sorted(range(len(dcols)), key=lambda i: dcols[i])
                    )
                    for r in drows
                }
                for x in list(sset - dset)[:3]:
                    print(f"      spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"      duck-only:  {x}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
