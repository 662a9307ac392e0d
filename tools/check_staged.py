"""Certify PREPARED-but-undebuted oracles against their registered
queries — the staging standard every capacity-gated debut must pass
(the split_cluster_safe / dedup_corpus_weighted precedent: staged
rows-only, hash-verified at sf0.001/0.01/0.1 each round until a
window slot opens).

A query is STAGED when it is registered in ``queries()`` without an
``oracle_sql()`` entry but ``workloads.llmdata`` defines an
``ORACLE_<NAME>`` constant for it.  This tool discovers those pairs
automatically (so the list can never silently drift from the code)
and runs the exact driver-gate comparison ``tools/check_oracle.py``
uses: row count + column names + order-insensitive value hash, with
the DuckDB side fetched through pandas like the driver does.

    python tools/check_staged.py                 # all staged, 3 sfs
    python tools/check_staged.py sf0.01          # one sf (substring)
    python tools/check_staged.py sf0.01 pii      # + name filter
"""

from __future__ import annotations

import os
import sys
import time

# anchor on this file's location so the tool works from any cwd
# (ADVICE r16: a bare '.' silently required running from the repo root)
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from check_oracle import TABLES, table_digest  # noqa: E402

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def staged_pairs() -> dict[str, str]:
    """query name -> prepared oracle SQL, for registered queries whose
    oracle exists as a module constant but is not (yet) registered."""
    import __spark_entry__ as entrymod
    from spark_cdc_replication_spark.workloads import llmdata

    registered = entrymod.queries()
    live = entrymod.oracle_sql()
    out = {}
    for name in registered:
        if name in live:
            continue
        const = f"ORACLE_{name.upper()}"
        sql = getattr(llmdata, const, None)
        if isinstance(sql, str):
            out[name] = sql
    return out


def _duck_rows(con, sql: str):
    import pandas as pd

    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    ddf = res.df()

    def _unnan(v):
        try:
            if v is not None and not isinstance(v, (list, tuple)) and pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        return v

    rows = [[_unnan(v) for v in r] for r in ddf.itertuples(index=False, name=None)]
    return rows, cols


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from spark_cdc_replication_spark.session import get_spark

    sf_filter = sys.argv[1] if len(sys.argv) > 1 else ""
    only = set(sys.argv[2:])

    pairs = staged_pairs()
    names = [n for n in sorted(pairs) if not only or any(o in n for o in only)]
    if not names:
        print("no staged (prepared-but-undebuted) oracles match")
        return 0
    print(f"staged queue: {', '.join(names)}")

    qs = entrymod.queries()
    spark = get_spark("staged-check")
    failures = []
    errors = []
    for sf_dir in [d for d in SF_DIRS if sf_filter in d]:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            t0 = time.time()
            try:
                sdf = qs[name](spark, sf_dir)
                srows = [list(r) for r in sdf.collect()]
                scols = sdf.columns
                drows, dcols = _duck_rows(con, pairs[name])
            except Exception as e:  # noqa: BLE001
                # a crash is a different failure class than a hash
                # mismatch (ADVICE r16) — track and report separately
                errors.append(f"{name}@{sf_dir}")
                print(f"ERROR {name} @ {sf_dir}: {e}")
                continue
            problems = []
            if len(srows) != len(drows):
                problems.append(f"rows {len(srows)} != {len(drows)}")
            if sorted(scols) != sorted(dcols):
                problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
            if not problems and table_digest(srows, scols) != table_digest(drows, dcols):
                problems.append("value hash mismatch")
            if problems:
                failures.append(f"{name}@{sf_dir}")
                print(f"FAIL  {name} @ {sf_dir}: {'; '.join(problems)}")
            else:
                print(
                    f"PASS  {name} @ {sf_dir} "
                    f"({len(srows)}/{len(drows)} rows, {time.time()-t0:.1f}s)"
                )
        con.close()
    print(
        f"\n{len(failures)} mismatches"
        + (f": {failures}" if failures else "")
        + f", {len(errors)} errors"
        + (f": {errors}" if errors else "")
    )
    return 1 if failures or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
