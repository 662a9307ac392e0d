"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string.

Modules register into ``QUERIES`` / ``ORACLE``; ``__spark_entry__.py``
re-exports them for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from . import analytics, cdc, events_analytics, llmdata

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    # Order matters: the driver's correctness gate checks the first 50
    # registry entries in insertion order.  cdc (11 oracles) + llmdata
    # (33 oracles) fit inside that window, so the LLM-data surface gets
    # driver-verified rows every round; analytics/events close the tail
    # (both families already hold driver-green rows from rounds 1-2).
    for mod in (cdc, llmdata, events_analytics, analytics):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    missing = set(oracle) - set(queries)
    assert not missing, f"oracle entries without queries: {missing}"
    # Oracle-less entries (approximate / hash-seeded, rows-only checks)
    # sort to the tail so every slot in the driver's 50-entry window
    # goes to a query with a full rows+schema+hash oracle.
    queries = {
        **{k: v for k, v in queries.items() if k in oracle},
        **{k: v for k, v in queries.items() if k not in oracle},
    }
    return queries, oracle
