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
    for mod in (cdc, analytics, events_analytics, llmdata):
        queries.update(mod.QUERIES)
        oracle.update(mod.ORACLE)
    missing = set(oracle) - set(queries)
    assert not missing, f"oracle entries without queries: {missing}"
    return queries, oracle
