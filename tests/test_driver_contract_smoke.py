"""Driver-contract smoke over the ENTIRE query registry.

The harness driver creates its OWN bare SparkSession — none of the
engine's session-factory confs exist there — and calls
``queries()[name](spark, sf_dir)``.  Engine code must therefore set
every runtime-required conf itself (``session.ensure_runtime_conf``,
called by ``fixtures.load_table``); a query that reads fixture parquet
around ``load_table`` works in the engine's own sessions but CRASHES
on the driver (the documented gotcha: ``events.parquet`` carries
parquet TIMESTAMP(NANOS), unreadable without
``spark.sql.legacy.parquet.nanosAsLong``).

Until now that bare-session certification was a manual step in each
debut's staging checklist; this test automates it for every registered
query, every round: strip the runtime confs before each query and
assert it still executes.  (Silent wrong-answer modes — e.g. a
non-UTC session timezone — are covered by the DuckDB oracle hash gate,
which also runs on a bare session; this smoke exists to catch the
crash mode for rows-only and out-of-window queries BEFORE their debut
round.)
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry
from spark_cdc_replication_spark.session import RUNTIME_CONF

from .conftest import SF_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"driver fixture tree {SF_DIR} not present on this machine",
)

_QUERIES = entry.queries()


def _strip_runtime_conf(spark):
    for k in RUNTIME_CONF:
        try:
            spark.conf.unset(k)
        except Exception:
            pass  # static on this build — the driver couldn't unset it either


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs_on_conf_stripped_session(spark, name):
    _strip_runtime_conf(spark)
    try:
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
    finally:
        # never leak the stripped state into other tests
        for k, v in RUNTIME_CONF.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass
