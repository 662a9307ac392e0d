from __future__ import annotations

import tempfile

import pytest

from spark_cdc_replication_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Fresh warehouse per test session so a crashed earlier run can't
    # leave a managed-table location behind (LOCATION_ALREADY_EXISTS).
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
