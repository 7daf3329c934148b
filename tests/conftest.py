from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "environment_pin: deliberate tripwire pinning a Spark/library-version-"
        "dependent witness; a failure after an upgrade means the environment "
        "changed, not that this repo regressed — see the assert message for "
        "the recovery procedure",
    )


@pytest.fixture(scope="session")
def spark():
    from batch_processing_new_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark(app_name="tests", cpus=cpus, shuffle_partitions=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same views the driver pre-registers."""
    import duckdb

    from batch_processing_new_spark.sources.readers import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_CORRECT}/{name}.parquet')"
        )
    return con
