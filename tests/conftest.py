from __future__ import annotations

import importlib.util
import os
import sys

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

_TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")


def load_tool(name: str):
    """Import tools/<name>.py WITHOUT mutating sys.path (ADVICE r07:
    a module-level sys.path.insert leaks into the whole pytest
    session, letting any tools/ module shadow or be accidentally
    importable by later-collected tests). The loaded module is still
    registered under its own name in sys.modules so dataclass/pickle
    round-trips inside it keep working."""
    existing = sys.modules.get(name)
    if existing is not None:
        return existing
    path = os.path.join(_TOOLS_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


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
