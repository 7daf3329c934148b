from __future__ import annotations

import importlib.util
import os
import sys

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

_TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")
_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# Call-time package imports inside load_tool'd tool functions need the
# repo root importable. `python -m pytest` from the repo root provides
# it implicitly, but a bare `pytest` entrypoint from elsewhere does not
# (ADVICE r09) — ensure it explicitly and idempotently rather than
# relying on launcher-dependent behavior.
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def load_tool(name: str):
    """Import tools/<name>.py WITHOUT leaking sys.path mutations
    (ADVICE r07/r08). Two leak paths, both closed:

    - this helper itself never inserts a path, and it snapshots and
      restores sys.path around exec_module, so the module-level
      ``sys.path.insert(0, repo_root)`` most tools carry (needed for
      their CLI entry) is undone before control returns to the test.
      Call-time package imports inside tool functions still resolve
      because this conftest pins the repo root onto sys.path at module
      level (idempotent insert above — launcher-independent);
    - the one call-time insert (build_zlib_lookup.fixture_texts) was
      fixed at source to load its siblings through the same
      importlib recipe.

    On exec failure the half-initialized module is evicted from
    sys.modules before re-raising (ADVICE r08: otherwise later
    load_tool calls silently return the broken module). The loaded
    module is still registered under its own name in sys.modules so
    dataclass/pickle round-trips inside it keep working."""
    existing = sys.modules.get(name)
    if existing is not None:
        return existing
    path = os.path.join(_TOOLS_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    saved_path = list(sys.path)
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        sys.modules.pop(name, None)
        raise
    finally:
        sys.path[:] = saved_path
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
