"""The probe battery's LOCAL contract (see probes.py).

Each probe has a documented expected behavior under THIS sandbox's
engine pair (duckdb 1.0.0 / pyspark 4.1.2). These tests pin that
contract so a probe that silently stops probing (e.g. an oracle edit
that accidentally fixes p03's deliberate HUGEINT) fails loudly —
a probe that cannot diverge cannot measure anything.
"""

from __future__ import annotations

import duckdb
import pytest

from batch_processing_new_spark.registry import (
    EXPECTED_DIVERGENT_PROBES,
    all_specs,
)
from tests.conftest import SF_SMOKE

SPECS = all_specs()
PROBES = {n: s for n, s in SPECS.items() if "_probe_" in n}


def test_probe_inventory():
    assert sorted(PROBES) == [
        "p01_probe_duckdb_version",
        "p02_probe_spark_version",
        "p03_probe_hugeint_sum",
        "p04_probe_bigint_cast_sum",
        "p05_probe_nullable_int",
        "p06_probe_null_window_order",
        "p07_probe_decimal_scale",
    ]
    assert EXPECTED_DIVERGENT_PROBES <= set(PROBES)


def test_version_probes_green_on_local_pins(spark, duck):
    """p01/p02 encode versions as row counts; on the local pins both
    sides must agree exactly (a driver with other versions reports
    them via the rows fields instead)."""
    import pyspark

    assert duckdb.__version__.startswith("1.0."), (
        "local duckdb pin moved — update _LOCAL_DUCKDB_ENC in probes.py"
    )
    assert pyspark.__version__.startswith("4.1."), (
        "local pyspark pin moved — update _LOCAL_PYSPARK_ENC in probes.py"
    )
    p01 = PROBES["p01_probe_duckdb_version"]
    assert p01.fn(spark, SF_SMOKE).count() == duck.sql(p01.oracle).df().shape[0] == 10000
    p02 = PROBES["p02_probe_spark_version"]
    assert p02.fn(spark, SF_SMOKE).count() == duck.sql(p02.oracle).df().shape[0] == 40102


def test_hugeint_probe_pair_is_a_controlled_experiment(spark, duck):
    """p03 must keep emitting HUGEINT (else it stops testing the r03
    red mechanism); its CAST twin p04 must be BIGINT with the same
    value."""
    p03 = duck.sql(PROBES["p03_probe_hugeint_sum"].oracle)
    assert [str(t) for t in p03.types] == ["HUGEINT"]
    p04 = duck.sql(PROBES["p04_probe_bigint_cast_sum"].oracle)
    assert [str(t) for t in p04.types] == ["BIGINT"]
    assert p03.fetchall() == p04.fetchall() == [(6,)]
    # pandas path: HUGEINT floatifies — the formatted-hash divergence
    assert str(p03.df()["s"].dtype) == "float64"
    assert str(p04.df()["s"].dtype) == "int64"
    for name in ("p03_probe_hugeint_sum", "p04_probe_bigint_cast_sum"):
        [(s,)] = PROBES[name].fn(spark, SF_SMOKE).collect()
        assert s == 6


def test_nullable_int_probe_matches_locally(spark, duck):
    spec = PROBES["p05_probe_nullable_int"]
    spdf = spec.fn(spark, SF_SMOKE).toPandas().sort_values("k")
    ddf = duck.sql(spec.oracle).df().sort_values("k")
    # both collection paths promote nullable int64 the same way here
    assert spdf["v"].isna().sum() == ddf["v"].isna().sum() == 1
    assert spdf["v"].dropna().tolist() == ddf["v"].dropna().tolist()


def test_null_window_order_probe_fingerprint(spark, duck):
    """12 vs 6 IS the diagnostic: Spark windows sort NULLS FIRST, DuckDB
    1.0 NULLS LAST. If either side changes, q81-class oracles need
    re-auditing for explicit null placement."""
    spec = PROBES["p06_probe_null_window_order"]
    assert spec.fn(spark, SF_SMOKE).count() == 12
    assert duck.sql(spec.oracle).df().shape[0] == 6


def test_decimal_scale_probe_diverges_on_pandas_path(spark, duck):
    spec = PROBES["p07_probe_decimal_scale"]
    ddf = duck.sql(spec.oracle).df()
    spdf = spec.fn(spark, SF_SMOKE).toPandas()
    assert str(ddf["v"].dtype) == "float64"  # DECIMAL floatified
    assert str(spdf["v"].dtype) == "object"  # Spark Decimal objects
    assert str(spdf["v"].iloc[1]) == "2.00" and str(ddf["v"].iloc[1]) == "2.0"
