"""Driver-environment probe battery (round-4 diagnostics).

Seven fixture-independent probes, front-loaded into the driver's
50-slot correctness window (registry._WINDOW_PRIORITY). They are NOT
operators: they measure the DRIVER's engine versions and comparison
semantics, because the driver sandbox is not inspectable from here and
its verdicts (r02/r03) diverged from a local harness that passed
everything. They are the sanctioned exception to the registry freeze
(VERDICT r03 "Next round #1") and are excluded from the operator
counts in COVERAGE.md.

Round-4 context: the five r03 driver-red queries (q81/q83/q91/q98/
q157) turned out to be exactly the five driver-checked queries whose
oracle emitted a DuckDB HUGEINT column — ``sum(BIGINT)`` types as
HUGEINT, pandas renders it float64, and a formatted-value hash sees
``1500.0`` vs Spark's ``1500`` (tools/dtype_audit.py). The oracles are
fixed with ``CAST(... AS BIGINT)``; the probes below turn the
remaining unknowns into measurements:

- p01/p02 encode ENGINE VERSIONS as row counts, because the
  correctness artifact exposes ``spark_rows``/``oracle_rows`` as raw
  numbers even for red rows. A red p01 literally REPORTS the driver's
  DuckDB version in ``oracle_rows`` (e.g. 10300 = 1.3.0); a red p02
  reports the driver's PySpark version in ``spark_rows``.
- p03/p04 are the controlled experiment for the hugeint mechanism: an
  uncast ``sum(BIGINT)`` (p03, expected RED iff the driver hashes
  formatted pandas values) against its CAST twin (p04, expected
  GREEN). A green p03 would falsify the whole diagnosis — that is the
  point of running it.
- p05 emits a nullable int64 with a real NULL: green means NULL-
  bearing future fixture generations are safe for nullable-int output
  columns; red means they must never reach an output projection.
- p06 encodes WINDOW NULL-ORDER defaults as row counts: Spark sorts
  NULLS FIRST in a window ORDER BY, DuckDB 1.0 NULLS LAST, so the
  checksum-of-running-sums differs by construction (12 vs 6 on this
  5-row relation). Matching rows would mean the driver's engine pair
  AGREES on null placement; 12 vs 6 confirms the divergence that made
  q81's median shift under NULL values (both sides now filter NULLs).
- p07 emits DECIMAL(10,2) with trailing-zero scale: Spark collects
  ``Decimal('0.50')`` objects, DuckDB's pandas path renders float64
  ``0.5`` — red documents the "never output DECIMAL, cast to DOUBLE"
  rule (tests/test_oracle_types.py enforces it for real queries).

Expected verdict pattern if the round-4 diagnosis is right and the
driver runs this sandbox's engine pair (duckdb 1.0.0 / pyspark 4.1.2):
p01 green, p02 green, p03 RED, p04 green, p05 green, p06 RED
(12 vs 6), p07 RED. Any other pattern names a different primitive.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query

# this sandbox's engine pins, encoded 10000*major + 100*minor + patch
_LOCAL_DUCKDB_ENC = 10000  # duckdb 1.0.0
_LOCAL_PYSPARK_ENC = 40102  # pyspark 4.1.2


def _enc_version(vs: str) -> int:
    m = re.match(r"(\d+)\.(\d+)\.(\d+)", vs)
    if not m:
        # distinct sentinel (1 row, decodes as 0.0.1): an UNPARSEABLE
        # version string must not read like "version 0.0.0" / an empty
        # frame in the driver artifact (ADVICE r04)
        return 1
    return 10000 * int(m.group(1)) + 100 * int(m.group(2)) + int(m.group(3))


_VER_EXPR = (
    "10000 * CAST(regexp_extract(version(), '(\\d+)\\.(\\d+)\\.(\\d+)', 1) AS BIGINT)"
    " + 100 * CAST(regexp_extract(version(), '(\\d+)\\.(\\d+)\\.(\\d+)', 2) AS BIGINT)"
    " + CAST(regexp_extract(version(), '(\\d+)\\.(\\d+)\\.(\\d+)', 3) AS BIGINT)"
)


@query(
    "p01_probe_duckdb_version",
    oracle=f"SELECT unnest(range(({_VER_EXPR}))) AS i",
)
def p01_probe_duckdb_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oracle_rows = the driver's DuckDB version, encoded
    10000*major + 100*minor + patch; the Spark side emits this
    sandbox's pin (10000 = 1.0.0). Green = driver runs duckdb 1.0.0;
    red = ``oracle_rows`` names its actual version."""
    return spark.range(_LOCAL_DUCKDB_ENC).select(F.col("id").alias("i"))


@query(
    "p02_probe_spark_version",
    oracle=f"SELECT unnest(range({_LOCAL_PYSPARK_ENC})) AS i",
)
def p02_probe_spark_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark_rows = the driver's PySpark version (same encoding); the
    oracle emits this sandbox's pin (40102 = 4.1.2)."""
    return spark.range(_enc_version(spark.version)).select(
        F.col("id").alias("i")
    )


@query(
    "p03_probe_hugeint_sum",
    oracle="SELECT sum(i) AS s FROM (SELECT unnest(range(1, 4)) AS i)",
)
def p03_probe_hugeint_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately UNCAST ``sum(BIGINT)`` — DuckDB types it HUGEINT,
    pandas floatifies to ``6.0`` vs Spark's ``6``. Expected RED under a
    formatted-value hash; GREEN falsifies the round-4 diagnosis of the
    q81/q83/q91/q98/q157 reds."""
    return spark.range(1, 4).agg(F.sum("id").alias("s"))


@query(
    "p04_probe_bigint_cast_sum",
    oracle=(
        "SELECT CAST(sum(i) AS BIGINT) AS s "
        "FROM (SELECT unnest(range(1, 4)) AS i)"
    ),
)
def p04_probe_bigint_cast_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p03's control twin with the CAST fix applied. Expected GREEN."""
    return spark.range(1, 4).agg(F.sum("id").alias("s"))


@query(
    "p05_probe_nullable_int",
    oracle=(
        "SELECT CAST(i AS BIGINT) AS k, "
        "CASE WHEN i < 2 THEN CAST(i AS BIGINT) END AS v "
        "FROM (SELECT unnest(range(3)) AS i)"
    ),
)
def p05_probe_nullable_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A nullable int64 output column containing a real NULL: both
    collection paths promote to float64-with-NaN, so GREEN means
    NULL-bearing fixtures are safe for nullable-int projections; RED
    means outputs must coalesce/filter NULLs first."""
    return spark.range(3).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 2, F.col("id")).alias("v"),
    )


@query(
    "p06_probe_null_window_order",
    oracle="""
SELECT unnest(range((
    SELECT CAST(sum(cum) AS BIGINT) FROM (
        SELECT k, CAST(sum(1) OVER (ORDER BY k) AS BIGINT) AS cum
        FROM (VALUES (NULL), (NULL), (1), (2), (3)) t(k)
    ) WHERE k IS NOT NULL
))) AS i
""",
)
def p06_probe_null_window_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ``ORDER BY`` null-placement fingerprint, rows-encoded:
    the sum of running counts over the non-NULL keys of
    [NULL, NULL, 1, 2, 3] is 12 under NULLS FIRST (Spark's default:
    cum = 3,4,5) and 6 under NULLS LAST (DuckDB 1.0's default:
    cum = 1,2,3). spark_rows/oracle_rows REPORT each engine's default;
    matching rows would mean the driver's pair agrees. This is the
    divergence class that shifted q81's cumulative-histogram medians
    whenever ``events.value`` held NULLs (both sides now filter)."""
    from pyspark.sql.window import Window

    rows = spark.createDataFrame(
        [(None,), (None,), (1,), (2,), (3,)], "k int"
    )
    cum = rows.withColumn(
        "cum", F.sum(F.lit(1)).over(Window.orderBy("k"))
    ).where(F.col("k").isNotNull())
    total = cum.agg(F.sum("cum")).collect()[0][0]
    return spark.range(int(total)).select(F.col("id").alias("i"))


@query(
    "p07_probe_decimal_scale",
    oracle=(
        "SELECT i AS k, CAST((i * 3 + 1) / 2 AS DECIMAL(10,2)) AS v "
        "FROM (SELECT unnest(range(3)) AS i)"
    ),
)
def p07_probe_decimal_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(10,2) output with trailing-zero scale: Spark collects
    ``Decimal('0.50')``, DuckDB's pandas path gives float64 ``0.5``.
    Expected RED under a formatted-value hash — documents the
    cast-outputs-to-DOUBLE rule that tests/test_oracle_types.py
    enforces for every real oracle."""
    return spark.range(3).select(
        F.col("id").alias("k"),
        ((F.col("id") * 3 + 1) / 2).cast("decimal(10,2)").alias("v"),
    )
