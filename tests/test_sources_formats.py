"""Source-format breadth: ORC roundtrip and parquet schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.sources.readers import (
    load_table,
    read_evolved_parquet,
    read_orc,
)
from tests.conftest import SF_CORRECT


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    dst = str(tmp_path / "orc")
    src = load_table(spark, SF_CORRECT, "customer")
    src.write.orc(dst)
    back = read_orc(spark, dst)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_evolved_parquet_merges_added_column(spark, tmp_path):
    """v1 files lack the column a v2 writer added; the merged scan
    exposes the union schema with NULLs for v1 rows."""
    base = str(tmp_path / "evolving")
    o = load_table(spark, SF_CORRECT, "orders")
    v1 = o.select("o_orderkey", "o_custkey").where("o_orderkey % 2 = 0")
    v2 = o.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).where("o_orderkey % 2 = 1")
    v1.write.parquet(base + "/v=1")
    v2.write.parquet(base + "/v=2")

    merged = read_evolved_parquet(spark, base)
    assert set(merged.columns) >= {"o_orderkey", "o_custkey", "o_totalprice"}
    assert merged.count() == o.count()
    nulls = merged.where(F.col("o_totalprice").isNull()).count()
    assert nulls == v1.count()
    # v2 rows kept their values
    total = merged.agg(F.sum("o_totalprice")).first()[0]
    expect = v2.agg(F.sum("o_totalprice")).first()[0]
    assert total == expect
