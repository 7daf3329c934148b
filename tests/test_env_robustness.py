"""Environment-robustness guards (TESTDATA.md post-mortem rules).

r02's driver-red queries passed the local harness because the harness
pinned what the driver does not (session timezone) and shared what the
driver may not (engine builds' rounding conventions). These tests make
the robustness RULES permanent:

1. no registered query outputs a session-zone TIMESTAMP column (the
   rendering of those depends on the session/host zone pair) — NTZ,
   DATE, STRING, numeric only; the three pre-rule driver-green queries
   are frozen exceptions;
2. the timekit helpers are bit-stable under a session-zone flip
   (the split-TZ environment that exposed q91/q134).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

# driver-green before the no-LTZ rule existed; frozen (changing their
# output type would invalidate recorded CORRECTNESS rows)
_LTZ_FROZEN = {"q80_retention", "q104_hypertable_rollup", "q108_interpolate_gaps"}

SF_DIR = "/root/testdata/sf0.001"


def test_no_new_query_outputs_session_zone_timestamp(spark):
    from batch_processing_new_spark import registry

    offenders = {}
    for name, spec in registry.all_specs().items():
        if name in _LTZ_FROZEN:
            continue
        df = spec.fn(spark, SF_DIR)  # analysis only — nothing executes
        ltz = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.TimestampType)
        ]
        if ltz:
            offenders[name] = ltz
    assert not offenders, (
        f"session-zone TIMESTAMP output columns (TZ-sensitive rendering; "
        f"use functions/timekit.py or cast to timestamp_ntz/date/string): "
        f"{offenders}"
    )


@pytest.fixture()
def ny_session_tz(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_timekit_is_session_zone_independent(ny_session_tz):
    """Every timekit helper must produce the SAME values under a
    non-UTC session zone as the naive/UTC math says — the split
    session-vs-host environment that flipped date_trunc-based
    queries."""
    from batch_processing_new_spark.functions import timekit as tk

    spark = ny_session_tz
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-15 14:30:45.123456' AS ts"
    )
    r = df.select(
        tk.epoch_seconds(F.col("ts")).alias("es"),
        tk.epoch_micros(F.col("ts")).alias("eus"),
        tk.day_ntz(F.col("ts")).alias("day"),
        tk.day_index(tk.epoch_seconds(F.col("ts"))).alias("didx"),
        tk.day_from_index(
            tk.day_index(tk.epoch_seconds(F.col("ts")))
        ).alias("day2"),
    ).collect()[0]
    assert r.es == 1705329045  # naive-as-UTC epoch, no zone shift
    assert r.eus == 1705329045123456
    assert str(r.day) == "2024-01-15 00:00:00"
    assert r.didx == 1705329045 // 86400
    assert r.day == r.day2

    # the anti-pattern really is zone-dependent (proves the split
    # environment this guard simulates is the dangerous one)
    ltz = df.select(F.date_trunc("day", "ts").alias("d")).schema["d"]
    assert isinstance(ltz.dataType, T.TimestampType)
