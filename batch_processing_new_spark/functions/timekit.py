"""Timezone-independent time arithmetic over TIMESTAMP_NTZ columns.

Why this exists: Spark's ``date_trunc`` / ``unix_timestamp`` /
``unix_micros`` silently promote TIMESTAMP_NTZ inputs to session-zone
TIMESTAMP, so a query that uses them renders differently when the
session timezone and the collecting process's timezone disagree — the
environment-sensitivity class behind the r02 driver-red queries (the
driver does not pin ``spark.sql.session.timeZone``; the local harness
did). Everything here is pure calendar/epoch arithmetic on NTZ values:
bit-identical output under ANY (session TZ, host TZ) combination, and
exactly DuckDB's naive-timestamp semantics, so oracles line up by
construction.

Verified TZ-free under a split environment (session=America/New_York,
host=UTC) in tests/test_env_robustness.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ntz_epoch() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_seconds(ts: Column) -> Column:
    """Whole seconds since the naive epoch (fractional part truncated)
    of an NTZ timestamp — ``timestamp_diff`` is pure arithmetic, unlike
    ``unix_timestamp`` which interprets in the session zone."""
    return F.timestamp_diff("SECOND", _ntz_epoch(), ts)


def epoch_micros(ts: Column) -> Column:
    """Microseconds since the naive epoch of an NTZ timestamp (the
    TZ-free sibling of ``unix_micros``, which requires a session-zone
    cast for NTZ input)."""
    return F.timestamp_diff("MICROSECOND", _ntz_epoch(), ts)


def day_ntz(ts: Column) -> Column:
    """Midnight-of-day as TIMESTAMP_NTZ — the TZ-free replacement for
    ``date_trunc('day', ts)`` (which returns a session-zone TIMESTAMP
    even for NTZ input). ``cast(date)`` takes the naive date part;
    ``cast(timestamp_ntz)`` re-attaches naive midnight."""
    return ts.cast("date").cast("timestamp_ntz")


def day_index(epoch_s: Column) -> Column:
    """Days since epoch from an epoch-seconds column (floor division —
    exact for the post-1970 fixtures; pre-epoch data needs floordiv
    semantics, which ``floor(x / 86400)`` provides for negatives too)."""
    return F.floor(epoch_s / F.lit(86400)).cast("int")


def day_from_index(idx: Column) -> Column:
    """Day index back to midnight TIMESTAMP_NTZ (pure days arithmetic
    via ``date_from_unix_date`` — no zone involved)."""
    return F.date_from_unix_date(idx).cast("timestamp_ntz")
