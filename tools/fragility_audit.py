#!/usr/bin/env python
"""Float-fragility audit: MEASURE how close every float output cell
sits to a driver-hash flip instead of guessing.

The r02 driver-reds (q81/q83/q91) all passed the identical check
locally and flipped only in the driver's environment — engine-build
noise (libm vs JVM ulps, rounding-convention skew) moved a value
across a formatting boundary. This audit covers the FORMATTING model
of the driver's hash: floats rendered through ``"%.9g"``, so a cell
can only flip if build noise pushes it across a 9-significant-digit
rounding boundary. (The r04 reconstruction favors a stricter
pandas-object BIT hash — tools/driver_canon_check.py now enforces
that model, under which ANY nonzero engine delta flips; the two tools
together bound both candidate semantics.) Both quantities are
measurable at sf0.01:

- **margin**: the distance (in ulps of the cell value) from the value
  to its nearest %.9g rounding boundary. A value 1e6 ulps from the
  boundary cannot flip under any plausible build skew; a value 2 ulps
  away is a coin toss.
- **engine delta**: the ulp distance between the Spark cell and the
  DuckDB oracle cell for the SAME canonical row — the observed size of
  cross-engine noise for that expression. (Cells are paired by the
  driver's own canon sort, so pairing is exact whenever the sweep is
  green.)

A query is FRAGILE when some cell's margin is within SAFETY x its
column's observed engine delta (or within ABS_MIN ulps when the
engines agree bit-for-bit locally — bit-equality here says nothing
about a third engine build, see q83's r02 flip). Everything else is
MEASURED-SAFE for the driver's formatting path: no conceivable
few-ulp build skew can change its hash.

One key fact narrows the model: the driver formats BOTH engines'
collected doubles in the SAME Python process, so the formatting
convention itself can never differ — only the value BITS can. A hash
flip therefore requires an engine build to produce a different
double, and the margin says how many ulps of build noise are
survivable.

Exact boundary TIES (margin < 0.5 ulp) are a special case: a value
that IS the closest double to a 9-digit half-boundary (e.g. a
10-digit integer ending in 5, or a DECIMAL-sum cast) formats
deterministically — IEEE integer-in-double arithmetic and
decimal->double casts are fully specified, so every engine build
produces the same bits and the tie resolves identically everywhere.
Such cells are safe IFF their provenance is exact arithmetic; the
reviewed ones are allowlisted in _EXACT_TIES with the provenance
that justifies them, and any NEW tie fails the audit until reviewed.

Limitations (documented, not hidden): an upstream ``round(x, d)``
executes BEFORE the output exists, so a half-way tie in x flips the
output by a full 10^-d — visible here as a huge engine delta, but
only if the local engines actually disagree. The audit therefore
complements (not replaces) the exact-integer/unrounded-quotient
discipline in TESTDATA.md.

Usage: python tools/fragility_audit.py [name-substr ...]
Writes a per-query table to stdout; exits 1 if any query is FRAGILE.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
SAFETY = 16.0  # margin must exceed SAFETY x observed engine delta
ABS_MIN = 64.0  # ... and this many ulps even when engines agree here

# (query, column) pairs whose cells sit exactly ON a %.9g boundary but
# whose provenance is EXACT arithmetic (bit-identical on every engine
# build, so the common formatter resolves the tie identically):
_EXACT_TIES = {
    # integer epoch-micros difference cast to double (exact < 2^53)
    ("q122_last_touch_attribution", "gap_us"),
    # DECIMAL(30,8) dsum cast to double: exact sum, correctly-rounded
    # cast — one fully-specified conversion, no float aggregation
    ("q17_date_funcs", "revenue"),
    ("q71_gapfill_timeseries", "revenue"),
    ("q128_cogroup_order_lines", "running_revenue"),
    # lo + (bin+1)*((hi-lo)/20) then round(.,4): identical IEEE op
    # chain on both engines from exact min/max scalars
    ("q77_histogram", "bin_lo"),
    ("q77_histogram", "bin_hi"),
}

from batch_processing_new_spark.sources.readers import TABLES  # noqa: E402


def margin_ulps(v: np.ndarray) -> np.ndarray:
    """Distance (in ulps of v) from each finite nonzero double to its
    nearest %.9g rounding boundary.

    %.9g rounds to 9 significant decimal digits: quantum q = 10^(e-8)
    with e = floor(log10|v|); boundaries sit at (n + 1/2) * q. The
    quantum is exact only as a real number, so compute the fractional
    position in extended precision via fmod to avoid losing the answer
    to the very noise being measured.
    """
    out = np.full(v.shape, np.inf)
    a = np.abs(v)
    ok = np.isfinite(v) & (a > 0)
    if not ok.any():
        return out
    av = a[ok]
    e = np.floor(np.log10(av)).astype(int)
    # log10 at an exact power of 10 can land 1ulp under; fix up so the
    # quantum matches what %g uses for the first digit
    e = np.where(av >= 10.0 ** (e + 1), e + 1, e)
    e = np.where(av < 10.0**e, e - 1, e)
    q = 10.0 ** (e - 8.0)
    frac = np.mod(av / q, 1.0)
    # boundaries sit at half-integer multiples of q: distance is how
    # far the fractional position is from 0.5 (frac 0 == ON a 9-digit
    # representable value == maximally far from any boundary)
    dist = np.abs(frac - 0.5) * q
    out[ok] = dist / np.spacing(av)
    return out


def ulp_delta(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cross-engine distance in ulps (of the larger magnitude)."""
    out = np.zeros(a.shape)
    ok = np.isfinite(a) & np.isfinite(b)
    d = np.abs(a[ok] - b[ok])
    scale = np.spacing(np.maximum(np.abs(a[ok]), np.abs(b[ok])))
    out[ok] = d / scale
    return out


def canon_key(df: pd.DataFrame) -> pd.Series:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    parts = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            parts.append(
                s.map(lambda v: "NULL" if pd.isna(v) else f"{v:.9g}")
            )
        else:
            parts.append(s.map(lambda v: "NULL" if pd.isna(v) else str(v)))
    key = parts[0].astype(str)
    for p in parts[1:]:
        key = key + "|" + p.astype(str)
    return key


def float_cols(df: pd.DataFrame) -> list[str]:
    return [c for c in df.columns if df[c].dtype.kind == "f"]


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries, oracles = mod.queries(), mod.oracle_sql()
    names = [
        n
        for n in sorted(queries)
        if n in oracles and (not argv or any(s in n for s in argv))
    ]
    fragile: list[str] = []
    no_floats = 0
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {name}: {type(exc).__name__}: {exc}")
            fragile.append(name)
            continue
        sdf.columns = [c.lower() for c in sdf.columns]
        ddf.columns = [c.lower() for c in ddf.columns]
        fcols = sorted(set(float_cols(sdf)) & set(float_cols(ddf)))
        if not fcols:
            no_floats += 1
            continue
        # pair rows via the driver's canon order (sweep-green => equal)
        sdf = sdf.iloc[np.argsort(canon_key(sdf).values, kind="stable")]
        ddf = ddf.iloc[np.argsort(canon_key(ddf).values, kind="stable")]
        if len(sdf) != len(ddf):
            print(f"ERROR  {name}: row count {len(sdf)} vs {len(ddf)}")
            fragile.append(name)
            continue
        worst = ("", math.inf, 0.0)  # col, min margin, max delta
        bad = False
        ties: list[str] = []
        for c in fcols:
            a = sdf[c].to_numpy(dtype=float)
            b = ddf[c].to_numpy(dtype=float)
            m = np.minimum(margin_ulps(a), margin_ulps(b))
            d = ulp_delta(a, b)
            mm = float(m.min()) if m.size else math.inf
            dd = float(d.max()) if d.size else 0.0
            if mm < worst[1]:
                worst = (c, mm, dd)
            if (name, c) in _EXACT_TIES:
                # reviewed exact-arithmetic column: bit-identical on
                # every engine build, so margin is irrelevant — but the
                # exemption only holds while the engines DO agree here
                if dd == 0.0:
                    ties.append(c)
                else:
                    bad = True
            elif mm < max(ABS_MIN, SAFETY * dd):
                bad = True
        tag = "FRAGILE" if bad else ("tie-ok" if ties else "ok")
        print(
            f"{tag:7s} {name:32s} min_margin={worst[1]:>12.1f} ulps "
            f"(col={worst[0]}, max_engine_delta={worst[2]:.1f} ulps)"
        )
        if bad:
            fragile.append(name)
    print(
        f"\n{len(fragile)} FRAGILE of {len(names)} checked "
        f"({no_floats} with no float outputs)"
        + (f": {fragile}" if fragile else " — ALL MEASURED-SAFE")
    )
    return 1 if fragile else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
