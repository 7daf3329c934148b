#!/usr/bin/env python
"""Replicate the DRIVER's pandas-based canonicalizer over every oracle
pair — a stricter gate than tests/run_verify.py's string canon.

The r01 driver canonicalizer sorts the result DataFrame with pandas
(``sort_values`` over all columns, column order = sorted names) and
value-hashes it; that path raises on unhashable cells (q65's
array<string>, CORRECTNESS_r01) and is sensitive to pandas dtype
quirks (None vs NaN, object columns, timestamps) that a str()-based
canon can mask. This tool runs the same shape: Spark result ->
``toPandas``-equivalent frame, DuckDB result -> ``df()`` frame,
normalize float precision, lexsort both with pandas, compare cell
strings. Any query that passes here AND run_verify cannot plausibly
fail the driver's harness.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd

# script dir (tools/) is what python puts on sys.path, not the repo
# root — same bootstrap as explain_audit.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
from batch_processing_new_spark.sources.readers import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> list[str]:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else f"{v:.9g}")
        elif s.dtype.kind == "M":
            df[c] = s.map(
                lambda v: "NULL" if pd.isna(v) else v.isoformat(sep=" ")
            )
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: "NULL"
                if v is None or (isinstance(v, float) and np.isnan(v))
                else (f"{v:.9g}" if isinstance(v, float) else str(v))
            )
        else:
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(v))
    # the driver's lexsort — this is where unhashable cells explode
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return ["|".join(map(str, row)) for row in df.itertuples(index=False)]


def main() -> int:
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
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
    failed = []
    for name, fn in sorted(queries.items()):
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            ddf = con.sql(oracles[name]).df()
            a, b = canon(sdf), canon(ddf)
        except Exception as exc:  # noqa: BLE001
            print(f"FAILED {name}: {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        if a != b:
            bad = next(
                ((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y),
                None,
            )
            if bad is None:  # equal prefix, different lengths
                print(
                    f"FAILED {name}: rowcount spark={len(a)} duck={len(b)}"
                )
            else:
                print(f"FAILED {name}: differs at sorted-row {bad[0]}")
                print(f"  spark: {bad[1][:160]}")
                print(f"  duck : {bad[2][:160]}")
            failed.append(name)
        else:
            print(f"ok     {name} ({len(a)} rows)")
    print(f"\n{len(failed)} FAILED of {len(oracles)}"
          + (f": {failed}" if failed else " — ALL OK"))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
