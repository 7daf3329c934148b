"""Local replica of the driver's correctness gate.

Compares a Spark DataFrame result against a DuckDB oracle result:
row-count, column-name set, and order-insensitive values (exact for
ints/strings, tight tolerance for floats — queries round in-query on both
sides, so exact match is the expectation and any drift is reported).
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # canonicalize cell values for ordering/comparison
    def canon(v):
        if hasattr(v, "tolist") and not hasattr(v, "isoformat"):
            v = v.tolist()  # numpy array/scalar from toPandas
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if isinstance(v, float) and v.is_integer():
            # canonicalize 3.0 (Spark DOUBLE) and 3 (DuckDB BIGINT) to
            # the same sort key — returning the float unchanged left
            # '3.0' vs '3' ordering the frames differently
            return int(v)
        return v

    out = pdf.map(canon)
    key = out.apply(lambda row: tuple(str(x) for x in row), axis=1)
    return out.iloc[key.argsort(kind="mergesort").values].reset_index(drop=True)


def assert_parity(spark_df, duck_rel, name: str, float_tol: float = 1e-9) -> None:
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert len(spdf) == len(ddf), (
        f"{name}: row count mismatch spark={len(spdf)} duckdb={len(ddf)}"
    )
    assert sorted(map(str.lower, spdf.columns)) == sorted(map(str.lower, ddf.columns)), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}"
    )
    # genuine case-insensitive alignment (the old list-comp was a no-op)
    spdf.columns = [c.lower() for c in spdf.columns]
    ddf.columns = [c.lower() for c in ddf.columns]
    a, b = normalize(spdf), normalize(ddf)
    b.columns = a.columns  # case-insensitive alignment after sorting
    def is_null(v):
        return v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v))

    mismatches = []
    for col in a.columns:
        if len(mismatches) >= 5:
            break  # the outer loop too: the cap is a report limit
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if is_null(x) or is_null(y):
                if is_null(x) != is_null(y):
                    mismatches.append((col, i, x, y))
                continue
            if isinstance(x, (int, float)) and isinstance(y, (int, float)):
                if not math.isclose(
                    float(x), float(y), rel_tol=float_tol, abs_tol=float_tol
                ):
                    mismatches.append((col, i, x, y))
            elif x != y:
                mismatches.append((col, i, x, y))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (col,row,spark,duck): {mismatches[:5]}"
