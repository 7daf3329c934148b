"""Local replica of the driver's correctness gate.

Compares a Spark DataFrame result against a DuckDB oracle result:
row-count, column-name set, and order-insensitive values (exact for
ints/strings, tight tolerance for floats — queries round in-query on both
sides, so exact match is the expectation and any drift is reported).
"""

from __future__ import annotations

import math

import pandas as pd

# dtype "print classes": two pandas columns in the same class render
# every shared value identically under str() formatting, so only a
# cross-class pair can split a formatted-value hash
_PRINT_CLASSES = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "float32": "float32", "float64": "float",
    "bool": "bool",
    "object": "object", "string": "object",
    "datetime64[ns]": "ts", "datetime64[us]": "ts", "datetime64[ms]": "ts",
}


def _print_class(series) -> str:
    cls = _PRINT_CLASSES.get(str(series.dtype), str(series.dtype))
    if cls == "object":
        # an all-int object column (Spark nullable long) prints like int
        vals = [v for v in series if v is not None]
        if vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            return "int"
    return cls


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
        return v

    out = pdf.map(canon)

    # ALIGNMENT-only key: int-ify integer-valued floats so the one
    # exempted dtype split (nullable-int promotion: int64 on one side,
    # float64-with-NaN on the other) sorts both frames identically —
    # str() keys '3' vs '3.0' would align DIFFERENT rows and report
    # spurious value mismatches (ADVICE r04). The comparison itself
    # still sees the raw canonicalized cells.
    def sort_cell(x):
        if isinstance(x, bool):
            return str(x)
        if isinstance(x, float) and x.is_integer() and abs(x) < 2**53:
            return str(int(x))
        if isinstance(x, tuple):
            return str(tuple(sort_cell(v) for v in x))
        return str(x)

    key = out.apply(lambda row: tuple(sort_cell(x) for x in row), axis=1)
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
    # pandas-dtype print-class parity: a driver-style harness hashes
    # FORMATTED values, so Spark int64 `1500` vs DuckDB float64 `1500.0`
    # is a guaranteed mismatch even when every value is numerically
    # equal. This is exactly how DuckDB's HUGEINT (the type of
    # sum(BIGINT)) split the five r03 driver-red queries while the old
    # canon here int-ified integer-valued floats and called them green.
    # Exception: a float column CONTAINING NaN whose counterpart is
    # int-class is pandas' unavoidable nullable-int promotion, not an
    # oracle bug — compared numerically below instead of flagged.
    dtype_flags = []
    for col in sorted(set(spdf.columns) & set(ddf.columns)):
        sc, dc = _print_class(spdf[col]), _print_class(ddf[col])
        if sc == dc:
            continue
        if {sc, dc} == {"int", "float"}:
            fl = spdf[col] if sc == "float" else ddf[col]
            if fl.isna().any():
                continue  # nullable-int promotion artifact
        dtype_flags.append(f"{col}: spark={spdf[col].dtype} duck={ddf[col].dtype}")
    assert not dtype_flags, (
        f"{name}: dtype print-class mismatch (formatted-value hash would "
        f"differ): {dtype_flags}"
    )
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
