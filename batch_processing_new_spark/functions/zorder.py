"""Z-order (Morton) clustering key — multi-dimensional data layout.

`write_range_clustered` (sinks/writers.py) gives perfect file-level
pruning on ONE key at the cost of every other column's locality: sort
by l_orderkey and each file spans the FULL l_partkey range, so
partkey-selective scans still touch every file. Interleaving the bits
of several keys (Morton order — the technique behind Delta/Iceberg
OPTIMIZE ZORDER) bounds every clustered dimension's per-file spread at
once: a file covering a contiguous Morton range covers a small hyper-
rectangle of the key space, so min/max footer stats prune scans on ANY
clustered column, not just the sort leader.

Pure codegen'd integer expressions (rank-normalize -> shift/or fold);
no UDF, no shuffle beyond the final range partition on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


ZBITS = 16  # bits kept per dimension: 2 dims -> 32-bit Morton key


def _normalize(col: Column, col_min: Column, col_max: Column) -> Column:
    """Scale a numeric column to an integer in [0, 2^ZBITS): equal-width
    over the observed [min, max]. Rank-based normalization would resist
    skew better but costs a global sort; equal-width is the standard
    single-pass trade and min/max come from one cheap aggregate."""
    span = (col_max - col_min).cast("double")
    unit = F.when(span > 0, span).otherwise(F.lit(1.0))
    scaled = ((col.cast("double") - col_min) / unit) * ((1 << ZBITS) - 1)
    return F.round(scaled).cast("bigint")


def _interleave(cols: list[Column], bits: int = ZBITS) -> Column:
    """Morton key: bit j of dimension i lands at position j*ndims+i.

    The ONE bit-interleave implementation in the engine —
    layout.morton_key delegates here (bit positions are disjoint, so
    OR and the sum formulation are identical; keeping two copies
    invited silent divergence).
    """
    ndims = len(cols)
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * ndims + i))
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], key_col: str = "_zkey"
) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric). One aggregate pass
    for per-column min/max (broadcast as a 1-row cross join), then the
    key is a pure projection."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    normed = [
        _normalize(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"))
        for c in cols
    ]
    return j.withColumn(key_col, _interleave(normed)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame, dest_dir: str, cols: list[str], n_files: int
) -> str:
    """Z-order-clustered parquet: range-partition + sort on the Morton
    key of ``cols``, so every file covers a small hyper-rectangle and
    footer min/max stats prune scans on every clustered column
    (asserted against single-key sorting in tests/test_scale.py)."""
    keyed = with_zorder_key(df, cols)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(dest_dir)
    )
    return dest_dir
