"""Physical-layout operators: Z-order (Morton) clustering keys and
zone-map statistics with pruning analysis.

At 100 TB, which rows share a file decides how much of the corpus a
selective query touches: parquet min/max footers (zone maps) can only
skip a file if the layout made its value ranges narrow. These two
queries are the engine's layout toolkit:

- q148 computes a Morton interleave key over two join/filter columns
  and shows, per Z-bucket, how tight the per-bucket ranges are — the
  exact property that makes ``writer.sortBy(zkey)`` produce
  multi-dimensionally skippable files (the technique Delta/Iceberg
  expose as OPTIMIZE ZORDER).
- q150 computes the zone map itself (per-shard min/max/count) under
  two layouts — hash-sharded vs date-range-sharded — and evaluates a
  concrete predicate against each shard's range, so the output IS the
  pruning decision table: hash layout prunes nothing, range layout
  prunes almost everything outside the predicate window.

Both are pure JVM expression + single partial-agg shuffle plans with
exact DuckDB oracles. The bit-interleave expression is generated once
in Python (as a literal expression tree / SQL string) — there is no
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

_BITS = 8  # quantization width per dimension (256 cells)
_BUCKET_SHIFT = 10  # zkey >> 10 => 64 Z-buckets over the 16-bit key


def morton_key(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Morton (Z-order) interleave of two ``bits``-wide non-negative
    ints: bit i of x lands at position 2i, bit i of y at 2i+1.
    Delegates to the engine's single interleave implementation
    (functions/zorder.py); codegen flattens it into straight-line
    long arithmetic — no loop survives at runtime."""
    from batch_processing_new_spark.functions.zorder import _interleave

    return _interleave([x, y], bits=bits)


def _morton_sql(x: str, y: str, bits: int = _BITS) -> str:
    """The identical interleave as a DuckDB SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "q148_zorder_layout",
    oracle=f"""
WITH q AS (
    SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y
    FROM lineitem
),
z AS (
    SELECT x, y, ({_morton_sql('x', 'y')}) >> {_BUCKET_SHIFT} AS zbucket
    FROM q
)
SELECT zbucket,
       count(*) AS n_rows,
       min(x)   AS x_min,
       max(x)   AS x_max,
       min(y)   AS y_min,
       max(y)   AS y_max
FROM z
GROUP BY zbucket
ORDER BY zbucket
""",
)
def q148_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: quantize (l_partkey, l_suppkey) to 8-bit
    cells, Morton-interleave them, bucket rows by the top 6 Z-key bits,
    and report each bucket's row count and per-dimension min/max.

    The output demonstrates the property Z-ordering exists for: every
    Z-bucket's x-range AND y-range are narrow simultaneously (<= 32
    wide out of 256), so files written in Z-key order are skippable by
    parquet zone maps on BOTH columns — a linear sort key keeps only
    its leading column narrow. At scale the full recipe is
    ``df.repartitionByRange(F.col("zkey")).sortWithinPartitions("zkey")
    .write...``; this query is the audit that validates the key before
    paying for the rewrite. Plan: the interleave is scan-stage
    straight-line arithmetic; the only exchange is the 64-group
    partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
    )
    z = li.withColumn(
        "zbucket",
        F.shiftright(morton_key(F.col("x"), F.col("y")), _BUCKET_SHIFT),
    )
    return (
        z.groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("zbucket")
    )


_N_HASH_SHARDS = 32
_PRED_DATE = "1997-01-01"


@query(
    "q150_zone_map_stats",
    oracle=f"""
WITH hashed AS (
    SELECT 'hash' AS layout,
           ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
               % {_N_HASH_SHARDS} AS shard,
           o_orderdate, o_totalprice
    FROM orders
),
ranged AS (
    SELECT 'date_range' AS layout,
           year(o_orderdate) * 12 + month(o_orderdate) AS shard,
           o_orderdate, o_totalprice
    FROM orders
),
both_layouts AS (
    SELECT * FROM hashed UNION ALL SELECT * FROM ranged
)
SELECT layout, shard,
       count(*)          AS n_rows,
       min(o_orderdate)  AS d_min,
       max(o_orderdate)  AS d_max,
       min(o_totalprice) AS p_min,
       max(o_totalprice) AS p_max,
       max(o_orderdate) < TIMESTAMP '{_PRED_DATE}' AS prunable
FROM both_layouts
GROUP BY layout, shard
ORDER BY layout, shard
""",
)
def q150_zone_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning table: per-shard min/max/count of orders under
    a hash layout (md5(o_orderkey) % 32) and a date-range layout
    (calendar month), plus whether the shard is prunable for the
    predicate ``o_orderdate >= '{_PRED_DATE}'`` (prunable iff the
    shard's max date falls before it).

    This is the quantitative case for range layouts at 100 TB: every
    hash shard's [d_min, d_max] spans the whole table (prunable =
    false, 32/32 shards scanned), while the month layout is prunable
    for every month before the cutoff — the scan-cost ratio between
    the two layouts is the output, not an assertion. Plan: one scan,
    two 32-to-90-group partial aggs, a union of ~120 stat rows; the
    md5 shard id reuses the engine's portable hash (text_funcs.hash60)
    so the oracle computes the identical shard assignment.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    from batch_processing_new_spark.functions.text_funcs import hash60

    hashed = o.select(
        F.lit("hash").alias("layout"),
        (hash60(F.col("o_orderkey").cast("string")) % _N_HASH_SHARDS).alias(
            "shard"
        ),
        "o_orderdate",
        "o_totalprice",
    )
    ranged = o.select(
        F.lit("date_range").alias("layout"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("shard"),
        "o_orderdate",
        "o_totalprice",
    )
    stats = (
        hashed.unionByName(ranged)
        .groupBy("layout", "shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderdate").alias("d_min"),
            F.max("o_orderdate").alias("d_max"),
            F.min("o_totalprice").alias("p_min"),
            F.max("o_totalprice").alias("p_max"),
            # NTZ literal: an NTZ-vs-NTZ comparison is pure naive
            # ordering; a plain "timestamp" literal would promote both
            # sides through the session zone
            (
                F.max("o_orderdate") < F.lit(_PRED_DATE).cast("timestamp_ntz")
            ).alias("prunable"),
        )
    )
    return stats.orderBy("layout", "shard")
