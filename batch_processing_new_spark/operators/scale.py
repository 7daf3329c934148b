"""Scale utilities: skew-salted joins and bucketed (pre-shuffled) tables.

These are the two knobs the 100 TB deployment turns that small-SF tests
can't show off on timings — so each carries a plan-level test
(tests/test_scale.py) asserting the *shape* Spark produces: the salted
join spreads a hot key over N subkeys, and a bucketed join runs with no
Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a hot key: the fact side gets a random-ish
    (but deterministic: hash of the whole row via a stable row key is
    unnecessary — any spread works, membership doesn't matter) salt in
    [0, n_salts); the dim side is exploded n_salts times so every
    (key, salt) pair exists. The shuffle then distributes a hot key over
    n_salts reducers instead of one.

    AQE's skew-join handles most cases automatically (split-and-replicate
    at runtime); explicit salting remains for aggregate-after-join
    pipelines and engines/stages where AQE can't rewrite (e.g. a
    hot-key groupBy feeding the join). Join RESULTS are identical to the
    unsalted join — asserted in tests.

    Only inner/left-flavored joins are accepted: the dim side is
    replicated n_salts times, so a right/full outer join would emit
    every UNMATCHED dim row once per salt (n_salts duplicates) — a
    silent correctness break, rejected loudly instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "dim rows would duplicate once per salt; use the plain join "
            "(AQE skew handling) for outer joins on the dim side"
        )
    fact_salted = fact.withColumn(
        SALT_COL, (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    dim_salted = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_salted.join(dim_salted, [key, SALT_COL], how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Persist a table pre-shuffled into hash buckets on the join key.

    Bucketing moves the shuffle from query time to write time: two
    tables bucketed identically on their join key sort-merge-join with
    NO Exchange at all — at 100 TB that's the difference between a
    terabyte-scale network transfer per query and zero. The same
    mechanism backs the IVF cell layout (similarity.py) and any
    repeatedly-joined fact/fact pair.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def kll_quantiles(
    df,
    value_col: str,
    group_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
):
    """Per-group quantile estimates via mergeable KLL sketches
    (datasketches, Spark-native `kll_sketch_agg_double`) — the scale
    path for percentiles: sketches build with map-side combine, merge
    associatively across partitions/days (`kll_sketch_merge_double`),
    and answer any quantile after the fact, unlike `percentile_approx`
    which fixes its targets per query.

    NOT exposed as a registry query: KLL compaction is randomized, so
    estimates differ run to run (measured: two identical 32-partition
    runs disagree) — it would violate the engine's cross-partitioning
    determinism guarantee that every `queries()` entry carries. Rank
    error is bounded (~1.65/sqrt(k)); tests/test_scale.py asserts the
    estimates land inside generous exact-rank bands.
    """
    from pyspark.sql import functions as F

    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(value_col).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    cols = [group_col, "n"] + [
        F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(
            f"p{int(round(q * 100))}"
        )
        for q in quantiles
    ]
    return sk.select(*cols)


def skew_profile_oracle(table: str, key: str) -> str:
    """DuckDB twin of ``skew_profile`` for one (table, key)."""
    return f"""
SELECT '{key}' AS join_key,
       count(*)                                    AS n_keys,
       CAST(max(c) AS BIGINT)                      AS max_rows,
       round(max(c) * 1.0 / sum(c), 9)             AS top1_share,
       round(max(c) * 1.0 * count(*) / sum(c), 6)  AS skew_factor
FROM (SELECT {key}, count(*) AS c FROM {table} GROUP BY {key})
"""


def skew_profile(df, key: str):
    """Join-key distribution diagnostic: key count, heaviest key's row
    count and share, and skew factor (heaviest / mean) — the number
    that decides between a plain shuffle join, AQE skew splitting, and
    explicit salting (`salted_join`). Rule of thumb: skew_factor < 4
    needs nothing, 4-20 AQE handles, beyond that salt with roughly
    ceil(skew_factor / 4) salts.

    One map-side-combined count per key, then a second tiny aggregate —
    cheap enough to run routinely before standing up a big join at
    100 TB (the profile costs one scan; a skewed shuffle join costs a
    straggler task that runs for hours).
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.lit(key).alias("join_key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_rows"),
        F.round(F.max("c") / F.sum("c"), 9).alias("top1_share"),
        # double BEFORE the product: max_rows * n_keys as long*long
        # silently wraps past 2^63 at data scale (the q185/q164
        # overflow class); the oracle's max(c)*1.0*count(*) is the
        # identical double-first DAG
        F.round(
            F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"), 6
        ).alias("skew_factor"),
    )


def _register_skew_query() -> None:
    from pyspark.sql import SparkSession

    from batch_processing_new_spark.registry import query
    from batch_processing_new_spark.sources.readers import load_table

    keyed = [("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
             ("orders", "o_custkey"), ("events", "user_id")]
    oracle = "\nUNION ALL\n".join(
        skew_profile_oracle(t, k) for t, k in keyed
    ) + "\nORDER BY join_key"

    @query(
        "q135_skew_profile",
        oracle=oracle,
        doc=skew_profile.__doc__,
    )
    def q135_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [
            skew_profile(load_table(spark, sf_dir, t).select(k), k)
            for t, k in keyed
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("join_key")


_register_skew_query()
