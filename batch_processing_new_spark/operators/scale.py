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
    """
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
