"""Delta-less incremental materialized-view maintenance.

Pattern: a streaming ``foreachBatch`` merges each micro-batch's partial
aggregate into a versioned parquet snapshot — the additive-merge MV
pattern for engines without a transactional table format. Each batch:

    state(v)  +  partial_agg(batch)  --re-aggregate-->  state(v+1)

Snapshots are immutable directories ``v=<batch_id>``; readers pick the
max version (atomic because a version directory appears only after its
write completes — parquet's _SUCCESS-gated rename). This is what
``MERGE INTO`` compiles to on Delta/Iceberg; spelled out here so the
engine doesn't depend on a table-format jar.

Scale notes: the merge re-aggregates state ∪ partial, shuffling on the
group key. State size is bounded by key cardinality, not event volume —
the whole point of maintaining the MV incrementally. At 100 TB,
partition the snapshot by a key bucket and rewrite only buckets touched
by the batch (partial-agg keys -> dynamic partition overwrite); the
versioning and additive-merge logic is unchanged.

Only ALGEBRAIC aggregates (count/sum/min/max and anything derivable:
avg = sum/count) merge this way; holistic ones (median, distinct) need
sketches (HLL for distinct — see q47) or full recompute.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.relational import DEC
from batch_processing_new_spark.streaming.stream_queries import _state_partitions
from batch_processing_new_spark.registry import query


def latest_snapshot(
    spark: SparkSession, state_path: str, before: int | None = None
) -> DataFrame | None:
    """The max-version COMMITTED snapshot under ``state_path`` (or the
    max strictly below ``before``), or None.

    Two replay-safety rules (foreachBatch is at-least-once):
    - only versions whose write COMMITTED (parquet _SUCCESS marker)
      qualify — a crash mid-write leaves a partial dir that must never
      become a merge base;
    - a merge for batch N bases itself on a version < N: after a
      crash-after-write-before-checkpoint-commit, batch N re-runs, and
      merging into the already-written v=N would double-count it.
    """
    if not os.path.isdir(state_path):
        return None
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(state_path)
        if d.startswith("v=")
        and os.path.exists(os.path.join(state_path, d, "_SUCCESS"))
    ]
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(f"{state_path}/v={max(versions)}")


def merge_user_stats_batch(
    batch_df: DataFrame, batch_id: int, state_path: str
) -> None:
    """foreachBatch hook: additive merge of one micro-batch into the
    per-user stats MV (n_events, total_value as exact decimal)."""
    spark = batch_df.sparkSession
    partial = batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).alias("total_value_dec"),
    )
    # idempotent under replay: base = newest committed version BELOW
    # this batch id (see latest_snapshot)
    cur = latest_snapshot(spark, state_path, before=batch_id)
    merged = (
        partial
        if cur is None
        else cur.unionByName(partial)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value_dec").alias("total_value_dec"),
        )
    )
    merged.write.mode("overwrite").parquet(f"{state_path}/v={batch_id}")


def run_incremental_user_stats(
    spark: SparkSession, events_dir: str, state_path: str
) -> DataFrame:
    """Stream ``events_dir`` (one micro-batch per file) through the MV
    merge; return the final snapshot."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    with _state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_user_stats_batch(df, bid, state_path)
            )
            .option(
                "checkpointLocation", os.path.join(state_path, "_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = latest_snapshot(spark, state_path)
    assert final is not None
    return final


@query(
    "q86_incremental_user_stats",
    oracle="""
SELECT user_id,
       count(*)                                          AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q86_incremental_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-user stats MV: events split into
    4 files, replayed one micro-batch each, additive-merged into a
    versioned snapshot — the final snapshot must equal the one-shot
    batch aggregate (the oracle)."""
    from batch_processing_new_spark.sources.readers import load_table

    work = tempfile.mkdtemp(prefix="mv_")
    events_dir = os.path.join(work, "events")
    # land the stream input as 4 files = 4 micro-batches
    load_table(spark, sf_dir, "events").select(
        "user_id", "value"
    ).repartition(4).write.mode("overwrite").parquet(events_dir)
    final = run_incremental_user_stats(
        spark, events_dir, os.path.join(work, "state")
    )
    return final.select(
        "user_id",
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
    ).orderBy("user_id")


# ------------------------------------------- mergeable-sketch MV

def merge_distinct_users_batch(
    batch_df: DataFrame, batch_id: int, state_path: str
) -> None:
    """foreachBatch hook for a DISTINCT-count MV: per-event_type
    Datasketches HLL sketches (binary, mergeable) instead of raw user
    sets.

    count(DISTINCT) is holistic — it can't be maintained by adding
    partials — but its sketch is algebraic: ``hll_union`` of the state
    sketch and the batch sketch is EXACTLY the sketch of the union
    (merge-invariance, asserted in tests). State per group is ~KBs
    regardless of user cardinality; this is the only way a distinct MV
    survives 100 TB.
    """
    spark = batch_df.sparkSession
    state_dir = f"{state_path}/hll"
    partial = batch_df.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    # same replay-idempotence rule as the additive MV: base strictly
    # below this batch id, committed versions only
    cur = latest_snapshot(spark, state_dir, before=batch_id)
    merged = (
        partial
        if cur is None
        else cur.unionByName(partial)
        .groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
    merged.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")


def run_incremental_distinct_users(
    spark: SparkSession, events_dir: str, state_path: str
) -> DataFrame:
    """Stream ``events_dir`` through the HLL merge; return the final
    (event_type, n_users_est) estimate."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    with _state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_distinct_users_batch(df, bid, state_path)
            )
            .option(
                "checkpointLocation", os.path.join(state_path, "_hll_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = latest_snapshot(spark, f"{state_path}/hll")
    assert final is not None
    return final.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("n_users_est"),
    )


@query("q92_hll_distinct_mv")  # sketch estimates have no DuckDB twin: rows-only
def q92_hll_distinct_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained distinct-users-per-event-type MV via
    mergeable HLL sketches; merge-invariance and accuracy vs the exact
    distinct count are asserted in tests/test_streaming.py.

    Determinism regime (measured r06, tools/hll_replay.py): up to 384
    distinct coupons per group the estimate is EXACTLY the coupon
    count — a set function, bit-stable under any partitioning, and
    pinned against an independent replay of the published DataSketches
    coupon path in tests/test_hll_replay.py. Above promotion the HIP
    estimator makes the value merge-order dependent (a valid estimate
    either way — accuracy, not identity, is the sketch contract), so
    the driver row is rows-only BY NECESSITY, not by test debt: no
    set-function oracle exists above the regime, for any
    implementation. Full argument: COVERAGE.md q92 residue row."""
    from batch_processing_new_spark.sources.readers import load_table

    work = tempfile.mkdtemp(prefix="hllmv_")
    events_dir = os.path.join(work, "events")
    load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).repartition(4).write.mode("overwrite").parquet(events_dir)
    return run_incremental_distinct_users(
        spark, events_dir, os.path.join(work, "state")
    ).orderBy("event_type")
