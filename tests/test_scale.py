"""Plan-shape tests for the scale utilities: salted joins preserve
results; bucketed tables join without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_equals_plain_join(spark):
    from batch_processing_new_spark.operators.scale import salted_join
    from batch_processing_new_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, SF, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", n_salts=4)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {(r.l_orderkey): (r.n, r.q) for r in plain.collect()}
    b = {(r.l_orderkey): (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from batch_processing_new_spark.operators.scale import write_bucketed
    from batch_processing_new_spark.sources.readers import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
        write_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"),
            "b_orders",
            "l_orderkey",
            n_buckets=4,
        )
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # bucketing removed the shuffle
        # and the join is still correct
        n = joined.count()
        assert n == li.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet + a partition-key filter must show
    partition pruning in the scan (PartitionFilters), reading only the
    matching directory — the mechanism that turns a 100 TB scan into a
    single-partition read."""
    from batch_processing_new_spark.sinks.writers import write_parquet
    from batch_processing_new_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events")
    dest = str(tmp_path / "events_by_type")
    write_parquet(ev, dest, partition_by=["event_type"])

    back = spark.read.parquet(dest).where(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "purchase" in plan  # the filter reached the partition pruner
    expected = ev.where(F.col("event_type") == "purchase").count()
    assert back.count() == expected

    import glob
    import os

    read_dirs = glob.glob(os.path.join(dest, "event_type=*"))
    assert len(read_dirs) == 5  # all partitions exist on disk; the scan's
    # PartitionFilters (asserted above) restrict reading to event_type=purchase
    # (inputFiles() reflects the unpruned file index, so don't assert on it)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Spark's runtime bloom-filter injection (AQE, Spark 3.3+): a
    selective filter on one side of a shuffle join plants a
    bloom_filter_agg / might_contain pre-filter on the other side, so
    the big side drops non-joinable rows BEFORE the shuffle — at 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the ~matching slice. Thresholds are lowered to force
    injection at test scale; results must be identical either way."""
    from tests.conftest import SF_CORRECT
    from batch_processing_new_spark.sources.readers import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast would bypass bloom injection
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        o = load_table(spark, SF_CORRECT, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_CORRECT, "lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count("*").alias("n"))

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        with_bloom = {(r.o_orderpriority, r.n) for r in joined.collect()}
    finally:
        for k, v in saved.items():
            conf.set(k, v)

    baseline = {
        (r.o_orderpriority, r.n)
        for r in load_table(spark, SF_CORRECT, "lineitem")
        .join(
            load_table(spark, SF_CORRECT, "orders").where(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert with_bloom == baseline


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """200 tiny files -> few target-size files, same content."""
    import glob

    from batch_processing_new_spark.sinks.writers import compact_parquet
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    li = load_table(spark, SF_CORRECT, "lineitem")
    li.repartition(200).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 200

    compact_parquet(spark, src, dst, target_file_mb=8)
    out_files = glob.glob(f"{dst}/part-*")
    assert 1 <= len(out_files) <= 4, len(out_files)

    a = spark.read.parquet(src).groupBy("l_returnflag").count().collect()
    b = spark.read.parquet(dst).groupBy("l_returnflag").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_range_clustered_write_disjoint_file_stats(spark, tmp_path):
    """Files written by write_range_clustered carry pairwise-disjoint
    footer min/max ranges on the cluster key — the property file-level
    pruning needs. Verified from the parquet metadata itself."""
    import glob

    import pyarrow.parquet as pq

    from batch_processing_new_spark.sinks.writers import write_range_clustered
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    dst = str(tmp_path / "clustered")
    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_range_clustered(li, dst, ["l_orderkey"], n_files=8)

    spans = []
    for f in sorted(glob.glob(f"{dst}/part-*")):
        meta = pq.ParquetFile(f).metadata
        schema_idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        ci = schema_idx["l_orderkey"]
        mins, maxs = [], []
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4  # range partitioner actually split the key space
    spans.sort()
    for (_, prev_max), (nxt_min, _) in zip(spans, spans[1:]):
        assert nxt_min >= prev_max  # ranges may touch on a key, not overlap

    # content unchanged
    a = spark.read.parquet(dst).agg(F.sum("l_quantity"), F.count("*")).collect()
    b = li.agg(F.sum("l_quantity"), F.count("*")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_zorder_bounds_both_dims_vs_single_key_sort(spark, tmp_path):
    """Z-ordered files cover small rectangles of (orderkey, partkey):
    the average per-file partkey span must be far below the single-key
    layout's, while orderkey locality stays file-prunable. Verified from
    parquet footer statistics, the same metadata a scan planner uses."""
    import glob

    import pyarrow.parquet as pq

    from batch_processing_new_spark.functions.zorder import write_zordered
    from batch_processing_new_spark.sinks.writers import write_range_clustered
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )

    def file_spans(path, col):
        spans = []
        for f in sorted(glob.glob(f"{path}/part-*")):
            meta = pq.ParquetFile(f).metadata
            idx = {
                meta.row_group(0).column(i).path_in_schema: i
                for i in range(meta.num_columns)
            }[col]
            mins, maxs = [], []
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                spans.append(max(maxs) - min(mins))
        return spans

    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    write_range_clustered(li, linear, ["l_orderkey"], n_files=16)
    write_zordered(li, zord, ["l_orderkey", "l_partkey"], n_files=16)

    full_part_span = (
        li.agg(F.max("l_partkey") - F.min("l_partkey")).first()[0]
    )
    lin_part = file_spans(linear, "l_partkey")
    z_part = file_spans(zord, "l_partkey")
    # single-key layout: every file spans ~the whole partkey range
    assert sum(lin_part) / len(lin_part) > 0.8 * full_part_span
    # z-order: files cover rectangles — mean span well below full range
    assert sum(z_part) / len(z_part) < 0.6 * full_part_span, (
        sum(z_part) / len(z_part),
        full_part_span,
    )

    # content preserved
    a = li.agg(F.sum("l_quantity"), F.count("*")).collect()
    b = spark.read.parquet(zord).agg(F.sum("l_quantity"), F.count("*")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kll_quantiles_within_rank_bounds(spark):
    from batch_processing_new_spark.operators.scale import kll_quantiles
    from batch_processing_new_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    est = {
        r[0]: (r.p25, r.p50, r.p75)
        for r in kll_quantiles(
            li, "l_extendedprice", "l_returnflag", (0.25, 0.5, 0.75)
        ).collect()
    }
    # exact rank bands: each estimate must fall between the exact
    # (q-0.05) and (q+0.05) quantiles — ~4x the default KLL rank error
    import pyspark.sql.functions as F

    for flag, (p25, p50, p75) in est.items():
        vals = (
            li.where(F.col("l_returnflag") == flag)
            .select(
                F.expr(
                    "percentile(l_extendedprice, "
                    "array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80))"
                ).alias("b")
            )
            .collect()[0]
            .b
        )
        assert vals[0] <= p25 <= vals[1]
        assert vals[2] <= p50 <= vals[3]
        assert vals[4] <= p75 <= vals[5]
