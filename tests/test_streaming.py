"""Streaming invariants (SURVEY.md §5.3): windowed streaming aggs equal
their batch equivalents; stateful ops converge to batch truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.registry import all_specs
from batch_processing_new_spark.sources.readers import load_table
from batch_processing_new_spark.streaming.stream_queries import (
    read_events_stream,
    run_update_to_memory,
)
from batch_processing_new_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_session_window_equals_batch_sessionize(spark):
    """q52 (streaming session_window, 30-min gap) must agree with
    q21 (batch lag/cumsum sessionization) on sessions and counts."""
    stream = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in all_specs()["q52_stream_session_window"].fn(spark, SF_CORRECT).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in all_specs()["q21_sessionize"].fn(spark, SF_CORRECT).collect()
    }
    assert stream == batch


def test_stream_dedupe_counts(spark):
    """dropDuplicatesWithinWatermark keeps exactly one row per
    (user_id, event_type) — equal to the batch distinct count (the whole
    replay fits one watermark interval)."""
    res = {
        r.user_id: r.n_first_events
        for r in all_specs()["q53_stream_dedupe"].fn(spark, SF_CORRECT).collect()
    }
    e = load_table(spark, SF_CORRECT, "events")
    batch = {
        r.user_id: r.n
        for r in e.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    assert res == batch


def test_stateful_running_stats_converge_to_batch(spark):
    """applyInPandasWithState: the LAST update per user must equal the
    batch groupBy aggregate."""
    stream = read_events_stream(spark, SF_CORRECT)
    updates = run_update_to_memory(running_user_stats(stream), "stateful")
    # last update per user == max n_events row (counts are monotone)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "max_event_id")
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4), r.max_event_id) for r in final.collect()}
    e = load_table(spark, SF_CORRECT, "events")
    exp = {
        r.user_id: (r.n, round(r.tv, 4), r.mx)
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
            F.max("event_id").alias("mx"),
        )
        .collect()
    }
    assert got == exp


def test_foreachbatch_microbatch_enrichment(spark, tmp_path):
    """Streaming enrichment: events replayed as a file stream, each
    micro-batch run through the batch enrich operator via foreachBatch —
    the composition SURVEY.md §7 step 8 calls for. Every event must be
    enriched exactly once with the deterministic mock response."""
    from batch_processing_new_spark.operators.enrich import (
        EnrichConfig,
        build_prompt,
        enrich,
        mock_response,
    )
    from batch_processing_new_spark.streaming.stream_queries import (
        read_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "enriched")
    cfg = EnrichConfig(system_prompt="Classify", transport="mock")

    def handle_batch(batch_df, batch_id: int) -> None:
        enriched = enrich(
            batch_df.select("event_id", "event_type"), "event_type", cfg
        )
        enriched.write.mode("append").parquet(out_dir)

    stream = read_events_stream(spark, sf)
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    assert got.count() == n_events
    sample = got.limit(20).collect()
    for r in sample:
        assert r.Response == mock_response(build_prompt("Classify", r.event_type))



def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics in append mode: a watermark finalizes a window
    one micro-batch after the stream's max event time passes window_end +
    delay; an event arriving after that must not revise the emitted
    result. Three single-file micro-batches: on-time data (max 12:00),
    a filler batch (12:30) that lets the 11:50 watermark take effect,
    then a 2.5-hour-late event for the already-finalized 10:00 window."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name: str, ids, tss, vals, mtime: int) -> None:
        df = pd.DataFrame(
            {
                "event_id": ids,
                # pandas defaults to ns parquet timestamps, which Spark's
                # vectorized reader rejects - write micro precision
                "ts": pd.to_datetime(tss).astype("datetime64[us]"),
                "value": vals,
            }
        )
        path = src / name
        df.to_parquet(path)
        # the file source orders micro-batches by modification time
        os.utime(path, (mtime, mtime))

    write_file(
        "part-000.parquet",
        [1, 2, 3],
        ["2024-01-01 10:01:00", "2024-01-01 10:02:00", "2024-01-01 12:00:00"],
        [1.0, 2.0, 4.0],
        1_700_000_000,
    )
    write_file(
        "part-001.parquet", [5], ["2024-01-01 12:30:00"], [8.0], 1_700_000_100
    )
    write_file(
        "part-002.parquet", [4], ["2024-01-01 10:03:00"], [100.0], 1_700_000_200
    )

    schema = spark.read.parquet(str(src / "part-000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> instant
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = {
        r["window"].start.strftime("%H:%M"): r.total
        for r in spark.table("late_test").collect()
    }
    # 10:00 window finalized at 3.0 BEFORE the late event arrived; the
    # late value=100 was dropped. 12:00/12:30 windows stay open (the
    # final 12:20 watermark never passes their ends) so emit nothing.
    assert rows == {"10:00": 3.0}, rows


def test_stream_stream_join_equals_batch_range_join(spark):
    """q67 (stream-stream join, inner) must agree with q43 (batch banded
    range join) on every purchase that has >= 1 view in the hour."""
    from batch_processing_new_spark.operators.relational_ext import q43_range_join
    from batch_processing_new_spark.streaming.stream_queries import (
        q67_stream_stream_join,
    )

    sf = "/root/testdata/sf0.001"
    batch = {
        r.purchase_id: r.n_views_1h
        for r in q43_range_join(spark, sf).collect()
        if r.n_views_1h > 0  # inner join omits zero-view purchases
    }
    stream = {
        r.purchase_id: r.n_views_1h
        for r in q67_stream_stream_join(spark, sf).collect()
    }
    assert stream == batch


def test_kafka_shim_stream_equals_batch(spark, tmp_path):
    """Kafka-wire topology end-to-end: producer serialize -> parquet
    'broker' -> readStream with the wire schema -> parse -> windowed
    count must equal the same aggregate computed batch-side. Also pins
    the wire contract (exact Kafka source column set) and keyed
    partitioning (every key maps to one partition)."""
    from batch_processing_new_spark.sources.kafka_shim import (
        KAFKA_WIRE_COLUMNS,
        events_as_kafka,
        parse_events,
        read_kafka_shaped_stream,
        write_kafka_shaped,
    )
    from batch_processing_new_spark.streaming.stream_queries import run_to_memory

    broker = str(tmp_path / "broker")
    wire = events_as_kafka(spark, SF_CORRECT)
    assert wire.columns == KAFKA_WIRE_COLUMNS
    write_kafka_shaped(wire, broker)

    # keyed partitioning: one partition per key
    multi = (
        spark.read.parquet(broker)
        .groupBy("key")
        .agg(F.countDistinct("partition").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    assert multi == 0

    stream = parse_events(read_kafka_shaped_stream(spark, broker))
    windowed = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    got = {
        (r.w.start, r.event_type): r.n for r in run_to_memory(windowed).collect()
    }

    e = load_table(spark, SF_CORRECT, "events")
    want = {
        (r.d, r.event_type): r.n
        for r in e.select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"),
            "event_type",
        )
        .groupBy("d", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_incremental_mv_merges_across_batches(spark, tmp_path):
    """The MV must be built by MULTIPLE additive merges (one per file
    micro-batch), and every intermediate snapshot must itself be a
    correct aggregate of the batches seen so far."""
    import os

    from batch_processing_new_spark.streaming.incremental import (
        run_incremental_user_stats,
    )

    events_dir = str(tmp_path / "events")
    state = str(tmp_path / "state")
    load_table(spark, SF_CORRECT, "events").select(
        "user_id", "value"
    ).repartition(4).write.parquet(events_dir)

    final = run_incremental_user_stats(spark, events_dir, state)

    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(state) if d.startswith("v=")
    )
    assert len(versions) == 4, versions  # one merge per micro-batch

    # monotone growth: each snapshot's total event count is a running sum
    counts = [
        spark.read.parquet(f"{state}/v={v}")
        .agg(F.sum("n_events").alias("s"))
        .collect()[0]
        .s
        for v in versions
    ]
    assert counts == sorted(counts) and counts[-1] > counts[0]

    want = {
        (r.user_id, r.n)
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r.user_id, r.n_events) for r in final.collect()}
    assert got == want


def test_hll_mv_merge_invariance_and_accuracy(spark, tmp_path):
    """The incrementally-merged HLL MV must (a) be EXACTLY equal to the
    one-shot sketch over all data (merge-invariance: union of partial
    sketches == sketch of the union) and (b) estimate within 5% of the
    exact distinct count."""
    from batch_processing_new_spark.streaming.incremental import (
        run_incremental_distinct_users,
    )

    events_dir = str(tmp_path / "events")
    e = load_table(spark, SF_CORRECT, "events").select("event_type", "user_id")
    e.repartition(4).write.parquet(events_dir)

    got = {
        r.event_type: r.n_users_est
        for r in run_incremental_distinct_users(
            spark, events_dir, str(tmp_path / "state")
        ).collect()
    }

    oneshot = {
        r.event_type: r.est
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert got == oneshot  # merge-invariance, bit-exact

    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(got[t] - n) / n < 0.05, (t, got[t], n)


def test_stream_left_outer_join_equals_batch_on_closed_region(spark):
    """q103 (stream-stream LEFT OUTER join) must agree with the batch
    left join — zero-view purchases included — for every purchase the
    watermark has closed (p_ts <= max_ts - 10min). Purchases inside the
    final watermark gap legitimately stay open in streaming; assert
    they are the ONLY discrepancies and that emitted rows are exact."""
    import datetime

    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.relational_ext import q43_range_join
    from batch_processing_new_spark.sources.readers import load_table
    from batch_processing_new_spark.streaming.stream_queries import (
        q103_stream_left_outer_join,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    closed = {
        r.event_id
        for r in ev.where(
            (F.col("event_type") == "purchase") & (F.col("ts") <= horizon)
        )
        .select("event_id")
        .collect()
    }

    batch = {
        r.purchase_id: r.n_views_1h for r in q43_range_join(spark, sf).collect()
    }
    stream = {
        r.purchase_id: r.n_views_1h
        for r in q103_stream_left_outer_join(spark, sf).collect()
    }

    # every closed purchase emitted, with the exact batch count
    for pid in closed:
        assert stream.get(pid) == batch[pid], (pid, stream.get(pid), batch[pid])
    # anything extra the stream emitted must still match batch exactly
    for pid, n in stream.items():
        assert batch[pid] == n
    # and zero-view purchases actually appear (the outer side is real)
    assert any(n == 0 for pid, n in stream.items() if pid in closed)


def test_transform_with_state_converges_to_batch(spark):
    """Spark 4 transformWithStateInPandas (typed ValueState + MapState):
    the final emission per user must equal the batch groupBy truth.
    Skipped where google.protobuf is unavailable (the Python state
    server's wire protocol — see streaming/stateful.py gate note)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from batch_processing_new_spark.streaming.stateful import user_type_profile

    stream = read_events_stream(spark, SF_CORRECT)
    updates = run_update_to_memory(user_type_profile(stream), "tws")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "n_types", "top_type")
    )
    got = {
        r.user_id: (r.n_events, round(r.total_value, 4), r.n_types, r.top_type)
        for r in final.collect()
    }
    e = load_table(spark, SF_CORRECT, "events")
    top = (
        e.groupBy("user_id", "event_type")
        .count()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("count").desc(), "event_type"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    exp = {
        r.user_id: (r.n, round(r.tv, 4), r.nt, r.top_type)
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
            F.countDistinct("event_type").alias("nt"),
        )
        .join(top, "user_id")
        .collect()
    }
    assert got == exp


def test_mv_merge_is_idempotent_under_batch_replay(spark, tmp_path):
    """foreachBatch is at-least-once: re-invoking the merge hook with
    the SAME batch_id (crash after write, before checkpoint commit)
    must not double-count — the merge bases itself on the newest
    committed version STRICTLY BELOW the replayed id."""
    from batch_processing_new_spark.sources.readers import load_table
    from batch_processing_new_spark.streaming.incremental import (
        latest_snapshot,
        merge_user_stats_batch,
    )

    ev = load_table(spark, SF_SMOKE, "events").limit(200).cache()
    state = str(tmp_path / "mv")
    b0 = ev.where("event_id % 2 = 0")
    b1 = ev.where("event_id % 2 = 1")
    merge_user_stats_batch(b0, 0, state)
    merge_user_stats_batch(b1, 1, state)
    once = {
        r["user_id"]: (r["n_events"], float(r["total_value_dec"]))
        for r in latest_snapshot(spark, state).collect()
    }
    # replay batch 1 (same id): result must be unchanged
    merge_user_stats_batch(b1, 1, state)
    twice = {
        r["user_id"]: (r["n_events"], float(r["total_value_dec"]))
        for r in latest_snapshot(spark, state).collect()
    }
    assert once == twice
    # and the totals equal the batch-global aggregate
    expect = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert {u: n for u, (n, _) in twice.items()} == expect


def test_events_fixture_is_single_parquet_file():
    """q53/q103's exact oracles assume the availableNow replay runs as
    ONE data micro-batch — true only while each events fixture is a
    single parquet FILE (a multi-file directory replays as several
    micro-batches, mid-stream state eviction re-emits pairs, and both
    driver rows silently flip red even though the Spark side is
    correct). Fail loudly AT THE ASSUMPTION if a fixture-layout change
    ever violates it (ADVICE r04)."""
    import glob
    import os

    # honor the same override the lookup builder uses
    # (tools/build_zlib_lookup.py) so a redirected fixture root is the
    # one actually validated (ADVICE r05)
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    dirs = sorted(glob.glob(os.path.join(base, "sf*")))
    assert dirs, "no testdata fixture dirs found"
    for d in dirs:
        p = os.path.join(d, "events.parquet")
        assert os.path.isfile(p), (
            f"{p} is not a single parquet file; q53/q103's exact "
            "oracles no longer hold — re-declare them rows-only "
            "(see stream_queries.py docstrings)"
        )
