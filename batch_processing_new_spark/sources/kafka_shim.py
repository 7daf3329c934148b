"""Kafka-shaped source abstraction.

Spark's Kafka connector (``spark.readStream.format("kafka")``) presents
a fixed wire schema — ``key``/``value`` as BINARY plus
topic/partition/offset/timestamp metadata — and every downstream plan
starts with "cast value, parse, type". This module implements exactly
that contract over a local parquet-backed "broker" so the whole
topology (serialize -> wire schema -> parse -> typed plan) is testable
without a broker, and swapping in real Kafka at deploy time changes
ONE line (the reader), not the parse or the business plan.

Reference evidence: SURVEY.md §2B streaming row (socketio/websockets
pins, requirements.txt:28,72) — the reference pushes rows over a
socket; the Spark-native equivalent of "rows arriving on a socket" is
the Kafka wire contract.

Scale notes: ``partition`` is ``pmod(user_id, N)`` — the same keyed
partitioning a real producer would use, so per-key ordering survives
the broker hop and stateful consumers (sessionization, dedup) can rely
on it. Parsing is ``from_json`` over a BINARY->STRING cast: pure JVM,
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

#: The exact column set Spark's Kafka source exposes.
KAFKA_WIRE_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]

#: Typed schema of an events record inside ``value`` (JSON).
EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

N_PARTITIONS = 8


def events_as_kafka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer side: serialize the events table into the Kafka wire
    schema (key = user_id bytes — keyed partitioning; value = JSON
    record bytes; offset = event_id)."""
    e = load_table(spark, sf_dir, "events")
    record = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    return e.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        record.cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.pmod("user_id", F.lit(N_PARTITIONS)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def parse_events(kafka_df: DataFrame) -> DataFrame:
    """Consumer side: wire schema -> typed events rows.

    Works identically on a batch DataFrame, this module's file-backed
    stream, or a real ``format("kafka")`` stream — the deploy-time
    swap point.
    """
    return (
        kafka_df.select(
            F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA).alias(
                "r"
            )
        )
        .select("r.*")
    )


def write_kafka_shaped(df: DataFrame, path: str) -> None:
    """Land a wire-schema DataFrame as the local 'broker' directory
    (one parquet subdir per topic-partition, like a real log)."""
    df.write.mode("overwrite").partitionBy("partition").parquet(path)


def read_kafka_shaped_stream(spark: SparkSession, path: str) -> DataFrame:
    """Consume the local broker directory as a stream with the Kafka
    wire schema. Real deployment: replace this one call with
    ``spark.readStream.format("kafka").option("subscribe", topic)``.
    """
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


@query(
    "q85_kafka_roundtrip",
    oracle="""
SELECT event_type,
       count(*)                                              AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)     AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q85_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> Kafka wire schema -> parse -> aggregate; the oracle is
    the same aggregate over the original table, proving the
    serialize/parse hop is lossless (ids, nested JSON props string,
    micro-precision timestamps, doubles)."""
    from batch_processing_new_spark.operators.relational import dsum

    wire = events_as_kafka(spark, sf_dir)
    typed = parse_events(wire)
    return (
        typed.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .orderBy("event_type")
    )
