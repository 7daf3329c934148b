"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same conf block is what we'd ship to a 1000-executor cluster, with the two
size knobs (shuffle partitions, Arrow batch size) scaled by deployment, not
hard-coded per query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "batch_processing_new_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes (these are the settings that matter at 100 TB):
    - AQE on: runtime partition coalescing, skew-join splitting, and
      broadcast-join demotion/promotion based on observed sizes.
    - shuffle.partitions ~= total cores locally; on a real cluster AQE's
      coalescing makes the initial number far less sensitive.
    - Arrow enabled: every pandas-UDF boundary is columnar-batched.
    - session timezone pinned UTC so timestamp semantics are reproducible
      (and comparable against the DuckDB oracle, which is UTC-naive).
    """
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # PySpark 4's DataFrame debugging captures the Python call site
        # for EVERY DataFrame/Column API call (errors/utils.py
        # _with_origin): a conf read + a stack walk + two extra py4j
        # round trips per call, only to decorate error messages with
        # origin lines. Measured round 12: F.col() costs 3.6 ms with it
        # on, 0.6 ms off; expression-heavy query CONSTRUCTION (inside
        # the timed region of any driver) is 2-5x slower with it on.
        # Plan-construction time is real driver latency at any scale
        # (optimization guide §7.3), so production keeps this off and
        # turns it on only when chasing a specific analysis error.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
