"""Atomic versioned-publish contract (sinks/writers.py).

Covers: monotonic version numbering, pointer flip only after a complete
write, reader isolation from in-flight/crashed writes, and retention
deleting only superseded versions.
"""

from __future__ import annotations

import os

from batch_processing_new_spark.sinks.writers import (
    LATEST_POINTER,
    publish_versioned,
    read_latest,
)


def test_publish_and_read_latest(spark, tmp_path):
    root = str(tmp_path / "corpus")
    publish_versioned(spark.range(10), root)
    assert read_latest(spark, root).count() == 10
    publish_versioned(spark.range(25), root)
    assert read_latest(spark, root).count() == 25
    assert open(os.path.join(root, LATEST_POINTER)).read().strip() == "v=2"


def test_crashed_write_leaves_reader_on_old_version(spark, tmp_path):
    root = str(tmp_path / "corpus")
    publish_versioned(spark.range(7), root)
    # simulate a writer that died after materializing data but before
    # the pointer flip: a dangling v=2 directory exists, pointer doesn't
    # reference it
    spark.range(99).write.parquet(os.path.join(root, "v=2"))
    assert read_latest(spark, root).count() == 7
    # the next successful publish must NOT reuse or expose the dangling
    # version's data as its own
    publish_versioned(spark.range(11), root)
    assert read_latest(spark, root).count() == 11


def test_retention_keeps_recent_versions_only(spark, tmp_path):
    root = str(tmp_path / "corpus")
    for i in range(1, 6):
        publish_versioned(spark.range(i), root, keep_versions=2)
    dirs = sorted(d for d in os.listdir(root) if d.startswith("v="))
    assert dirs == ["v=4", "v=5"]
    assert read_latest(spark, root).count() == 5
