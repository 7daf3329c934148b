"""Custom Python data source (sources/pydatasource.py) invariants."""

from __future__ import annotations

from batch_processing_new_spark.sources.pydatasource import (
    read_synthdocs,
    synth_row,
)


def test_partition_planning_respected(spark):
    df = read_synthdocs(spark, rows=100, partitions=7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 100


def test_rows_match_local_generator(spark):
    got = {r.doc_id: (r.text, r.source) for r in read_synthdocs(spark, rows=50, partitions=3).collect()}
    assert len(got) == 50
    for i in range(50):
        _, text, source = synth_row(i)
        assert got[i] == (text, source)


def test_uneven_partition_split_covers_every_row(spark):
    # rows % partitions != 0: remainder rows must not be dropped or duplicated
    df = read_synthdocs(spark, rows=103, partitions=8)
    ids = [r.doc_id for r in df.collect()]
    assert sorted(ids) == list(range(103))
