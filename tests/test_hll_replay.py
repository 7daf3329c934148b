"""Non-circular exact pin for q92's HLL estimates (VERDICT r05 #4).

q92_hll_distinct_mv stays rows-only at the driver because its output
is only a set function of the data in the COUPON regime; these tests
(a) pin Spark's estimate EXACTLY against an independent pure-Python
replay of the published DataSketches coupon path (tools/hll_replay.py)
at the driver's correctness fixtures, (b) pin the regime boundary the
argument rests on, and (c) pin the measured impossibility beyond it —
above promotion the estimate is a function of coupon insertion ORDER,
so no implementation could provide a set-function oracle. The full
argument lives in COVERAGE.md's q92 residue row.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE, load_tool

_replay = load_tool("hll_replay")
COUPON_REGIME_MAX = _replay.COUPON_REGIME_MAX
coupon_count = _replay.coupon_count
coupon_for_long = _replay.coupon_for_long
murmur3_x64_128 = _replay.murmur3_x64_128
parse_coupons = _replay.parse_coupons
sketch_mode = _replay.sketch_mode


def test_murmur3_public_vector():
    """Published x64-128 test vector: 'hello', seed 0 ->
    cbd8a7b341bd9b02 5b1e906a48ae1d19 — the hash is pinned to the
    public reference, not to anything Spark produced."""
    h1, h2 = murmur3_x64_128(b"hello", 0)
    assert f"{h1:016x}{h2:016x}" == "cbd8a7b341bd9b025b1e906a48ae1d19"
    assert murmur3_x64_128(b"", 0) == (0, 0)


def _df(spark, values, schema, partitions):
    """With partitions=None, coalesce(1) pins the insertion order to
    the input list order so the HIP-regime witness is deterministic
    regardless of SPARK_GRAFT_TEST_CPUS. A partitions= value
    reshuffles rows (order NOT pinned) — only coupon-regime tests,
    which are order-free, may pass it."""
    df = spark.createDataFrame([(v,) for v in values], schema)
    return df.repartition(partitions) if partitions else df.coalesce(1)


def _sketch_bytes(spark, values, schema="v long", partitions=None):
    from pyspark.sql import functions as F

    df = _df(spark, values, schema, partitions)
    return df.agg(F.hll_sketch_agg("v").alias("s")).collect()[0].s


def _estimate(spark, values, schema="v long", partitions=None):
    from pyspark.sql import functions as F

    df = _df(spark, values, schema, partitions)
    return df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).collect()[0].e


def test_list_sketch_coupon_parity(spark):
    """Spark's LIST-mode sketch bytes carry exactly the coupons the
    replay computes — pins hash+encoding end-to-end (the serialization
    layout itself is the published preamble format)."""
    vals = [7, 42, 123456789, -3, 2**40 + 17]
    b = _sketch_bytes(spark, vals)
    assert sketch_mode(b) == "LIST"
    assert parse_coupons(b) == {coupon_for_long(v) for v in vals}


def test_int_column_updates_as_long(spark):
    """Spark updates IntegerType by widening to long — int and long
    columns of the same values produce identical sketch bytes, so one
    replay path covers the fixtures' int32 user_id too."""
    vals = [7, 42, 123456789]
    assert _sketch_bytes(spark, vals, "v int") == _sketch_bytes(
        spark, vals, "v long"
    )


def test_promotion_threshold(spark):
    """The 385th distinct coupon promotes SET->HLL (3/4 load on the
    2^(lgK-3)=512-int max coupon array, lgConfigK=12). The coupon
    regime's exactness claim rests on this boundary; a Spark/
    DataSketches upgrade that moves it must fail here loudly."""
    vals = list(range(1, 501))
    # sequential longs 1..N: find N giving exactly 384 then 385 coupons
    coupons = 0
    at_384 = at_385 = None
    seen = set()
    for v in vals:
        seen.add(coupon_for_long(v))
        if len(seen) == 384 and at_384 is None:
            at_384 = v
        if len(seen) == 385:
            at_385 = v
            break
    assert at_384 is not None and at_385 is not None
    assert sketch_mode(_sketch_bytes(spark, list(range(1, at_384 + 1)))) == "SET"
    assert sketch_mode(_sketch_bytes(spark, list(range(1, at_385 + 1)))) == "HLL"


def test_coupon_regime_estimate_is_exact_and_order_free(spark):
    """Below promotion the rounded estimate equals the replay's
    distinct-coupon count regardless of partitioning/order — the
    coupon-collector inversion c + c^2/2^27 rounds to c for all
    c <= 384."""
    import random

    rng = random.Random(92)
    for n, parts in [(15, None), (150, 4), (370, 8), (384, 3)]:
        ids = rng.sample(range(1, 10**9), n)
        want = coupon_count(ids)
        assert _estimate(spark, ids, partitions=parts) == want
        assert _estimate(spark, ids[::-1], partitions=parts) == want


def test_q92_fixture_estimates_pinned_by_replay(spark):
    """The driver-facing exact pin: at the smoke and driver-
    correctness fixtures, q92's per-event_type estimate equals the
    independent replay's coupon count, and the cardinalities sit
    inside the coupon regime with >1/3 margin (the premise that makes
    the pin exact — mirrors q53's single-file premise test)."""
    from pyspark.sql import functions as F

    from batch_processing_new_spark.sources.readers import load_table

    for sf_dir in (SF_SMOKE, SF_CORRECT):
        ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
        got = {
            r.event_type: r.est
            for r in ev.groupBy("event_type")
            .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
            .collect()
        }
        by_type: dict[str, list] = {}
        for r in ev.collect():
            by_type.setdefault(r.event_type, []).append(r.user_id)
        for et, ids in by_type.items():
            want = coupon_count(ids)
            assert want <= COUPON_REGIME_MAX * 2 // 3, (
                f"{sf_dir}/{et}: {want} coupons eats the regime margin —"
                " re-read COVERAGE.md's q92 row before trusting the pin"
            )
            assert got[et] == want, (sf_dir, et)


@pytest.mark.environment_pin
def test_above_regime_estimate_is_order_dependent(spark):
    """The measured impossibility: the SAME 1000 distinct longs on one
    partition estimate differently ascending vs descending (HIP
    accumulates over coupon insertion order once promoted). This is
    why q92 keeps a rows-only driver row — no set-function oracle can
    exist above the coupon regime, for any implementation."""
    asc = _estimate(spark, list(range(1, 1001)), partitions=None)
    desc = _estimate(spark, list(range(1000, 0, -1)), partitions=None)
    # deterministic witness measured in round 6: 996 vs 990
    assert asc != desc, (
        "order-independence above the coupon regime would UNLOCK an"
        " exact q92 oracle — if this ever fails, re-run the round-6"
        " sweep (ROUNDLOG r06) and revisit COVERAGE.md's q92 row"
    )
