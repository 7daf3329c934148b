"""Non-circular exact pin for q47's approx_count_distinct (VERDICT
r06 #6).

q47_sketch_aggs stays rows-only at the driver because sketch
estimates are engine-specific; these tests (a) pin Spark's HLL++
estimate EXACTLY against an independent pure-Python replay of the
published algorithm (tools/hllpp_replay.py) at every driver fixture,
for BOTH the q47 accuracy (rsd=0.02) and the default (rsd=0.05),
(b) pin that the replay reproduces the SKETCH and not the exact count
(the m=512 sketch reads 151 for 150 true distinct at sf0.01 — a real
register collision, reproduced bit-for-bit), (c) pin the property
that makes the pin possible at all — the register fold is max(), a
pure SET function, so unlike q92's HIP accumulator the estimate is
insertion-order- and partitioning-independent at ANY cardinality —
and (d) pin the regime boundary: above threshold(p) the estimator
needs the paper's empirical bias tables, which this replay refuses to
copy, so the residue narrative is now 'replayable exactly in the
linear-counting regime, bounded by the bias-table boundary above it'
(COVERAGE.md q47 row).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE, load_tool

_replay = load_tool("hllpp_replay")
THRESHOLD = _replay.THRESHOLD
OutOfRegime = _replay.OutOfRegime
linear_count_estimate = _replay.linear_count_estimate
precision_for_rsd = _replay.precision_for_rsd
xxhash64 = _replay.xxhash64
xxhash64_long = _replay.xxhash64_long

SF_BENCH = "/root/testdata/sf0.1"


def test_xxhash64_public_vectors():
    """Published XXH64 sanity vectors (xxHash repository) — the hash
    layer is pinned to the public reference algorithm, not to
    anything Spark produced."""
    assert xxhash64(b"", 0) == 0xEF46DB3751D8E999
    assert xxhash64(b"abc", 0) == 0x44BC2CF5AD770999
    assert (
        xxhash64(b"Nobody inspects the spammish repetition", 0)
        == 0xFBCEA83C8A378BF1
    )
    # >=32-byte input exercises the 4-lane stripe path
    assert (
        xxhash64(b"Nobody inspects the spammish repetition repetition", 0)
        != xxhash64(b"Nobody inspects the spammish repetition", 0)
    )


def test_long_convention_matches_public_sql_function(spark):
    """The 8-byte little-endian convention for hashing a LongType
    value is cross-checked against Spark's PUBLIC xxhash64() SQL
    function (documented default seed 42) over a sign/magnitude
    spread. This pins OUR bytes layout via a user-visible surface —
    the sketch itself is never consulted here."""
    from pyspark.sql import functions as F

    vals = [0, 1, -1, 42, 2**31, -(2**31) - 1, 123456789012345,
            -987654321, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    for r in rows:
        mine = xxhash64_long(r.v)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == r.h, r.v


def test_precision_sizing():
    """rsd -> register-count sizing: q47's rsd=0.02 -> p=12 (m=4096,
    linear-counting threshold 3100), default 0.05 -> p=9 (m=512,
    threshold 400). A wrong p cannot hide: every fixture estimate
    below would mismatch."""
    assert precision_for_rsd(0.02) == 12
    assert precision_for_rsd(0.05) == 9


def _spark_acd(spark, sf_dir, rsd):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=rsd).alias("est"))
        .collect()
    }


def _ids_by_type(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out: dict[str, list[int]] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        out.setdefault(r.event_type, []).append(r.user_id)
    return out


@pytest.mark.parametrize(
    ("sf_dir", "rsd"),
    [
        (SF_SMOKE, 0.02),
        (SF_SMOKE, 0.05),
        (SF_CORRECT, 0.02),
        (SF_CORRECT, 0.05),
        (SF_BENCH, 0.02),
    ],
)
def test_fixture_estimates_pinned_by_replay(spark, sf_dir, rsd):
    """Spark's approx_count_distinct == the independent replay,
    exactly, on every events fixture the driver uses — with a regime
    margin guard so fixture growth that eats into the linear-counting
    window fails loudly (the q92 coupon-margin discipline).

    sf0.1 at rsd=0.05 is deliberately ABSENT: 1500 distinct with
    m=512 leaves the regime — test_regime_boundary pins that side.
    """
    import math

    got = _spark_acd(spark, sf_dir, rsd)
    ids = _ids_by_type(spark, sf_dir)
    p = precision_for_rsd(rsd)
    for et, vals in sorted(ids.items()):
        want = linear_count_estimate(vals, rsd=rsd)
        # margin guard: the linear count must sit under 2/3 of the
        # switchover threshold, not just under it
        h = want  # round(H) is within 0.5 of H
        assert h <= THRESHOLD[p] * 2 // 3, (
            f"{sf_dir}/{et}: H~{h} eats the regime margin (m={1 << p},"
            f" threshold {THRESHOLD[p]}) — re-read COVERAGE.md's q47"
            " row before trusting the pin"
        )
        assert got[et] == want, (sf_dir, et, rsd)


def test_replay_reproduces_sketch_not_exact_count(spark):
    """At sf0.01 the m=512 sketch (rsd=0.05) estimates 151 for 150
    true distinct — a genuine register collision. The replay lands on
    the same 151, which proves it reproduces the SKETCH pipeline
    (hash -> register -> linear count), not the exact cardinality a
    circular oracle would compute."""
    ids = _ids_by_type(spark, SF_CORRECT)
    got = _spark_acd(spark, SF_CORRECT, 0.05)
    artifacts = 0
    for et, vals in ids.items():
        exact = len(set(vals))
        want = linear_count_estimate(vals, rsd=0.05)
        assert got[et] == want, et
        if want != exact:
            artifacts += 1
    assert artifacts >= 1, (
        "every estimate equals the exact count — the fixture no longer"
        " witnesses a collision, so this test can't distinguish the"
        " replay from an exact-count oracle; regenerate or re-derive"
    )


def test_set_function_order_and_partition_independent(spark):
    """The property q92's DataSketches path LACKS and HLL++ has: a
    max-fold register is a pure set function, so the estimate is
    identical for ascending vs descending insertion and across
    partitionings — at a cardinality (1000) far above q92's coupon
    promotion point (385). This is WHY q47 admits an exact replay pin
    at any in-regime cardinality while q92's is bounded at 384."""
    from pyspark.sql import functions as F

    vals = list(range(1, 1001))

    def est(values, partitions):
        df = spark.createDataFrame([(v,) for v in values], "v long")
        df = df.repartition(partitions) if partitions else df.coalesce(1)
        return df.agg(
            F.approx_count_distinct("v", rsd=0.02).alias("e")
        ).collect()[0].e

    asc = est(vals, None)
    desc = est(list(reversed(vals)), None)
    sharded = est(vals, 7)
    assert asc == desc == sharded == linear_count_estimate(vals, rsd=0.02)


def test_regime_boundary():
    """Above threshold(p) the replay REFUSES rather than guesses —
    the estimator switches to the empirically-bias-corrected raw
    estimate, whose per-precision correction tables are
    implementation constants this replay deliberately does not copy
    (same measured-boundary discipline as q92's promotion point)."""
    with pytest.raises(OutOfRegime):
        linear_count_estimate(list(range(1500)), rsd=0.05)  # p=9, m=512
    # and a saturated sketch (V == 0) is refused even before the
    # threshold comparison could run
    with pytest.raises(OutOfRegime):
        linear_count_estimate(list(range(200_000)), rsd=0.3)
