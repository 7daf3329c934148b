"""Deterministic pin for q47's OTHER sketch half: approx_percentile.

The HLL++ half got its independent replay in tools/hllpp_replay.py;
this file pins the percentile half by the same regime logic, measured
rather than asserted:

- **Exact regime (group size n <= accuracy)**: Spark's
  Greenwald-Khanna summary retains every sample while n stays under
  the accuracy parameter (q47 passes accuracy=10000; the fixture
  groups are ~200 / ~2000 rows at sf0.001 / sf0.01), so the query
  returns an exact discrete order statistic — and it lands on the
  SAME element as DuckDB's ``quantile_disc``, a fully independent
  engine. All ten fixture groups (even and odd n) match exactly.
- **Above accuracy (sf0.1, ~20k rows per group)**: the summary
  compresses and the result drifts off the exact discrete quantile
  (measured: 4 of 5 event types differ from quantile_disc by ~1
  sample step). The estimate is genuinely a sketch there, which is
  (a) why q47 stays rows-only at the driver and (b) the witness that
  the exact-regime pin above is not vacuous.

Together with tests/test_hllpp_replay.py this bounds BOTH q47
aggregates: exact-pinned inside a measured regime, sketch-by-design
beyond it (COVERAGE.md q47 row).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE

SF_BENCH = "/root/testdata/sf0.1"
ACCURACY = 10000  # q47's parameter (operators/relational_ext.py)


def _spark_ap(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return {
        (r.event_type): (r.ap, r.n)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(f"approx_percentile(value, 0.5D, {ACCURACY})").alias("ap"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def _duck_qdisc(duck, sf_dir):
    rows = duck.sql(
        f"""
        SELECT event_type, quantile_disc(value, 0.5) AS qd
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1
        """
    ).fetchall()
    return dict(rows)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_exact_regime_matches_independent_engine(spark, duck, sf_dir):
    """n <= accuracy: the GK summary is lossless, so approx_percentile
    is an exact discrete median and coincides with DuckDB's
    quantile_disc on every group — with a 2/3-accuracy margin guard
    so fixture growth that approaches the compression point fails
    loudly (the hllpp/coupon-margin discipline)."""
    got = _spark_ap(spark, sf_dir)
    want = _duck_qdisc(duck, sf_dir)
    assert set(got) == set(want)
    for et, (ap, n) in sorted(got.items()):
        assert n <= ACCURACY * 2 // 3, (
            f"{sf_dir}/{et}: {n} rows eats the exact-regime margin"
            f" (accuracy {ACCURACY}) — re-read COVERAGE.md's q47 row"
            " before trusting this pin"
        )
        assert ap == want[et], (sf_dir, et)


@pytest.mark.environment_pin
def test_above_accuracy_is_a_sketch(spark, duck):
    """The boundary witness: at sf0.1 (~20k rows per group >
    accuracy) the compressed summary drifts off the exact discrete
    quantile for at least one group — proving the exact-regime test
    above distinguishes a lossless summary from a mere
    estimate-that-happens-to-agree. Version-dependent by nature (a
    different GK compression schedule could land elsewhere), hence
    the environment_pin marker: if an upgrade makes ALL groups exact
    again, re-measure the regime boundary before widening the pin."""
    got = _spark_ap(spark, SF_BENCH)
    want = _duck_qdisc(duck, SF_BENCH)
    drifted = [et for et, (ap, n) in got.items() if ap != want[et]]
    assert any(n > ACCURACY for _, n in got.values()), (
        "sf0.1 groups no longer exceed the accuracy parameter — the"
        " witness premise is gone; re-measure"
    )
    assert drifted, (
        "every sf0.1 group matches the exact discrete quantile despite"
        " n > accuracy — the GK compression now lands exactly; re-run"
        " the round-7 probe (ROUNDLOG r07) and revisit COVERAGE.md's"
        " q47 row before trusting the exact-regime pin's power"
    )
