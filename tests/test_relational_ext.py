"""Invariants for the extended relational operators (sf0.01).

Oracle parity for q27/q28/q29/q43/q44/q48 is covered by the driver gate
(tests/run_verify.py); here we test what the oracles can't express:
sketch accuracy bounds and as-of/range join edge semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_sketch_aggs_within_bounds(spark):
    from batch_processing_new_spark.operators.relational_ext import q47_sketch_aggs

    rows = q47_sketch_aggs(spark, SF).collect()
    assert rows, "sketch agg returned no groups"
    for r in rows:
        # HLL++ with rsd=2% should be well within 5% on these cardinalities
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.05, f"{r.event_type}: HLL error {rel_err:.3f}"
        # KLL-ish approx_percentile with accuracy=10000 is exact-rank here
        assert abs(r.approx_p50 - r.exact_p50) <= abs(r.exact_p50) * 0.05 + 1e-9


def test_asof_join_no_future_views(spark):
    """Every matched view must be at-or-before its purchase, same user."""
    from batch_processing_new_spark.operators.relational_ext import q29_asof_join

    df = q29_asof_join(spark, SF)
    bad = df.where(
        F.col("view_ts").isNotNull() & (F.col("view_ts") > F.col("purchase_ts"))
    ).count()
    assert bad == 0


def test_asof_join_row_per_purchase(spark):
    """As-of join is 1:1 — exactly one output row per purchase event."""
    from batch_processing_new_spark.operators.relational_ext import q29_asof_join
    from batch_processing_new_spark.sources.readers import load_table

    n_purchases = (
        load_table(spark, SF, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    df = q29_asof_join(spark, SF)
    assert df.count() == n_purchases
    assert df.select("purchase_id").distinct().count() == n_purchases


def test_range_join_counts_match_naive(spark):
    """Banded range join == naive inequality join on a sampled subset."""
    from batch_processing_new_spark.operators.relational_ext import q43_range_join
    from batch_processing_new_spark.sources.readers import load_table

    banded = {r.purchase_id: r.n_views_1h for r in q43_range_join(spark, SF).collect()}

    ev = load_table(spark, SF, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    ).limit(50)
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"), F.col("ts").alias("v_ts")
    )
    naive = (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id")
        .agg(F.count("v_ts").alias("n"))
        .collect()
    )
    for r in naive:
        assert banded[r.purchase_id] == r.n, f"purchase {r.purchase_id}"
