"""Invariants for the analytics operators beyond their SQL oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.functions.text_funcs import tokens
from batch_processing_new_spark.registry import all_specs
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT


def test_freq_items_superset_guarantee(spark):
    """Spark's one-pass approximate heavy hitters (df.stat.freqItems,
    Karp-Papadimitriou-Shenker) must return a SUPERSET of the tokens
    with frequency > support — the classic sketch guarantee (false
    positives allowed, false negatives not). The exact q82 top-k is the
    ground truth."""
    d = load_table(spark, SF_CORRECT, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    total = tok.count()
    support = 0.02

    approx = set(tok.stat.freqItems(["token"], support).collect()[0][0])

    exact_heavy = {
        r.token
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > support * total)
        .collect()
    }
    assert exact_heavy, "fixture should have heavy tokens at 2% support"
    missing = exact_heavy - approx
    assert not missing, f"sketch missed heavy hitters: {missing}"


def test_funnel_stages_monotone(spark):
    """Funnel counts must be monotone non-increasing along stages."""
    rows = all_specs()["q79_funnel"].fn(spark, SF_CORRECT).collect()
    counts = [r.n_users for r in sorted(rows, key=lambda r: r.stage)]
    assert counts == sorted(counts, reverse=True), counts


def test_weighted_sample_rate_tracks_length(spark):
    """Inclusion rate of the length-weighted sample must increase with
    document length bucket (the weighting working as designed)."""
    d = load_table(spark, SF_CORRECT, "documents")
    picked = {
        r.doc_id
        for r in all_specs()["q89_weighted_sample"].fn(spark, SF_CORRECT).collect()
    }
    buckets = (
        d.select("doc_id", (F.col("n_chars") / 300).cast("int").alias("b"))
        .collect()
    )
    by_bucket: dict[int, list[bool]] = {}
    for r in buckets:
        by_bucket.setdefault(min(r.b, 3), []).append(r.doc_id in picked)
    rates = [
        sum(v) / len(v) for _, v in sorted(by_bucket.items()) if len(v) >= 20
    ]
    assert all(b >= a - 0.1 for a, b in zip(rates, rates[1:])), rates
