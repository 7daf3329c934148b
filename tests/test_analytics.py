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


# ------------------------------------------------ jackknife variance

def test_jackknife_se_matches_classic_se(spark):
    """For the MEAN, the delete-a-group jackknife SE must agree with
    the classic stddev/sqrt(n) estimate (they are asymptotically
    identical; at 15k orders across 8 balanced hash shards they agree
    to a few percent), and the CI must bracket the mean."""
    import math

    from batch_processing_new_spark.operators.analytics import (
        q157_jackknife_ci,
    )
    from tests.conftest import SF_CORRECT

    [r] = q157_jackknife_ci(spark, SF_CORRECT).collect()
    o = load_table(spark, SF_CORRECT, "orders")
    stats = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    classic_se = stats.sd / math.sqrt(stats.n)
    assert abs(r.mean_price - stats.mu) < 1e-2
    assert abs(r.jk_se - classic_se) / classic_se < 0.10
    assert r.ci_lo < r.mean_price < r.ci_hi


def test_dup_ngram_fraction_short_docs_dropped(spark):
    """Documents with fewer than 5 tokens must be OMITTED (oracle's
    empty range()), not crash the gram sequence with slice(start=0)."""
    from batch_processing_new_spark.operators.analytics import _NGRAM_N

    assert _NGRAM_N == 5
    docs = spark.createDataFrame(
        [(1, "only four tokens here"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    from batch_processing_new_spark.functions.text_funcs import tokens

    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - _NGRAM_N),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, _NGRAM_N)),
    )
    out = (
        toked.where(F.size(toks) >= _NGRAM_N)
        .select("doc_id", F.array_sort(grams).alias("g"))
        .collect()
    )
    assert [r["doc_id"] for r in out] == [2]
    assert len(out[0]["g"]) == 3  # 7 tokens -> 3 five-grams
