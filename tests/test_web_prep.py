"""Invariant tests for web-corpus prep (operators/web_prep.py) beyond
the oracle-checked q139/q140 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.web_prep import canonicalize_url


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_aliases_collapse_to_one_key(spark):
    aliases = [
        "https://example.com/a?x=1&y=2",
        "HTTPS://EXAMPLE.COM/a?y=2&x=1",
        "https://www.example.com:443/a?x=1&y=2#frag",
        "https://example.com/a?utm_source=tw&y=2&utm_campaign=c&x=1",
    ]
    keys = set(_canon(spark, aliases))
    assert keys == {"https://example.com/a?x=1&y=2"}


def test_path_case_and_non_default_port_preserved(spark):
    [c] = _canon(spark, ["http://Example.com:8080/CaseSensitive/Path?b=1"])
    # host lowercased, :8080 is NOT the https default port and stays,
    # path case untouched
    assert c == "http://example.com:8080/CaseSensitive/Path?b=1"


def test_no_query_yields_no_question_mark(spark):
    [c] = _canon(spark, ["https://www.example.com/just/path"])
    assert c == "https://example.com/just/path"


def test_all_params_tracking_drops_query_entirely(spark):
    [c] = _canon(spark, ["https://example.com/p?utm_source=a&utm_medium=b"])
    assert c == "https://example.com/p"


def test_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.com:443/Docs/7?utm_source=feed&b=2&a=1#x",
        "http://site.org/q?z=9&a=0",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_boilerplate_flags_exactly_site_chrome(spark):
    """Pages sharing a nav/footer across one site: the shared lines are
    flagged, unique content lines survive with order preserved."""
    from batch_processing_new_spark.operators import web_prep

    rows = []
    for i in range(4):
        rows += [
            (i, "siteA", "NAV | products | contact", 1),
            (i, "siteA", f"unique content {i}", 2),
            (i, "siteA", "(c) siteA", 3),
        ]
    lines = spark.createDataFrame(
        rows, "doc_id long, source string, line string, idx int"
    )
    docs_per_source = lines.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    line_df = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").alias("df")
    )
    flagged = (
        lines.join(line_df, ["source", "line"])
        .join(docs_per_source, "source")
        .withColumn(
            "is_boiler",
            (F.col("df") / F.col("n_docs")) > web_prep.BOILER_FRAC,
        )
    )
    out = {
        (r.doc_id, r.line): r.is_boiler
        for r in flagged.select("doc_id", "line", "is_boiler").collect()
    }
    for i in range(4):
        assert out[(i, "NAV | products | contact")] is True
        assert out[(i, "(c) siteA")] is True
        assert out[(i, f"unique content {i}")] is False
