"""Scraped-HTML / tweet-JSON source tests (sources/scraped.py) — parser
edge cases beyond the oracle-checked q136/q137 fixtures."""

from __future__ import annotations

import json

from batch_processing_new_spark.sources.scraped import (
    TWEET_SCHEMA,
    parse_html,
    read_tweets,
)


def _parse_one(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    [row] = parse_html(df).collect()
    return row.asDict()


def test_script_and_style_never_leak(spark):
    out = _parse_one(
        spark,
        "<html><head><style>body{x:1}</style></head><body>"
        "<p>keep</p><script>var leak='NO';</script><p>this</p></body></html>",
    )
    assert out["body_text"] == "keep this"
    assert "NO" not in out["body_text"]


def test_entities_unescaped(spark):
    out = _parse_one(
        spark,
        "<html><body><p>salt &amp; pepper &lt;tag&gt; &#8212; dash</p></body></html>",
    )
    assert out["body_text"] == "salt & pepper <tag> — dash"


def test_nested_tags_and_multiple_links(spark):
    out = _parse_one(
        spark,
        '<html><body><div><p>a <b>bold</b> word</p></div>'
        '<a href="https://x/1">one</a><a href="https://x/2">two</a>'
        "</body></html>",
    )
    assert "bold" in out["body_text"]
    assert out["n_links"] == 2
    assert out["first_href"] == "https://x/1"


def test_unclosed_tags_do_not_crash(spark):
    out = _parse_one(
        spark, "<html><body><p>open paragraph <b>bold no close</body>"
    )
    assert "open paragraph" in out["body_text"]


def test_no_links_yields_null_href(spark):
    out = _parse_one(spark, "<html><body><p>plain</p></body></html>")
    assert out["n_links"] == 0
    assert out["first_href"] is None


def test_read_tweets_jsonl_file(spark, tmp_path):
    """Schema-on-read over an actual JSONL file on disk — the shape a
    tweety-ns dump lands in."""
    tweets = [
        {
            "id": 7,
            "author": {"username": "user7", "verified": True},
            "text": "hello world",
            "created_on": "2024-03-01 10:00:00",
            "likes": 42,
            "hashtags": ["#a", "#b"],
        },
        {
            "id": 8,
            "author": {"username": "user8", "verified": False},
            "text": "second",
            "created_on": "2024-03-02 11:30:00",
            "likes": 0,
            "hashtags": [],
        },
    ]
    p = tmp_path / "tweets.jsonl"
    p.write_text("\n".join(json.dumps(t) for t in tweets))
    df = read_tweets(spark, str(p)).orderBy("id")
    assert df.schema == TWEET_SCHEMA
    rows = df.collect()
    assert rows[0].author.username == "user7"
    assert rows[0].hashtags == ["#a", "#b"]
    assert rows[1].likes == 0
    assert rows[1].hashtags == []
