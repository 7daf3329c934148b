"""Text analysis over the documents corpus: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

North-Star surface (SURVEY.md §2B "text analysis"; reference evidence:
nltk/regex/joblib pins, requirements.txt:44,59,41). Everything here is
built-in string/array expressions — JVM codegen, no Python — because at
100 TB the text hot path must not cross the Arrow boundary. Each query
has a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.functions.text_funcs import (
    distinct_tokens,
    hash60,
    hash60_sql,
    token_set_fingerprint,
    TOKEN_SET_FP_SQL,
    tokens,
)
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

# small stopword list over the fixture vocabulary; real deployments swap
# in a broadcast stopword table
STOPWORDS = ["the", "a", "and", "of"]
_STOP_SQL = "['the', 'a', 'and', 'of']"


@query(
    "q23_token_stats",
    oracle="""
SELECT doc_id,
       len(string_split(trim(text), ' '))                      AS n_tokens,
       len(list_distinct(string_split(trim(text), ' ')))       AS n_distinct,
       round(len(list_distinct(string_split(trim(text), ' '))) * 1.0
             / len(string_split(trim(text), ' ')), 6)          AS ttr,
       length(text)                                            AS n_chars
FROM documents
ORDER BY doc_id
""",
)
def q23_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: counts, distincts, type-token ratio, chars."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


@query(
    "q24_quality_score",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           string_split(trim(text), ' ') AS toks,
           length(text)                  AS n_chars
    FROM documents
)
SELECT doc_id,
       n_chars,
       len(toks) AS n_tokens,
       round(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0
             / len(toks), 6)                                   AS stopword_ratio,
       round(len(list_filter(toks, x -> length(x) >= 5)) * 1.0
             / len(toks), 6)                                   AS long_token_ratio,
       CASE WHEN len(toks) >= 30 AND
                 len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) * 1.0
                 / len(toks) BETWEEN 0.05 AND 0.6
            THEN 1 ELSE 0 END                                  AS passes_quality
FROM t
ORDER BY doc_id
""",
)
def q24_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/stopword/long-token ratios + a pass flag —
    the shape of a pretraining-corpus quality filter (length + symbol +
    stopword heuristics), as pure array expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_long = F.size(F.filter(toks, lambda x: F.length(x) >= 5))
    stop_ratio = n_stop / F.size(toks)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(n_long / F.size(toks), 6).alias("long_token_ratio"),
        F.when(
            (F.size(toks) >= 30) & (stop_ratio >= 0.05) & (stop_ratio <= 0.6), 1
        )
        .otherwise(0)
        .alias("passes_quality"),
    ).orderBy("doc_id")


@query(
    "q25_lang_id",
    oracle="""
WITH t AS (
    SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents
),
scored AS (
    SELECT doc_id, lang,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of')))       AS en_score,
           len(list_filter(toks, x -> x IN ('data', 'table', 'row'))) AS data_score,
           len(toks)                                                  AS n
    FROM t
)
SELECT doc_id,
       lang AS labeled_lang,
       CASE WHEN en_score * 1.0 / n >= 0.08 THEN 'en'
            WHEN data_score * 1.0 / n >= 0.10 THEN 'data-ish'
            ELSE 'unknown' END AS predicted_lang
FROM scored
ORDER BY doc_id
""",
)
def q25_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token frequency scoring.

    The fixture text is language-agnostic word salad, so this is the
    mechanism (n-gram/stopword frequency argmax — how real lang-ID
    works), validated for determinism rather than accuracy; swap marker
    lists per language for real corpora.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    en = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of")))
    data = F.size(F.filter(toks, lambda x: x.isin("data", "table", "row")))
    n = F.size(toks)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(en / n >= 0.08, "en")
        .when(data / n >= 0.10, "data-ish")
        .otherwise("unknown")
        .alias("predicted_lang"),
    ).orderBy("doc_id")


@query(
    "q26_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(lower(trim(text)))                    AS content_fp,
       {TOKEN_SET_FP_SQL}                        AS token_set_fp,
       {hash60_sql("lower(trim(text))")}         AS fp60
FROM documents
ORDER BY doc_id
""",
)
def q26_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash, order-insensitive token-set
    hash, and the engine's 60-bit numeric fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        token_set_fingerprint(F.col("text")).alias("token_set_fp"),
        hash60(norm).alias("fp60"),
    ).orderBy("doc_id")
