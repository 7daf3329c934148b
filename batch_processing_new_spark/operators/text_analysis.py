"""Text analysis over the documents corpus: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

North-Star surface (SURVEY.md §2B "text analysis"; reference evidence:
nltk/regex/joblib pins, requirements.txt:44,59,41). Everything here is
built-in string/array expressions — JVM codegen, no Python — because at
100 TB the text hot path must not cross the Arrow boundary. Each query
has a full DuckDB oracle.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.functions.text_funcs import (
    ascii_lower,
    ascii_lower_sql,
    distinct_tokens,
    hash60,
    hash60_sql,
    token_set_fingerprint,
    TOKEN_SET_FP_SQL,
    tokens,
)
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import (
    fan_out,
    load_table,
    pin_before_sort,
)

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
    # ascii_lower, not lower(): full case folding is engine-specific
    # off the ASCII plane (text_funcs.ascii_lower docstring), and a
    # fingerprint must be bit-stable across engines
    oracle=f"""
SELECT doc_id,
       md5({ascii_lower_sql("trim(text)")})      AS content_fp,
       {TOKEN_SET_FP_SQL}                        AS token_set_fp,
       {hash60_sql(ascii_lower_sql("trim(text)"))} AS fp60
FROM documents
ORDER BY doc_id
""",
)
def q26_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash, order-insensitive token-set
    hash, and the engine's 60-bit numeric fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    norm = ascii_lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.md5(norm).alias("content_fp"),
        token_set_fingerprint(F.col("text")).alias("token_set_fp"),
        hash60(norm).alias("fp60"),
    ).orderBy("doc_id")


@query(
    "q58_bigrams",
    oracle="""
WITH t AS (
    SELECT string_split(trim(text), ' ') AS toks FROM documents
),
bg AS (
    SELECT unnest([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS bigram
    FROM t
),
counted AS (
    SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
),
ranked AS (
    SELECT bigram, n,
           row_number() OVER (ORDER BY n DESC, bigram) AS rank
    FROM counted
)
SELECT bigram, n, rank FROM ranked WHERE rank <= 50 ORDER BY rank
""",
)
def q58_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus bigrams. n-gram construction is a zip of the token
    array with its own tail — pure JVM array ops, then one count shuffle
    carrying (bigram, partial count). The top-50 cut is
    ``orderBy().limit()`` — distributed TakeOrdered over the
    vocabulary-scale aggregate (billions of distinct bigrams at
    100 TB), never a single-partition rank window; the rank column is
    re-derived over the 50 survivors only.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    counted = (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counted.orderBy(F.col("n").desc(), "bigram").limit(50)
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


@query(
    "q59_tfidf",
    oracle="""
WITH tok AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY doc_id, term
),
dl AS (SELECT doc_id, sum(cnt) AS doc_len FROM tf GROUP BY doc_id),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           round((tf.cnt * 1.0 / dl.doc_len)
                 * ln((n.n_docs + 1.0) / (df.doc_freq + 1.0)), 6) AS tfidf
    FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term) AS rank
    FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
""",
)
def q59_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF, top-3 terms per document.

    Plan shape: one explode + (doc, term) count, document frequency as a
    second agg on the same intermediate, N as a broadcast scalar. The
    score is rounded BEFORE ranking so the ranking itself is
    engine-independent (libm log differs in the last ulp).
    Scale: shuffles carry (term, count) pairs, never text; df for
    ultra-common terms is the only skew point — cap with a stop-list at
    real scale.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("cnt").alias("doc_len"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = d.count()  # scalar; literal-folded into the expression
    scored = (
        tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .withColumn(
            "tfidf",
            F.round(
                (F.col("cnt") / F.col("doc_len"))
                * F.log((n_docs + 1.0) / (F.col("doc_freq") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


CHUNK_TOKENS = 32


@query(
    "q60_chunking",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
c AS (
    SELECT doc_id,
           unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT))) AS chunk_id,
           toks
    FROM t
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                                  (chunk_id + 1) * {CHUNK_TOKENS}), ' ') AS chunk_text,
       len(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                      (chunk_id + 1) * {CHUNK_TOKENS}))                  AS n_tokens
FROM c
ORDER BY doc_id, chunk_id
""",
)
def q60_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking — the training-data op that turns
    documents into model-sized pieces (here {CHUNK_TOKENS} tokens,
    non-overlapping). One explode of chunk indexes + array slice, all
    JVM-side; the text shuffles only if a downstream op asks it to.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("long")
    with_toks = d.select("doc_id", toks.alias("toks"), n_chunks.alias("nc"))
    c = with_toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
        "toks",
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_TOKENS + 1, CHUNK_TOKENS
    )
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    ).orderBy("doc_id", "chunk_id")


# --------------------------------------- unigram language-model score

# Vocabulary cap: only the top-K terms (by count, ties by token) keep
# their own probability; everything else scores as a single UNK whose
# mass is the summed count of all truncated terms. K is chosen BELOW
# the fixture vocabulary (~30 types) so the cap binds at verify scale
# and the oracle checks the truncation semantics, not just the happy
# path; a production run raises K (e.g. 1<<20) — the collect stays
# bounded at K rows either way, never the full corpus vocabulary.
VOCAB_TOPK = 24

@query(
    "q99_unigram_logprob",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
    FROM documents WHERE text IS NOT NULL
),
lm AS (
    SELECT t, count(*) AS c FROM tok GROUP BY t
),
tot AS (
    SELECT sum(c) AS n FROM lm
),
topk AS (
    SELECT t, c FROM lm ORDER BY c DESC, t LIMIT {VOCAB_TOPK}
),
unk AS (
    SELECT (SELECT n FROM tot) - sum(c) AS uc FROM topk
),
scored AS (
    SELECT doc_id,
           coalesce(-ln(k.c * 1.0 / tot.n),
                    -ln(unk.uc * 1.0 / tot.n)) AS nlp
    FROM tok LEFT JOIN topk k USING (t), tot, unk
)
SELECT doc_id,
       count(*)           AS n_tokens,
       round(avg(nlp), 6) AS avg_neg_logprob
FROM scored
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q99_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: train token frequencies over the
    corpus itself, then score each document by its mean negative log
    probability — the CCNet/perplexity-filter shape (docs far from the
    corpus distribution score high and get filtered or down-weighted).

    Training is one map-side-combined token count, truncated to the
    VOCAB_TOPK most frequent terms plus an UNK entry carrying the
    truncated tail's total mass — the CCNet-style vocabulary cap. The
    model collected to the driver is therefore BOUNDED at K rows (the
    k-means-centroids pattern), never the full corpus vocabulary: at
    100 TB the vocab is tens of millions of types and an uncapped
    collect is a driver OOM plus a plan-size explosion. Scoring folds
    a literal token->nlp MAP (K entries) over each document's token
    array with UNK fallback — entirely inside the scan stage, ZERO
    scoring shuffle. The previous shape (broadcast join against
    exploded tokens + groupBy(doc_id)) re-shuffled one row per token
    occurrence: ~1.7 MiB at sf0.1 and O(corpus tokens) at scale;
    measured 1.39 s -> 0.24 s, identical values.

    NULL-text docs are excluded on BOTH sides (q95 discipline): the
    oracle's unnest never emits them, while the unfiltered scoring
    scan emitted a NULL-score row per NULL-text doc
    (tools/null_text_sweep.py finding).
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tok = fan_out(d.select("text")).select(
        F.explode(tokens(F.col("text"))).alias("t")
    )
    # vocab-sized counts materialized ONCE (two consumers: top-K and
    # the total) — without the checkpoint both collects re-tokenize the
    # whole corpus
    lm = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # bounded collects: K (token, count) rows + one total row
    top = lm.orderBy(F.desc("c"), "t").limit(VOCAB_TOPK).collect()
    n_total = lm.agg(F.sum("c").alias("n")).collect()[0].n
    if n_total is None:
        # empty corpus: sum() over zero vocab rows is NULL — there is
        # no language model to score with, and no documents to score;
        # emit the 0-row contract frame instead of NULL arithmetic
        return d.select(
            "doc_id",
            F.lit(0).alias("n_tokens"),
            F.lit(None).cast("double").alias("avg_neg_logprob"),
        ).orderBy("doc_id")
    unk_count = n_total - sum(r.c for r in top)
    import math

    # one typed two-array literal, not 2K F.lit() calls: each lit is a
    # py4j round trip and the map is constant-folded identically either
    # way (Literal arrays -> foldable map_from_arrays -> same map)
    nlp_map = F.map_from_arrays(
        F.lit([r.t for r in top]),
        F.lit([-math.log(r.c / n_total) for r in top]),
    )
    unk_nlp = (
        F.lit(-math.log(unk_count / n_total))
        if unk_count > 0
        else F.lit(None).cast("double")
    )
    toks = tokens(F.col("text"))
    nlp_sum = F.aggregate(
        F.transform(
            toks, lambda t: F.coalesce(F.element_at(nlp_map, t), unk_nlp)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # the scoring map-fold is a narrow expression chain straight off the
    # scan; unpinned, the presentation sort's range sampling re-executes
    # it (measured ~0.6 s + 11 s duplicate stage pair at sf0.1)
    return pin_before_sort(
        fan_out(d.select("doc_id", "text")).select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.round(nlp_sum / F.size(toks), 6).alias("avg_neg_logprob"),
        )
    ).orderBy("doc_id")


# --------------------------------------- compression-ratio signal

def compression_ratio(docs: DataFrame) -> DataFrame:
    """(doc_id, raw_len, compressed_len, ratio): zlib-compressed size
    over raw UTF-8 size — the classic cheap repetition/boilerplate
    detector (degenerate repetitive text compresses far below ~0.4;
    high-entropy text sits near 1.0).

    zlib at a fixed level is deterministic, so the column is a pure
    function of the text; the scan is one Arrow-batched `mapInPandas`
    pass with no shuffle at all. SQL has no codec, so the DuckDB
    oracle (q100) joins a pre-materialized (md5(text) -> zlib length)
    lookup parquet built by tools/build_zlib_lookup.py — the r04
    BPE technique of materializing the deterministic artifact and
    replaying it in SQL (VERDICT r04 #4). ``ratio`` is the raw IEEE
    double quotient, NOT rounded: both engines convert the two small
    ints exactly and divide correctly-rounded, so the bits match with
    no round()-tie hazard (numpy rounds half-even, DuckDB half-away —
    raw_len=2^k texts make position-7 ties reachable). Tests also
    recompute ratios with local zlib and assert exact equality
    (tests/test_training_mix.py).
    """
    import pandas as pd
    import zlib

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("raw_len", IntegerType()),
            StructField("compressed_len", IntegerType()),
            StructField("ratio", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            raw_len = raw.str.len()
            comp_len = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "raw_len": raw_len,
                    "compressed_len": comp_len,
                    "ratio": comp_len / raw_len,
                }
            )

    # empty docs are excluded (q127's convention): raw_len=0 would
    # emit ratio=inf into a threshold-consumed column
    return (
        docs.select("doc_id", "text")
        .where(F.length("text") > 0)
        .mapInPandas(score, schema)
    )


# SQL has no codec, so the oracle replays a pre-materialized
# (md5(text) -> zlib-length) lookup parquet (tools/build_zlib_lookup.py;
# the q169/q180 artifact-replay technique, VERDICT r04 #4 — upgrades
# q100 from rows-only to a full value-hash oracle). The lookup covers
# every fixture text (three SF dirs + poison + constant modes; coverage
# pinned by tests/test_training_mix.py::test_zlib_lookup_covers_all_
# fixture_texts) — a missing text drops its JOIN row and fails LOUDLY
# as a rows mismatch, never silently. ratio is the raw IEEE quotient
# on both sides (two exact int->double conversions + one correctly-
# rounded divide = bit-identical across engines, no round() ties).
#
# This is the ONLY oracle whose SQL itself reads a file. Two declared
# environment assumptions, both with loud failure modes:
# - the driver's DuckDB connection permits read_parquet: it must —
#   the pre-registered table views are themselves parquet-backed and
#   lazily re-read at query time in the SAME connection, so disabled
#   external access would fail every oracle, not just this one; a
#   chrooted driver would record err, not a wrong value.
# - zlib lengths are per-BUILD deterministic, not per-spec: the Spark
#   side recomputes with the runtime zlib while the lookup bakes this
#   image's (1.2.13). tests/test_training_mix.py::test_zlib_build_
#   canary pins three observable lengths so an image/zlib upgrade
#   fails there first with a named cause (rebuild the lookup, confirm
#   the driver shares the runtime) instead of as a driver red.
_ZLIB_LOOKUP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "zlib_len_lookup.parquet",
)


@query(
    "q100_compression_ratio",
    oracle=f"""
SELECT d.doc_id,
       CAST(strlen(d.text) AS INTEGER)               AS raw_len,
       z.compressed_len                              AS compressed_len,
       z.compressed_len * 1.0 / strlen(d.text)       AS ratio
FROM documents d
JOIN read_parquet('{_ZLIB_LOOKUP}') z
  ON md5(d.text) = z.text_md5
WHERE length(d.text) > 0
ORDER BY d.doc_id
""",
)
def q100_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    # pin the Arrow zlib pass: range sampling would run it twice
    return pin_before_sort(compression_ratio(d)).orderBy("doc_id")


# ------------------------------------- BPE-style piece counting

# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset
# both regex engines share (Java regex in Spark, RE2 in DuckDB; both
# use leftmost-first alternation): letter runs, digit runs, punctuation
# runs (each with optional leading space), bare whitespace.
_BPE_PAT = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


@query(
    "q109_bpe_piece_count",
    oracle=f"""
SELECT c_custkey,
       len(string_split_regex(trim(c_name), '\\s+'))  AS n_ws_tokens,
       len(list_filter(regexp_extract_all(c_name, '{_BPE_PAT}'),
                       p -> trim(p) <> ''))           AS n_pieces,
       round(len(list_filter(regexp_extract_all(c_name, '{_BPE_PAT}'),
                             p -> trim(p) <> '')) * 1.0
             / len(string_split_regex(trim(c_name), '\\s+')), 6)
                                                      AS pieces_per_token
FROM customer
ORDER BY c_custkey
""",
)
def q109_bpe_piece_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word piece counting with a GPT-2-style pre-tokenizer regex
    (letter/digit/punctuation runs) next to plain whitespace tokens —
    the cheap token-budget estimator for text whose whitespace count
    under-measures model tokens (ids, code, punctuation-dense rows).
    pieces_per_token is the fragmentation signal quality filters
    threshold on.

    Runs on ``c_name`` (mixed alpha/digit/punct) because the synthetic
    documents corpus is pure lowercase words, where the two counts
    coincide by construction. Pure string expressions, zero shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    pieces = F.filter(
        F.regexp_extract_all("c_name", F.lit(_BPE_PAT), 0),
        lambda p: F.trim(p) != "",
    )
    n_ws = F.size(F.split(F.trim(F.col("c_name")), r"\s+"))
    return c.select(
        "c_custkey",
        n_ws.alias("n_ws_tokens"),
        F.size(pieces).alias("n_pieces"),
        F.round(F.size(pieces) / n_ws, 6).alias("pieces_per_token"),
    ).orderBy("c_custkey")


# ------------------------------------------------------ inverted index

@query(
    "q110_inverted_index",
    oracle="""
WITH t AS (
    SELECT doc_id,
           unnest(list_distinct(string_split(trim(text), ' '))) AS term
    FROM documents
)
SELECT term,
       count(*) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM t
GROUP BY term
ORDER BY term
""",
)
def q110_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus inverted index: term -> document frequency + sorted
    posting list — the search/retrieval-side complement of q59's TF-IDF
    and the blocking structure behind q35's Jaccard join.

    Scale shape: one explode of distinct per-doc terms, one shuffle on
    term with map-side partial aggregation; text never shuffles. At
    100 TB the hot-term posting lists are the skew risk — there you
    shard the aggregation key to (term, doc_id % B) and concatenate the
    B sub-lists afterwards, keeping every reducer's list bounded; the
    fixture vocabulary is small enough that the direct groupBy is the
    right plan.
    """
    d = load_table(spark, sf_dir, "documents")
    t = fan_out(d.select("doc_id", "text")).select(
        "doc_id", F.explode(distinct_tokens(F.col("text"))).alias("term")
    )
    return (
        t.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # stringified: driver hasher can't canonicalize array cells
            F.concat_ws(
                ",", F.array_sort(F.collect_list("doc_id"))
            ).alias("postings"),
        )
        .orderBy("term")
    )


# ---------------------------------- vocabulary induction + OOV scoring

VOCAB_K = 100  # induced bigram-vocabulary size


@query(
    "q119_vocab_oov",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
bg AS (
    SELECT doc_id,
           unnest([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))])
               AS bigram
    FROM t WHERE len(toks) >= 2
),
counted AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram),
vocab AS (
    SELECT bigram FROM (
        SELECT bigram, row_number() OVER (ORDER BY n DESC, bigram) AS rank
        FROM counted)
    WHERE rank <= {VOCAB_K}
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(sum(CASE WHEN v.bigram IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS oov_rate
FROM bg b LEFT JOIN vocab v USING (bigram)
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
)
def q119_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + out-of-vocabulary scoring: build the
    top-{VOCAB_K} bigram vocabulary from the corpus itself, then score
    every document by the fraction of its bigram occurrences outside
    it — the cheap novelty/garbage signal tokenizer builders and
    quality filters both use (high OOV = unusual text OR noise).

    Two passes over one exploded bigram table: (1) count + rank to the
    vocab (tiny — {VOCAB_K} rows), (2) broadcast the vocab back against
    the same explode. At 100 TB the vocab induction is the only global
    piece and it's a top-k over an aggregation — the per-doc scoring
    pass stays embarrassingly parallel with the vocab broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    bg = (
        fan_out(d.select("doc_id", "text"))
        .where(F.size(tokens(F.col("text"))) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .localCheckpoint(eager=False)
    )
    # vocab cut via distributed TakeOrdered (per-partition top-K
    # heaps), not a single-partition rank window over the full bigram
    # vocabulary; the rank itself is never needed — only membership
    vocab = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(VOCAB_K)
        .select("bigram", F.lit(True).alias("in_vocab"))
    )
    return (
        bg.join(F.broadcast(vocab), "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------- byte-entropy signal (mapInArrow)

@query(
    "q127_byte_entropy",
    # TRUE byte frequencies: hex(encode(text)) is the UTF-8 byte
    # stream as hex pairs, so multi-byte characters contribute their
    # individual bytes exactly like the kernel's np.frombuffer —
    # per-CHARACTER frequencies (the old oracle) only coincide on
    # pure-ASCII text
    oracle="""
WITH chars AS (
    SELECT doc_id, substr(hex(encode(text)), 2 * i + 1, 2) AS ch
    FROM documents, unnest(range(octet_length(encode(text)))) AS u(i)
),
freq AS (
    SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
),
tot AS (
    SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id
)
SELECT f.doc_id,
       CAST(max(t.n) AS INT) AS n_bytes,
       round(-sum((c * 1.0 / t.n) * log2(c * 1.0 / t.n)), 6)
           AS entropy_bits
FROM freq f JOIN tot t USING (doc_id)
GROUP BY f.doc_id
ORDER BY f.doc_id
""",
)
def q127_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon byte-entropy per document (bits/byte distribution over
    the UTF-8 encoding) — the two-sided corpus-hygiene signal:
    near-8-bit entropy flags binary/encrypted/base64 junk, abnormally
    LOW entropy flags degenerate repetition; natural text sits in
    between. (The SQL oracle explodes hex(encode(text)) pairs, so its
    frequencies are the same UTF-8 BYTES the kernel sees — exact on
    multi-byte text too, not just ASCII.)

    Implemented over ``mapInArrow`` — the zero-pandas Arrow path: each
    batch's strings feed numpy bincount directly, no pandas Series
    materialization on either side of the boundary (the third UDF
    transport next to pandas_udf and applyInPandas; for byte-level
    numeric kernels it's the cheapest).
    """
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(spark)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column(1).to_pylist()
            n_bytes, ents = [], []
            for t in texts:
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / len(b)
                n_bytes.append(len(b))
                ents.append(round(float(-(p * np.log2(p)).sum()), 6))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(n_bytes, pa.int32()),
                    pa.array(ents, pa.float64()),
                ],
                ["doc_id", "n_bytes", "entropy_bits"],
            )

    d = load_table(spark, sf_dir, "documents")
    return (
        # Empty documents are dropped BEFORE the kernel: the oracle's
        # unnest(range(1, length+1)) emits no rows for length 0, and an
        # unguarded bincount/len(b) would divide by zero on them.
        # pin the Arrow kernel ahead of the presentation sort: the
        # range sampling pass otherwise runs the whole mapInArrow
        # entropy pass twice (r12 pin audit, FLAG-python)
        pin_before_sort(
            fan_out(d.select("doc_id", "text").where(F.length("text") > 0))
            .mapInArrow(
                run, schema="doc_id bigint, n_bytes int, entropy_bits double"
            )
        )
        .orderBy("doc_id")
    )


# ------------------------------- winnowing (rolling-hash) fingerprints

WINNOW_K = 12  # character k-gram length
WINNOW_W = 8   # winnowing window (guarantee: any match >= k+w-1 chars shares a fp)


@query(
    "q132_winnowing_fingerprints",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, i AS pos,
           ('0x' || substr(md5(substr(text, i, {WINNOW_K})), 1, 15))::BIGINT AS h,
           length(text) AS n
    FROM documents, unnest(range(1, length(text) - {WINNOW_K} + 2)) AS u(i)
),
wins AS (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                                 AND {WINNOW_W - 1} FOLLOWING) AS fp,
           n
    FROM grams
)
SELECT DISTINCT doc_id, fp
FROM wins
WHERE pos <= n - {WINNOW_K} + 1 - ({WINNOW_W} - 1)
ORDER BY doc_id, fp
""",
)
def q132_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    character {WINNOW_K}-gram, slide a {WINNOW_W}-wide window over the
    hash sequence, keep each window's minimum — the selected hash SET
    is the document's fingerprint, with the winnowing guarantee that
    any shared substring of length >= k+w-1 yields at least one shared
    fingerprint. This is the partial-overlap/plagiarism detector the
    whole-document hashes (q26) and token-set methods (q33-q39) can't
    provide: those need global similarity, winnowing catches a copied
    paragraph inside an otherwise-unrelated document.

    Declarative form of the rolling hash: per-position substring hash +
    a ROWS-frame window min — Catalyst evaluates both inside one
    per-document sorted pass (the shuffle carries (doc, pos, 8-byte
    hash), never text). Matching docs are then found by self-joining
    the fingerprint table on fp — the same inverted-index shape as q35.
    """
    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(fan_out(d.select("doc_id", "text"))).orderBy(
        "doc_id", "fp"
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, fp) distinct winnowing fingerprints of a (doc_id, text)
    DataFrame — the q132 pipeline as a reusable operator."""
    from pyspark.sql import Window

    n = F.length("text")
    # docs shorter than one k-gram carry no fingerprint (the oracle's
    # empty range); without the filter the sequence DESCENDS through
    # zero/negative positions and every garbage substr is hashed and
    # windowed before the pos predicate discards it
    grams = docs.where(n >= k).select(
        "doc_id",
        "text",
        n.alias("n"),
        F.posexplode(F.sequence(F.lit(1), n - k + 1)).alias("_", "pos"),
    ).select(
        "doc_id",
        "pos",
        "n",
        hash60(F.expr(f"substr(text, pos, {k})")).alias("h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .where(F.col("pos") <= F.col("n") - k + 1 - (w - 1))
        .select("doc_id", "fp")
        .distinct()
    )


# ------------------------------- Unicode normalization (NFC)

# Deterministic mixed-normalization suffix appended to every fixture
# document so the op is non-vacuous on the ASCII corpus: a precomposed
# e-acute, a DECOMPOSED e + combining acute (different bytes, same NFC
# form), and an fi ligature (NFC-stable, NFKC-decomposable).
_NFC_MIX = " café café ﬁne"


@query(
    "q138_unicode_nfc",
    oracle=f"""
WITH s AS (
    SELECT doc_id, trim(text) || '{_NFC_MIX}' AS raw FROM documents
)
SELECT doc_id,
       nfc_normalize(raw)                 AS text_nfc,
       length(raw)                        AS n_raw,
       length(nfc_normalize(raw))         AS n_nfc,
       raw != nfc_normalize(raw)          AS changed
FROM s
ORDER BY doc_id
""",
)
def q138_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the first step of every real text
    pipeline (web text mixes precomposed and combining-mark forms of
    the same grapheme; unnormalized corpora split token statistics and
    dedup keys across byte-distinct equal strings).

    Spark has no built-in normalizer, so this is a vectorized
    pandas_udf over ``unicodedata.normalize`` (Arrow-batched, no
    shuffle — the column never leaves the scan stage). The oracle is
    DuckDB's independent ICU-side ``nfc_normalize`` over the same
    mixed-form strings, so the two implementations cross-check: the
    decomposed e+U+0301 must collapse to the precomposed form (length
    shrinks by one per occurrence) and the fi ligature must survive
    (NFC, unlike NFKC, preserves compatibility characters).
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(spark)

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        # NULL passes through as NULL (DuckDB nfc_normalize(NULL) is
        # NULL; an unguarded normalize(None) crashes the whole batch —
        # tools/null_text_sweep.py finding)
        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(F.trim(F.col("text")), F.lit(_NFC_MIX))
    out = fan_out(d.select("doc_id", raw.alias("raw"))).select(
        "doc_id", "raw", nfc("raw").alias("text_nfc")
    )
    # pin the Arrow normalize pass ahead of the presentation sort: the
    # range sampling otherwise runs the pandas UDF twice (r12 pin audit)
    return pin_before_sort(
        out.select(
            "doc_id",
            "text_nfc",
            F.length("raw").alias("n_raw"),
            F.length("text_nfc").alias("n_nfc"),
            (F.col("raw") != F.col("text_nfc")).alias("changed"),
        )
    ).orderBy("doc_id")


# ------------------------------------ overlapping (RAG) chunking

CHUNK_W = 32   # window: tokens per chunk (matches q60's model-size unit)
CHUNK_S = 24   # stride: W - S = 8 tokens of overlap between neighbors


@query(
    "q152_chunk_overlap",
    oracle=f"""
WITH toked AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks
    FROM documents WHERE text IS NOT NULL
),
ids AS (
    SELECT doc_id, toks,
           unnest(range(0, CAST(ceil(greatest(len(toks) - {CHUNK_W}, 0)
                                     / {CHUNK_S}.0) AS BIGINT) + 1)) AS chunk_id
    FROM toked
)
SELECT doc_id, chunk_id,
       chunk_id * {CHUNK_S} AS chunk_start,
       len(list_slice(toks, chunk_id * {CHUNK_S} + 1,
                      chunk_id * {CHUNK_S} + {CHUNK_W}))          AS n_tokens,
       array_to_string(list_slice(toks, chunk_id * {CHUNK_S} + 1,
                                  chunk_id * {CHUNK_S} + {CHUNK_W}), ' ')
                                                                   AS chunk_text
FROM ids
ORDER BY doc_id, chunk_id
""",
)
def q152_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (the RAG indexing shape):
    {CHUNK_W}-token windows at a {CHUNK_S}-token stride, so neighboring
    chunks share {CHUNK_W - CHUNK_S} tokens of context and no retrieval
    hit dies at an arbitrary chunk boundary. Chunk count per document
    is ceil(max(len-W,0)/S)+1 — the final window always reaches the
    document end without emitting pure-suffix tail fragments.

    Same plan as q60 (non-overlapping): explode chunk INDEXES (ints),
    slice the in-row token array per index — the text bytes never
    shuffle and the kernel is all JVM array expressions inside the
    scan stage. Overlap multiplies output bytes by W/S (~1.33x), a
    sink-side cost, not a shuffle cost; at 100 TB the emitted chunks
    stream straight to the (partitioned) writer.

    NULL-text docs are excluded on BOTH sides (q95 discipline): NULL
    tokens make ``greatest(NULL, 0)`` diverge between the engines
    (Spark skips NULLs, DuckDB propagates them —
    tools/null_text_sweep.py finding), and a doc with no text has no
    chunks.
    """
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toked = fan_out(d.select("doc_id", "text")).select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    toks = F.col("_toks")
    n_chunks = (
        F.ceil(F.greatest(F.size(toks) - CHUNK_W, F.lit(0)) / CHUNK_S) + 1
    ).cast("long")
    ids = toked.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * CHUNK_S
    piece = F.slice(F.col("toks"), start + 1, CHUNK_W)
    return ids.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


_POS_WORDS = ("fast", "big")
_NEG_WORDS = ("slow", "small")


@query(
    "q195_lexicon_sentiment",
    oracle=f"""
WITH lex(term, weight) AS (
    VALUES {", ".join(f"('{w}', 1)" for w in _POS_WORDS)},
           {", ".join(f"('{w}', -1)" for w in _NEG_WORDS)}
),
tok AS (
    SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS t,
           len(string_split(trim(text), ' ')) AS n
    FROM documents
),
scored AS (
    SELECT tok.doc_id, tok.source,
           sum(coalesce(lex.weight, 0)) AS hits,
           any_value(tok.n) AS n
    FROM tok LEFT JOIN lex ON lex.term = tok.t
    GROUP BY tok.doc_id, tok.source
),
labeled AS (
    SELECT source,
           CASE WHEN hits * 1.0 / n > 0.01 THEN 'positive'
                WHEN hits * 1.0 / n < -0.01 THEN 'negative'
                ELSE 'neutral' END AS sentiment,
           hits * 1.0 / n AS score
    FROM scored
)
SELECT source, sentiment,
       count(*)::BIGINT AS n_docs,
       round(CAST(CAST(sum(CAST(score AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / count(*), 6) AS mean_score
FROM labeled
GROUP BY source, sentiment
ORDER BY source, sentiment
""",
)
def q195_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment (SURVEY §2B's named alternative to the
    q30 LLM map): a broadcast sentiment lexicon joined against the
    exploded token stream, per-document polarity score = signed hits /
    tokens, thresholded to a label, rolled up per source — the
    classic pre-LLM sentiment pipeline, and the broadcast-join
    demonstration the literal-map fold (q142) does not cover: at real
    lexicon sizes (VADER ~7.5k, SentiWordNet ~100k+ entries) a map
    LITERAL bloats every task's plan, while a broadcast join ships the
    lexicon once per executor.

    Shapes: one token explode fused into the scan, broadcast-hash join
    against the tiny lexicon, groupBy(doc) with map-side combine, then
    the per-(source, label) rollup. Scores are exact rationals; the
    mean reduces under DECIMAL.
    """
    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(
        [(w, 1) for w in _POS_WORDS] + [(w, -1) for w in _NEG_WORDS],
        "term string, weight int",
    )
    toks = tokens(F.col("text"))
    tok = fan_out(d.select("doc_id", "source", "text")).select(
        "doc_id",
        "source",
        F.size(toks).alias("n"),
        F.explode(toks).alias("t"),
    )
    scored = (
        tok.join(F.broadcast(lex), tok["t"] == lex["term"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("hits"),
            F.first("n").alias("n"),
        )
    )
    score = F.col("hits") / F.col("n")
    labeled = scored.select(
        "source",
        F.when(score > 0.01, "positive")
        .when(score < -0.01, "negative")
        .otherwise("neutral")
        .alias("sentiment"),
        score.alias("score"),
    )
    return (
        labeled.groupBy("source", "sentiment")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("score").cast("decimal(30,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
        )
        .orderBy("source", "sentiment")
    )
