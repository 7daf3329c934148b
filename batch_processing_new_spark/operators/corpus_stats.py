"""Corpus-level statistics for training-data curation: cross-document
repeated n-grams and deterministic seeded sampling per source.

Two curation steps the per-document quality stack (text_analysis.py,
q83) cannot express because they aggregate ACROSS documents:

- q146: which exact 5-grams recur across many documents? Within-doc
  repetition (q83) catches degenerate generation; cross-doc repetition
  catches templated boilerplate, licence headers, and SEO spam that
  survive per-document filters — the "most common n-grams" audit every
  published corpus card reports (C4/RefinedWeb style).
- q147: a deterministic, reproducible k-per-source sample for human
  eval / labeling. Seeded hash ranking (not ``rand()``) so the sample
  is stable across runs, partitionings, and engines — the property the
  reference's whole row-id discipline exists for (SURVEY §2A op 11).

North-Star surface: SURVEY.md §2B text analysis / exact dedup rows.
Both queries carry exact DuckDB oracles; everything is JVM expressions
and equi-shuffles — no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.functions.text_funcs import tokens
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import fan_out, load_table

_N = 5  # n-gram width, matches q83/q95's corpus-hygiene convention
_MIN_DOCS = 2  # report grams seen in at least this many documents
_TOP = 100

_SEED = "42"  # sampling seed, embedded in the hash preimage
_K = 20  # docs kept per source


@query(
    "q146_cross_doc_ngrams",
    oracle=f"""
WITH g AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(len(string_split(trim(text), ' ')) - {_N - 1}),
               i -> array_to_string(
                        list_slice(string_split(trim(text), ' '),
                                   i + 1, i + {_N}), ' ')
           ))) AS gram
    FROM documents
    WHERE len(string_split(trim(text), ' ')) >= {_N}
)
SELECT gram,
       count(*)    AS doc_count,
       min(doc_id) AS sample_doc
FROM g
GROUP BY gram
HAVING count(*) >= {_MIN_DOCS}
ORDER BY doc_count DESC, gram
LIMIT {_TOP}
""",
)
def q146_cross_doc_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top cross-document repeated 5-grams: for every distinct 5-gram,
    the number of documents containing it (distinct-per-doc, so a gram
    repeated inside one document counts once) and a sample doc_id;
    grams in >= 2 documents, top 100 by document count.

    Scale shape: grams are deduplicated PER DOCUMENT inside the scan
    stage (array_distinct over the in-row gram array — no exchange),
    so the single shuffle is the groupBy(gram) count, and partial
    aggregation collapses hot grams map-side before they travel. The
    final top-100 is a TakeOrdered on the aggregated (gram, count)
    set, never a global sort of the gram universe. At 100 TB the gram
    universe is huge but the shuffle carries one row per distinct
    (doc, gram) — the same cost profile as the q95 decontamination
    join, which is the proven-scalable shape for corpus n-gram work.
    """
    d = load_table(spark, sf_dir, "documents")
    toked = fan_out(d.select("doc_id", "text")).select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    toks = F.col("_toks")
    # distinct in-row grams; short docs (< _N tokens) are dropped up
    # front so Spark's sequence() never sees a negative span (and the
    # oracle's range() agrees: empty list for them).
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - _N),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, _N)),
        )
    )
    exploded = (
        toked.where(F.size(toks) >= _N)
        .select("doc_id", F.explode(grams).alias("gram"))
    )
    counted = exploded.groupBy("gram").agg(
        F.count("*").alias("doc_count"),
        F.min("doc_id").alias("sample_doc"),
    )
    return (
        counted.where(F.col("doc_count") >= _MIN_DOCS)
        .orderBy(F.col("doc_count").desc(), "gram")
        .limit(_TOP)
    )


@query(
    "q147_seeded_sample_per_group",
    oracle=f"""
WITH ranked AS (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5('{_SEED}:' || doc_id), doc_id
           ) AS sample_rank
    FROM documents
)
SELECT source, doc_id, sample_rank
FROM ranked
WHERE sample_rank <= {_K}
ORDER BY source, sample_rank
""",
)
def q147_seeded_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-source document sample: rank documents
    within each source by md5(seed || doc_id) and keep the first k.

    Seeded-hash ranking instead of ``rand()`` makes the sample a pure
    function of (seed, doc_id) — rerunning, repartitioning, or porting
    engines reproduces it bit-for-bit (md5 is the engine's portable
    hash, text_funcs.hash60). Scale shape: one shuffle on source; the
    per-group top-k is a window with a rank filter, and Spark pushes
    the k-limit into the sort (TopK per partition) so no group's full
    ranking materializes. Sources are few and large here — if a group
    outgrows a task at 1000x, pre-thin with an approximate hash
    threshold (keep md5 < p where p ~= 2k/|group|) before the exact
    window; the threshold pass is map-only.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.lit(_SEED + ":"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    return (
        d.select("source", "doc_id")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= _K)
        .orderBy("source", "sample_rank")
    )
