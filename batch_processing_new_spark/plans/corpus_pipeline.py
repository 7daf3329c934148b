"""End-to-end training-corpus assembly: the individual operators
composed into the pipeline a reference user would actually run.

quality filter -> near-dup removal -> eval decontamination -> per-domain
cap -> stratified split -> sequence packing of the train split. Each
stage is the already-oracle-checked operator (q24, q37+q90 machinery,
q95, q105, q97, q96) applied to the previous stage's survivors; this
module adds NO new semantics — it exists to prove the operators compose
as DataFrame -> DataFrame stages with lazy evaluation end to end (one
job graph, no driver-side materialization between stages).

Scale shape: the whole pipeline is one lineage — Catalyst sees every
stage, so column pruning reaches the first scan (only doc_id/text/
source/lang survive past stage 1) and the only materialization points
are the two the operators themselves choose (the shingle checkpoint in
minhash_lsh_pairs; the packing shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.dedup import (
    dedup_apply,
    minhash_lsh_pairs_md5,
)
from batch_processing_new_spark.operators.training_mix import (
    DOMAIN_CAP,
    EVAL_MOD,
    SPLIT_FRAC,
    pack_sequences,
)
from batch_processing_new_spark.functions.text_funcs import salted_hash60, tokens
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table


def assemble_corpus(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Run the full assembly; returns every intermediate stage keyed by
    name (all lazy — callers pick what to materialize)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate (q24's pass criteria)
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in ["the", "a", "and", "of"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = n_stop / F.size(toks)
    quality = docs.where(
        (F.size(toks) >= 30) & (stop_ratio >= 0.05) & (stop_ratio <= 0.6)
    )

    # 2. near-dup removal (MinHash-LSH banding at Jaccard >= 0.5 with
    #    the md5 base hash — q183's SQL-replayable variant, so the
    #    WHOLE pipeline carries an exact oracle; cluster + keep min-id
    #    representative, q90 machinery)
    deduped = dedup_apply(quality, minhash_lsh_pairs_md5(quality, threshold=0.5))

    # 3. eval decontamination: drop the eval slice itself AND training
    #    docs sharing a 3-gram with it (q95 semantics, applied as a gate)
    from batch_processing_new_spark.operators.training_mix import (
        q95_decontaminate,
    )

    contaminated = q95_decontaminate(spark, sf_dir).select("doc_id")
    clean = deduped.where(
        F.col("doc_id") % EVAL_MOD != 0
    ).join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 4. per-domain cap (q105 semantics on the survivors)
    h_cap = salted_hash60("cap", F.col("doc_id"))
    w_cap = Window.partitionBy("source").orderBy(h_cap, "doc_id")
    capped = (
        clean.withColumn("_rn", F.row_number().over(w_cap))
        .where(F.col("_rn") <= DOMAIN_CAP)
        .drop("_rn")
    )

    # 5. stratified split (q97 semantics on the survivors)
    h_split = salted_hash60("split", F.col("doc_id"))
    w_split = Window.partitionBy("lang").orderBy(h_split, "doc_id")
    wn = Window.partitionBy("lang")
    split = capped.withColumn(
        "split",
        F.when(
            F.row_number().over(w_split)
            <= F.ceil(F.count("*").over(wn) * SPLIT_FRAC),
            "validation",
        ).otherwise("train"),
    )
    train = split.where(F.col("split") == "train")

    # 6. pack the train split into sequence bins (q96)
    packed = pack_sequences(train)

    return {
        "input": docs,
        "quality": quality,
        "deduped": deduped,
        "clean": clean,
        "capped": capped,
        "train": train,
        "validation": split.where(F.col("split") == "validation"),
        "packed": packed,
    }


from batch_processing_new_spark.functions.text_funcs import hash60_sql
from batch_processing_new_spark.operators.dedup import (
    _SHINGLES_SQL,
    LSH_BAND_SIZE,
    NUM_MINHASHES,
)

_Q106_ORACLE = f"""
WITH RECURSIVE toks0 AS (
    SELECT doc_id, source, lang, text,
           string_split(trim(text), ' ') AS t
    FROM documents
),
quality AS (
    SELECT doc_id, source, lang, text
    FROM (
        SELECT *, len(t) AS n,
               len(list_filter(t,
                   x -> list_contains(['the', 'a', 'and', 'of'], x))) AS ns
        FROM toks0
    )
    WHERE n >= 30 AND ns * 1.0 / n >= 0.05 AND ns * 1.0 / n <= 0.6
),
sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM quality),
el AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sig AS (
    SELECT doc_id, g.hash_id,
           min({hash60_sql("hash_id::VARCHAR || ':' || s")}) AS m
    FROM el, generate_series(0, {NUM_MINHASHES - 1}) g(hash_id)
    GROUP BY doc_id, g.hash_id
),
bands AS (
    SELECT doc_id, (hash_id // {LSH_BAND_SIZE}) AS band_id,
           md5(string_agg(m::VARCHAR, ':' ORDER BY hash_id)) AS band_hash
    FROM sig GROUP BY doc_id, band_id
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id
),
pairs AS (
    SELECT c.id_a, c.id_b
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.5
),
sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a
),
labels AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
),
deduped AS (
    SELECT q.* FROM quality q
    WHERE q.doc_id NOT IN (
        SELECT doc_id FROM labels WHERE doc_id <> cluster_id
    )
),
gramtok AS (
    SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(greatest(len(t) - 3, 0) + 1),
               i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')
           ))) AS gram
    FROM gramtok
),
ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
    SELECT DISTINCT g.doc_id
    FROM grams g JOIN ev USING (gram)
    WHERE g.doc_id % 97 <> 0
),
clean AS (
    SELECT * FROM deduped
    WHERE doc_id % 97 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
capped AS (
    SELECT doc_id, source, lang FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY source
                   ORDER BY {hash60_sql("'cap:' || doc_id::VARCHAR")}, doc_id
               ) AS rn
        FROM clean
    ) WHERE rn <= 15
),
split AS (
    SELECT doc_id,
           CASE WHEN row_number() OVER (
                     PARTITION BY lang
                     ORDER BY {hash60_sql("'split:' || doc_id::VARCHAR")},
                              doc_id)
                <= ceil(count(*) OVER (PARTITION BY lang) * 0.2)
                THEN 'validation' ELSE 'train' END AS split
    FROM capped
)
SELECT 0 AS stage_no, 'input' AS stage,
       (SELECT count(*) FROM documents)::BIGINT AS n_docs
UNION ALL SELECT 1, 'quality', (SELECT count(*) FROM quality)::BIGINT
UNION ALL SELECT 2, 'deduped', (SELECT count(*) FROM deduped)::BIGINT
UNION ALL SELECT 3, 'clean', (SELECT count(*) FROM clean)::BIGINT
UNION ALL SELECT 4, 'capped', (SELECT count(*) FROM capped)::BIGINT
UNION ALL SELECT 5, 'train',
    (SELECT count(*) FROM split WHERE split = 'train')::BIGINT
ORDER BY stage_no
"""


@query("q106_corpus_pipeline", oracle=_Q106_ORACLE)
def q106_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage survivor counts of the full corpus assembly — the
    funnel report a data-curation run logs.

    Upgraded from rows-only: with the dedup stage on the md5 LSH
    variant (q183) every stage is SQL-replayable, and the oracle runs
    the ENTIRE composed pipeline — quality gate, LSH banding +
    recursive-CTE closure, n-gram decontamination, per-domain cap,
    stratified split — in one DuckDB query."""
    stages = assemble_corpus(spark, sf_dir)
    order = ["input", "quality", "deduped", "clean", "capped", "train"]
    counts = [
        stages[s].select(
            F.lit(i).alias("stage_no"),
            F.lit(s).alias("stage"),
            F.count("*").alias("n_docs"),
        )
        for i, s in enumerate(order)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stage_no")


# ----------------------------------- per-source corpus health scorecard

@query(
    "q130_source_scorecard",
    oracle="""
WITH toks AS (
    SELECT doc_id, source,
           len(string_split(trim(text), ' '))                  AS n_tokens,
           len(list_distinct(string_split(trim(text), ' ')))   AS n_distinct,
           -- ascii_lower canonicalizer (dedup._CANON_SQL twin): full
           -- lower() is engine-specific off the ASCII plane
           md5(trim(regexp_replace(regexp_replace(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz'),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))      AS canon_fp
    FROM documents
),
ent AS (
    -- per-doc round(6) mirrors q127's output, which the Spark side
    -- consumes as-is before averaging; hex(encode()) pairs = the
    -- UTF-8 BYTE stream (q127's oracle), exact beyond ASCII
    SELECT doc_id, round(-sum(p * log2(p)), 6) AS entropy_bits
    FROM (
        SELECT doc_id,
               count(*) * 1.0 / octet_length(any_value(b)) AS p
        FROM (
            SELECT doc_id, encode(text) AS b,
                   substr(hex(encode(text)), 2 * i + 1, 2) AS ch
            FROM documents,
                 unnest(range(octet_length(encode(text)))) AS u(i)
        )
        GROUP BY doc_id, ch
    )
    GROUP BY doc_id
),
dup AS (
    SELECT t.doc_id,
           CASE WHEN count(*) OVER (PARTITION BY t.canon_fp) > 1
                THEN 1 ELSE 0 END AS is_dup
    FROM toks t
)
SELECT t.source,
       count(*)                                            AS n_docs,
       -- exact means (dsum discipline): int sums are exact on both
       -- engines; the double columns reduce under DECIMAL so no mean
       -- depends on partition/scan order (the q108 sf0.1 lesson)
       round(sum(t.n_tokens) * 1.0 / count(*), 6)          AS avg_tokens,
       round(CAST(CAST(sum(CAST(t.n_distinct * 1.0 / t.n_tokens
                           AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / count(*), 6)                                AS avg_ttr,
       round(CAST(CAST(sum(CAST(e.entropy_bits AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / count(*), 6)                                AS avg_entropy,
       round(sum(d.is_dup) * 1.0 / count(*), 6)            AS dup_fraction
FROM toks t
JOIN ent e USING (doc_id)
JOIN dup d ON d.doc_id = t.doc_id
GROUP BY t.source
ORDER BY t.source
""",
)
def q130_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health scorecard: token volume, type-token
    ratio, byte entropy, and exact-dup (canonical-fingerprint) rate per
    origin — the dashboard a data-acquisition team watches to decide
    which domains to re-crawl, down-weight, or drop. Composes the
    engine's quality signals (q23 token stats, q127 entropy, q111
    canonical dedup) into one aggregation rather than re-implementing
    them.

    Shape: token/fingerprint stats fuse into the document scan;
    entropy joins in from its Arrow pass on doc_id; the dup flag is a
    window over the fingerprint; everything then collapses to one row
    per source with map-side combine.
    """
    from pyspark.sql import Window

    from batch_processing_new_spark.operators.dedup import (
        canonical_fingerprint,
    )
    from batch_processing_new_spark.operators.text_analysis import (
        q127_byte_entropy,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        canonical_fingerprint(F.col("text")).alias("canon_fp"),
    )
    is_dup = F.when(
        F.count(F.lit(1)).over(Window.partitionBy("canon_fp")) > 1, 1
    ).otherwise(0)
    base = base.withColumn("is_dup", is_dup)
    ent = q127_byte_entropy(spark, sf_dir).select("doc_id", "entropy_bits")
    dec = "decimal(30,12)"
    n = F.count(F.lit(1))
    return (
        base.join(ent, "doc_id")
        .groupBy("source")
        .agg(
            n.alias("n_docs"),
            # exact means, not F.avg: Spark sums int avg inputs in
            # DOUBLE (partition-order-dependent last ulps) while DuckDB
            # sums exactly — the q108 sf0.1 boundary-flip class
            F.round(F.sum("n_tokens") / n, 6).alias("avg_tokens"),
            F.round(
                F.sum(
                    (F.col("n_distinct") / F.col("n_tokens")).cast(dec)
                ).cast("double")
                / n,
                6,
            ).alias("avg_ttr"),
            F.round(
                F.sum(F.col("entropy_bits").cast(dec)).cast("double") / n, 6
            ).alias("avg_entropy"),
            F.round(F.sum("is_dup") / n, 6).alias("dup_fraction"),
        )
        .orderBy("source")
    )
