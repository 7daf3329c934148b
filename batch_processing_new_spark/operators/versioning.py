"""Corpus snapshot diff: the change-data-feed between two published
corpus versions (added / removed / updated), computed as one full-outer
hash-compare join.

Dataset versioning is first-class in a training-data pipeline (the
engine already publishes atomic versions — sinks/writers.py::
publish_versioned — and reads SCD2 snapshots, q159). The missing
piece is the DIFF between two versions: what changed, so downstream
consumers (index builders, trainers with data ablations, compliance
audits) can process the delta instead of the world. This is the shape
Delta Lake calls Change Data Feed, re-derived relationally:

    FULL OUTER JOIN on the stable key + content-hash comparison
    -> change_type in {added, removed, updated}, unchanged dropped.

Scale: a single equi-join on the primary key. Both versions of a
published corpus are written range-clustered by key (writers.py), so
at 100 TB the join is a co-partitioned sort-merge with no residual
work, the hash comparison is a codegen'd string equality, and the
output is only the delta (usually orders of magnitude smaller than
either input). No driver participation at any size.

The two "versions" here are derived deterministically from the
documents fixture (membership and mutation gates on doc_id), so the
oracle states the identical derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

# v1 membership: doc_id % 11 != 3 (docs later ADDED are absent here)
# v2 membership: doc_id % 13 != 5 (docs REMOVED since v1 are absent here)
# v1 content: docs with doc_id % 7 == 2 carried an older text revision
_V1_DROP, _V2_DROP, _MUT = 11, 13, 7


def snapshot_diff(v1: DataFrame, v2: DataFrame, key: str) -> DataFrame:
    """Change feed between two keyed snapshots carrying ``content_hash``.

    Returns (key, change_type, old_hash, new_hash) for every key whose
    state differs; unchanged keys produce no row.
    """
    a = v1.select(F.col(key), F.col("content_hash").alias("old_hash"))
    b = v2.select(F.col(key), F.col("content_hash").alias("new_hash"))
    j = a.join(b, key, "full_outer")
    return j.select(
        key,
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("updated"))
        .alias("change_type"),
        "old_hash",
        "new_hash",
    ).where(F.col("change_type").isNotNull())


@query(
    "q165_snapshot_diff",
    oracle=f"""
WITH v1 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % {_MUT} = 2 THEN 'rev0:' || text
                    ELSE text END) AS content_hash
    FROM documents WHERE doc_id % {_V1_DROP} <> 3
),
v2 AS (
    SELECT doc_id, md5(text) AS content_hash
    FROM documents WHERE doc_id % {_V2_DROP} <> 5
),
j AS (
    SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           v1.content_hash AS old_hash,
           v2.content_hash AS new_hash
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash <> new_hash THEN 'updated'
       END AS change_type,
       old_hash, new_hash
FROM j
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
ORDER BY doc_id
""",
)
def q165_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two corpus versions: doc_ids added,
    removed, or content-updated between v1 and v2 (both derived
    deterministically from the documents fixture), with both content
    hashes. Unchanged documents emit nothing — the output is the
    delta, not the corpus.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = d.where(F.col("doc_id") % _V1_DROP != 3).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % _MUT == 2,
                F.concat(F.lit("rev0:"), F.col("text")),
            ).otherwise(F.col("text"))
        ).alias("content_hash"),
    )
    v2 = d.where(F.col("doc_id") % _V2_DROP != 5).select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    return snapshot_diff(v1, v2, "doc_id").orderBy("doc_id")
