"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract as Arrow-batched Pandas UDFs.

North-Star surface (SURVEY.md §2B): images/audio/video ride through the
engine as ``BinaryType`` columns with a metadata struct; per-item decode
and feature extraction run in ``mapInPandas`` so bytes move executor-side
in Arrow batches, never through the driver.

The actual media codecs (PIL/ffmpeg/librosa) are NOT in this container,
so ``decode_media`` has two paths:
- ``fake`` (default, tested): a deterministic pseudo-decode that derives
  metadata arithmetically from the payload bytes — the Spark-side
  plumbing (schema, batching, UDF signature, partitioning) is fully real
  and oracle-checked;
- ``real``: raises ``NotImplementedError`` with the dependency it needs —
  the marked stub to swap in a codec where available.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, "
    "n_frames int"
)


def with_media_payload(docs: DataFrame) -> DataFrame:
    """Model documents as media rows: binary payload + typed metadata.

    Real pipelines land bytes from object storage
    (``spark.read.format("binaryFile")``); here the fixture text is
    encoded so every stage downstream is identical.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.length(F.col("text")).alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic pseudo-decode: metadata from byte arithmetic.

    Chosen to be re-computable in SQL (the oracle recomputes it from
    octet_length), so the whole decode path is value-hash-checked.
    """
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    n_frames = (n + 255) // 256
    return n, width, height, n_frames


def decode_media(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas (Arrow batches)."""
    if mode == "real":
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg, not present in this image; "
            "swap _fake_decode for the codec and keep the same schema"
        )

    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["content_type"] for m in pdf["media_meta"]],
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_frames": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


@query(
    "q45_multimodal_decode",
    oracle="""
SELECT doc_id,
       'image/fake'                                AS media_type,
       octet_length(encode(text))                  AS n_bytes,
       64 + (octet_length(encode(text)) % 512)     AS width,
       64 + ((octet_length(encode(text)) * 7) % 512) AS height,
       CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_frames
FROM documents
ORDER BY doc_id
""",
)
def q45_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas decode -> typed metadata, end to end.

    The oracle recomputes the fake decode from octet_length, so the
    binary encode/Arrow-transfer/decode plumbing is value-hash-checked.
    """
    d = load_table(spark, sf_dir, "documents")
    return decode_media(with_media_payload(d)).orderBy("doc_id")


@query(
    "q46_multimodal_filter_agg",
    oracle="""
WITH m AS (
    SELECT source,
           octet_length(encode(text)) AS n_bytes,
           CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_frames
    FROM documents
)
SELECT source,
       count(*)                         AS n_items,
       CAST(sum(n_bytes) AS BIGINT)     AS total_bytes,
       CAST(sum(n_frames) AS BIGINT)    AS total_frames
FROM m
WHERE n_bytes >= 128
GROUP BY source
ORDER BY source
""",
)
def q46_multimodal_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational ops over decoded media metadata (filter + agg after the
    Python decode boundary — the typical multimodal pipeline shape)."""
    d = load_table(spark, sf_dir, "documents")
    meta = decode_media(with_media_payload(d.select("doc_id", "text", "source")))
    src = d.select("doc_id", "source")
    return (
        meta.join(src, "doc_id")
        .where(F.col("n_bytes") >= 128)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
        )
        .orderBy("source")
    )
