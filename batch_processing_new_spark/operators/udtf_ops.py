"""Python UDTF surface as a driver-visible query (SURVEY.md §2B UDF row).

UDTFs are the row-to-rows extension point registered into SQL itself
(``LATERAL chunk_doc(...)``) — the path for table-generating logic that
must be callable from SQL text, not just the DataFrame API. The hot
path stays JVM-side (q60 does the same chunking with explode/slice);
this query pins the UDTF transport with the identical arithmetic, so
its oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from batch_processing_new_spark.operators.text_analysis import CHUNK_TOKENS
from batch_processing_new_spark.registry import query


@udtf(returnType="doc_id: bigint, chunk_id: int, n_tokens: int")
class ChunkDocUDTF:
    """Split a document into fixed-size token chunks (one output row
    per chunk) — the same semantics as q60's JVM explode/slice."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            # no text -> no chunks, matching the oracle's NULL-range
            # drop (an unguarded .strip() crashed the whole batch —
            # tools/null_text_sweep.py finding)
            return
        toks = text.strip().split(" ")
        for i in range(0, len(toks), CHUNK_TOKENS):
            yield doc_id, i // CHUNK_TOKENS, len(toks[i : i + CHUNK_TOKENS])


@query(
    "q131_udtf_chunking",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
),
c AS (
    SELECT doc_id, toks,
           unnest(range(CAST(ceil(len(toks) * 1.0 / {CHUNK_TOKENS}) AS INT)))
               AS chunk_id
    FROM t
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       len(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                      (chunk_id + 1) * {CHUNK_TOKENS})) AS n_tokens
FROM c
ORDER BY doc_id, chunk_id
""",
)
def q131_udtf_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token chunking through the Python UDTF transport, invoked as a
    SQL LATERAL table function. The arithmetic is q60's, so the oracle
    pins the UDTF protocol (registration, lateral correlation, row
    generation) exactly. Scale note: a UDTF runs row-at-a-time in
    Python — reserve it for SQL-exposed extensibility and keep bulk
    chunking on the q60 explode/slice path.
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors
    from batch_processing_new_spark.sources.readers import (
        load_table,
        pin_before_sort,
    )

    ensure_package_on_executors(spark)
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("q131_docs")
    # sort applied OUTSIDE the SQL so the row-at-a-time UDTF pass can
    # be pinned: unpinned, the range sampling ran it twice (r12 pin
    # audit, FLAG-python)
    return pin_before_sort(
        spark.sql(
            "SELECT c.doc_id, c.chunk_id, c.n_tokens "
            "FROM q131_docs, LATERAL chunk_doc(doc_id, text) c"
        )
    ).orderBy("doc_id", "chunk_id")
