"""Python UDTF surface (SURVEY.md §2B UDF/UDAF row).

UDTFs are the row-to-rows extension point; the engine's hot paths use
JVM explode/slice instead (q60_chunking), so the UDTF is covered as an
API capability: same chunking semantics, asserted equal to the JVM
implementation.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

SF = "/root/testdata/sf0.001"
CHUNK = 32


@udtf(returnType="doc_id: bigint, chunk_id: int, n_tokens: int")
class ChunkDoc:
    def eval(self, doc_id: int, text: str):
        toks = text.strip().split(" ")
        for i in range(0, len(toks), CHUNK):
            yield doc_id, i // CHUNK, len(toks[i : i + CHUNK])


def test_udtf_matches_jvm_chunking(spark):
    from batch_processing_new_spark.operators.text_analysis import q60_chunking
    from batch_processing_new_spark.sources.readers import load_table

    spark.udtf.register("chunk_doc", ChunkDoc)
    load_table(spark, SF, "documents").select("doc_id", "text").createOrReplaceTempView(
        "udtf_docs"
    )
    via_udtf = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens)
        for r in spark.sql(
            "SELECT c.* FROM udtf_docs, LATERAL chunk_doc(doc_id, text) c"
        ).collect()
    )
    via_jvm = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens)
        for r in q60_chunking(spark, SF).select(
            "doc_id", "chunk_id", "n_tokens"
        ).collect()
    )
    assert via_udtf == via_jvm


def test_udtf_in_sql(spark):
    spark.udtf.register("chunk_doc", ChunkDoc)
    rows = spark.sql(
        "SELECT * FROM chunk_doc(7::BIGINT, 'a b c d e f g')"
    ).collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in rows] == [(7, 0, 7)]
