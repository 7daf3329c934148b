"""Invariant tests for overlapping chunking (q152) and schema-evolution
reads (q153) beyond their DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.text_analysis import (
    CHUNK_S,
    CHUNK_W,
    q152_chunk_overlap,
)
from batch_processing_new_spark.sources.excel import q153_schema_evolution
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_chunks_cover_and_overlap(spark):
    """Every document is fully covered: the first chunk starts at 0,
    consecutive starts advance by exactly the stride, and the last
    chunk reaches the document's final token; interior chunks are
    exactly W tokens."""
    rows = q152_chunk_overlap(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    doc_len = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split(F.trim("text"), " ")).alias("n"))
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert chunks[0].chunk_start == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b.chunk_start - a.chunk_start == CHUNK_S
            assert a.n_tokens == CHUNK_W  # only the last may be short
        last = chunks[-1]
        assert last.chunk_start + last.n_tokens == doc_len[doc_id]


def test_chunk_reconstruction(spark):
    """Stitching chunk 0 plus each later chunk's non-overlapping tail
    reproduces the original token stream exactly."""
    d = {
        r.doc_id: r.text.strip()
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = q152_chunk_overlap(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in list(by_doc.items())[:50]:
        chunks.sort(key=lambda r: r.chunk_id)
        toks = chunks[0].chunk_text.split(" ")
        for c in chunks[1:]:
            piece = c.chunk_text.split(" ")
            keep = (c.chunk_start + c.n_tokens) - len(toks)
            if keep > 0:
                toks.extend(piece[-keep:])
        assert " ".join(toks) == " ".join(d[doc_id].split())


def test_schema_evolution_conserves_rows(spark):
    out = q153_schema_evolution(spark, SF_SMOKE)
    total = out.agg(F.sum("n_orders")).collect()[0][0]
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert total == n_orders
    missing = {r.priority: r.n_orders for r in out.collect()}["MISSING"]
    evens = (
        load_table(spark, SF_SMOKE, "orders")
        .where(F.col("o_orderkey") % 2 == 0)
        .count()
    )
    assert missing == evens
