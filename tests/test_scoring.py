"""Invariant tests for retrieval/model scoring (operators/scoring.py)
beyond the oracle parity checks."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from batch_processing_new_spark.operators import scoring
from tests.conftest import SF_CORRECT


def test_bm25_ranks_are_contiguous_and_scores_monotonic(spark):
    rows = scoring.q141_bm25_topk(spark, SF_CORRECT).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_hits_contain_a_query_term(spark):
    from batch_processing_new_spark.sources.readers import load_table

    top = scoring.q141_bm25_topk(spark, SF_CORRECT)
    d = load_table(spark, SF_CORRECT, "documents")
    joined = top.join(d, "doc_id").select("doc_id", "text").collect()
    for r in joined:
        toks = set(r.text.strip().split(" "))
        assert toks & set(scoring.BM25_QUERY), r.doc_id


def test_classifier_matches_local_reimplementation(spark):
    """p_good recomputed doc-by-doc with hashlib + math must match the
    distributed fold to float tolerance."""
    from batch_processing_new_spark.sources.readers import load_table

    out = {
        r.doc_id: r.p_good
        for r in scoring.q142_quality_classifier(spark, SF_CORRECT)
        .limit(2000)
        .collect()
    }
    w = scoring._weights(spark)
    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(25)
        .collect()
    )
    for r in docs:
        dot = 0.0
        for t in r.text.strip().split(" "):
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            dot += w[h % scoring.CLS_DIM]
        p = 1 / (1 + math.exp(-(scoring.CLS_BIAS + dot)))
        assert abs(out[r.doc_id] - round(p, 6)) < 1e-9, r.doc_id


def test_classifier_keep_consistent_with_threshold(spark):
    rows = scoring.q142_quality_classifier(spark, SF_CORRECT).collect()
    for r in rows:
        assert r.keep == (1 if r.p_good > 0.5 else 0) or abs(
            r.p_good - 0.5
        ) < 1e-6


# -------------------------------------------------- hybrid RRF fusion

def test_hybrid_rrf_math_and_membership(spark):
    """Every fused row's rrf_score equals the two-term reciprocal sum
    of its exposed ranks, and every row carries at least one rank
    (a doc in neither list can't appear)."""
    from batch_processing_new_spark.operators.scoring import (
        RRF_K,
        q151_hybrid_rrf,
    )
    from tests.conftest import SF_CORRECT

    rows = q151_hybrid_rrf(spark, SF_CORRECT).collect()
    assert rows and rows[0].rank == 1
    for r in rows:
        assert r.bm25_rank is not None or r.cos_rank is not None
        expect = 0.0
        if r.bm25_rank is not None:
            expect += 1.0 / (RRF_K + r.bm25_rank)
        if r.cos_rank is not None:
            expect += 1.0 / (RRF_K + r.cos_rank)
        assert abs(r.rrf_score - round(expect, 6)) < 1e-9


def test_hybrid_rrf_prefers_docs_in_both_lists(spark):
    """A document ranked in BOTH legs must outscore one holding only a
    deep single-leg rank — the property fusion exists for."""
    from batch_processing_new_spark.operators.scoring import q151_hybrid_rrf
    from tests.conftest import SF_CORRECT

    rows = q151_hybrid_rrf(spark, SF_CORRECT).collect()
    both = [r for r in rows if r.bm25_rank is not None and r.cos_rank is not None]
    single = [r for r in rows if (r.bm25_rank is None) != (r.cos_rank is None)]
    if both and single:
        assert max(r.rrf_score for r in both) > min(
            r.rrf_score for r in single
        )
