"""Winnowing fingerprint invariants (text_analysis.py q132).

The winnowing guarantee: two documents sharing a substring of length
>= k + w - 1 select at least one common fingerprint; unrelated random
documents share none (w.h.p. at 60-bit hashes).
"""

from __future__ import annotations

import random
import string

from batch_processing_new_spark.operators.text_analysis import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_shared_substring_shares_a_fingerprint(spark):
    rng = random.Random(3)
    shared = _rand_text(rng, WINNOW_K + WINNOW_W - 1)
    a = _rand_text(rng, 120) + shared + _rand_text(rng, 120)
    b = _rand_text(rng, 150) + shared + _rand_text(rng, 90)
    docs = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id bigint, text string"
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {0: set(), 1: set()}
    for r in fps:
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[0] & by_doc[1], "guaranteed shared fingerprint missing"


def test_unrelated_documents_share_nothing(spark):
    rng = random.Random(5)
    docs = spark.createDataFrame(
        [(i, _rand_text(rng, 300)) for i in range(4)],
        "doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs).collect()
    seen: dict[int, set] = {}
    for r in fps:
        seen.setdefault(r.doc_id, set()).add(r.fp)
    ids = sorted(seen)
    for i in ids:
        for j in ids:
            if i < j:
                assert not (seen[i] & seen[j])
