"""Invariant tests for the round-2 experiment/graph/versioning batch
(q163-q168): closed-form recomputation, brute-force cross-checks on
the smoke fixture, and structural invariants the SQL oracles can't
state."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.experiments import q163_ab_ztest
from batch_processing_new_spark.operators.graph import (
    q166_item_similarity,
    q167_triangle_count,
)
from batch_processing_new_spark.operators.similarity import q168_hard_negatives
from batch_processing_new_spark.operators.versioning import q165_snapshot_diff
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_ab_ztest_closed_form(spark):
    row = q163_ab_ztest(spark, SF_CORRECT).collect()[0]
    n_a, n_b, c_a, c_b = row["n_a"], row["n_b"], row["conv_a"], row["conv_b"]
    assert n_a + n_b > 0 and 0 <= c_a <= n_a and 0 <= c_b <= n_b
    p_a, p_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    z = (p_b - p_a) / math.sqrt(
        pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
    )
    assert abs(row["z_score"] - round(z, 6)) < 1e-9
    assert row["significant"] == (abs(z) > 1.959963985)
    # hash split should be roughly balanced (50/50 binomial, 6 sigma)
    assert abs(n_a - n_b) < 6 * math.sqrt(n_a + n_b)


def test_snapshot_diff_classification(spark):
    rows = q165_snapshot_diff(spark, SF_CORRECT).collect()
    by_type: dict[str, set] = {"added": set(), "removed": set(), "updated": set()}
    for r in rows:
        by_type[r["change_type"]].add(r["doc_id"])
        if r["change_type"] == "added":
            assert r["old_hash"] is None and r["new_hash"] is not None
        elif r["change_type"] == "removed":
            assert r["new_hash"] is None and r["old_hash"] is not None
        else:
            assert r["old_hash"] != r["new_hash"]
    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id")
        .collect()
    ]
    exp_added = {i for i in ids if i % 11 == 3 and i % 13 != 5}
    exp_removed = {i for i in ids if i % 11 != 3 and i % 13 == 5}
    exp_updated = {
        i for i in ids if i % 11 != 3 and i % 13 != 5 and i % 7 == 2
    }
    assert by_type["added"] == exp_added
    assert by_type["removed"] == exp_removed
    assert by_type["updated"] == exp_updated


def test_item_similarity_matches_bruteforce(spark):
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n: dict[int, int] = {}
    co: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:
            n[p] = n.get(p, 0) + 1
        for a, b in combinations(sorted(parts), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    rows = q166_item_similarity(spark, SF_SMOKE).collect()
    assert rows, "smoke fixture should produce co-purchased parts"
    for r in rows:
        a, b = sorted((r["part"], r["neighbor"]))
        assert co[(a, b)] == r["co_orders"]
        jac = co[(a, b)] / (n[r["part"]] + n[r["neighbor"]] - co[(a, b)])
        assert abs(r["jaccard"] - round(jac, 6)) < 1e-9
        assert 1 <= r["rank"] <= 5 and r["part"] < 200


def test_triangle_count_matches_bruteforce(spark):
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges: set[tuple[int, int]] = set()
    adj: dict[int, set] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    per_node: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once (a < b < c)
                for v in (a, b, c):
                    per_node[v] = per_node.get(v, 0) + 1
    expected = sorted(per_node.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["part"], r["triangles"])
        for r in q167_triangle_count(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_pagerank_checkpoint_knob_is_value_neutral(spark):
    """The r06 lineage knob (checkpoint_every, VERDICT r05 #5) must be
    a pure planning optimization: because each iteration's reduce is
    already order-independent (9dp-rounded DECIMAL term sum), ranks
    with and without mid-loop checkpoints are BIT-identical, not just
    close."""
    import struct

    from batch_processing_new_spark.operators.graph import (
        copurchase_edges,
        pagerank,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = copurchase_edges(li)
    plain = {r["v"]: r["r"] for r in pagerank(edges, iters=6).collect()}
    knobbed = {
        r["v"]: r["r"]
        for r in pagerank(edges, iters=6, checkpoint_every=2).collect()
    }
    assert plain.keys() == knobbed.keys()
    for v in plain:
        assert struct.pack("<d", plain[v]) == struct.pack(
            "<d", knobbed[v]
        ), v
    # nonsensical knob values are caller errors, not silent modes
    with pytest.raises(ValueError):
        pagerank(edges, iters=3, checkpoint_every=0)
    with pytest.raises(ValueError):
        pagerank(edges, iters=3, checkpoint_every=-1)


def test_hard_negatives_labels_and_cosines(spark):
    e = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in load_table(spark, SF_CORRECT, "embeddings").collect()
    }
    rows = q168_hard_negatives(spark, SF_CORRECT).collect()
    assert len(rows) == 25  # 5 anchors x 5 negatives
    for r in rows:
        qv, ql = e[r["query_id"]]
        nv, nl = e[r["neighbor_id"]]
        assert ql == r["query_label"] and nl == r["neighbor_label"]
        assert ql != nl
        cos = float(
            qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv))
        )
        assert abs(r["cos_sim"] - cos) < 1e-5
    # each anchor's negatives are its best cross-label matches:
    # verify top-1 per anchor against numpy argmax
    best = {}
    for r in rows:
        if r["rank"] == 1:
            best[r["query_id"]] = r["neighbor_id"]
    for qid, (qv, ql) in ((k, v) for k, v in e.items() if k < 5):
        cands = {
            vid: float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
            for vid, (nv, nl) in e.items()
            if nl != ql
        }
        top = max(cands.items(), key=lambda kv: (round(kv[1], 6), -kv[0]))
        assert best[qid] == top[0]


def test_semantic_decontam_numpy_parity(spark):
    from batch_processing_new_spark.operators.similarity import (
        q176_semantic_decontam,
    )

    e = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_CORRECT, "embeddings").collect()
    }
    ev = {k: v for k, v in e.items() if 5 <= k < 15}
    rows = q176_semantic_decontam(spark, SF_CORRECT).collect()
    assert len(rows) == len(e) - len(ev)
    for r in rows[:50]:
        cv = e[r["vec_id"]]
        sims = {
            eid: round(
                float(vv @ cv / (np.linalg.norm(vv) * np.linalg.norm(cv))), 6
            )
            for eid, vv in ev.items()
        }
        best = max(sims.items(), key=lambda kv: (kv[1], -kv[0]))
        assert r["best_eval_id"] == best[0]
        assert abs(r["max_cos"] - best[1]) < 1e-9
        assert r["contaminated"] == (best[1] >= 0.5)


def test_temperature_mix_properties(spark):
    from batch_processing_new_spark.operators.training_mix import (
        q177_temperature_mix,
    )

    rows = q177_temperature_mix(spark, SF_CORRECT).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    assert sum(r["alloc_docs"] for r in rows) <= 10000
    # alpha < 1 compresses: weight ratio is flatter than char ratio
    hi = max(rows, key=lambda r: r["chars"])
    lo = min(rows, key=lambda r: r["chars"])
    assert hi["weight"] / lo["weight"] < hi["chars"] / lo["chars"]
    # monotone: more chars -> weakly larger weight
    by_chars = sorted(rows, key=lambda r: r["chars"])
    for a, b in zip(by_chars, by_chars[1:]):
        assert a["weight"] <= b["weight"] + 1e-9


def test_length_buckets_partition_docs(spark):
    from batch_processing_new_spark.operators.training_mix import (
        q178_length_bucket_packing,
    )

    rows = q178_length_bucket_packing(spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        # bucket bounds contain [min, max]; width is 16 tokens
        assert r["bucket"] * 16 <= r["min_tok"] <= r["max_tok"] < (r["bucket"] + 1) * 16
        # waste identity
        assert 0 <= r["waste_frac"] < 1


def test_calibration_table_weighted_means(spark):
    from batch_processing_new_spark.operators.scoring import (
        q179_calibration_table,
    )

    rows = q179_calibration_table(spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["mean_p"] <= 1 and 0 <= r["frac_good"] <= 1
        assert abs(r["gap"] - round(abs(r["mean_p"] - r["frac_good"]), 6)) < 2e-6
        # bucket b contains probabilities in [b/10, (b+1)/10)
        assert r["bucket"] * 0.1 - 1e-6 <= r["mean_p" ] <= (r["bucket"] + 1) * 0.1 + 1e-6
