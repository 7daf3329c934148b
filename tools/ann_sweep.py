#!/usr/bin/env python
"""Parameter sweep for the approximate operators: sign-LSH ANN
(planes x bands), IVF ANN (cells x nprobe), MinHash-LSH near-dup
(hashes x band size).

For each config: recall against the exact ground truth, a cost proxy
(candidate volume / scan fraction), and wall time at the sweep SF.
Writes TUNING.md — the recorded rationale for the defaults baked into
operators/similarity.py and operators/dedup.py. The dials transfer to
100 TB because both families' cost models are data-size-linear in the
candidate volume, which the sweep measures directly.

Run: python tools/ann_sweep.py  (SPARK_GRAFT_SF_DIR to override scale)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAND_MARKER = "<!-- ann_sweep:hand-written-below -->"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_QUERIES = 20
K = 10


def exact_topk(emb, n_queries: int, k: int):
    """Brute-force cosine top-k truth set {(query, neighbor)}."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.similarity import _f64, cosine

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), _f64("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), _f64("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    top = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    return {(r.query_id, r.neighbor_id) for r in top.collect()}


def mean_recall(truth: set, got: set, n_queries: int, k: int) -> float:
    per_q = []
    for q in range(n_queries):
        t = {n for (qq, n) in truth if qq == q}
        g = {n for (qq, n) in got if qq == q}
        if t:
            per_q.append(len(t & g) / len(t))
    if not per_q:
        raise ValueError(
            "no query vectors produced ground truth — check that the "
            "fixture has vec_id < N_QUERIES rows"
        )
    return sum(per_q) / len(per_q)


def main() -> None:
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.dedup import minhash_lsh_pairs
    from batch_processing_new_spark.operators.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
    )
    from batch_processing_new_spark.session import get_spark
    from batch_processing_new_spark.sources.readers import load_table

    spark = get_spark(app_name="ann_sweep")
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_corpus = emb.count()
    truth = exact_topk(emb, N_QUERIES, K)

    lines = [
        "# TUNING — approximate-operator parameter sweeps",
        "",
        f"Swept at `{SF_DIR}` (corpus={n_corpus} vectors, "
        f"{N_QUERIES} queries, k={K}) by `tools/ann_sweep.py`; regenerate "
        "after changing the operator defaults. Recall is against exact "
        "brute-force cosine (resp. exact shingle-Jaccard). Cost proxies "
        "are scale-transferable: candidate volume for LSH-style ops, "
        "scan fraction for IVF.",
        "",
        "## Sign-LSH ANN (`ann_lsh_topk`)",
        "",
        "| planes | bands | band bits | multiprobe | recall@10 | sec |",
        "|---|---|---|---|---|---|",
    ]

    for planes, bands, mp in [
        (12, 4, 0),
        (12, 4, 1),
        (16, 4, 0),
        (16, 4, 1),
        (20, 5, 1),
        (24, 4, 1),
    ]:
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_lsh_topk(
                emb,
                n_queries=N_QUERIES,
                k=K,
                n_planes=planes,
                n_bands=bands,
                multiprobe=mp,
            ).collect()
        }
        dt = time.perf_counter() - t0
        rec = mean_recall(truth, got, N_QUERIES, K)
        mark = " <- default" if (planes, bands, mp) == (12, 4, 1) else ""
        lines.append(
            f"| {planes} | {bands} | {planes // bands} | {mp} | {rec:.3f} | "
            f"{dt:.1f}{mark} |"
        )
        print(lines[-1], file=sys.stderr)

    lines += [
        "",
        "## IVF ANN (`ann_ivf_topk`)",
        "",
        "| cells | nprobe | scan fraction | recall@10 | sec |",
        "|---|---|---|---|---|",
    ]
    for cells, nprobe in [(16, 2), (16, 4), (16, 8), (32, 4), (32, 8), (64, 8)]:
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(
                emb, n_queries=N_QUERIES, k=K, cells=cells, nprobe=nprobe
            ).collect()
        }
        dt = time.perf_counter() - t0
        rec = mean_recall(truth, got, N_QUERIES, K)
        mark = " <- default" if (cells, nprobe) == (16, 4) else ""
        lines.append(
            f"| {cells} | {nprobe} | {nprobe / cells:.3f} | {rec:.3f} | "
            f"{dt:.1f}{mark} |"
        )
        print(lines[-1], file=sys.stderr)

    # ---- MinHash-LSH near-dup: recall/precision vs exact >= 0.5 pairs
    docs = load_table(spark, SF_DIR, "documents").cache()
    from batch_processing_new_spark.functions.text_funcs import shingles

    toksets = docs.select("doc_id", shingles(F.col("text")).alias("toks"))
    ta = toksets.select(
        F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a")
    )
    tb = toksets.select(
        F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in ta.join(tb, F.col("id_a") < F.col("id_b"))
        .where(inter / union >= 0.5)
        .select("id_a", "id_b")
        .collect()
    }

    lines += [
        "",
        "## MinHash-LSH near-dup (`minhash_lsh_pairs`, Jaccard >= 0.5)",
        "",
        f"Exact >= 0.5 pairs in corpus: {len(exact_pairs)}. Candidates = "
        "band-collision pairs (pre-verify volume, the shuffle cost); "
        "precision = fraction of candidates that verify.",
        "",
        "| hashes | band size | bands | candidates | recall | precision | sec |",
        "|---|---|---|---|---|---|---|",
    ]
    for num_hashes, band_size in [(8, 2), (8, 4), (16, 2), (16, 4), (24, 2)]:
        t0 = time.perf_counter()
        cand_df = minhash_lsh_pairs(
            docs, threshold=0.0, num_hashes=num_hashes, band_size=band_size
        ).cache()
        n_cand = cand_df.count()
        found = {
            (r.id_a, r.id_b)
            for r in cand_df.where(F.col("jaccard") >= 0.5).collect()
        }
        cand_df.unpersist()
        dt = time.perf_counter() - t0
        rec = (
            len(exact_pairs & found) / len(exact_pairs) if exact_pairs else 1.0
        )
        prec = len(found) / n_cand if n_cand else 1.0
        mark = " <- default" if (num_hashes, band_size) == (8, 2) else ""
        lines.append(
            f"| {num_hashes} | {band_size} | {num_hashes // band_size} | "
            f"{n_cand} | {rec:.3f} | {prec:.3f} | {dt:.1f}{mark} |"
        )
        print(lines[-1], file=sys.stderr)

    lines += [
        "",
        "## Reading the tables",
        "",
        "- **Sign-LSH**: more planes -> smaller buckets (fewer candidates,"
        " faster, lower recall); more bands -> more probes (higher recall,"
        " more candidates). Buckets ~ corpus/2^(band bits).",
        "- **IVF**: recall tracks the scan fraction nprobe/cells; cells"
        " sets bucket granularity (train cost ~ cells x dim). At 100 TB"
        " persist the corpus partitioned by cell so a probe is partition"
        " pruning, not a filter.",
        "- **MinHash**: bands b = hashes/r with band size r ->"
        " P[candidate] = 1-(1-j^r)^b. Bigger r = sharper threshold"
        " (higher precision, lower recall); more hashes = more bands ="
        " higher recall at higher signature cost.",
        "",
    ]

    # hand-written sections below the marker survive regeneration
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TUNING.md",
    )
    preserved = ""
    if os.path.exists(path):
        with open(path) as f:
            old = f.read()
        if HAND_MARKER in old:
            preserved = old[old.index(HAND_MARKER):]
    with open(path, "w") as f:
        f.write("\n".join(lines))
        if preserved:
            f.write(preserved)
    print("TUNING.md written", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
