#!/usr/bin/env python
"""10x synthetic scale-stress for the heaviest operator families.

SCALE.md fits exponents across the driver fixtures (sf0.001-0.1); this
probe asks the next question — does each heavy plan SURVIVE another
10x, i.e. the sf~1 regime — by building synthetic scale-ups of the
sf0.1 tables and timing the REGISTERED query functions on them
unchanged. Weak-scaling semantics: each copy k of the base fixture
gets its join/group keys shifted into a disjoint range (orderkey,
partkey, suppkey, doc_id, vec_id, user_id...) and its content
perturbed (a per-copy token appended to text, one embedding dimension
nudged) so dedup/LSH/ANN candidate structure replicates instead of
collapsing into one giant cross-copy cluster — row counts, shuffle
volumes, and hash-table sizes scale 10x while per-key densities stay
fixture-like, which is exactly how TPC-H SF scaling behaves.

Copies=1 rewrites the base fixture through the same builder, so the
reported ratio is builder-to-builder (parquet layout and file counts
held equal). A plan surviving 10x means wall grows ~linearly
(exponent log10(t10/t1) <= ~1.15, the SCALE.md bar); a superlinear
blowup here is a named scale-killer before a real cluster ever sees
it.

Usage: python tools/scale_stress.py [copies] [--tables t1,t2] [query-substr ...]
       (default copies=10, default query set below; --tables restricts
       the synthetic build to the listed tables — e.g. a x100 run over
       documents,embeddings stresses the dedup/ANN family at 500k docs
       without cloning lineitem 100x)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from batch_processing_new_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/scale_stress")

# the heavy families: graph iteration, graph intersection, LSH
# banding, ANN banding, k-means, full corpus pipeline, scan-agg,
# window/sessionize, text stats
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q21_sessionize",
    "q37_minhash_lsh_pairs",
    "q42_ann_lsh_topk",
    "q99_unigram_logprob",
    "q102_copurchase_pagerank",
    "q106_corpus_pipeline",
    "q113_kmeans",
    "q167_triangle_count",
]

# key columns shifted into a disjoint range per copy, by table; the
# second element names the key DOMAIN so foreign-key pairs (l_orderkey
# / o_orderkey, ...) shift by the SAME stride and joins stay consistent
# within each copy
KEY_SHIFTS = {
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "customer": [("c_custkey", "custkey"), ("c_nationkey", "nationkey")],
    "supplier": [("s_suppkey", "suppkey"), ("s_nationkey", "nationkey")],
    "part": [("p_partkey", "partkey")],
    "nation": [("n_nationkey", "nationkey"), ("n_regionkey", "regionkey")],
    "region": [("r_regionkey", "regionkey")],
    "events": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents": [("doc_id", "doc_id")],
    "embeddings": [("vec_id", "vec_id")],
}


def _nth_permutation(s: str, n: int) -> str:
    """The n-th lexicographic permutation of ``s`` (factorial number
    system) — a unique, deterministic permutation per copy index."""
    import math

    pool = list(s)
    out = []
    n %= math.factorial(len(pool))
    for i in range(len(pool), 0, -1):
        f = math.factorial(i - 1)
        out.append(pool.pop(n // f))
        n %= f
    return "".join(out)


def build(
    spark: SparkSession,
    copies: int,
    out_dir: str,
    only: set[str] | None = None,
) -> None:
    """Union `copies` key-shifted, content-perturbed clones of every
    base table (or the ``only`` subset) into ``out_dir`` (same builder
    at copies=1 keeps the comparison apples-to-apples)."""
    os.makedirs(out_dir, exist_ok=True)
    shifts = {
        t: k for t, k in KEY_SHIFTS.items() if only is None or t in only
    }
    # pass 1: per-DOMAIN stride = max over every column in the domain
    stride: dict[str, int] = {}
    tables: dict[str, object] = {}
    for table, keys in shifts.items():
        base = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
        tables[table] = base
        maxes = base.agg(
            *[F.max(col).alias(col) for col, _ in keys]
        ).collect()[0].asDict()
        for col, dom in keys:
            stride[dom] = max(stride.get(dom, 0), int(maxes[col] or 0) + 1)
    # pass 2: shifted clones
    for table, keys in shifts.items():
        base = tables[table]
        parts = []
        for c in range(copies):
            df = base
            for col, dom in keys:
                df = df.withColumn(
                    col, (F.col(col) + F.lit(c * stride[dom])).cast("long")
                )
            if table == "documents" and c > 0:
                # per-copy LETTER PERMUTATION: translate is a bijection
                # on shingles, so each copy's internal Jaccard matrix —
                # and therefore its near-dup pair structure — is
                # identical to the base, while cross-copy shingle
                # overlap collapses below any LSH threshold. (A mere
                # appended token left cross-copy Jaccard ~1 and merged
                # every clone into one giant cluster: q37 pairs went
                # 25 -> 600 at x2 instead of 50. And a simple ROTATION
                # only has len(alpha) distinct values, so at x100
                # copies c and c+10 were byte-identical and formed
                # 10-way duplicate clusters: 2.5M pairs instead of
                # 25.6k.) The c-th lexicographic permutation (factorial
                # number system) is unique per copy for c < 10!.
                # Length-preserving, so n_chars stays consistent.
                # Builder self-check: q37 rows ~= copies x its x1 rows
                # — a FEW missing pairs are LSH recall variance (the
                # permuted shingles hash into different bands, so
                # borderline pairs flip: measured 25,595 of 25,600 at
                # x100), but ANY excess means cross-copy structure
                # leaked in.
                # scramble the index: lexicographically ADJACENT
                # permutations are near-identity (c=1 only swaps the
                # final two letters), which would leave most shingles
                # shared between neighboring copies — a large odd
                # multiplier spreads copies across the permutation
                # space (typical random permutation: ~1 fixed point)
                alpha = "etaoinshrd"
                perm = _nth_permutation(alpha, c * 1000003)
                df = df.withColumn("text", F.translate("text", alpha, perm))
            if table == "embeddings" and c > 0:
                # nudge one dimension so ANN neighborhoods replicate
                # per copy instead of producing exact cross-copy ties
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i == 0, (x + F.lit(c * 1e-3)).cast("float")
                        ).otherwise(x),
                    ),
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))


def main() -> int:
    args = sys.argv[1:]
    only = None
    if "--tables" in args:
        i = args.index("--tables")
        if i + 1 >= len(args):
            raise SystemExit("usage error: --tables requires a csv list")
        only = set(args[i + 1].split(","))
        unknown = only - set(KEY_SHIFTS)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
        del args[i : i + 2]
    copies = int(args[0]) if args and args[0].isdigit() else 10
    subs = args[1:] if args and args[0].isdigit() else args
    from batch_processing_new_spark import registry

    specs = registry.all_specs()
    names = [
        n
        for n in (subs and [q for q in specs if any(s in q for s in subs)] or DEFAULT_QUERIES)
        if n in specs
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scale_stress", cpus=cpus, shuffle_partitions=cpus)

    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for k in (1, copies):
        out = os.path.join(WORK, f"x{k}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build(spark, k, out, only=only)
        print(f"built x{k} in {time.time() - t0:.1f}s at {out}", flush=True)
        for n in names:
            t0 = time.time()
            df = specs[n].fn(spark, out)
            cnt = df.count()
            dt = time.time() - t0
            results[n][k] = dt
            print(f"x{k} {n}: {dt:7.2f}s rows={cnt}", flush=True)
    import math

    print(f"\n-- scale-stress exponents (x1 -> x{copies}; bar 1.15) --")
    worst = 0.0
    for n in names:
        t1, tk = results[n][1], results[n][copies]
        exp = math.log10(max(tk, 1e-3) / max(t1, 1e-3)) / math.log10(copies)
        worst = max(worst, exp)
        verdict = "ok" if exp <= 1.15 else "SUPERLINEAR"
        print(f"{n}: {t1:.2f}s -> {tk:.2f}s exponent {exp:.2f} {verdict}")
    print(f"worst exponent: {worst:.2f}")
    return 0 if worst <= 1.15 else 1


if __name__ == "__main__":
    raise SystemExit(main())
