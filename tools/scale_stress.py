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
       python tools/scale_stress.py --sources [copies]
       (file-count stress for the xlsx parse path: F vs F*copies
       workbooks through the distributed binaryFile->mapInPandas read)
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

# events replay layout: number of ts-range slice files written at EVERY
# scale (weak scaling of micro-batch size, monotone watermark). The
# repartitionByRange producer and the post-write file-count guard below
# must agree on this number (ADVICE r10: two drifting literals).
EVENTS_TS_SLICES = 10

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
        if table == "events":
            # Time-ordered replay layout (r09): the streaming queries
            # read this directory through a maxFilesPerTrigger=1 file
            # source, and the naive union write lands ~one file PER
            # COPY, each spanning the full 30-day ts range — so micro-
            # batch 1 advances the watermark to stream-end and batches
            # 2..N are dropped as LATE almost entirely (measured: q53
            # at x10 emitted 3,960 of 15,000 users). That stress was
            # timing late-row culling, not scaled state. Real log
            # replay arrives in rough ts order, so write events as a
            # FIXED number of ts-range slices at every scale: equal
            # micro-batch counts x1 vs xN (weak scaling of batch
            # size), monotone watermark, zero late drops, and the
            # dedup/join state honestly reaches keys x horizon. The
            # r08 streaming-slice exponents were measured on the old
            # per-copy layout and are superseded by the r09 table.
            full = full.repartitionByRange(
                EVENTS_TS_SLICES, "ts"
            ).sortWithinPartitions("ts")
        full.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
        if table == "events":
            # ...and force the REPLAY order to match: FileStreamSource
            # processes files oldest-mtime-first, and a parallel write
            # stamps mtimes in task-COMPLETION order — effectively
            # random — so the ts-sliced files could still replay out
            # of order, re-introducing watermark late-drops
            # nondeterministically (q103's x1 emitted 7,969 / 12,091 /
            # 7,717 rows across three otherwise-identical builds
            # before this fix). part-NNNNN names sort in partition =
            # ts-range order; stamp strictly ascending mtimes along
            # that order so every replay is the same monotone log.
            import glob as _glob
            import time as _time

            files = sorted(
                _glob.glob(os.path.join(out_dir, f"{table}.parquet", "part-*"))
            )
            # the repartitionByRange above fixes the slice count at
            # EVENTS_TS_SLICES;
            # filename sort == partition order == ts-range order ONLY
            # under that invariant (ADVICE r09: an empty range
            # partition or a committer naming change would silently
            # mis-order or shrink the replay) — fail loudly instead
            if len(files) != EVENTS_TS_SLICES:
                raise SystemExit(
                    f"events replay layout broken: expected "
                    f"{EVENTS_TS_SLICES} ts-range slice files, found "
                    f"{len(files)} in {out_dir} — filename-sort mtime "
                    f"stamping is no longer safe"
                )
            t_base = _time.time() - 2 * len(files)
            for i, f in enumerate(files):
                os.utime(f, (t_base + 2 * i, t_base + 2 * i))


def sources_stress(spark: SparkSession, copies: int) -> int:
    """File-count stress for the Excel source parse path.

    The other engine families are stressed by ROW volume (the table
    builder above), but the xlsx read path's declared scale mechanism
    is FILE fan-out — ``read_xlsx`` parallelism = number of workbooks
    (sources/excel.py read-path doc; zip+XML are not splittable). So
    the right extra-decade axis here is file count: write F key-shifted
    single-sheet workbooks at x1 and F*copies at x{copies}, each file
    the same size, then time the identical distributed
    binaryFile-scan -> mapInPandas-parse -> cast -> groupBy/agg plan
    (the q49 read half, unchanged) on both corpora.

    Weak-scaling read: wall should grow sub-linearly while file count
    <= cores (idle executors absorb new files) and at worst ~linearly
    beyond — exponent bar 1.15, same as the table slices.
    """
    import math

    from batch_processing_new_spark.sources.excel import (
        read_xlsx,
        workbook_bytes,
    )
    from batch_processing_new_spark.sources.readers import load_table

    base_files = 8
    cust = load_table(spark, BASE, "customer")
    columns = list(cust.columns)
    # one bounded driver collect of the sf0.1 customer table (15k rows
    # at sf0.1 — same small-result category as the xlsx driver sink it
    # feeds); per-file clones shift c_custkey into disjoint ranges so
    # every workbook is distinct bytes, not a hardlink-equivalent
    rows = [tuple(r) for r in cust.collect()]
    key_idx = columns.index("c_custkey")
    stride = max(int(r[key_idx]) for r in rows) + 1

    results: dict[int, float] = {}
    for k in (1, copies):
        d = os.path.join(WORK, f"xlsx_x{k}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        t0 = time.time()
        for f_i in range(base_files * k):
            shifted = [
                r[:key_idx] + (r[key_idx] + f_i * stride,) + r[key_idx + 1 :]
                for r in rows
            ]
            with open(os.path.join(d, f"part{f_i:04d}.xlsx"), "wb") as fh:
                fh.write(workbook_bytes(columns, shifted))
        print(
            f"built {base_files * k} workbooks in {time.time() - t0:.1f}s at {d}",
            flush=True,
        )
        def fresh_agg():
            # a FRESH plan per attempt: re-collecting the same
            # DataFrame object reuses AQE's materialized shuffle
            # stages (the partial-agg exchange), which skips the scan
            # + parse entirely — measured 11.3 s -> 0.2 s on the x10
            # corpus. Warm-up and every timed attempt must re-plan.
            return (
                read_xlsx(spark, os.path.join(d, "*.xlsx"), columns)
                .select(
                    "c_mktsegment",
                    F.col("c_acctbal").cast("double").alias("c_acctbal"),
                )
                .groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("n_customers"),
                    F.sum(F.col("c_acctbal").cast("decimal(30,8)"))
                    .cast("double")
                    .alias("total_acctbal"),
                )
            )

        # warm-up + best-of-2 (ADVICE r07): a single timed run charges
        # the first-touch warm-up of the binaryFile->mapInPandas path
        # (JVM codegen, Python worker fork, Arrow init) to whichever
        # corpus runs first — x1 always did, biasing the exponent low
        # and under-detecting SUPERLINEAR. SCALE.md's curve tool
        # already takes best-of-2 after warm-up; match it.
        fresh_agg().collect()  # untimed warm-up
        dt = math.inf
        out = None
        for _attempt in range(2):
            t0 = time.time()
            out = fresh_agg().collect()
            dt = min(dt, time.time() - t0)
        results[k] = dt
        n_rows = sum(r.n_customers for r in out)
        print(
            f"x{k} xlsx_parse: {dt:7.2f}s files={base_files * k}"
            f" parsed_rows={n_rows}",
            flush=True,
        )
        want = len(rows) * base_files * k
        if n_rows != want:
            print(f"SELF-CHECK FAILED: parsed {n_rows} rows, want {want}")
            return 1
    exp = math.log10(
        max(results[copies], 1e-3) / max(results[1], 1e-3)
    ) / math.log10(copies)
    verdict = "ok" if exp <= 1.15 else "SUPERLINEAR"
    print(
        f"\nxlsx_parse file-count exponent (x1 -> x{copies}; bar 1.15):"
        f" {results[1]:.2f}s -> {results[copies]:.2f}s exponent {exp:.2f}"
        f" {verdict}"
    )
    return 0 if exp <= 1.15 else 1


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
    sources_mode = "--sources" in args
    if sources_mode:
        args.remove("--sources")
    copies = int(args[0]) if args and args[0].isdigit() else 10
    if copies < 2:
        raise SystemExit("usage error: copies must be >= 2 (exponent needs two scales)")
    subs = args[1:] if args and args[0].isdigit() else args
    if sources_mode:
        if only is not None or subs:
            raise SystemExit(
                "usage error: --sources takes only [copies] (the slice is "
                "file-count-axis, not table/query selection)"
            )
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        spark = get_spark(
            app_name="scale_stress_sources", cpus=cpus, shuffle_partitions=cpus
        )
        return sources_stress(spark, copies)
    from batch_processing_new_spark import registry

    specs = registry.all_specs()
    if subs:
        candidates = [q for q in specs if any(s in q for s in subs)]
        if not candidates:
            raise SystemExit(f"usage error: no registered query matches substrings {subs}")
    else:
        candidates = DEFAULT_QUERIES
    names = [n for n in candidates if n in specs]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scale_stress", cpus=cpus, shuffle_partitions=cpus)

    dirs: dict[int, str] = {}
    for k in (1, copies):
        out = os.path.join(WORK, f"x{k}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build(spark, k, out, only=only)
        print(f"built x{k} in {time.time() - t0:.1f}s at {out}", flush=True)
        dirs[k] = out
    # Timing discipline (r09 — two session-warmth traps found the day
    # the time-ordered events layout made every streaming replay 10
    # micro-batches, where fixed per-batch overhead dwarfs the data
    # compute at x1):
    # 1. single cold runs charge first-touch session overhead to
    #    whichever scale runs first (x1 cold 22s vs x10 warm 5.6s on
    #    q53) -> best-of-2 per scale, like the r08 sources-path fix;
    # 2. running ALL x1 attempts before ALL x10 attempts still lets
    #    monotonically-accumulating JIT/state-store warmth subsidize
    #    the later scale (exponents went NEGATIVE: q50 read
    #    x1 13.99s -> x10 5.51s) -> INTERLEAVE scales per query,
    #    alternating x1/xN attempts, so both scales' minima come from
    #    an equally-warm session.
    # Every attempt calls specs[n].fn() anew, rebuilding the plan, so
    # AQE cannot reuse materialized stages across attempts (the
    # re-collect trap); streaming queries re-execute their
    # availableNow replay end-to-end each attempt by construction.
    results: dict[str, dict[int, float]] = {n: {} for n in names}
    for n in names:
        best: dict[int, float] = {1: float("inf"), copies: float("inf")}
        cnt: dict[int, int] = {}
        for _ in range(2):
            for k in (1, copies):
                t0 = time.time()
                df = specs[n].fn(spark, dirs[k])
                c = df.count()
                # determinism tripwire (ADVICE r09): two identical
                # invocations must emit IDENTICAL row counts — a
                # regression to nondeterministic streaming replay (the
                # exact bug the r09 mtime fix addressed) must fail
                # loudly, not print only the last attempt's count
                if k in cnt and cnt[k] != c:
                    raise SystemExit(
                        f"NONDETERMINISTIC REPLAY: {n} x{k} emitted "
                        f"{cnt[k]} rows on attempt 1 and {c} on attempt 2"
                    )
                cnt[k] = c
                best[k] = min(best[k], time.time() - t0)
        for k in (1, copies):
            results[n][k] = best[k]
            print(f"x{k} {n}: {best[k]:7.2f}s rows={cnt[k]}", flush=True)
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
