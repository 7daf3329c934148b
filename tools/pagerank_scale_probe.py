#!/usr/bin/env python
"""Pagerank iteration-depth probe (VERDICT r05 #5).

q102 runs 3 pagerank iterations; the graph.py docstring prescribes
per-iteration checkpointing at 100 TB but the seam had never been
exercised. This probe runs the UNREGISTERED 1..N-iteration variants of
the exact q102 pipeline at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints, per depth: wall seconds, marginal seconds for the added
iteration, and the analyzed-plan string length (lineage-growth proxy).
A compounding marginal time or super-linear plan growth = the signal
to add the per-iteration localCheckpoint knob to ``pagerank()``.

Usage: python tools/pagerank_scale_probe.py [max_iters] [--checkpoint N]
  --checkpoint N: localCheckpoint the rank frame every N iterations
  (exercises the knob variant for A/B).
  --single: run ONLY depth max_iters instead of the 1..max_iters
  sweep. The sweep is N actions re-planning 1..N-deep DAGs (O(N^2)
  total work — fine at depth 20, prohibitive at 50); --single is the
  honest per-knob cost at one depth: one action, wall/N = s/iter.
  With --single the probe runs every knob in {None, 5, 1}, reports
  s/iter for each, and asserts the three rank outputs are
  BYTE-IDENTICAL (the knob must stay value-neutral at depth 50, not
  just the depth-20 the r06 test pinned). Each knob runs in a FRESH
  SparkSession: a depth-50 run leaves ~GBs of localCheckpoint blocks
  (the materialized edge list plus up to 50 rank cuts) pinned in the
  local-mode JVM until GC, and a shared session OOM'd the third knob
  on its broadcast build when r08 first ran this — isolation also
  makes the three walls an honest cold-session A/B.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_new_spark.operators.graph import (  # noqa: E402
    copurchase_edges,
    pagerank,
)
from batch_processing_new_spark.session import get_spark  # noqa: E402
from batch_processing_new_spark.sources.readers import load_table  # noqa: E402


def single_depth_knob_sweep(sf_dir: str, cpus: int, iters: int) -> int:
    """One pagerank action at depth ``iters`` per knob value, each in
    a fresh SparkSession, plus a byte-identity check across the three
    outputs (VERDICT r07 #5: the r06 measurement stopped at depth 20;
    this records where lineage cost inflects at 50 without paying the
    sweep's O(N^2)). The edge build is materialized (eager
    localCheckpoint) and timed SEPARATELY before t0, so s/iter is the
    marginal iteration cost alone (ADVICE r08: folding the fixed edge
    build into wall/iters overstated s/iter at low depths; r08's
    recorded depth-50 table used the older wall-inclusive figure —
    identical across knobs, so its ratios stand)."""
    from pyspark.sql import SparkSession

    results: dict[str, tuple[float, str]] = {}
    for ckpt in (None, 5, 1):
        # stop ANY live session, not just the thread-active one:
        # getActiveSession() is thread-local, so a default session
        # created elsewhere would slip past it straight into
        # get_spark's getOrCreate and silently share one JVM across
        # knobs, losing the documented isolation (ADVICE r08).
        # _instantiatedSession is private API: assert it exists so a
        # PySpark upgrade renaming it fails LOUDLY here instead of
        # silently restoring shared-JVM behavior (ADVICE r09); if a
        # future PySpark grows the public getDefaultSession() (the
        # Scala-side name), prefer it automatically.
        if not hasattr(SparkSession, "_instantiatedSession") and not hasattr(
            SparkSession, "getDefaultSession"
        ):
            raise SystemExit(
                "SparkSession lost both _instantiatedSession and "
                "getDefaultSession — update the session-isolation "
                "teardown for this PySpark version before trusting "
                "the knob A/B"
            )
        live_sessions = {SparkSession.getActiveSession()}
        if hasattr(SparkSession, "getDefaultSession"):
            live_sessions.add(SparkSession.getDefaultSession())
        live_sessions.add(getattr(SparkSession, "_instantiatedSession", None))
        for live in live_sessions - {None}:
            live.stop()
        spark = get_spark(
            app_name=f"pagerank_probe_ckpt_{ckpt}",
            cpus=cpus,
            shuffle_partitions=cpus,
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        t_edges = time.time()
        edges = copurchase_edges(li).localCheckpoint(eager=True)
        edge_s = time.time() - t_edges
        t0 = time.time()
        kw = {"checkpoint_every": ckpt} if ckpt else {}
        rows = (
            pagerank(edges, iters=iters, **kw)
            .orderBy("v")
            .collect()
        )
        dt = time.time() - t0
        # canonical byte rendering: repr of the full sorted row list
        blob = repr([(r.v, r.r) for r in rows])
        results[str(ckpt)] = (dt, blob)
        print(
            f"checkpoint_every={str(ckpt):>4} iters={iters}"
            f" edge_build={edge_s:7.2f}s wall={dt:8.2f}s"
            f" s/iter={dt / iters:6.3f} rows={len(rows)}",
            flush=True,
        )
    blobs = {b for _, b in results.values()}
    if len(blobs) != 1:
        print("FAIL: knob is NOT value-neutral at this depth")
        return 1
    print(f"outputs byte-identical across knob values ({len(blobs)} variant)")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    ckpt = None
    if "--checkpoint" in args:
        i = args.index("--checkpoint")
        if i + 1 >= len(args) or not args[i + 1].isdigit() or int(args[i + 1]) < 1:
            raise SystemExit("usage error: --checkpoint requires an integer >= 1")
        ckpt = int(args[i + 1])
        del args[i : i + 2]
    single = "--single" in args
    if single:
        args.remove("--single")
    max_iters = int(args[0]) if args else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if single:
        if ckpt is not None:
            raise SystemExit(
                "usage error: --single sweeps the knob itself"
                " ({None, 5, 1}); don't also pass --checkpoint"
            )
        print(f"sf_dir={sf_dir} single-depth sweep, iters={max_iters}")
        return single_depth_knob_sweep(sf_dir, cpus, max_iters)
    spark = get_spark(app_name="pagerank_probe", cpus=cpus, shuffle_partitions=cpus)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li)
    n_edges = edges.count()
    print(f"sf_dir={sf_dir} edges={n_edges} checkpoint_every={ckpt}")
    prev = 0.0
    for iters in range(1, max_iters + 1):
        t0 = time.time()
        kw = {"checkpoint_every": ckpt} if ckpt else {}
        ranks = pagerank(edges, iters=iters, **kw)
        total = ranks.agg({"r": "sum"}).collect()[0][0]
        dt = time.time() - t0
        plan_len = len(ranks._jdf.queryExecution().analyzed().toString())
        print(
            f"iters={iters:2d} wall={dt:7.2f}s marginal={dt - prev:7.2f}s "
            f"plan_chars={plan_len:8d} sum_rank={total:.6f}"
        )
        prev = dt
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
