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


def main() -> int:
    args = [a for a in sys.argv[1:]]
    ckpt = None
    if "--checkpoint" in args:
        i = args.index("--checkpoint")
        if i + 1 >= len(args) or not args[i + 1].isdigit() or int(args[i + 1]) < 1:
            raise SystemExit("usage error: --checkpoint requires an integer >= 1")
        ckpt = int(args[i + 1])
        del args[i : i + 2]
    max_iters = int(args[0]) if args else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
