#!/usr/bin/env python
"""q102 second-decade attribution: shuffle-partition sizing A/B.

The r10 x100 datapoint put q102_copurchase_pagerank at 0.88 over two
decades (x10 was 0.61 in r06) — implying the second decade alone runs
~1.15, right at the bar. The suspect is not plan shape (explain_audit
is clean and edge volume is exactly linear in copies — the builder
self-check counts 2,000,000 = 100 x base part rows) but PARTITION
SIZING: scale_stress pins spark.sql.shuffle.partitions = 32 at every
scale, so each reducer's hash table grows 100x at x100 (the same
fixed-resource squeeze that OOM'd the 16 GB heap before the 96g knob).
A 1000-executor cluster sets shuffle partitions in the thousands; the
honest question is whether GIVING the x100 run the partition count its
data volume calls for restores the decade-1 exponent.

This probe times the REGISTERED q102 fn on the scale_stress lineitem
corpora under spark.sql.shuffle.partitions in {32, 256} — interleaved
best-of-2, fresh plan per attempt, one session PER SCALE (the conf is
read at plan time, so per-attempt spark.conf.set applies; AQE then
coalesces DOWN from the initial number, which is why the x1 run
tolerates 256; the per-scale session boundary keeps accumulated
localCheckpoint blocks from one scale's attempts off the next scale's
block manager — ADVICE r10).
Output equality across partition counts is asserted (sorted collect,
exact — the engine's decimal-sum discipline makes q102
reduction-order-robust; determinism_check already sweeps this axis at
sf0.01, this re-asserts it at 60M rows).

Run with SPARK_GRAFT_DRIVER_MEM=96g (the x100 corpus needs the scaled
heap regardless of partition count — see SKILL.md gotcha).

Usage: python tools/q102_shuffle_probe.py [copies]   (default 100;
       reuses /tmp/scale_stress/x{1,copies}/lineitem.parquet if
       present, else rebuilds through the scale_stress builder)
"""

from __future__ import annotations

import gc
import importlib.util
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_new_spark.session import get_spark  # noqa: E402

WORK = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/scale_stress")
PARTITION_COUNTS = (32, 256)


def _load_scale_stress():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_stress.py")
    spec = importlib.util.spec_from_file_location("scale_stress", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_stress"] = mod
    spec.loader.exec_module(mod)
    return mod


def _require_scaled_heap(copies: int) -> None:
    """Fail fast before the expensive x100 corpus build (ADVICE r10).

    The docstring mandates SPARK_GRAFT_DRIVER_MEM=96g for x100 — the
    default 16 GB heap OOMs mid-pagerank at 60M rows (the exact failure
    SKILL.md documents). Launched without the knob, the old flow built
    the corpus for many minutes and THEN died; check at startup instead.
    The threshold mirrors the measured boundary: >=6 GB/10M base rows,
    i.e. x100 on the sf0.1 fixture needs ~60g+.
    """
    if copies < 100:
        return
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "")
    m = re.fullmatch(r"(\d+)\s*[gG]", mem.strip())
    gb = int(m.group(1)) if m else 0
    if gb < 60:
        raise SystemExit(
            f"q102_shuffle_probe: copies={copies} needs a scaled driver "
            f"heap (measured boundary: 16g OOMs at 60M rows) but "
            f"SPARK_GRAFT_DRIVER_MEM={mem!r}. Re-run with "
            f"SPARK_GRAFT_DRIVER_MEM=96g python tools/q102_shuffle_probe.py "
            f"{copies}"
        )


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _require_scaled_heap(copies)
    spark = get_spark(
        app_name="q102_shuffle_probe", cpus=cpus, shuffle_partitions=cpus
    )
    ss = _load_scale_stress()
    dirs: dict[int, str] = {}
    for k in (1, copies):
        out = os.path.join(WORK, f"x{k}")
        if not os.path.isdir(os.path.join(out, "lineitem.parquet")):
            t0 = time.time()
            ss.build(spark, k, out, only={"lineitem"})
            print(f"built x{k} in {time.time() - t0:.1f}s at {out}", flush=True)
        dirs[k] = out

    from batch_processing_new_spark import registry

    fn = registry.all_specs()["q102_copurchase_pagerank"].fn
    results: dict[tuple[int, int], float] = {}
    # Fresh session PER SCALE (ADVICE r10): pagerank localCheckpoints
    # its edge/rank frames every call, and checkpoint blocks from
    # earlier attempts are only reclaimed by the async ContextCleaner —
    # one long-lived session accumulates block-manager pressure that
    # can inflate the later (x100) attempts. The 32-vs-256 comparison
    # stays interleaved WITHIN each scale's session (fair A/B); the
    # session boundary only isolates scales, matching the repo's
    # fresh-session-per-variant discipline for checkpoint-heavy sweeps.
    spark.stop()
    for k in (1, copies):
        spark = get_spark(
            app_name=f"q102_shuffle_probe_x{k}",
            cpus=cpus,
            shuffle_partitions=cpus,
        )
        best = {p: math.inf for p in PARTITION_COUNTS}
        blobs: dict[int, str] = {}
        for _attempt in range(2):
            for p in PARTITION_COUNTS:  # interleaved
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
                t0 = time.time()
                rows = fn(spark, dirs[k]).collect()
                dt = time.time() - t0
                blob = repr(sorted((r.part_id, r.rank) for r in rows))
                if p in blobs and blobs[p] != blob:
                    raise SystemExit(f"NONDETERMINISTIC: x{k} parts={p}")
                blobs[p] = blob
                best[p] = min(best[p], dt)
                # release this attempt's frame refs so the
                # ContextCleaner can reclaim its checkpoint blocks
                # before the next attempt starts
                del rows
                gc.collect()
        if len(set(blobs.values())) != 1:
            raise SystemExit(
                f"PARTITION-COUNT SENSITIVE at x{k}: outputs differ "
                f"between shuffle.partitions {PARTITION_COUNTS}"
            )
        for p in PARTITION_COUNTS:
            results[(k, p)] = best[p]
            print(f"x{k} parts={p}: {best[p]:8.2f}s", flush=True)
        print(f"x{k}: outputs identical across partition counts", flush=True)
        spark.stop()

    decades = math.log10(copies)
    print(f"\n-- q102 exponents over x1 -> x{copies} per partition count --")
    for p in PARTITION_COUNTS:
        exp = math.log10(
            max(results[(copies, p)], 1e-3) / max(results[(1, p)], 1e-3)
        ) / decades
        print(
            f"parts={p}: {results[(1, p)]:.2f}s -> {results[(copies, p)]:.2f}s"
            f" exponent {exp:.2f} {'ok' if exp <= 1.15 else 'SUPERLINEAR'}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
