#!/usr/bin/env python
"""q78 emission-volume A/B: micro-batch sizing as the 100 TB recipe.

VERDICT r09 #3: q78 (update-mode applyInPandasWithState,
streaming/stateful.py) is the one streaming exponent still climbing
between decades (0.54 at x10 -> 0.82 over two decades at x100). The
mechanics are understood — update mode emits one row per ACTIVE KEY
per MICRO-BATCH, so total emissions = sum over batches of
distinct-users-in-batch; with the fixture's users active in every
batch that is users x batches, linear in each factor, and the PRODUCT
looks superlinear when a weak-scaling stress grows both together.
The operator's state work is linear; the emission volume is a
CONSUMER CONTRACT choice.

This probe measures the lever directly: the identical
running_user_stats operator replayed over the same synthetic events
corpus with maxFilesPerTrigger=1 (the registered q78 shape: 10
micro-batches on the 10-slice layout) vs maxFilesPerTrigger=5 (2
micro-batches — still exercising cross-batch state carry, 5x fewer
emissions). Per scale the two variants' FINAL per-user states must be
byte-identical (the running sum is integer cents — order-independent,
streaming/stateful.py:21); the A/B wall + emission counts quantify
how much of q78's x100 cost is emission volume rather than state
maintenance, and the B column is the documented deployment recipe:
when the consumer needs final state (not a per-batch changelog), size
micro-batches to the emission budget — emissions = active keys x
batches — or equivalently consume the update stream through a
foreachBatch upsert (streaming/incremental.py) instead of retaining
every emission.

Timing discipline (memory + r09): interleave variants per scale,
best-of-2, FRESH plan per attempt (each attempt rebuilds the reader
and the streaming query; availableNow replays end-to-end by
construction). Each scale's corpus is built once through the
scale_stress builder (ts-range-sliced, ascending-mtime-stamped —
byte-deterministic replay).

Usage: python tools/q78_emission_ab.py [scales-csv]   (default 1,10,100)
"""

from __future__ import annotations

import importlib.util
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from batch_processing_new_spark.session import get_spark  # noqa: E402

WORK = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/q78_emission_ab")

# (label, maxFilesPerTrigger): A = the registered q78 replay shape
# (stream_queries.py:36 read_events_stream hardcodes "1"); B = the
# emission-budget recipe (5 files/trigger -> 2 micro-batches on the
# fixed 10-slice layout).
VARIANTS = [("A_mfpt1", 1), ("B_mfpt5", 5)]


def _load_scale_stress():
    """Import tools/scale_stress.py for its corpus builder (tools/ is
    not a package; same importlib recipe as tests/conftest.load_tool)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_stress.py")
    spec = importlib.util.spec_from_file_location("scale_stress", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_stress"] = mod
    spec.loader.exec_module(mod)
    return mod


def read_events_stream_n(
    spark: SparkSession, sf_dir: str, files_per_trigger: int
) -> DataFrame:
    """read_events_stream (stream_queries.py:36) with the trigger-size
    knob exposed — the ONLY degree of freedom in this A/B. The stress
    corpus is always the directory-style dataset, so only that branch
    is replicated; ts normalization and the UTC session pin match the
    engine reader line for line."""
    from batch_processing_new_spark.sources.readers import _normalize_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    p = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(p).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(p)
    )
    return stream.withColumn(
        "ts", _normalize_ts(schema["ts"].dataType).cast("timestamp")
    )


def run_variant(
    spark: SparkSession, sf_dir: str, files_per_trigger: int
) -> tuple[float, int, int, list]:
    """One fresh end-to-end replay: (wall s, emissions, final rows,
    sorted final state). Wall covers the full registered-q78 shape —
    replay into the memory sink PLUS the keep-last dedup down to final
    per-user state — so the A/B charges each variant its real
    downstream cost (A dedups users x batches rows, B a fifth of that)."""
    from batch_processing_new_spark.streaming.stateful import running_user_stats
    from batch_processing_new_spark.streaming.stream_queries import (
        run_update_to_memory,
    )

    t0 = time.time()
    events = read_events_stream_n(spark, sf_dir, files_per_trigger)
    res = run_update_to_memory(running_user_stats(events), "q78ab")
    emissions = res.count()
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        res.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "max_event_id")
        .orderBy("user_id")
        .collect()
    )
    dt = time.time() - t0
    blob = [(r.user_id, r.n_events, r.total_value, r.max_event_id) for r in final]
    return dt, emissions, len(final), blob


def main() -> int:
    scales = (
        [int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1 else [1, 10, 100]
    )
    ss = _load_scale_stress()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="q78_emission_ab", cpus=cpus, shuffle_partitions=cpus)

    dirs: dict[int, str] = {}
    for k in scales:
        out = os.path.join(WORK, f"x{k}")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        ss.build(spark, k, out, only={"events"})
        print(f"built x{k} events in {time.time() - t0:.1f}s at {out}", flush=True)
        dirs[k] = out

    results: dict[str, dict[int, float]] = {lbl: {} for lbl, _ in VARIANTS}
    emits: dict[str, dict[int, int]] = {lbl: {} for lbl, _ in VARIANTS}
    for k in scales:
        best: dict[str, float] = {lbl: math.inf for lbl, _ in VARIANTS}
        blobs: dict[str, list] = {}
        cnt: dict[str, tuple[int, int]] = {}
        for _attempt in range(2):
            for lbl, mfpt in VARIANTS:  # interleaved per attempt
                dt, em, n_final, blob = run_variant(spark, dirs[k], mfpt)
                if lbl in cnt and cnt[lbl] != (em, n_final):
                    raise SystemExit(
                        f"NONDETERMINISTIC REPLAY: {lbl} x{k} "
                        f"{cnt[lbl]} then {(em, n_final)}"
                    )
                if lbl in blobs and blobs[lbl] != blob:
                    raise SystemExit(
                        f"NONDETERMINISTIC STATE: {lbl} x{k} final state "
                        f"differs between attempts"
                    )
                cnt[lbl] = (em, n_final)
                blobs[lbl] = blob
                best[lbl] = min(best[lbl], dt)
        if blobs["A_mfpt1"] != blobs["B_mfpt5"]:
            raise SystemExit(
                f"A/B NOT VALUE-NEUTRAL at x{k}: final per-user states differ"
            )
        for lbl, _ in VARIANTS:
            results[lbl][k] = best[lbl]
            emits[lbl][k] = cnt[lbl][0]
            print(
                f"x{k} {lbl}: {best[lbl]:8.2f}s emissions={cnt[lbl][0]:>9}"
                f" final_users={cnt[lbl][1]}",
                flush=True,
            )
        print(f"x{k}: final states byte-identical across variants", flush=True)

    if len(scales) >= 2:
        lo, hi = min(scales), max(scales)
        decades = math.log10(hi / lo)
        print(f"\n-- exponents over x{lo} -> x{hi} ({decades:.0f} decades; bar 1.15) --")
        for lbl, _ in VARIANTS:
            exp = math.log10(
                max(results[lbl][hi], 1e-3) / max(results[lbl][lo], 1e-3)
            ) / decades
            print(
                f"{lbl}: {results[lbl][lo]:.2f}s -> {results[lbl][hi]:.2f}s"
                f" exponent {exp:.2f} {'ok' if exp <= 1.15 else 'SUPERLINEAR'}"
            )
        a, b = results["A_mfpt1"][hi], results["B_mfpt5"][hi]
        print(
            f"emission-budget effect at x{hi}: A {a:.2f}s"
            f" ({emits['A_mfpt1'][hi]} emissions) vs B {b:.2f}s"
            f" ({emits['B_mfpt5'][hi]} emissions) — {a / max(b, 1e-3):.2f}x"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
