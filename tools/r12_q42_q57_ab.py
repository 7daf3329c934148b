#!/usr/bin/env python
"""Interleaved A/B records for the two VERDICT-r11 follow-ups.

1. q42 re-rank fan_out (VERDICT r11 #2 in 'What's wrong'): A = current
   code (fan_out on the exact-cosine re-rank scan), B = the same query
   with that fan_out bypassed. Interleaved ABAB x reps in one session,
   bench-identical timing (construct + noop sink, best of 3 per sample).
   Decision rule: drop the fan_out if B is not slower than A.

2. q57 _const_vector/_const_matrix (VERDICT r11 #7): A = current
   one-expr array literals, B = the r10-era element-wise
   ``F.array(*[F.lit(x) ...])`` construction (reconstructed here for
   measurement only). Records the plan-construction win with a
   committed artifact.

Usage: python tools/r12_q42_q57_ab.py [q42|q57] [reps]
Writes /tmp/r12_ab_<name>.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "q42"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators import similarity as sim
    from batch_processing_new_spark.session import get_spark
    from batch_processing_new_spark.sources.readers import TABLES, load_table

    spark = get_spark(app_name=f"r12_ab_{which}")
    for t in TABLES:
        load_table(spark, SF_DIR, t).schema

    if which == "q42":
        fn_a = sim.q42_ann_lsh_topk.__wrapped__ if hasattr(
            sim.q42_ann_lsh_topk, "__wrapped__"
        ) else sim.q42_ann_lsh_topk

        real_fan_out = sim.fan_out

        def fn_b(spark, sf_dir):
            sim.fan_out = lambda df, **kw: df  # bypass re-rank fan_out
            try:
                return fn_a(spark, sf_dir)
            finally:
                sim.fan_out = real_fan_out

    elif which == "q57":
        from batch_processing_new_spark.registry import all_specs

        fn_a = all_specs()["q57_ann_ivf_topk"].fn

        def const_vector_unrolled(values):
            return F.array(*[F.lit(float(x)) for x in values])

        def const_matrix_unrolled(rows):
            return F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in r])
                    for r in rows
                ]
            )

        real_v, real_m = sim._const_vector, sim._const_matrix

        def fn_b(spark, sf_dir):
            sim._const_vector = const_vector_unrolled
            sim._const_matrix = const_matrix_unrolled
            try:
                return fn_a(spark, sf_dir)
            finally:
                sim._const_vector, sim._const_matrix = real_v, real_m

    else:
        raise SystemExit(f"unknown target {which}")

    # warm-up both variants (JIT / codegen), untimed
    _timed(fn_a, spark, SF_DIR)
    _timed(fn_b, spark, SF_DIR)

    a_times, b_times = [], []
    for _ in range(reps):
        a_times.append(_timed(fn_a, spark, SF_DIR))
        b_times.append(_timed(fn_b, spark, SF_DIR))
    out = {
        "target": which,
        "sf_dir": SF_DIR,
        "a_current": [round(x, 3) for x in a_times],
        "b_variant": [round(x, 3) for x in b_times],
        "a_min": round(min(a_times), 3),
        "b_min": round(min(b_times), 3),
    }
    path = f"/tmp/r12_ab_{which}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
