#!/usr/bin/env python
"""Split each headline query's bench time into plan-CONSTRUCTION
(calling fn(spark, sf_dir) — includes fan_out's df.rdd width probe,
adaptive_width's analyze+optimize stats pass, and any driver-side
loops) vs EXECUTION (the noop sink on an already-built DataFrame).

The bench times construction+execution together; if construction is a
big slice, caching the width probe is a real win (ADVICE r11 low #3).

Usage: python tools/r12_construct_vs_exec.py [names...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE

    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark
    from batch_processing_new_spark.sources.readers import TABLES, load_table

    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="r12_construct_vs_exec")
    specs = all_specs()
    for t in TABLES:
        load_table(spark, SF_DIR, t).schema
    li = load_table(spark, SF_DIR, "lineitem")
    li.groupBy("l_returnflag").count().count()

    def _identity(batches):
        yield from batches

    spark.range(100).mapInPandas(_identity, schema="id long").count()

    print(f"{'query':32s} {'construct':>9s} {'execute':>9s} {'c_share':>8s}")
    for name in names:
        fn = specs[name].fn
        # warm-up (bench-identical: 2 untimed full runs)
        for _ in range(2):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        gc.collect()
        best_c, best_e = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
        tot = best_c + best_e
        print(
            f"{name:32s} {best_c:9.3f} {best_e:9.3f} {best_c / tot:8.1%}"
        )
        gc.collect()
    spark.stop()


if __name__ == "__main__":
    main()
