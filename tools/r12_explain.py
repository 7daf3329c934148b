#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries -> plans/r12/.

Usage: python tools/r12_explain.py before|after [names...]
Names default to the bench HEADLINE list. Output file per query:
plans/r12/<name>_<tag>.txt (the optimization-round judge checks plan
claims against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    import bench
    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark

    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark(app_name=f"r12_explain_{tag}")
    specs = all_specs()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
