#!/usr/bin/env python
"""Cross-partitioning determinism check: run EVERY registered query at
two different shuffle/parallelism settings and compare canonicalized
result hashes. A mismatch means a query's output depends on partition
count or row order — the class of bug the DuckDB oracle can't see
(it only runs once per setting).

Run occasionally (not CI — ~10 min): python tools/determinism_check.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def result_hash(df) -> str:
    rows = df.collect()
    cols = sorted(df.columns)

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    lines = sorted(
        "|".join(canon(r[c]) for c in cols) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark

    bad = []
    hashes: dict[str, str] = {}
    for cpus, parts in ((32, 32), (5, 7)):
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
        spark = get_spark(
            app_name=f"determinism_{cpus}", cpus=cpus, shuffle_partitions=parts
        )
        for name, spec in sorted(all_specs().items()):
            h = result_hash(spec.fn(spark, SF_DIR))
            if name in hashes and hashes[name] != h:
                bad.append(name)
                print(f"MISMATCH {name}", file=sys.stderr)
            hashes[name] = h
        spark.stop()
    print(f"checked {len(hashes)} queries; mismatches: {bad or 'none'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
