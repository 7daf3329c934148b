#!/usr/bin/env python
"""Calibrate FANOUT_TASK_BYTES: bench-methodology timings of the
fan_out-affected headline queries at several settings, fresh session per
setting (the env var is read at import). Run forward then reverse order
to bracket host drift.

Usage: python tools/r11_fanout_sweep.py [setting ...]
Each setting is an int for SPARK_GRAFT_FANOUT_TASK_BYTES (1 = legacy
always-cap behavior).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q37_minhash_lsh_pairs",
    "q83_dup_ngram_fraction",
    "q95_decontaminate",
    "q99_unigram_logprob",
    "q112_seeded_shuffle_shard",
    "q113_kmeans",
]

CHILD = r"""
import gc, json, sys, time
sys.path.insert(0, %(repo)r)
from batch_processing_new_spark.registry import all_specs
from batch_processing_new_spark.session import get_spark
from batch_processing_new_spark.sources.readers import TABLES, load_table

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="fanout_sweep")
specs = all_specs()
for t in TABLES:
    load_table(spark, SF, t).schema
load_table(spark, SF, "lineitem").groupBy("l_returnflag").count().count()
def _identity(batches):
    yield from batches
spark.range(100).mapInPandas(_identity, schema="id long").count()
def run_all(df):
    df.write.format("noop").mode("overwrite").save()
out = {}
for name in %(queries)r:
    fn = specs[name].fn
    for _ in range(2):
        run_all(fn(spark, SF))
    gc.collect(); spark._jvm.System.gc(); time.sleep(0.5)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_all(fn(spark, SF))
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
    gc.collect(); spark._jvm.System.gc(); time.sleep(0.5)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_setting(setting: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_FANOUT_TASK_BYTES=setting)
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "queries": QUERIES}],
        env=env,
        capture_output=True,
        text=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"setting {setting} failed:\n{p.stderr[-2000:]}")


def main() -> None:
    settings = sys.argv[1:] or ["1", "16384", "32768", "65536", "131072"]
    order = settings + settings[::-1]
    acc: dict[str, dict[str, float]] = {s: {} for s in settings}
    for s in order:
        r = run_setting(s)
        for q, v in r.items():
            acc[s][q] = min(v, acc[s].get(q, 1e9))
        print(f"# setting={s}: total={sum(r.values()):.3f} {r}", flush=True)
    print("\nsetting  " + "  ".join(q.split("_")[0] for q in QUERIES) + "  TOTAL")
    for s in settings:
        row = [acc[s][q] for q in QUERIES]
        print(f"{s:<8} " + "  ".join(f"{v:.3f}" for v in row) + f"  {sum(row):.3f}")


if __name__ == "__main__":
    main()
