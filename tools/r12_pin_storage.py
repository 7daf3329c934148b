#!/usr/bin/env python
"""Measure the executor-storage footprint of the r11 pin_before_sort /
localCheckpoint pins (VERDICT r11 item #6): run each pinned headline
query to completion and read the block manager's RDD storage info at
peak — the bytes a pin actually holds while the query runs.

Usage: python tools/r12_pin_storage.py [names...]
Prints per-query: input bytes scanned (for the scale ratio), total
checkpoint block bytes (memory + disk), block count.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PINNED = [
    "q37_minhash_lsh_pairs",
    "q83_dup_ngram_fraction",
    "q99_unigram_logprob",
    "q112_seeded_shuffle_shard",
    "q113_kmeans",
    "q30_enrich_map",
    "q42_ann_lsh_topk",
]


def main() -> None:
    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark
    from batch_processing_new_spark.sources.readers import TABLES, load_table

    names = sys.argv[1:] or PINNED
    spark = get_spark(app_name="r12_pin_storage")
    sc = spark.sparkContext
    specs = all_specs()
    for t in TABLES:
        load_table(spark, SF_DIR, t).schema
    out = {}
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        infos = sc._jsc.sc().getRDDStorageInfo()
        mem = sum(i.memSize() for i in infos)
        disk = sum(i.diskSize() for i in infos)
        blocks = sum(i.numCachedPartitions() for i in infos)
        out[name] = {
            "checkpoint_mem_bytes": int(mem),
            "checkpoint_disk_bytes": int(disk),
            "cached_blocks": int(blocks),
            "n_rdds": len(infos),
        }
        print(
            f"{name:32s} mem={mem/1e6:8.2f} MB disk={disk/1e6:6.2f} MB "
            f"blocks={blocks}"
        )
        del df
        import gc

        gc.collect()
        spark._jvm.System.gc()
        import time

        time.sleep(1.0)
    with open("/tmp/r12_pin_storage.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
