#!/usr/bin/env python
"""Systematic audit of every global-sort (Exchange rangepartitioning)
site across ALL registered queries — VERDICT r11 item #5.

Mechanism being audited: a range-partitioned sort SAMPLES its child to
compute partition bounds, then executes the child again for the real
shuffle. If the chain between the range exchange and the next
materialization boundary below it (another Exchange whose shuffle files
are reused, a checkpointed RDD scan, an in-memory relation, or a local
table) contains a Python-eval node or a long expression chain straight
off a file scan, that work runs TWICE.

For every query: build the DataFrame at $SPARK_GRAFT_SF_DIR (default
sf0.01), walk the executed-plan tree, and for each
``Exchange rangepartitioning`` classify its child subtree:

- SAFE-boundary: first thing below is an Exchange / Scan ExistingRDD
  (localCheckpoint) / InMemoryTableScan / LocalTableScan — the sampling
  pass re-reads materialized or shuffle-file data, cheap.
- FLAG-python: a Python-eval node (ArrowEvalPython / BatchEvalPython /
  MapInPandas / FlatMapGroupsInPandas / MapInArrow) sits between the
  range exchange and the first boundary — the Python pass runs twice.
- FLAG-scan: a file scan is reachable with >= MIN_OPS operators in
  between and no boundary — a narrow expression chain off the scan
  runs twice (flagged informationally; expression chains are often
  cheap, judge by the operator list printed).

Writes plans/r12/pin_audit.md. Usage:
  python tools/r12_pin_audit.py [name-substr ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
    "PythonMapInArrow",
)
BOUNDARY = (
    "Exchange",  # any exchange below: shuffle files reused on re-run
    "Scan ExistingRDD",  # localCheckpoint pin
    "InMemoryTableScan",
    "LocalTableScan",
    "BroadcastExchange",
)
MIN_OPS = 4


def _depth(line: str) -> int:
    m = re.match(r"^[\s:+|-]*", line)
    return len(m.group(0)) if m else 0


def _node(line: str) -> str:
    return line.strip().lstrip(":+|- ").strip()


def audit_plan(plan: str) -> list[dict]:
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    results = []
    for i, ln in enumerate(lines):
        if "Exchange rangepartitioning" not in ln:
            continue
        d = _depth(ln)
        subtree = []
        for nxt in lines[i + 1 :]:
            if _depth(nxt) <= d and _node(nxt):
                break
            subtree.append(nxt)
        chain, verdict = [], "SAFE-boundary"
        for nxt in subtree:
            node = _node(nxt)
            if any(node.startswith(b) for b in BOUNDARY):
                break
            chain.append(node.split("(")[0].split("[")[0].strip())
            if any(p in node for p in PY_NODES):
                verdict = "FLAG-python"
                break
        else:
            pass
        if verdict != "FLAG-python":
            scan_hit = any(
                "Scan parquet" in _node(x) or "FileScan" in _node(x)
                for x in subtree[: len(chain) + 1]
            )
            if scan_hit and len(chain) >= MIN_OPS:
                verdict = "FLAG-scan"
        results.append({"verdict": verdict, "chain": chain[:8]})
    return results


def main() -> None:
    from batch_processing_new_spark.registry import all_specs
    from batch_processing_new_spark.session import get_spark

    subs = sys.argv[1:]
    spark = get_spark(app_name="r12_pin_audit")
    specs = all_specs()
    rows, errors = [], []
    for name in sorted(specs):
        if subs and not any(s in name for s in subs):
            continue
        if name.startswith("_probe_"):
            continue
        try:
            df = specs[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            errors.append((name, str(e)[:120]))
            continue
        for r in audit_plan(plan):
            rows.append((name, r["verdict"], " <- ".join(r["chain"])))
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    flags = [r for r in rows if r[1] != "SAFE-boundary"]
    with open(os.path.join(outdir, "pin_audit.md"), "w") as f:
        f.write(
            "# Range-sort pin audit (round 12)\n\n"
            f"Fixture: {SF_DIR}. {len(rows)} Exchange-rangepartitioning "
            f"sites across {len({r[0] for r in rows})} queries; "
            f"{len(flags)} flagged.\n\n"
            "| query | verdict | chain below range exchange |\n"
            "|---|---|---|\n"
        )
        for name, verdict, chain in rows:
            if verdict == "SAFE-boundary" and not subs:
                continue
            f.write(f"| {name} | {verdict} | {chain} |\n")
        f.write(
            f"\nSAFE-boundary sites not listed: "
            f"{len(rows) - len(flags)}.\n"
        )
        if errors:
            f.write("\n## Build errors\n\n")
            for name, err in errors:
                f.write(f"- {name}: {err}\n")
    print(f"{len(rows)} sites, {len(flags)} flagged, {len(errors)} errors")
    for r in flags:
        print("FLAG", r[0], "|", r[2])
    spark.stop()


if __name__ == "__main__":
    main()
