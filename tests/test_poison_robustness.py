"""Poisoned-fixture robustness gate (tools/poison_sweep.py as a test).

The fixtures are pristine (no NULL text, no NULL event values, no
malformed props, no NULL embeddings), so neither the local sweep nor
the driver can exhibit the q95 divergence class: Spark's NULL-array /
NULL-skipping expression semantics vs a SQL oracle's NULL-propagating
or zero-row-unnest semantics. The sweep poisons a copy of sf0.001 with
adversarial rows in every custom table (documents/events/embeddings)
and re-verifies EVERY oracle-able query on it; r03's first run found
12 divergent queries that six per-module adversarial reviews had
missed (q26/q30/q33/q34/q65/q99/q131/q138/q140/q152/q183/q193). This
test keeps the whole class extinct.

Runs in a subprocess: the sweep needs its own SparkSession conf and
must not mutate the shared pytest session (the q50-review lesson).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_poison_sweep_all_robust():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "poison_sweep.py")],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"poison sweep found divergent queries:\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
