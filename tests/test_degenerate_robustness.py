"""Degenerate-cardinality robustness gate (tools/degenerate_sweep.py
as a test).

The fixtures are comfortably sized, so neither the local sweep nor the
driver can exhibit the empty-relation class the first sweep run found
(8 divergent queries): driver-side seed/vocab collects indexing into
an empty result (q113/q114 IndexError, q57 VOID-typed empty centroid
array, q99 NULL total arithmetic), Spark's global aggregate fabricating
one all-NULL row where the oracle's GROUP BY emits zero (q162/q189),
and Spark's rollup/cube emitting nothing over an empty relation where
ANSI emits the () grand-total row (q08/q09). At 100 TB an empty or
single-row relation is routine — a date filter that matches nothing, a
partition with one surviving row — so every oracle-able query must
agree with its oracle on both. This test keeps the class extinct.

Runs in subprocesses: the sweep needs its own SparkSession conf and
must not mutate the shared pytest session (the q50-review lesson).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["empty", "single"])
def test_degenerate_sweep_all_robust(mode):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "degenerate_sweep.py"),
            mode,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"degenerate sweep ({mode}) found divergent queries:\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
