"""Degenerate-cardinality robustness gate (tools/degenerate_sweep.py
as a test).

The fixtures are comfortably sized and well-dispersed, so neither the
local sweep nor the driver can exhibit what the first sweep runs found
(8 empty + 14 single + 3 constant divergent queries): driver-side
seed/vocab collects indexing into an empty result (q113/q114
IndexError, q57 VOID-typed empty centroid array, q99 NULL total
arithmetic), Spark's global aggregate fabricating one all-NULL row
where the oracle's GROUP BY emits zero (q162/q189/q192), Spark's
rollup/cube emitting nothing over an empty relation where ANSI emits
the () grand-total row (q08/q09), ANSI DIVIDE_BY_ZERO raises on
undefined-statistic denominators where DuckDB yields NULL (a dozen
queries — including Spark's own `corr` builtin on a zero-variance
group with n >= 2, q48), and IEEE negative zero rendering "-0"
(q189). At 100 TB an empty relation, a single-row relation, and a
zero-dispersion slice are all routine — a date filter that matches
nothing, a partition with one surviving row, a source whose docs are
identical — so every oracle-able query must agree with its oracle on
all three. This test keeps the classes extinct.

Runs in subprocesses: the sweep needs its own SparkSession conf and
must not mutate the shared pytest session (the q50-review lesson).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["empty", "single", "constant"])
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
