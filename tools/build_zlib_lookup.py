"""Materialize the zlib-length lookup that q100's DuckDB oracle joins.

SQL has no codec, so the oracle cannot recompute zlib lengths — but
zlib.compress(text, 6) is a pure deterministic function of the text
bytes, so the lengths can be precomputed ONCE into a tiny parquet and
replayed in SQL (the technique that upgraded the BPE pair q169/q180
from rows-only to exact oracles in round 4; VERDICT r04 #4 names q100
as the next candidate).

The lookup must cover every document text any harness can feed the
oracle:

- the three driver fixture dirs /root/testdata/sf{0.001,0.01,0.1};
- the poison-sweep unicode texts (tools/poison_sweep.py adds FIXED
  adversarial strings — importing the module keeps this in sync);
- the degenerate constant-mode text (tools/degenerate_sweep.py).

A text missing from the lookup drops its row out of the oracle JOIN
and the driver row goes red LOUDLY (rows mismatch) rather than
silently wrong; tests/test_training_mix.py::test_zlib_lookup_covers_
all_fixture_texts re-derives the universe and fails first locally.

Output: fixtures/zlib_len_lookup.parquet
        (text_md5 VARCHAR primary, compressed_len INTEGER), sorted by
        text_md5 for stable bytes — rebuilding with unchanged inputs
        is a git no-op.

Usage: python tools/build_zlib_lookup.py
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys
import zlib

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
OUT = os.path.join(ROOT, "fixtures", "zlib_len_lookup.parquet")


def _load_sibling(name: str):
    """Import tools/<name>.py by path WITHOUT a sys.path insert
    (ADVICE r08: the former call-time ``sys.path.insert(0, tools/)``
    leaked into the rest of the process — under pytest it partially
    undid conftest.load_tool's no-mutation contract). Snapshot and
    restore sys.path around exec_module so the sibling's own
    module-level repo-root insert doesn't leak either; evict the
    half-initialized module on failure (standard importlib recipe)."""
    import importlib.util

    existing = sys.modules.get(name)
    if existing is not None:
        return existing
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    saved_path = list(sys.path)
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        sys.modules.pop(name, None)
        raise
    finally:
        sys.path[:] = saved_path
    return mod


def fixture_texts() -> set[str]:
    texts: set[str] = set()
    con = duckdb.connect()
    # keep the hostile-fixture texts in sync by importing their source
    _CONST_TEXT = _load_sibling("degenerate_sweep")._CONST_TEXT
    _poison = _load_sibling("poison_sweep")
    BASE, POISON_DOC_TEXTS = _poison.BASE, _poison.POISON_DOC_TEXTS

    # scan roots: every SF dir under TESTDATA, PLUS the poison sweep's
    # hardcoded base dir — when SPARK_GRAFT_TESTDATA points elsewhere,
    # the poisoned fixture still unions BASE's document texts, and
    # those must stay in the lookup or the poison canon sweep would
    # report a spurious q100 rows mismatch
    paths = set(glob.glob(os.path.join(TESTDATA, "sf*", "documents.parquet")))
    paths.add(os.path.join(BASE, "documents.parquet"))
    for path in sorted(p for p in paths if os.path.exists(p)):
        for (t,) in con.sql(
            f"SELECT DISTINCT text FROM read_parquet('{path}') "
            "WHERE text IS NOT NULL AND length(text) > 0"
        ).fetchall():
            texts.add(t)
    texts.update(POISON_DOC_TEXTS)
    texts.add(_CONST_TEXT)
    return texts


def build() -> int:
    rows = sorted(
        (
            hashlib.md5(t.encode("utf-8")).hexdigest(),
            len(zlib.compress(t.encode("utf-8"), 6)),
        )
        for t in fixture_texts()
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lut (text_md5 VARCHAR, compressed_len INTEGER)"
    )
    con.executemany("INSERT INTO lut VALUES (?, ?)", rows)
    con.execute(f"COPY (SELECT * FROM lut ORDER BY text_md5) TO '{OUT}' (FORMAT PARQUET)")
    return len(rows)


if __name__ == "__main__":
    n = build()
    print(f"wrote {OUT}: {n} rows")
