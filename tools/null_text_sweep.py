#!/usr/bin/env python
"""NULL/empty-text robustness sweep over every documents-reading query.

The fixtures are currently NULL-free, so the local sweep and the driver
cannot exhibit the divergence class found (and fixed) in q95, the dedup
family, multimodal, and scoring: Spark's ``tokens(NULL)`` is a NULL
ARRAY (one row survives), while a SQL oracle's ``unnest(string_split)``
emits ZERO rows — so a future fixture generation with NULL text would
silently split the two sides. This sweep makes the class testable NOW:

1. copy sf0.001 into a temp dir, append two adversarial rows to
   documents.parquet — one NULL text, one empty-string text (both with
   consistent n_chars);
2. run every registered oracle-able query whose oracle touches the
   documents table, Spark vs DuckDB, with the run_verify canon;
3. report any query whose two sides disagree on the poisoned fixture.

Queries that legitimately cannot run on the poisoned fixture are not
expected — a crash here is a finding, not noise.

Usage: python tools/null_text_sweep.py [name-substr ...]
Exit 1 on any divergence/crash.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.001"

from batch_processing_new_spark.sources.readers import TABLES  # noqa: E402


def build_poisoned_dir(dst: str) -> None:
    for t in TABLES:
        src = os.path.join(BASE, f"{t}.parquet")
        if t == "documents":
            con = duckdb.connect()
            mx = con.sql(
                f"SELECT max(doc_id) FROM read_parquet('{src}')"
            ).fetchone()[0]
            con.sql(
                f"""
                COPY (
                    SELECT * FROM read_parquet('{src}')
                    UNION ALL
                    SELECT {mx + 1}, NULL, 'en', 'poison', NULL
                    UNION ALL
                    SELECT {mx + 2}, '', 'en', 'poison', 0
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
                """
            )
            con.close()
        else:
            shutil.copyfile(src, os.path.join(dst, f"{t}.parquet"))


def main(argv: list[str]) -> int:
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from batch_processing_new_spark import registry

    tmp = tempfile.mkdtemp(prefix="nulltext_")
    build_poisoned_dir(tmp)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp}/{t}.parquet')"
        )

    # the run_verify canon (shared import keeps ONE comparison contract)
    from tests.run_verify import canon_rows  # type: ignore

    names = [
        name
        for name, s in sorted(registry.all_specs().items())
        if s.oracle
        and "documents" in s.oracle
        and (not argv or any(sub in name for sub in argv))
    ]
    failed: list[str] = []
    for name in names:
        s = registry.all_specs()[name]
        try:
            sdf = s.fn(spark, tmp)
            a = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
            rel = con.sql(s.oracle)
            b = canon_rows(rel.columns, rel.fetchall())
        except Exception as exc:  # noqa: BLE001
            print(f"CRASH  {name}: {type(exc).__name__}: {str(exc)[:200]}")
            failed.append(name)
            continue
        if a != b:
            diff = next(
                (
                    (i, x, y)
                    for i, (x, y) in enumerate(zip(a, b))
                    if x != y
                ),
                None,
            )
            print(
                f"DIFF   {name}: rows spark={len(a)} duck={len(b)}"
                + (f" first-diff@{diff[0]}: {diff[1][:90]} | {diff[2][:90]}" if diff else "")
            )
            failed.append(name)
        else:
            print(f"ok     {name} ({len(a)} rows)")
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        f"\n{len(failed)} DIVERGENT of {len(names)} documents-queries "
        "on the NULL/empty-text poisoned fixture"
        + (f": {failed}" if failed else " — ALL ROBUST")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
