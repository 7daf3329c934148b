"""Enrichment-pipeline edge cases (SURVEY §2A ops 3/12/13/14): empty
input, limit boundaries, and output-file shape at the extremes."""

from __future__ import annotations

import csv

from batch_processing_new_spark.operators.enrich import EnrichConfig
from batch_processing_new_spark.plans.pipeline import (
    PipelineSpec,
    run_enrichment_pipeline,
)


def _spec(url: str, max_rows: int) -> PipelineSpec:
    return PipelineSpec(
        file_url=url,
        column_index=1,
        max_rows=max_rows,
        system_prompt="classify",
        enrich=EnrichConfig(transport="mock"),
    )


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "text", "amount"])
        w.writerows(rows)
    return str(path)


def test_empty_input_yields_header_only_output(spark, tmp_path):
    src = _write_csv(tmp_path / "empty.csv", [])
    res = run_enrichment_pipeline(
        spark, _spec(src, 10), str(tmp_path / "out")
    )
    assert res.row_count == 0
    assert res.error_count == 0 and res.error_indexes == []
    with open(res.output_path) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert lines == ["id,text,Response"] or lines == ["id,text,amount,Response"]


def test_max_rows_zero_is_all_passthrough(spark, tmp_path):
    src = _write_csv(tmp_path / "p.csv", [[i, f"t{i}", i * 1.5] for i in range(7)])
    res = run_enrichment_pipeline(spark, _spec(src, 0), str(tmp_path / "out"))
    assert res.row_count == 7
    with open(res.output_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 7
    # nothing enriched: every Response empty, order preserved
    assert all(r["Response"] == "" for r in rows)
    assert [r["id"] for r in rows] == [str(i) for i in range(7)]


def test_max_rows_beyond_input_enriches_everything(spark, tmp_path):
    src = _write_csv(tmp_path / "a.csv", [[i, f"t{i}", i] for i in range(5)])
    res = run_enrichment_pipeline(
        spark, _spec(src, 10_000), str(tmp_path / "out")
    )
    assert res.row_count == 5
    with open(res.output_path) as f:
        rows = list(csv.DictReader(f))
    assert all(r["Response"].startswith("resp::") for r in rows)
    assert [r["id"] for r in rows] == [str(i) for i in range(5)]


def test_single_enriched_row_boundary(spark, tmp_path):
    src = _write_csv(tmp_path / "b.csv", [[i, f"t{i}", i] for i in range(4)])
    res = run_enrichment_pipeline(spark, _spec(src, 1), str(tmp_path / "out"))
    with open(res.output_path) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["Response"].startswith("resp::")
    assert all(r["Response"] == "" for r in rows[1:])
