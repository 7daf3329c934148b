"""Parity tests for the enrichment operator and the full pipeline
(SURVEY.md §5.2 golden assertions, FIXTURES.md §B)."""

from __future__ import annotations

import hashlib
import random

import pytest

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.enrich import (
    SENTINEL,
    EnrichConfig,
    build_prompt,
    enrich,
    mock_response,
)
from batch_processing_new_spark.plans.pipeline import PipelineSpec, run_enrichment_pipeline

SYS = "Classify the sentiment of the input."


@pytest.fixture(scope="module")
def enrich_input_csv(tmp_path_factory):
    """FIXTURES.md §B: deterministic CSV, seed=42, 2500 rows."""
    rng = random.Random(42)
    vocab = "the fast key order sort table scan merge part window small hash".split()
    path = tmp_path_factory.mktemp("fixture") / "enrich_input.csv"
    with open(path, "w") as f:
        f.write("id,text,category,amount\n")
        for i in range(2500):
            text = " ".join(rng.choice(vocab) for _ in range(8))
            cat = f"cat{rng.randrange(5)}"
            amount = round(rng.random() * 1000, 2)
            f.write(f"{i},{text} row{i},{cat},{amount}\n")
    return str(path)


def test_mock_determinism_matches_pandas_reimpl(spark):
    """Spark enrich == a Spark-free pandas reimplementation (SURVEY §5.3)."""
    pdf = spark.range(200).withColumn("text", F.concat(F.lit("doc-"), F.col("id")))
    cfg = EnrichConfig(system_prompt=SYS, transport="mock")
    got = {
        r.id: r.Response
        for r in enrich(pdf, "text", cfg).select("id", "Response").collect()
    }
    for i in range(200):
        prompt = build_prompt(SYS, f"doc-{i}")
        expected = "resp::" + hashlib.md5(prompt.encode()).hexdigest()[:8]
        assert got[i] == expected


def test_scripted_failures_degrade_to_sentinel(spark):
    fails = frozenset({"doc-3", "doc-7"})
    cfg = EnrichConfig(
        system_prompt=SYS,
        transport="mock",
        mock_fail_inputs=fails,
        retries=2,
        base_delay=0.0,
    )
    df = spark.range(10).withColumn("text", F.concat(F.lit("doc-"), F.col("id")))
    rows = enrich(df, "text", cfg, with_result_struct=True).collect()
    by_id = {r.id: r for r in rows}
    assert by_id[3].Response == SENTINEL
    assert by_id[7].Response == SENTINEL
    assert by_id[3]._enrich_attempts == 2
    assert by_id[3]._enrich_error is not None
    for i in set(range(10)) - {3, 7}:
        assert by_id[i].Response == mock_response(build_prompt(SYS, f"doc-{i}"))
        assert by_id[i]._enrich_error is None


def test_full_pipeline_parity(spark, enrich_input_csv, tmp_path):
    """Golden assertions over the reference-shaped fixture:
    rows preserved, order preserved, schema+Response, tail empty,
    sentinel on scripted failures, error report matches."""
    # scripted failures: rows where id % 97 == 0 (FIXTURES.md §B)
    import csv as csvmod

    with open(enrich_input_csv) as f:
        rows = list(csvmod.DictReader(f))
    fail_texts = frozenset(r["text"] for r in rows if int(r["id"]) % 97 == 0)

    max_rows = 2000
    spec = PipelineSpec(
        file_url=enrich_input_csv,
        column_index=1,
        max_rows=max_rows,
        system_prompt=SYS,
        file_name="fixture",
        request_id="t-001",
        enrich=EnrichConfig(
            transport="mock",
            mock_fail_inputs=fail_texts,
            retries=2,
            base_delay=0.0,
        ),
    )
    result = run_enrichment_pipeline(spark, spec, str(tmp_path))

    assert result.row_count == 2500
    out_rows = list(csvmod.DictReader(open(result.output_path)))
    # (1) row count preserved
    assert len(out_rows) == 2500
    # (2) order preserved == input order
    assert [r["id"] for r in out_rows] == [r["id"] for r in rows]
    # (3) schema == input + Response
    assert list(out_rows[0].keys()) == ["id", "text", "category", "amount", "Response"]
    expected_err_idx = []
    for i, (inp, out) in enumerate(zip(rows, out_rows)):
        rid = int(inp["id"])
        if rid >= max_rows:
            # (4) passthrough tail: empty Response
            assert out["Response"] == ""
        elif rid % 97 == 0:
            # (5) exact sentinel on scripted failures
            assert out["Response"] == SENTINEL
            expected_err_idx.append(i + 1)  # 1-based
        else:
            assert out["Response"] == mock_response(build_prompt(SYS, inp["text"]))
        # payload columns carried through untouched
        assert out["category"] == inp["category"]
        assert out["amount"] == inp["amount"]
    # (6) error report matches the data
    assert result.error_count == len(expected_err_idx)
    assert result.error_indexes == expected_err_idx


def test_limit_complement_reconstructs_input(spark):
    """Property: head(n) ∪ tail(n) == input exactly (ops 3 + 12)."""
    from batch_processing_new_spark.sources.readers import with_ingest_row_id

    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    with_id = with_ingest_row_id(df)
    head = with_id.where(F.col("_row_id") < 400)
    tail = with_id.where(F.col("_row_id") >= 400)
    assert head.count() == 400
    assert tail.count() == 600
    recon = head.unionByName(tail).drop("_row_id")
    assert recon.exceptAll(df).count() == 0
    assert df.exceptAll(recon).count() == 0
