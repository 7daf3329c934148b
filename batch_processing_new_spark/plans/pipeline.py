"""The full reference pipeline as one composable Spark job.

Mirrors ops 1-15 of SURVEY.md §2A (reference test.py:141-285):

  job spec -> CSV scan -> ingest-order _row_id -> head(max_rows) ->
  per-row LLM map -> append Response -> passthrough tail (empty Response)
  -> order-restoring sort -> single-file CSV sink -> error report ->
  completion webhook.

Parity contract (SURVEY.md §2A.1): output rows == input rows, output
order == input order, schema == input + 'Response', rows >= max_rows get
Response == '', terminal failures carry the exact sentinel, and the
error report carries (error_count, 1-based error_indexes).
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.enrich import (
    SENTINEL,
    EnrichConfig,
    enrich,
)
from batch_processing_new_spark.sinks.writers import write_single_csv
from batch_processing_new_spark.sources.readers import read_csv, with_ingest_row_id
from batch_processing_new_spark.sources.storage import apply_s3a_conf, map_url

ROW_ID = "_row_id"


@dataclass
class PipelineSpec:
    """The job spec of the reference's POST /process_csv (test.py:148-159)."""

    file_url: str
    column_index: int
    max_rows: int
    system_prompt: str
    model: str = "mock-model"
    temperature: float = 0.0
    tokens: int = 16
    file_name: str = "output"
    request_id: str = ""
    version_id: str = ""
    webhook_url: str | None = None
    enrich: EnrichConfig = field(default_factory=EnrichConfig)

    def validate(self) -> None:
        """400-on-missing-key equivalent (test.py:147-161)."""
        if not self.file_url:
            raise ValueError("file_url is required")
        if self.column_index < 0:
            raise ValueError("column_index must be >= 0")
        if self.max_rows < 0:
            raise ValueError("max_rows must be >= 0")


@dataclass
class PipelineResult:
    output_path: str
    row_count: int
    error_count: int
    error_indexes: list[int]  # 1-based data-row indexes (test.py:52)


def run_enrichment_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    output_dir: str,
    df: DataFrame | None = None,
) -> PipelineResult:
    """Execute the whole reference flow (§3.1) and return the report.

    ``df`` overrides the CSV scan for testing; otherwise ``spec.file_url``
    is read as CSV. The enrich stage is persisted before its two
    consumers (sink + error aggregation) — the reference re-reads its
    output buffer (test.py:231,242); naive Spark would re-run the paid
    LLM stage instead, so the persist is a correctness-of-cost matter.
    """
    spec.validate()
    cfg = EnrichConfig(
        **{
            **spec.enrich.__dict__,
            "system_prompt": spec.system_prompt,
            "model": spec.model,
            "temperature": spec.temperature,
            "max_tokens": spec.tokens,
        }
    )

    if df is not None:
        raw = df
    else:
        # Reference addressing parity (test.py:170): file_url may be a
        # presigned/virtual-hosted/path-style S3 HTTPS URL or an
        # s3://... URI — map to s3a:// + fs.s3a.* conf; local paths
        # pass through untouched (sources/storage.py).
        src = map_url(spec.file_url)
        if src.scheme in ("http", "https"):
            # presigned S3 / plain HTTPS: no Hadoop FS speaks these —
            # stream the single object driver-side (reference
            # test.py:170 model) and scan the local copy
            from batch_processing_new_spark.sources.storage import (
                fetch_http_to_local,
            )

            raw = read_csv(spark, fetch_http_to_local(src.path))
        else:
            raw = read_csv(spark, apply_s3a_conf(spark, src))
    input_col = raw.columns[spec.column_index]  # positional (test.py:151,86)

    with_id = with_ingest_row_id(raw, ROW_ID)

    # LIMIT with a stable complement (ops 3 + 12): where on _row_id, not
    # df.limit(n) — the tail must be exactly the non-enriched rows.
    head = with_id.where(F.col(ROW_ID) < spec.max_rows)
    tail = with_id.where(F.col(ROW_ID) >= spec.max_rows)

    enriched_head = enrich(head, input_col, cfg, response_col="Response")
    passthrough_tail = tail.withColumn("Response", F.lit(""))

    out = enriched_head.unionByName(passthrough_tail)
    # dual consumption below (write + error agg): persist so the paid
    # enrichment map runs exactly once
    out = out.persist()
    try:
        ordered = out.orderBy(ROW_ID)

        dest = map_url(output_dir)
        if dest.scheme == "s3a":
            # object-store sink (reference put_object + public-read ACL,
            # test.py:248-253): ONE downloadable object at the final
            # key (stage + FS rename — a bare .csv(path) write would
            # leave a part-file DIRECTORY at the advertised key), ACL
            # via the s3a canned-ACL conf, and the returned URL is the
            # public HTTPS form the reference hands back
            from batch_processing_new_spark.sinks.writers import (
                write_single_csv_hadoop,
            )

            out_path = f"{apply_s3a_conf(spark, dest, public_read=True)}/{spec.file_name}_final.csv"
            write_single_csv_hadoop(spark, ordered.drop(ROW_ID), out_path)
            bucket_key = out_path[len("s3a://"):]
            bucket, _, key = bucket_key.partition("/")
            output_path = f"https://{bucket}.s3.amazonaws.com/{key}"
        else:
            output_path = write_single_csv(
                ordered.drop(ROW_ID), f"{output_dir}/{spec.file_name}_final.csv"
            )
        row_count = out.count()

        # op 13: error aggregation — filter + count + collect of 1-based
        # indexes (reference count_errors_in_csv, test.py:40-54)
        errs = (
            out.where(F.col("Response") == SENTINEL)
            .select((F.col(ROW_ID) + 1).alias("idx"))
            .orderBy("idx")
        )
        error_indexes = [int(r.idx) for r in errs.collect()]
    finally:
        out.unpersist()

    result = PipelineResult(
        output_path=output_path,
        row_count=row_count,
        error_count=len(error_indexes),
        error_indexes=error_indexes,
    )
    if spec.webhook_url:
        _notify_webhook(spec, result)
    return result


def _notify_webhook(spec: PipelineSpec, result: PipelineResult) -> None:
    """Completion webhook (op 15, test.py:260-281): failures are logged
    and swallowed — job success never depends on the notification."""
    payload = {
        "message": "CSV processing completed",
        "file_url": result.output_path,
        "error_count": result.error_count,
        "request_id": spec.request_id,
    }
    try:
        req = urllib.request.Request(
            spec.webhook_url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=200)
    except Exception as exc:  # noqa: BLE001
        print(f"webhook notify failed (swallowed): {exc}")
