"""Thin HTTP job-ingest service — reference op 1 (test.py:141-161).

The reference is a Flask route ``POST /process_csv`` that pulls ten
required keys out of the JSON body (400 on any missing key,
test.py:147-161), runs the enrichment pipeline inline, and answers with
a completion JSON (test.py:261,281). Flask isn't in this image and a
control-plane endpoint needs nothing beyond the standard library, so
this uses ``http.server.ThreadingHTTPServer``.

Design note: the service is control plane only — it validates the spec,
hands it to ``plans.pipeline.run_enrichment_pipeline`` (the data plane),
and reports. Unlike the reference, concurrent jobs are safe: all job
state lives in the job's own scope, not module globals (the reference's
global progress counter makes it single-job, SURVEY.md §3.1). One
SparkSession serves all jobs — Spark schedules concurrent jobs FIFO
across its pools.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from batch_processing_new_spark.operators.enrich import EnrichConfig
from batch_processing_new_spark.plans.pipeline import (
    PipelineSpec,
    run_enrichment_pipeline,
)

# The reference's required body keys, verbatim (test.py:148-159).
REQUIRED_KEYS = [
    "s3_file_url",
    "column_index",
    "max_rows",
    "system_prompt",
    "model",
    "temperature",
    "tokens",
    "file_name",
    "request_id",
    "version_id",
]


def spec_from_body(body: dict, transport: str = "mock") -> PipelineSpec:
    """Validate + coerce the POST body into a typed job spec.

    Raises KeyError on a missing key — the caller maps that to 400,
    mirroring the reference's ``except KeyError`` route guard.
    """
    missing = [k for k in REQUIRED_KEYS if k not in body]
    if missing:
        raise KeyError(missing[0])
    return PipelineSpec(
        file_url=str(body["s3_file_url"]),
        column_index=int(body["column_index"]),
        max_rows=int(body["max_rows"]),
        system_prompt=str(body["system_prompt"]),
        model=str(body["model"]),
        temperature=float(body["temperature"]),
        tokens=int(body["tokens"]),
        file_name=str(body["file_name"]),
        request_id=str(body["request_id"]),
        version_id=str(body["version_id"]),
        webhook_url=body.get("webhook_url"),
        enrich=EnrichConfig(transport=transport),
    )


class _Handler(BaseHTTPRequestHandler):
    server: EnrichmentServer  # set by ThreadingHTTPServer

    def log_message(self, *args) -> None:  # quiet test output
        pass

    def _reply(self, code: int, payload: dict) -> None:
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self) -> None:  # noqa: N802 — BaseHTTPRequestHandler API
        if self.path != "/process_csv":
            self._reply(404, {"error": "unknown route"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as exc:
            self._reply(400, {"error": f"bad JSON: {exc}"})
            return
        try:
            spec = spec_from_body(body, transport=self.server.transport)
        except KeyError as exc:  # missing key -> 400 (test.py:160-161)
            self._reply(400, {"error": f"Missing key: {exc}"})
            return
        except (ValueError, TypeError) as exc:
            # uncoercible value or non-dict JSON body: still a client
            # error — without this the handler thread dies and the
            # client sees a closed connection instead of a 400
            self._reply(400, {"error": f"Bad value: {exc}"})
            return
        try:
            result = run_enrichment_pipeline(
                self.server.spark, spec, self.server.output_dir
            )
        except Exception as exc:  # noqa: BLE001 — read/derive failure -> 500
            self._reply(500, {"error": str(exc)})
            return
        # completion JSON, reference shape (test.py:261)
        self._reply(
            200,
            {
                "message": "CSV processing completed",
                "file_url": result.output_path,
                "row_count": result.row_count,
                "error_count": result.error_count,
                "error_indexes": result.error_indexes,
                "request_id": spec.request_id,
            },
        )


class EnrichmentServer(ThreadingHTTPServer):
    """``with EnrichmentServer(spark, out_dir) as srv: srv.start()`` —
    serves on an ephemeral port (``srv.port``) until closed."""

    daemon_threads = True

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        transport: str = "mock",
    ) -> None:
        super().__init__((host, port), _Handler)
        self.spark = spark
        self.output_dir = output_dir
        self.transport = transport
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=10)
        self.server_close()
