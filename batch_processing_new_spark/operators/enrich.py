"""Per-row LLM enrichment — the reference's core operator, Spark-first.

Reference semantics being reproduced (SURVEY.md §2A, cited to
/root/reference/test.py):

- prompt construction ``f"{system_prompt}\\n\\nInput: {cell}"`` (test.py:86-87)
- one chat-completions call per row, response text appended as a new
  ``Response`` column (test.py:57-74, test.py:186)
- retry x7 with exponential backoff 1s->64s, per-call timeout, terminal
  failure degrades to the in-band sentinel ``"Error: Unable to process"``
  (test.py:66-80) — a row never aborts the job (test.py:105-107)
- ~200 concurrent in-flight calls via a two-level thread pool
  (test.py:116,163-165,200)

Spark mapping: ``df.mapInPandas`` — each Arrow batch is processed by an
asyncio loop with a semaphore-capped client pool, so the concurrency
topology becomes ``executors x cores x per-task in-flight cap`` instead of
the reference's fixed 10x20 pools. The enrichment result is a typed struct
(response, error, attempts, latency_ms) rather than an in-band sentinel;
``response`` keeps the sentinel-compatible value for parity.

Scale notes:
- The operator is an optimizer barrier by construction (Python UDF); keep
  it late in the plan, after filters/limits, so Catalyst prunes first.
- Spark task retries would re-run whole partitions of paid API calls —
  callers should run the enrich stage with ``spark.task.maxFailures=1``
  and speculation off, or make calls idempotent via the dedupe path.
- ``dedupe_inputs=True`` enriches only DISTINCT input texts and joins
  results back — the big real-world cost optimization the reference
  lacks (SURVEY.md §4.2).
"""

from __future__ import annotations

import asyncio
import hashlib
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL = "Error: Unable to process"  # exact string, reference test.py:80

# Driver-side progress accumulators pinned for session lifetime (see
# comment at the accumulator() call in enrich()).
_LIVE_ACCUMULATORS: list = []

RESULT_FIELDS = (
    "response string, error string, attempts int, latency_ms double"
)


@dataclass
class EnrichConfig:
    """Job spec — mirrors the reference's POST body (test.py:148-159)."""

    system_prompt: str = ""
    model: str = "mock-model"
    temperature: float = 0.0
    max_tokens: int = 16
    # orchestration (reference: 20 row-workers/batch, 7 retries, 1s base
    # backoff doubling to 64s, 200s timeout — test.py:66-78,116)
    concurrency: int = 20
    retries: int = 7
    base_delay: float = 1.0
    max_delay: float = 64.0
    timeout: float = 200.0
    # transport: "mock" (deterministic, hermetic) or "http" (real API)
    transport: str = "mock"
    api_url: str = ""
    api_key_env: str = "OPENAI_API_KEY"
    # mock-only: inputs for which the transport terminally fails, to
    # exercise the sentinel path deterministically in tests
    mock_fail_inputs: frozenset[str] = field(default_factory=frozenset)
    # mock-only: simulated per-call latency seconds (0 = as fast as possible)
    mock_latency: float = 0.0
    # cost optimization: enrich distinct inputs only, join back
    dedupe_inputs: bool = False


def build_prompt(system_prompt: str, input_text: str) -> str:
    """Exact prompt shape of the reference (test.py:87)."""
    return f"{system_prompt}\n\nInput: {input_text}"


def mock_response(prompt: str) -> str:
    """Deterministic mock transport: md5-derived response.

    md5 (not sha1) because the DuckDB oracle must compute the identical
    value in SQL and DuckDB 1.0 ships md5 but not sha1.
    """
    return "resp::" + hashlib.md5(prompt.encode("utf-8")).hexdigest()[:8]


class MalformedResponseError(Exception):
    """A 2xx response whose body isn't the expected chat-completions
    shape (JSON parse failure or missing choices/message/content keys).

    The reference treats this class of failure as NON-retryable: its
    inner ``try`` around response parsing returns the sentinel
    immediately (test.py:71-74), while only transport-level failures
    fall through to the blanket retry loop (test.py:105-107). A server
    that answers 200 with garbage will answer 200 with garbage seven
    times — retrying burns quota for nothing.
    """


async def _call_with_retries(
    transport: Callable, prompt: str, cfg: EnrichConfig, sem: asyncio.Semaphore
) -> tuple[str, str | None, int, float]:
    """Retry x N with exponential backoff; degrade to sentinel (test.py:66-80).

    Error asymmetry (test.py:71-74 vs test.py:105-107): transport
    failures (connection, HTTP >= 400, timeout) retry up to
    ``cfg.retries`` times; a MalformedResponseError — delivered 200 but
    unparseable — skips all remaining retries and degrades immediately.
    """
    t0 = time.monotonic()
    delay = cfg.base_delay
    last_err: str | None = None
    for attempt in range(1, cfg.retries + 1):
        try:
            async with sem:
                # 2x headroom over the transport's own deadline: the
                # blocking worker self-terminates at cfg.timeout (see
                # http_transport), so wait_for is a backstop that fires
                # only if a thread is truly wedged — cancelling first
                # would leak the still-running thread's pool slot
                resp = await asyncio.wait_for(
                    transport(prompt), timeout=cfg.timeout * 2 + 1
                )
            return resp, None, attempt, (time.monotonic() - t0) * 1000.0
        except MalformedResponseError as exc:
            last_err = f"{type(exc).__name__}: {exc}"
            return SENTINEL, last_err, attempt, (time.monotonic() - t0) * 1000.0
        except Exception as exc:  # noqa: BLE001 — any failure degrades, never aborts
            last_err = f"{type(exc).__name__}: {exc}"
            if attempt < cfg.retries:
                await asyncio.sleep(min(delay, cfg.max_delay))
                delay *= 2
    return SENTINEL, last_err, cfg.retries, (time.monotonic() - t0) * 1000.0


def _make_transport(cfg: EnrichConfig) -> Callable:
    if cfg.transport == "mock":

        async def mock_transport(prompt: str) -> str:
            if cfg.mock_latency:
                await asyncio.sleep(cfg.mock_latency)
            # the scripted-failure hook sees the raw input text after the
            # prompt prefix, mirroring fixture FIXTURES.md §B
            input_text = prompt.split("\n\nInput: ", 1)[-1]
            if input_text in cfg.mock_fail_inputs:
                raise RuntimeError("scripted mock failure")
            return mock_response(prompt)

        return mock_transport

    if cfg.transport == "http":
        # Real chat-completions REST transport (reference test.py:58-74).
        # stdlib urllib (aiohttp/httpx may be absent in the image), made
        # non-blocking by a DEDICATED thread pool sized to the
        # concurrency cap: asyncio.to_thread shares the loop's default
        # executor (~32 threads), which would silently throttle a
        # 200-in-flight topology to ~32 — the semaphore must be the only
        # concurrency limiter, so the pool matches it.
        import json
        import os
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        api_key = os.environ.get(cfg.api_key_env, "")
        executor = ThreadPoolExecutor(
            max_workers=max(cfg.concurrency, 1),
            thread_name_prefix="enrich-http",
        )

        async def http_transport(prompt: str) -> str:
            def blocking_call() -> str:
                body = json.dumps(
                    {
                        "model": cfg.model,
                        "messages": [{"role": "user", "content": prompt}],
                        "temperature": cfg.temperature,
                        "max_tokens": cfg.max_tokens,
                    }
                ).encode()
                req = urllib.request.Request(
                    cfg.api_url,
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        "Authorization": f"Bearer {api_key}",
                    },
                )
                # transport-level failures (connect refused, HTTP >= 400,
                # socket timeout) raise URLError/HTTPError/OSError here
                # and RETRY; a delivered-but-unparseable 200 raises
                # MalformedResponseError below and does NOT (test.py:71-74)
                #
                # The read loop enforces an OVERALL deadline: urlopen's
                # timeout bounds each socket op, so a drip-feed server
                # could hold the worker thread far beyond cfg.timeout —
                # and an abandoned (wait_for-cancelled) thread would
                # permanently occupy one of the pool's exactly-
                # `concurrency` slots. Self-terminating by deadline keeps
                # the semaphore the only concurrency limiter.
                deadline = time.monotonic() + cfg.timeout
                chunks: list[bytes] = []
                with urllib.request.urlopen(req, timeout=cfg.timeout) as r:
                    while True:
                        if time.monotonic() > deadline:
                            raise TimeoutError(
                                f"response exceeded {cfg.timeout}s deadline"
                            )
                        chunk = r.read(65536)
                        if not chunk:
                            break
                        chunks.append(chunk)
                raw = b"".join(chunks)
                try:
                    payload = json.loads(raw)
                    return payload["choices"][0]["message"]["content"].strip()
                except (
                    json.JSONDecodeError,
                    KeyError,
                    IndexError,
                    TypeError,
                    AttributeError,
                ) as exc:
                    raise MalformedResponseError(
                        f"{type(exc).__name__}: {exc}"
                    ) from exc

            loop = asyncio.get_running_loop()
            return await loop.run_in_executor(executor, blocking_call)

        http_transport._executor = executor
        return http_transport

    raise ValueError(f"unknown transport: {cfg.transport}")


async def _enrich_series(texts: list[str], cfg: EnrichConfig) -> list[tuple]:
    transport = _make_transport(cfg)
    sem = asyncio.Semaphore(cfg.concurrency)
    prompts = [build_prompt(cfg.system_prompt, t) for t in texts]
    try:
        return list(
            await asyncio.gather(
                *(_call_with_retries(transport, p, cfg, sem) for p in prompts)
            )
        )
    finally:
        ex = getattr(transport, "_executor", None)
        if ex is not None:
            ex.shutdown(wait=False)


def enrich(
    df: DataFrame,
    input_col: str,
    cfg: EnrichConfig,
    response_col: str = "Response",
    with_result_struct: bool = False,
) -> DataFrame:
    """Append an LLM response column to ``df`` (reference ops 4-10).

    The input cell is string-coerced exactly as the reference does
    (``str(row[column_index])``, test.py:86). Output keeps every input
    column untouched and appends ``response_col`` (plus optionally the
    typed ``_enrich`` result struct with error/attempts/latency).
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)

    if cfg.dedupe_inputs:
        return _enrich_deduped(df, input_col, cfg, response_col, with_result_struct)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [
            f"`{response_col}` string",
            "`_enrich_error` string",
            "`_enrich_attempts` int",
            "`_enrich_latency_ms` double",
        ]
    )
    acc = df.sparkSession.sparkContext.accumulator(0)  # progress (test.py:97-101)
    # Pin the driver-side Accumulator for session lifetime: when the
    # enriched DataFrame is GC'd, Accumulator.__del__ deregisters the id,
    # and any late JVM-side update flush (worker reuse / straggler task
    # completion during the NEXT query) then logs a noisy
    # "attempted to access non-existent accumulator" DAGScheduler error
    # (seen in BENCH_r01.json's tail between q30 and q37). One int per
    # enrich() call — bounded, never data-sized.
    _LIVE_ACCUMULATORS.append(acc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[input_col].astype(str).tolist()
            results = asyncio.run(_enrich_series(texts, cfg))
            out = pdf.copy()
            out[response_col] = [r[0] for r in results]
            out["_enrich_error"] = [r[1] for r in results]
            out["_enrich_attempts"] = [r[2] for r in results]
            out["_enrich_latency_ms"] = [r[3] for r in results]
            acc.add(len(out))
            yield out

    result = df.mapInPandas(run, schema=out_schema)
    if not with_result_struct:
        result = result.drop("_enrich_error", "_enrich_attempts", "_enrich_latency_ms")
    return result


def _enrich_deduped(
    df: DataFrame,
    input_col: str,
    cfg: EnrichConfig,
    response_col: str,
    with_result_struct: bool,
) -> DataFrame:
    """Enrich DISTINCT inputs, then join responses back.

    Same-input rows cost one API call instead of N. The joined-back map
    is usually tiny relative to the fact table -> broadcast; if it were
    huge, AQE falls back to a shuffle join automatically.
    """
    base_cfg = EnrichConfig(**{**cfg.__dict__, "dedupe_inputs": False})
    distinct = df.select(F.col(input_col).cast("string").alias(input_col)).distinct()
    enriched_map = enrich(
        distinct, input_col, base_cfg, response_col, with_result_struct=True
    ).withColumnRenamed(input_col, "_enrich_key")
    joined = df.join(
        F.broadcast(enriched_map),
        df[input_col].cast("string") == F.col("_enrich_key"),
        "left",
    ).drop("_enrich_key")
    if not with_result_struct:
        joined = joined.drop("_enrich_error", "_enrich_attempts", "_enrich_latency_ms")
    return joined
