"""Socket-push delivery sink: stream results pushed to subscribers.

Reference parity: the reference declares a push surface
(requirements.txt:28 Flask-SocketIO, requirements.txt:72 websockets) —
results delivered TO clients rather than polled. SURVEY.md §1.4 maps
that capability onto Structured Streaming; this module is the delivery
edge itself: a ``foreachBatch`` sink that pushes each micro-batch's
rows over plain TCP as JSON lines (the loopback-testable core of a
SocketIO/websocket emitter — a production deployment swaps the socket
write for the framing library of choice and nothing upstream moves).

Delivery semantics, stated rather than implied:

- At-least-once per micro-batch: foreachBatch replays a batch after a
  failure, so every message carries ``batch_id`` — subscribers
  de-duplicate on it (same rule as incremental.py's MV merges).
- Push failures can be swallowed (``ignore_errors=True``, the
  reference's webhook behavior — test.py:150's bare ``except: pass``)
  or raised to fail the batch and trigger replay (default; the right
  choice when the subscriber is a durable consumer, not a dashboard).

Scale shape: rows are pushed PER PARTITION from the executors — the
driver never collects the batch. Each partition opens one connection,
writes its rows, closes. A 1000-executor job fans its partitions across
the subscriber pool behind one address (TCP load balancing), which is
exactly how a websocket gateway tier is deployed.
"""

from __future__ import annotations

import json
import socket

from pyspark.sql import DataFrame


def push_batch_to_socket(
    batch_df: DataFrame,
    batch_id: int,
    host: str,
    port: int,
    ignore_errors: bool = False,
) -> None:
    """Push one (micro-)batch's rows to ``host:port`` as JSON lines.

    Executor-side fan-out: ``foreachPartition`` — one connection and
    one ordered line sequence per partition; no driver collect.
    """

    def _send(rows) -> None:
        buf = []
        for row in rows:
            # the sink's tag LAST so a result column named batch_id can
            # never overwrite it — subscribers dedup on this key
            rec = {**row.asDict(recursive=True), "batch_id": batch_id}
            buf.append(json.dumps(rec, default=str, sort_keys=True))
        if not buf:
            return  # empty partition: do not open a connection
        try:
            with socket.create_connection((host, port), timeout=10) as s:
                s.sendall(("\n".join(buf) + "\n").encode("utf-8"))
        except OSError:
            if not ignore_errors:
                raise

    batch_df.foreachPartition(_send)


def start_push_query(
    stream_df: DataFrame,
    host: str,
    port: int,
    query_name: str = "push_sink",
    output_mode: str = "update",
    ignore_errors: bool = False,
    available_now: bool = True,
):
    """Attach the socket-push sink to a streaming plan and start it.

    ``availableNow`` drains the backlog then stops (the harness/test
    mode); a live deployment passes ``available_now=False`` and lets
    the trigger default to micro-batches.
    """

    def _push(batch_df: DataFrame, batch_id: int) -> None:
        push_batch_to_socket(
            batch_df, batch_id, host, port, ignore_errors=ignore_errors
        )

    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .queryName(query_name)
        .foreachBatch(_push)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
