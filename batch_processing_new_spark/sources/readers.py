"""Sources: parquet/CSV/JSON readers plus ingest-order row-id minting.

The reference's data model is "a CSV addressed by URL, loaded whole into
pandas, with the integer file position as row identity" (reference
test.py:170, test.py:221 — see SURVEY.md §1.1). At scale the whole-file
driver load is the 100 TB blocker, so here ingest is a distributed
``spark.read`` and row identity is minted explicitly at ingest time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


#: Inferred-schema cache per (sf_dir, table): the catalog this engine
#: does not otherwise have. ``spark.read.parquet`` re-infers the schema
#: from file footers on EVERY call (~80 ms of driver time per call on
#: this host, measured round 12); with 200+ load_table call sites that
#: is pure per-query plan-construction overhead. Pinning the schema
#: after the first inference (``spark.read.schema(s).parquet`` — 15 ms)
#: is exactly the "pin the merged schema in a catalog and pass it
#: explicitly" move the 100 TB notes below prescribe. Process-local and
#: derived at runtime from the same files — no cross-run state; each
#: call still returns a FRESH DataFrame (fresh scan relation), so plan
#: shapes, self-join resolution, and results are unchanged.
_SCHEMA_CACHE: dict[tuple[str, str], T.StructType] = {}


def _read_parquet_pinned(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    key = (sf_dir, name)
    path = f"{sf_dir}/{name}.parquet"
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it.

    ``events.ts`` has shipped in two parquet encodings across fixture
    generations: TIMESTAMP(NANOS) (readable only as raw int64 via
    ``nanosAsLong``, then truncated to micros — integer division, because
    2024-epoch nanos ≈ 1.7e18 exceeds double's 53-bit integer range) and
    plain TIMESTAMP(MICROS) (which Spark reads natively). We detect which
    one we got from the loaded schema and normalize both to
    micro-precision TIMESTAMP_NTZ — the exact representation DuckDB uses,
    so oracle comparisons agree.
    """
    if name == "events":
        # NOTE: session-wide side effect, deliberately NOT restored —
        # the returned DataFrame's scan is lazy and consults this conf
        # at execution, so restoring it here would corrupt the read.
        # The flag only changes how TIMESTAMP(NANOS) columns decode
        # (raw int64 instead of an error); other fixture tables have
        # none, and _normalize_ts handles both decodings.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet_pinned(spark, sf_dir, name)
        return df.withColumn("ts", _normalize_ts(df.schema["ts"].dataType))
    return _read_parquet_pinned(spark, sf_dir, name)


def _normalize_ts(dtype: T.DataType):
    """Normalize an events.ts column (long nanos or native timestamp) to
    micro-precision TIMESTAMP_NTZ."""
    if isinstance(dtype, T.LongType):
        return F.expr("timestamp_micros(ts DIV 1000)").cast("timestamp_ntz")
    return F.col("ts").cast("timestamp_ntz")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


#: DuckDB twin of load_vectors() — inline wherever an oracle reads the
#: embeddings table, so both sides share ONE vector-validity boundary.
VECTORS_SQL = (
    "(SELECT * FROM embeddings "
    "WHERE embedding IS NOT NULL AND len(embedding) > 0)"
)


def load_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table with invalid vectors excluded (NULL or
    zero-length embedding) — the single load boundary for every
    similarity/clustering consumer.

    A NULL embedding crashes numpy-side kernels (``np.stack(None)``),
    a zero-length one divides cosine by a zero norm (ANSI: job abort),
    and the SQL oracles' NULL-propagating arithmetic silently drops or
    NULLs the same rows — three different behaviors for one bad row
    (tools/poison_sweep.py findings: q41/q42/q93/q113/q114/q120).
    Excluding them HERE, with the identical predicate inlined in every
    oracle (VECTORS_SQL), gives one defined semantics: an invalid
    vector does not participate in vector ops.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.where(F.col("embedding").isNotNull() & (F.size("embedding") > 0))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV source (reference test.py:170 ``pd.read_csv``), distributed.

    Schema-on-read is preserved (inferSchema when none given) but an
    explicit schema skips the extra inference pass — at 100 TB always pass
    one. PERMISSIVE mode mirrors pandas' tolerance for ragged rows.
    """
    reader = spark.read.option("header", str(header).lower()).option(
        "mode", "PERMISSIVE"
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def with_ingest_row_id(df: DataFrame, col_name: str = "_row_id") -> DataFrame:
    """Mint a contiguous 0-based ingest-order row id.

    Reference parity: the pandas integer index is the reference's row
    identity and its output-order contract (test.py:103, test.py:221).
    Two-pass zipWithIndex SHAPE, kept entirely in the JVM: pin the
    input's partitioning (lazy localCheckpoint), count rows per
    partition (one tiny collect of P longs), prefix-sum the offsets on
    the driver, then ``offset[pid] + local_index`` where local_index is
    the low 33 bits of ``monotonically_increasing_id`` (its documented
    layout: partition id << 33 | per-partition row counter, counter
    assigned in iteration order — the same order zipWithIndex used).
    No global sort, no single-partition funnel, scale-safe; the offset
    table joins back as a broadcast on the partition id, so the data
    rows never move or cross the Python boundary. The previous
    implementation was ``RDD.zipWithIndex`` + ``createDataFrame``,
    which pickled EVERY ROW out to Python workers and parsed it back —
    two full non-Arrow serialization passes that dominate the
    enrichment pipeline's non-LLM cost at any scale. Ids are identical:
    both schemes number partitions in index order and rows in
    iteration order over the same pinned blocks. (Bound: 2^33 rows per
    partition — a >1 TiB single partition would be a partitioning bug
    long before the counter wraps.)

    Use it only when ingest-order identity is genuinely required (the
    enrichment pipeline); analytical queries should key on natural columns.
    """
    spark = df.sparkSession
    if col_name in df.columns:
        raise ValueError(f"column {col_name!r} already exists")
    pid_col, off_col = "_ingest_pid", "_ingest_offset"
    pinned = df.withColumn(
        pid_col, F.spark_partition_id()
    ).localCheckpoint(eager=False)
    counts = (
        pinned.groupBy(pid_col).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r[pid_col]):
        if r["n"] >= (1 << 33):
            # the low-33-bit local index would bleed into the partition
            # bits and ids silently corrupt — fail loud instead (the
            # counts are already on the driver, the check is free)
            raise ValueError(
                f"with_ingest_row_id: partition {r[pid_col]} holds "
                f"{r['n']} rows (>= 2^33); repartition the input first"
            )
        offsets.append((r[pid_col], acc))
        acc += r["n"]
    if not offsets:
        # empty input: no partitions produced rows; the join below would
        # have an empty build side and drop nothing — short-circuit to a
        # typed empty frame with the SAME non-null id field the non-empty
        # path produces (schema-sensitive consumers — strict unionByName,
        # writers — must not see nullability diverge on emptiness)
        return pinned.drop(pid_col).withColumn(
            col_name, F.lit(0).cast(T.LongType())
        ).where(F.lit(False))
    off = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField(pid_col, T.IntegerType(), False),
                T.StructField(off_col, T.LongType(), False),
            ]
        ),
    )
    # local index stamped BEFORE the join: evaluated directly over the
    # pinned blocks, so it cannot depend on the join preserving
    # stream-side row order (it does for a broadcast hash join, but the
    # id must not rest on that)
    idx_col = "_ingest_local_idx"
    indexed = pinned.withColumn(
        idx_col,
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)),
    )
    return (
        indexed.join(F.broadcast(off), pid_col)
        .withColumn(
            col_name, (F.col(off_col) + F.col(idx_col)).cast(T.LongType())
        )
        .drop(pid_col, off_col, idx_col)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """JSON-lines source. Explicit schema skips the inference pass (at
    100 TB always pass one — inference reads the data twice); PERMISSIVE
    mode lands malformed lines as nulls instead of failing the job,
    mirroring read_csv's tolerance."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning properties as the
    parquet scan (Spark ships both natively); exists so corpora landed
    by Hive/Trino-era pipelines ingest without a rewrite."""
    return spark.read.orc(path)


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across files written under DIFFERENT schema versions
    (columns added over time): ``mergeSchema`` unions the file footers
    into one schema and fills absent columns with NULL per file.

    The read-side half of schema evolution every long-lived corpus
    needs — yesterday's files stay valid when today's writer adds a
    column. Costs one footer pass over the files (not the data); for
    100 TB directories pin the merged schema in a catalog instead and
    pass it explicitly.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


#: fan_out sizing: estimated plan bytes per spread task. Calibrated by
#: measurement at sf0.1 (OPTIMIZATION_r11.md): per-task fixed cost on
#: this class of host is ~15-20 ms of scheduling plus ~100-500 ms of
#: executor run overhead, so tiny inputs must NOT be cut into
#: core-count slivers — a 0.25 MiB projection in 32 tasks spends ~30x
#: more wall in per-task overhead than in its own expression work.
#: The knob only shapes SMALL inputs: at 100 TB every scan already has
#: >= cores partitions and fan_out no-ops entirely.
FANOUT_TASK_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_TASK_BYTES", "32768")
)


#: Width-decision cache keyed on the ANALYZED plan's semanticHash (plus
#: the sizing knobs): fan_out / adaptive_width probe the Catalyst size
#: estimate and the source RDD's partition count, which costs a full
#: optimize + physical-planning pass per call — per-query CONSTRUCTION
#: latency paid by every driver on every run (measured round 12:
#: ~30-90 ms per fan_out site on the bench host). The analyzed plan
#: already exists (Datasets analyze eagerly), so the hash is one cheap
#: JVM call, and two semantically-equal plans get equal widths — the
#: correct outcome, since values are width-independent everywhere by
#: the engine's determinism discipline (tools/determinism_check.py).
#: Caches a partitioning DECISION, never data or results; process-local.
_WIDTH_CACHE: dict[tuple, tuple[int, int]] = {}


def _plan_key(df: DataFrame, *knobs) -> tuple | None:
    try:
        return (
            df._jdf.queryExecution().analyzed().semanticHash(),
            *knobs,
        )
    except Exception:
        return None  # non-classic backend: fall back to live probing


def fan_out(
    df: DataFrame, multiple: int = 1, task_bytes: int | None = None
) -> DataFrame:
    """Spread a small-file scan across cores before an expression-heavy
    narrow stage — sized by DATA, capped by cores.

    Spark chains projections/explodes into the scan stage, and a scan's
    parallelism is bounded by parquet row groups — a single-row-group
    file runs its whole downstream expression chain on ONE task no
    matter how many cores exist (measured 2.6x on the shingle stage at
    sf0.1). This helper pays one tiny exchange (the projected columns
    only) to unlock execution width.

    Width is ``ceil(estimated plan bytes / FANOUT_TASK_BYTES)`` capped
    at ``defaultParallelism * multiple`` (guide §2: derive partitioning
    from input size, never a core-count constant): a hard
    ``repartition(cores)`` is an AQE-opaque user shuffle, and at small
    inputs it pays ~cores x the per-task fixed overhead for microscopic
    slices (measured at sf0.1: the q37 shingle stage at 32 fixed tasks
    ran 2.3x slower than data-sized width; a warm no-op Python stage
    costs 0.37 s at 2 tasks vs 0.85 s at 32). No-op when the scan
    already has enough partitions — at 100 TB real inputs have
    thousands of row groups and this never fires; it's the small-input
    guard, so the knob only tunes small-input behavior. Values are
    width-independent everywhere by the engine's determinism discipline
    (tools/determinism_check.py runs every query at two partitionings).

    ``task_bytes`` overrides the default slice size per call site:
    Python-kernel consumers (mapInPandas/pandas UDF over vectors) pay a
    far higher per-task boundary cost than JVM expression chains, so
    they pass a coarser slice (measured sweep in OPTIMIZATION_r11.md:
    q113's Lloyd passes run ~35 percent faster at 128 KiB/task than at
    the 32 KiB text default; the text band inverts).
    """
    key = _plan_key(
        df,
        "fan_out",
        df.sparkSession.sparkContext.defaultParallelism * multiple,
        task_bytes,
    )
    hit = _WIDTH_CACHE.get(key) if key is not None else None
    if hit is None:
        target = adaptive_width(df, multiple=multiple, task_bytes=task_bytes)
        # _jdf.rdd(), not df.rdd: the Python RDD wrapper adds a
        # serializer handshake on top of the same physical planning
        src = df._jdf.rdd().getNumPartitions()
        if key is not None:
            _WIDTH_CACHE[key] = (target, src)
    else:
        target, src = hit
    if src < target:
        return df.repartition(target)
    return df


def adaptive_width(
    df: DataFrame,
    multiple: int = 1,
    task_bytes: int | None = None,
    floor: int = 1,
) -> int:
    """Data-derived partition count: ``ceil(estimated plan bytes /
    task_bytes)`` clamped to ``[floor, defaultParallelism * multiple]``.
    Shared by fan_out and the explicit repartition sites (q112's range
    shard) so every small-input width decision uses one rule. Falls
    back to the core-count cap when Catalyst has no estimate (RDD-backed
    plans report Long.Max)."""
    sc = df.sparkSession.sparkContext
    cap = sc.defaultParallelism * multiple
    per_task = task_bytes or FANOUT_TASK_BYTES
    # cap is part of the key: sessions with different core counts in
    # one process (tests) must not share width decisions
    key = _plan_key(df, "width", cap, per_task, floor)
    hit = _WIDTH_CACHE.get(key) if key is not None else None
    if hit is not None:
        return hit[0]
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        est = -1
    if est < 0 or est >= (1 << 62):
        width = max(floor, cap)  # no/degenerate estimate: previous behavior
    else:
        width = max(floor, min(cap, -(-est // per_task)))
    if key is not None:
        _WIDTH_CACHE[key] = (width, -1)
    return width


#: Python-kernel fan_out slice (see fan_out docstring): coarser than the
#: JVM-expression default because each Python task pays the worker
#: handshake + Arrow round-trip regardless of slice size.
FANOUT_PY_TASK_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_PY_TASK_BYTES", "131072")
)


def pin_before_sort(df: DataFrame) -> DataFrame:
    """Materialize a narrow expensive chain ONCE ahead of a final
    ``orderBy``.

    A range-partitioned sort computes its partition bounds by SAMPLING
    its child, then executes the child again for the real shuffle — so
    everything between the last exchange and the sort runs TWICE
    (measured at sf0.1: q30's enrichment mapInPandas appeared as two
    ~0.56 s Python stages, q83's gram chain as a 5.6 s + 20.6 s stage
    pair, q113's final assignment as 9.9 s + 15.5 s). For a chain that
    is cheap to recompute the double execution is harmless; for a
    Python pass or a heavy expression chain it doubles the dominant
    stage. ``localCheckpoint(eager=False)`` pins the chain's output in
    block storage so the sampling pass and the shuffle both read blocks
    — the chain runs once, at the cost of caching one output-sized
    DataFrame (bounded: callers pin final query outputs, never wide
    intermediates). Lazy, so no extra job: the sampling pass itself
    triggers the materialization.
    """
    return df.localCheckpoint(eager=False)
