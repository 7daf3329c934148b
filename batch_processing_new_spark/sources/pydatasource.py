"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic-documents generator, `format("synthdocs")`.

Demonstrates the engine's source-extensibility story end to end:
partition planning happens in Python on the driver (`partitions()` —
one InputPartition per contiguous doc_id range), row generation runs
executor-side per partition (`read()` yields tuples, never touching the
driver), and the output is a first-class DataFrame any operator here
can consume. The same four-method shape wraps any external system a
100 TB pipeline lands from (REST pagination, message queues, bespoke
binary formats) — partition = the unit of parallel fetch.

Generation is pure md5 arithmetic so the DuckDB oracle re-derives every
row exactly (q126 is a full value-hash check of the source, not a
rows-only smoke).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (registry convention)

from batch_processing_new_spark.registry import query

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima",
    "mike", "november", "oscar", "papa",
]
N_SOURCES = 20
SYNTH_ROWS = 2000
SYNTH_PARTITIONS = 8
SEED = "s42"


def synth_row(doc_id: int, seed: str = SEED) -> tuple[int, str, str]:
    """One deterministic row; shared by the executor-side reader and
    tests. n_tokens = 5 + doc_id % 10; token j = VOCAB[first md5 byte
    of 'seed:doc_id:j']; source = src(first md5 byte of 'seed:doc_id'
    mod 20)."""
    import hashlib

    def byte(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:2], 16)

    n_tokens = 5 + doc_id % 10
    toks = [
        VOCAB[byte(f"{seed}:{doc_id}:{j}") % len(VOCAB)]
        for j in range(n_tokens)
    ]
    return doc_id, " ".join(toks), f"src{byte(f'{seed}:{doc_id}') % N_SOURCES}"


def _make_datasource():
    """Build the DataSource class lazily: the pyspark.sql.datasource
    module exists only on Spark >= 4.0."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SynthDocsReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", SYNTH_ROWS))
            self.parts = int(options.get("partitions", SYNTH_PARTITIONS))
            self.seed = options.get("seed", SEED)

        def partitions(self):
            # contiguous doc_id ranges, remainder spread over the first
            # (rows % parts) partitions
            base, extra = divmod(self.rows, self.parts)
            bounds, start = [], 0
            for i in range(self.parts):
                end = start + base + (1 if i < extra else 0)
                bounds.append(InputPartition((start, end)))
                start = end
            return bounds

        def read(self, partition):
            start, end = partition.value
            for doc_id in range(start, end):
                yield synth_row(doc_id, self.seed)

    class SynthDocsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthdocs"

        def schema(self):
            return "doc_id bigint, text string, source string"

        def reader(self, schema):
            return SynthDocsReader(self.options)

    return SynthDocsDataSource


def register_synthdocs(spark: SparkSession) -> None:
    spark.dataSource.register(_make_datasource())


def read_synthdocs(
    spark: SparkSession,
    rows: int = SYNTH_ROWS,
    partitions: int = SYNTH_PARTITIONS,
) -> DataFrame:
    register_synthdocs(spark)
    return (
        spark.read.format("synthdocs")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


_VOCAB_SQL = "[" + ", ".join(f"'{t}'" for t in VOCAB) + "]"
_BYTE = "('0x' || substr(md5({expr}), 1, 2))::INT"


@query(
    "q126_python_datasource",
    oracle=f"""
WITH ids AS (SELECT unnest(range({SYNTH_ROWS})) AS doc_id),
g AS (
    SELECT doc_id,
           array_to_string(
               [{_VOCAB_SQL}[{_BYTE.format(expr=f"'{SEED}:' || doc_id || ':' || j")}
                             % {len(VOCAB)} + 1]
                FOR j IN range(5 + doc_id % 10)], ' ') AS text,
           'src' || ({_BYTE.format(expr=f"'{SEED}:' || doc_id")}
                     % {N_SOURCES})::VARCHAR           AS source
    FROM ids
)
SELECT doc_id, text, source FROM g ORDER BY doc_id
""",
)
def q126_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python data source and return its rows — a FULL
    value-hash check of the source protocol (the oracle re-derives the
    generator's md5 arithmetic in SQL), covering partition planning,
    executor-side generation, and option plumbing."""
    return read_synthdocs(spark).orderBy("doc_id")
