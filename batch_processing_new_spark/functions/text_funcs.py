"""Shared text/hash expression builders (JVM-side, codegen'd).

The engine's portable 60-bit hash: first 15 hex chars of md5, parsed as
an integer. Chosen because (a) md5 exists in both Spark and DuckDB 1.0
(sha1/xxhash64 don't), (b) 60 bits fits a signed BIGINT in both, so
MinHash/SimHash get exact SQL oracles. Collision odds at 60 bits are
irrelevant for dedup fingerprints at any realistic corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def salted_hash60(salt: str, col: Column) -> Column:
    """Portable seeded hash of ``"{salt}:" || value`` — the ONE recipe
    behind every deterministic sampling gate, split, shard, and cap
    ranking (q61/q89/q97/q98/q105/q112/q147/q163/q190 + the composed
    pipeline). Centralized so a pipeline stage re-stating an operator's
    salt cannot drift from the operator it claims to replicate."""
    return hash60(F.concat(F.lit(salt + ":"), col.cast("string")))


def salted_hash60_sql(salt: str, expr: str) -> str:
    """The identical salted hash in DuckDB SQL."""
    return hash60_sql(f"'{salt}:' || {expr}")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.trim(col), " ")


def tokens_spark_sql(expr: str) -> str:
    """Spark-SQL twin of :func:`tokens` — the same expression as ONE
    parsed string. Hot constructors use this because every Column-
    algebra call is a py4j round trip plus an eager re-analysis
    (measured round 12: ~1-6 ms per call on the bench driver), while a
    parsed string costs one. Parity with the Column form is asserted in
    tests/test_r12_parity.py."""
    return f"split(trim({expr}), ' ')"


def shingles_of_spark_sql(arr_expr: str, n: int = 3) -> str:
    """Spark-SQL twin of :func:`shingles_of` (same tree, one parse).

    ``arr_expr`` must be a simple column reference: an embedded
    expression would be re-evaluated per element inside the lambda
    (the shingles_of docstring's O(len^2) trap)."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size({arr_expr}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice({arr_expr}, i, {n}))))"
    )


_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column) -> Column:
    """ASCII-only case fold — the PORTABLE normalization for content
    fingerprints. Full `lower()` is engine-specific off the ASCII
    plane (Java's full case mapping turns U+0130 'İ' into "i" + a
    combining dot; DuckDB's utf8proc simple mapping yields plain "i"),
    so an md5 over `lower(text)` silently splits engines on real-world
    unicode. translate() is byte-identical on both engines and leaves
    non-ASCII untouched."""
    return F.translate(col, _ASCII_UPPER, _ASCII_LOWER)


def ascii_lower_sql(expr: str) -> str:
    """The identical ASCII fold in DuckDB SQL."""
    return f"translate({expr}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse runs of whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def token_set_fingerprint(col: Column) -> Column:
    """md5 of the sorted distinct-token set — the exact-dedup key.

    Two documents that are permutations/repetitions of the same word set
    share a fingerprint; byte-identical texts trivially do.

    NULL text fingerprints to NULL, matching ``TOKEN_SET_FP_SQL``
    (DuckDB's md5(NULL) is NULL): ``concat_ws`` SKIPS a NULL array, so
    the unguarded expression silently fingerprinted NULL text as
    md5('') — colliding every NULL-text doc with every empty-text doc
    and splitting from the oracle (caught by tools/null_text_sweep.py).
    """
    return F.when(
        col.isNotNull(),
        F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(col)))),
    )


TOKEN_SET_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' '))"
)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (word n-grams).

    MinHash/LSH must hash shingles, not unigrams: over a small
    vocabulary the per-hash min of unigram hashes concentrates on a few
    globally-minimal tokens, making every document's signature nearly
    identical (measured: one LSH band bucket held 78% of the corpus).
    The shingle space is |V|^n, so minima are document-specific again.
    """
    return shingles_of(tokens(col), n)


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct n-grams over an ALREADY-TOKENIZED array column.

    Callers on the hot path should project the token array into a
    column first (``.select(tokens(col).alias("_toks"))``) and pass
    ``F.col("_toks")``: an expression inside a higher-order-function
    lambda is re-evaluated per element, so embedding the ``split`` in
    the lambda re-tokenizes the document once per shingle — O(len²)
    per doc (measured 2.7x on the corpus scan).
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
