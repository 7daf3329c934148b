"""Property-based tests (hypothesis) for the pure expression kernels
added in round 2: Morton interleave and overlapping chunk math.

These kernels are Python-generated JVM expression TREES, so a bug is a
bug in the generator — randomized inputs through the real Spark
expressions, checked against independent Python references, cover the
generator's whole input space rather than a fixture's corner of it.
Batched: hypothesis drives case GENERATION, one Spark job evaluates
all cases per test (per-example Spark jobs would be minutes, not
seconds)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_processing_new_spark.operators.layout import morton_key
from batch_processing_new_spark.operators.text_analysis import (
    CHUNK_S,
    CHUNK_W,
)


def _ref_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_morton_matches_reference_on_random_points(spark, pts):
    df = spark.createDataFrame(pts, "x int, y int")
    got = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == _ref_morton(r.x, r.y), (r.x, r.y)


def test_morton_is_bijective_on_full_grid(spark):
    """All 256x256 cells map to 65536 DISTINCT keys in [0, 2^16) —
    interleaving is a bijection, so no two (x, y) cells ever share a
    Z-key (what makes sortBy(zkey) a total layout order)."""
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )
    keys = df.select(morton_key(F.col("x"), F.col("y")).alias("z"))
    stats = keys.agg(
        F.countDistinct("z").alias("d"),
        F.min("z").alias("lo"),
        F.max("z").alias("hi"),
    ).collect()[0]
    assert (stats.d, stats.lo, stats.hi) == (65536, 0, 65535)


def _ref_chunks(tokens: list[str], w: int = CHUNK_W, s: int = CHUNK_S):
    n_chunks = max(0, -(-max(len(tokens) - w, 0) // s)) + 1
    out = []
    for i in range(n_chunks):
        piece = tokens[i * s : i * s + w]
        out.append((i, i * s, len(piece), " ".join(piece)))
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=200),  # token counts per doc
        min_size=1,
        max_size=8,
    )
)
def test_chunk_math_matches_reference_on_random_lengths(spark, lengths):
    """Drive the q152 chunk expressions over synthetic docs of random
    token counts (including < W and exact-boundary lengths) and check
    ids/starts/sizes/text against a Python reference."""
    from batch_processing_new_spark.functions.text_funcs import tokens as tok

    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toked = df.select("doc_id", tok(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n_chunks = (
        F.ceil(F.greatest(F.size(toks) - CHUNK_W, F.lit(0)) / CHUNK_S) + 1
    ).cast("long")
    ids = toked.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * CHUNK_S
    piece = F.slice(F.col("toks"), start + 1, CHUNK_W)
    got = ids.select(
        "doc_id",
        "chunk_id",
        start.alias("chunk_start"),
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, r.n_tokens, r.chunk_text)
        )
    for i, n in enumerate(lengths):
        expect = _ref_chunks(docs[i][1].split(" "))
        assert sorted(by_doc[i]) == expect, f"doc len {n}"
