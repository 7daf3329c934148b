"""Invariant tests for the layout toolkit (operators/layout.py) and
corpus statistics (operators/corpus_stats.py) beyond their DuckDB
oracle checks: the properties that make the operators USEFUL (Z-bucket
locality, pruning asymmetry, sample determinism) rather than just
value-exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.corpus_stats import (
    q146_cross_doc_ngrams,
    q147_seeded_sample_per_group,
)
from batch_processing_new_spark.operators.layout import (
    _BUCKET_SHIFT,
    morton_key,
    q148_zorder_layout,
    q150_zone_map_stats,
)
from tests.conftest import SF_CORRECT, SF_SMOKE


# --------------------------------------------------------- Morton key

def test_morton_key_matches_bit_reference(spark):
    """Spot-check the interleave against a pure-Python bit reference."""

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (3, 200)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == ref(x, y), (x, y)


def test_zbuckets_are_locality_preserving(spark):
    """The reason to Z-order: EVERY bucket's x-range and y-range are
    simultaneously narrow. Top-6-bit buckets partition the 256x256
    grid into 32x32 tiles, so no bucket may span more than 32 in
    either dimension — a linear sort key would give one narrow and one
    full-width dimension."""
    rows = q148_zorder_layout(spark, SF_CORRECT).collect()
    assert len(rows) > 1
    # bits of x kept in the bucket id = (16 - shift) // 2; tile width
    # is the span of the dropped low bits: 256 >> kept = 32 for shift 10
    tile = 256 >> ((16 - _BUCKET_SHIFT) // 2)
    for r in rows:
        assert r.x_max - r.x_min < tile, r
        assert r.y_max - r.y_min < tile, r


# --------------------------------------------------------- zone maps

def test_zone_maps_prune_range_layout_only(spark):
    rows = q150_zone_map_stats(spark, SF_CORRECT).collect()
    hash_rows = [r for r in rows if r.layout == "hash"]
    range_rows = [r for r in rows if r.layout == "date_range"]
    # hash layout: every shard spans ~the whole table -> nothing prunes
    assert hash_rows and not any(r.prunable for r in hash_rows)
    # date layout: at least one month-shard falls entirely before the
    # predicate cutoff and prunes
    assert any(r.prunable for r in range_rows)
    # row conservation: both layouts cover the identical table
    assert sum(r.n_rows for r in hash_rows) == sum(
        r.n_rows for r in range_rows
    )


# ------------------------------------------------- cross-doc n-grams

def test_cross_doc_counts_are_distinct_doc_counts(spark, duck):
    """doc_count counts DOCUMENTS, not occurrences: it can never
    exceed the corpus size, and every reported gram's count matches a
    direct per-gram recount on the raw table."""
    out = q146_cross_doc_ngrams(spark, SF_CORRECT)
    rows = out.collect()
    assert rows, "fixtures contain duplicated docs; expected shared grams"
    n_docs = duck.sql("SELECT count(*) FROM documents").fetchone()[0]
    top = rows[0]
    assert all(r.doc_count <= n_docs for r in rows)
    # recount the top gram with an independent containment scan
    recount = duck.sql(
        "SELECT count(*) FROM documents "
        "WHERE contains(' ' || trim(text) || ' ', ' ' || ? || ' ')",
        params=[top.gram],
    ).fetchone()[0]
    assert recount >= top.doc_count  # containment may over-match, never under


# ------------------------------------------------------ seeded sample

def test_seeded_sample_is_partitioning_invariant(spark):
    """The sample must be a pure function of (seed, doc_id): computing
    it after an adversarial repartition of the input yields the
    identical (source, doc_id, rank) set."""
    base = {
        (r.source, r.doc_id, r.sample_rank)
        for r in q147_seeded_sample_per_group(spark, SF_CORRECT).collect()
    }
    from batch_processing_new_spark.operators import corpus_stats

    orig = corpus_stats.load_table

    def shuffled(sp, sf, name):
        df = orig(sp, sf, name)
        return df.repartition(7) if name == "documents" else df

    corpus_stats.load_table = shuffled
    try:
        again = {
            (r.source, r.doc_id, r.sample_rank)
            for r in q147_seeded_sample_per_group(spark, SF_CORRECT).collect()
        }
    finally:
        corpus_stats.load_table = orig
    assert base == again


def test_seeded_sample_k_per_group(spark):
    out = q147_seeded_sample_per_group(spark, SF_SMOKE)
    per = out.groupBy("source").count().collect()
    assert per
    for r in per:
        assert r["count"] <= 20


# ------------------------------------- source similarity + KS test

def test_vocab_jaccard_bounds_and_symmetric_pairs(spark):
    """Jaccard in (0, 1]; exactly one row per unordered source pair;
    n_common never exceeds either vocabulary."""
    from batch_processing_new_spark.operators.corpus_stats import (
        q161_source_vocab_jaccard,
    )

    rows = q161_source_vocab_jaccard(spark, SF_CORRECT).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert 0 < r.jaccard <= 1
        assert r.n_common <= min(r.vocab_a, r.vocab_b)


def test_ks_statistic_matches_scipy_style_reference(spark):
    """The D statistic must equal a direct two-sample KS computation
    over the collected values (numpy reference, no scipy needed)."""
    import numpy as np

    from batch_processing_new_spark.operators.corpus_stats import (
        q162_ks_statistic,
    )
    from batch_processing_new_spark.sources.readers import load_table

    [r] = q162_ks_statistic(spark, SF_CORRECT).collect()
    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("source", "n_chars")
        .collect()
    )
    a = np.sort([d.n_chars for d in docs if d.source == "src0"])
    b = np.sort([d.n_chars for d in docs if d.source == "src1"])
    grid = np.union1d(a, b)
    ca = np.searchsorted(a, grid, side="right") / len(a)
    cb = np.searchsorted(b, grid, side="right") / len(b)
    d_ref = np.abs(ca - cb).max()
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert abs(r.ks_d - round(float(d_ref), 6)) < 1e-9
