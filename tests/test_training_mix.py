"""Invariants for the training-corpus assembly operators.

q95/q97/q98 are oracle-checked by the driver; the tests here cover the
non-SQL-expressible packing operator (q96) and the cross-query
properties SQL can't state (determinism under repartitioning,
split-proportion exactness).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_new_spark.operators.training_mix import (
    PACK_CAPACITY,
    PACK_SHARDS,
    SPLIT_FRAC,
    pack_sequences,
    q97_stratified_split,
)
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT


def _docs(spark):
    return load_table(spark, SF_CORRECT, "documents")


def test_pack_every_doc_exactly_once(spark):
    d = _docs(spark)
    packed = pack_sequences(d)
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_pack_bins_respect_capacity(spark):
    packed = pack_sequences(_docs(spark))
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.sum("tok_count").alias("total"), F.count("*").alias("n_docs")
    )
    # a bin may exceed capacity only when it holds a single oversized doc
    over = per_bin.where(
        (F.col("total") > PACK_CAPACITY) & (F.col("n_docs") > 1)
    ).count()
    assert over == 0


def test_pack_nextfit_waste_bound(spark):
    """Next-fit uses < 2x the optimal bin count: every pair of adjacent
    bins holds > capacity tokens combined, so bins <= 2*ceil(total/cap)
    per shard (+1 for the trailing partial bin)."""
    packed = pack_sequences(_docs(spark))
    stats = (
        packed.groupBy("shard")
        .agg(
            F.sum("tok_count").alias("total"),
            (F.max("bin_id") + 1).alias("bins"),
        )
        .collect()
    )
    assert len(stats) == PACK_SHARDS
    for r in stats:
        assert r.bins <= 2 * math.ceil(r.total / PACK_CAPACITY) + 1, dict(
            r.asDict()
        )


def test_pack_deterministic_under_repartition(spark):
    d = _docs(spark)
    a = {tuple(r) for r in pack_sequences(d).collect()}
    b = {tuple(r) for r in pack_sequences(d.repartition(13)).collect()}
    assert a == b


def test_stratified_split_exact_proportions(spark):
    out = q97_stratified_split(spark, SF_CORRECT)
    got = (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("split") == "validation", 1).otherwise(0)
            ).alias("v"),
        )
        .collect()
    )
    assert got
    for r in got:
        assert r.v == math.ceil(r.n * SPLIT_FRAC), dict(r.asDict())


def test_compression_ratio_matches_local_zlib(spark):
    """The Spark column is a pure function of the text: recompute with
    local zlib and assert exact equality for every document."""
    import zlib

    from batch_processing_new_spark.operators.text_analysis import (
        compression_ratio,
    )

    d = _docs(spark)
    got = {r.doc_id: r for r in compression_ratio(d).collect()}
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        r = got[doc_id]
        assert (r.raw_len, r.compressed_len) == (len(raw), comp), doc_id
        # raw quotient (not rounded): the q100 oracle relies on both
        # engines producing the identical IEEE double bits
        assert r.ratio == comp / len(raw), doc_id


def test_zlib_lookup_covers_all_fixture_texts(tmp_path):
    """Every text any harness can feed q100's oracle must be in the
    materialized lookup (fixtures/zlib_len_lookup.parquet) with the
    correct zlib length — a missing text would drop its JOIN row and
    flip the driver red. The universe is derived TWO ways so the test
    is not circular with the builder: (a) the builder's own
    fixture_texts(), which catches a stale parquet, and (b) the texts
    ACTUALLY present in freshly-built poison and degenerate fixture
    dirs plus the raw SF dirs — which catches a hostile mode adding
    document texts the builder's universe definition missed."""
    import glob
    import hashlib
    import os
    import zlib

    import duckdb

    from tests.conftest import load_tool

    _lut_mod = load_tool("build_zlib_lookup")
    OUT, fixture_texts = _lut_mod.OUT, _lut_mod.fixture_texts
    build_degenerate_dir = load_tool("degenerate_sweep").build_degenerate_dir
    build_poisoned_dir = load_tool("poison_sweep").build_poisoned_dir

    con = duckdb.connect()
    lut = dict(
        con.sql(
            f"SELECT text_md5, compressed_len FROM read_parquet('{OUT}')"
        ).fetchall()
    )

    texts = fixture_texts()
    assert texts, "fixture text universe is empty"

    # (b) independent re-derivation from the fixture builders' OUTPUT
    # — scan the same root the lookup builder scans (ADVICE r05)
    testdata = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    doc_paths = glob.glob(os.path.join(testdata, "sf*", "documents.parquet"))
    for builder, sub in [
        (build_poisoned_dir, "poison"),
        (lambda d: build_degenerate_dir(d, "single"), "single"),
        (lambda d: build_degenerate_dir(d, "constant"), "constant"),
    ]:
        d = tmp_path / sub
        d.mkdir()
        builder(os.fspath(d))
        doc_paths.append(os.fspath(d / "documents.parquet"))
    observed: set[str] = set()
    for p in doc_paths:
        for (t,) in con.sql(
            f"SELECT DISTINCT text FROM read_parquet('{p}') "
            "WHERE text IS NOT NULL AND length(text) > 0"
        ).fetchall():
            observed.add(t)
    missed = observed - texts
    assert not missed, (
        f"builder universe misses {len(missed)} fixture text(s): "
        f"{sorted(t[:60] for t in missed)[:3]!r} — update "
        "tools/build_zlib_lookup.py::fixture_texts and rebuild"
    )

    for t in texts | observed:
        b = t.encode("utf-8")
        md5 = hashlib.md5(b).hexdigest()
        assert md5 in lut, f"lookup missing text: {t[:60]!r}"
        assert lut[md5] == len(zlib.compress(b, 6)), t[:60]


def test_zlib_build_canary():
    """q100's oracle replays zlib lengths baked by THIS environment's
    zlib; a different zlib build (zlib-ng, changed level-6 deflate
    heuristics) would change lengths and flip q100 red with no code
    bug. Pin the observable behavior so environment drift fails HERE
    first, with a named cause — the rule-20 canary pattern."""
    import zlib

    # pinned on the image's zlib (ZLIB_RUNTIME_VERSION 1.2.13): if any
    # assert fires, rebuild fixtures/zlib_len_lookup.parquet and check
    # whether the driver shares the new runtime before re-running q100
    assert len(zlib.compress(b"", 6)) == 8
    assert len(zlib.compress(b"the quick brown fox jumps over the lazy dog", 6)) == 50
    assert len(zlib.compress(b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 16, 6)) == 14


# ---------------------------------------- next-fit property tests

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_new_spark.operators.training_mix import nextfit_bins


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=1000), max_size=200),
    capacity=st.integers(min_value=1, max_value=600),
)
def test_nextfit_invariants(sizes, capacity):
    bins = nextfit_bins(sizes, capacity)
    assert len(bins) == len(sizes)
    if not sizes:
        return
    # bin ids start at 0, are nondecreasing, and step by at most 1
    assert bins[0] == 0
    for a, b in zip(bins, bins[1:]):
        assert a <= b <= a + 1
    # capacity respected except single-oversized-item bins
    totals: dict[int, int] = {}
    counts: dict[int, int] = {}
    for s, b in zip(sizes, bins):
        totals[b] = totals.get(b, 0) + s
        counts[b] = counts.get(b, 0) + 1
    for b, t in totals.items():
        assert t <= capacity or counts[b] == 1
    # next-fit guarantee: any two ADJACENT bins overflow one bin, so
    # bin count < 2 * optimal + 1 (optimal >= ceil(total/capacity))
    n_bins = max(bins) + 1
    for b in range(n_bins - 1):
        assert totals[b] + totals[b + 1] > capacity


def test_corpus_pipeline_funnel_invariants(spark):
    """The composed assembly must behave like its parts: monotone
    funnel, train/validation partition the capped set, packing covers
    the train split exactly, caps respected."""
    from batch_processing_new_spark.operators.training_mix import DOMAIN_CAP
    from batch_processing_new_spark.plans.corpus_pipeline import assemble_corpus
    from tests.conftest import SF_CORRECT

    st = assemble_corpus(spark, SF_CORRECT)
    n = {k: st[k].count() for k in ("input", "quality", "deduped", "clean", "capped", "train", "validation", "packed")}
    assert n["input"] >= n["quality"] >= n["deduped"] >= n["clean"] >= n["capped"]
    assert n["capped"] > 0
    assert n["train"] + n["validation"] == n["capped"]
    assert n["packed"] == n["train"]
    # packing covers exactly the train doc_ids
    train_ids = {r.doc_id for r in st["train"].select("doc_id").collect()}
    packed_ids = {r.doc_id for r in st["packed"].select("doc_id").collect()}
    assert packed_ids == train_ids
    # per-source cap holds on the capped stage
    from pyspark.sql import functions as F

    over = (
        st["capped"].groupBy("source").count().where(F.col("count") > DOMAIN_CAP)
    ).count()
    assert over == 0
