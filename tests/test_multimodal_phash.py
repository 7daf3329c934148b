"""Perceptual-hash operator invariants (multimodal.py pHash).

The fixture corpus has no true media dups, so correctness is pinned on
controlled payloads: distributed output equals the pure-numpy reference,
identical payloads collide at Hamming 0, a one-byte flip stays within a
few bits (locality — the point of pHash), and independent payloads land
near the 63/2 expectation (separation).
"""

from __future__ import annotations

import numpy as np

from batch_processing_new_spark.operators.multimodal import (
    PHASH_MAX_HAMMING,
    phash_bytes,
    phash_media,
    phash_neardup_pairs,
    with_media_payload,
)
from batch_processing_new_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _media_df(spark, payloads: dict[int, bytes]):
    rows = [
        (i, p, {"content_type": "image/fake", "declared_len": len(p), "origin": "t"})
        for i, p in payloads.items()
    ]
    return spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, "
        "media_meta struct<content_type:string, declared_len:int, origin:string>",
    )


def test_distributed_phash_equals_numpy_reference(spark):
    d = load_table(spark, SF_DIR, "documents").limit(50)
    media = with_media_payload(d)
    got = {r.doc_id: r.phash for r in phash_media(media).collect()}
    for r in d.select("doc_id", "text").collect():
        assert got[r.doc_id] == phash_bytes(r.text.encode("utf-8"))


def test_exact_duplicate_payloads_pair_at_zero(spark):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    other = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
    pairs = phash_neardup_pairs(
        _media_df(spark, {0: base, 1: base, 2: other})
    ).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} >= {(0, 1, 0)}


def test_one_byte_flip_is_local(spark):
    rng = np.random.default_rng(11)
    base = bytearray(rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
    flipped = bytearray(base)
    flipped[100] ^= 0xFF
    h0, h1 = phash_bytes(bytes(base)), phash_bytes(bytes(flipped))
    assert _hamming(h0, h1) <= PHASH_MAX_HAMMING


def test_independent_payloads_separate():
    rng = np.random.default_rng(13)
    hs = [
        phash_bytes(rng.integers(0, 256, 1500, dtype=np.uint8).tobytes())
        for _ in range(12)
    ]
    dists = [
        _hamming(a, b) for i, a in enumerate(hs) for b in hs[i + 1 :]
    ]
    assert min(dists) > PHASH_MAX_HAMMING
    assert 20 <= sorted(dists)[len(dists) // 2] <= 44


# ----------------------------------------- real-codec swap-in contract

def _trivial_real_decoder(payload: bytes):
    """Stand-in 'real codec': header-derived dims instead of byte
    arithmetic — shaped exactly like a PIL/ffmpeg wrapper would be."""
    n = len(payload)
    w = 16 + (payload[0] if n else 0)
    h = 16 + (payload[-1] if n else 0)
    return n, w, h, 1 + n // 1000


def test_real_decoder_swap_in(spark, monkeypatch):
    """decode_media(mode="real") must run any registered per-payload
    codec through the SAME mapInPandas plumbing (schema, Arrow
    batching, executor shipping) as the fake path — the deploy-time
    swap is one assignment, nothing else moves. The gate stays: with
    no codec registered, mode="real" raises."""
    import pytest

    from batch_processing_new_spark.operators import multimodal as mm

    media = _media_df(spark, {0: b"ab", 1: b"x" * 1500, 2: b""})

    with pytest.raises(NotImplementedError):
        mm.decode_media(media, mode="real").collect()

    monkeypatch.setattr(mm, "_REAL_DECODER", _trivial_real_decoder)
    real = mm.decode_media(media, mode="real")
    fake = mm.decode_media(media, mode="fake")
    assert real.schema == fake.schema  # the swap-in contract
    got = {r.doc_id: (r.n_bytes, r.width, r.height, r.n_frames)
           for r in real.collect()}
    assert got == {
        i: _trivial_real_decoder(p)
        for i, p in {0: b"ab", 1: b"x" * 1500, 2: b""}.items()
    }


def test_phash_values_match_sql_replay(spark):
    """q115's driver row compares EMPTY pair sets at fixture scale (no
    true media dups by design), so the value-level evidence lives
    here: every per-document 63-bit hash from the distributed numpy
    path must equal the DuckDB SQL replay of the int64-quantized DCT
    (the oracle's `ph` stage) — 500/500 at sf0.01-scale fixtures,
    exercised at sf0.001 for test speed."""
    import duckdb

    from batch_processing_new_spark.operators.multimodal import _phash_oracle

    d = load_table(spark, SF_DIR, "documents")
    sp = {r.doc_id: r.phash for r in phash_media(with_media_payload(d)).collect()}

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ph_sql = (
        _phash_oracle().split("chunks AS")[0].rstrip().rstrip(",")
        + " SELECT doc_id, phash FROM ph"
    )
    du = dict(con.sql(ph_sql).fetchall())
    assert sp and sp == du
