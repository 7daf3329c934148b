"""Recall invariants for approximate similarity search
(SURVEY.md §5.3: LSH top-k recall vs the exact-cosine baseline)."""

from __future__ import annotations

from batch_processing_new_spark.operators.similarity import ann_lsh_topk
from batch_processing_new_spark.registry import all_specs
from batch_processing_new_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT


def test_ann_recall_vs_exact(spark):
    """Sign-LSH top-10 must recover >= 60% of the exact top-10 per query
    on average (weak clusters in the fixture make this a real bar: the
    random-candidate baseline is ~ k/n = 2%)."""
    exact = all_specs()["q40_cosine_topk"].fn(spark, SF_CORRECT).collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    e = load_table(spark, SF_CORRECT, "embeddings")
    approx = ann_lsh_topk(e).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    # multiprobe=1 default: sweep-measured 0.975 at sf0.01 (TUNING.md)
    assert mean_recall >= 0.9, f"ANN mean recall {mean_recall:.2f} ({recalls})"


def test_ann_scores_match_exact_for_common_neighbors(spark):
    """Where ANN and exact agree on a neighbor, the cosine must be
    identical (the ANN verify step computes the same exact cosine)."""
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in all_specs()["q40_cosine_topk"].fn(spark, SF_CORRECT).collect()
    }
    e = load_table(spark, SF_CORRECT, "embeddings")
    for r in ann_lsh_topk(e).collect():
        if (r.query_id, r.neighbor_id) in exact:
            assert r.cos_sim == exact[(r.query_id, r.neighbor_id)]


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=4 of 16 cells must recover >= 60% of the exact
    top-10 on average (random-candidate baseline ~2%); common neighbors
    must carry identical exact-cosine scores."""
    from batch_processing_new_spark.operators.similarity import ann_ivf_topk

    exact_rows = all_specs()["q40_cosine_topk"].fn(spark, SF_CORRECT).collect()
    truth: dict[int, set[int]] = {}
    scores: dict[tuple[int, int], float] = {}
    for r in exact_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        scores[(r.query_id, r.neighbor_id)] = r.cos_sim

    e = load_table(spark, SF_CORRECT, "embeddings")
    approx = ann_ivf_topk(e).collect()
    got: dict[int, set[int]] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
        if (r.query_id, r.neighbor_id) in scores:
            assert r.cos_sim == scores[(r.query_id, r.neighbor_id)]

    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"IVF mean recall {mean_recall:.2f} ({recalls})"


def test_ivf_returns_k_rows_per_query(spark):
    from batch_processing_new_spark.operators.similarity import ann_ivf_topk

    e = load_table(spark, SF_CORRECT, "embeddings")
    per_q: dict[int, int] = {}
    for r in ann_ivf_topk(e).collect():
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q) == set(range(5))
    assert all(v == 10 for v in per_q.values()), per_q


def test_signature_np_matches_expression_version(spark):
    """The Arrow-vectorized sign-LSH signature must reproduce the
    Catalyst expression version bit for bit over the full fixture —
    q42's full value-hash oracle rests on the numpy matmul agreeing
    with the sequential fold at every >=0 knife-edge, so the parity is
    asserted, not assumed. Also pins a wide-signature case (n_planes >
    31) where an int32 kernel would wrap bit 31 into the sign."""
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.similarity import (
        _f64,
        _hyperplanes,
        _signature,
        _signature_np,
    )
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    e = load_table(spark, SF_CORRECT, "embeddings")
    for n_planes in (12, 33):
        planes = _hyperplanes(n_planes)
        both = e.select(
            "vec_id",
            _signature(_f64("embedding"), planes).alias("expr"),
            _signature_np(planes)("embedding").alias("np"),
        )
        bad = both.where(
            F.col("expr").cast("long") != F.col("np")
        ).count()
        assert bad == 0, f"signature divergence at n_planes={n_planes}"
        if n_planes == 33:
            # a wrapped int32 kernel would emit negatives here
            neg = both.where(F.col("np") < 0).count()
            assert neg == 0


def test_nearest_cells_np_matches_expression_version(spark):
    """The Arrow-vectorized IVF assignment must reproduce the Catalyst
    expression version exactly (distance rounding and cid tiebreak)."""
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.similarity import (
        _f64,
        _nearest_cells,
        _nearest_cells_np,
        train_ivf_centroids,
    )
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_CORRECT

    e = load_table(spark, SF_CORRECT, "embeddings")
    cents = train_ivf_centroids(e, 16)
    both = e.select(
        "vec_id",
        _nearest_cells(_f64("embedding"), cents, 4).alias("expr"),
        _nearest_cells_np(cents, 4)("embedding").alias("np"),
    )
    bad = both.where(F.col("expr") != F.col("np")).count()
    assert bad == 0


def test_const_matrix_literal_bits(spark):
    """_const_vector/_const_matrix (one-py4j-call F.expr literals) must
    be BIT-identical to the element-wise F.lit construction they
    replaced: repr() round-trips every finite double and the D suffix
    pins the SQL type, so the Literal values — including trained IVF
    centroid means and md5-derived hyperplane coords — may not differ
    in a single ulp."""
    from pyspark.sql import functions as F

    from batch_processing_new_spark.operators.similarity import (
        _const_matrix,
        _const_vector,
        _hyperplanes,
        train_ivf_centroids,
    )
    from batch_processing_new_spark.sources.readers import load_vectors
    from tests.conftest import SF_CORRECT

    mats = [
        _hyperplanes(12),
        train_ivf_centroids(load_vectors(spark, SF_CORRECT), exact_fold=True),
        [[0.1, -0.0, 1e-308, 2.5e17, -3.123456789012345e-5]],
    ]
    for mat in mats:
        row = spark.range(1).select(
            _const_matrix(mat).alias("m"),
            F.array(
                *[F.array(*[F.lit(float(x)) for x in r]) for r in mat]
            ).alias("ref"),
        ).collect()[0]
        got = [[v.hex() for v in r] for r in row.m]
        want = [[v.hex() for v in r] for r in row.ref]
        assert got == want
        vec = spark.range(1).select(
            _const_vector([float(x) for x in mat[0]]).alias("v")
        ).collect()[0].v
        assert [v.hex() for v in vec] == want[0]
