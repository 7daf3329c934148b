"""Invariants for clustering.py: Lloyd k-means matches a Spark-free
numpy reimplementation, and SemDeDup survivors are pairwise-dissimilar.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from batch_processing_new_spark.operators.clustering import (
    K_CLUSTERS,
    KM_ITERS,
    SEM_THRESHOLD,
    lloyd_kmeans,
)
from batch_processing_new_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _numpy_lloyd(V: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Reference Lloyd with the engine's exact rounding discipline:
    d2 rounded to 9 with ties on cluster id, means rounded to 6,
    empty clusters keep their centroid."""
    C = V[:k].copy()

    def assign(C):
        d2 = np.round(
            np.stack([((V - C[i]) ** 2).sum(axis=1) for i in range(k)], axis=1),
            9,
        )
        order = np.lexsort(
            (np.broadcast_to(np.arange(k), d2.shape), d2), axis=1
        )
        return order[:, 0]

    for _ in range(iters):
        a = assign(C)
        for i in range(k):
            members = V[a == i]
            if len(members):
                C[i] = np.round(members.mean(axis=0), 6)
    return assign(C)


@pytest.fixture(scope="module")
def vectors() -> np.ndarray:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id")
    return np.vstack(df["embedding"].to_numpy()).astype(np.float64)


def test_kmeans_matches_numpy_reference(spark, vectors):
    got = {
        r.vec_id: r.cluster
        for r in lloyd_kmeans(load_table(spark, SF_DIR, "embeddings")).collect()
    }
    want = _numpy_lloyd(vectors, K_CLUSTERS, KM_ITERS)
    assert len(got) == len(vectors)
    mismatch = [i for i in range(len(want)) if got[i] != want[i]]
    assert not mismatch, f"assignment differs at vec_ids {mismatch[:10]}"


def test_kmeans_d2_is_true_squared_distance(spark, vectors):
    rows = lloyd_kmeans(load_table(spark, SF_DIR, "embeddings")).collect()
    # d2 must be the actual squared distance to SOME centroid-like point:
    # check it is at most the distance to the vector's seed-initialized
    # worst case and non-negative (cheap sanity; exact value is
    # oracle-checked in q113)
    assert all(r.d2 >= 0.0 for r in rows)


def test_semantic_dedup_survivors_pairwise_dissimilar(spark, vectors):
    from batch_processing_new_spark.registry import all_specs

    surv = all_specs()["q114_semantic_dedup"].fn(spark, SF_DIR).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in surv:
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    norms = np.linalg.norm(vectors, axis=1)
    for ids in by_cluster.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cos = round(
                    float(vectors[a] @ vectors[b]) / (norms[a] * norms[b]), 6
                )
                assert cos < SEM_THRESHOLD, (a, b, cos)


def test_semantic_dedup_keeps_cluster_minimum(spark):
    from batch_processing_new_spark.registry import all_specs

    e = load_table(spark, SF_DIR, "embeddings")
    assign = {r.vec_id: r.cluster for r in lloyd_kmeans(e).collect()}
    surv = all_specs()["q114_semantic_dedup"].fn(spark, SF_DIR).collect()
    surv_ids = {r.vec_id for r in surv}
    for c in set(assign.values()):
        members = [v for v, cl in assign.items() if cl == c]
        assert min(members) in surv_ids


# --------------------------------------------- covariance matrix

def test_covariance_matrix_is_psd(spark):
    """The reconstructed 64x64 covariance matrix must be symmetric
    positive semi-definite (any true covariance is): all eigenvalues
    >= -1e-6 after the round-to-6dp, and diagonal entries positive."""
    import numpy as np

    from batch_processing_new_spark.operators.clustering import (
        _COV_DIM,
        q160_embedding_covariance,
    )
    from tests.conftest import SF_CORRECT

    rows = q160_embedding_covariance(spark, SF_CORRECT).collect()
    m = np.zeros((_COV_DIM, _COV_DIM))
    for r in rows:
        m[r.i, r.j] = r.cov
        m[r.j, r.i] = r.cov
    assert (np.diag(m) > 0).all()
    eig = np.linalg.eigvalsh(m)
    assert eig.min() > -1e-6, eig.min()


def test_covariance_matches_numpy(spark):
    """Spot-check a handful of cells against numpy's covariance of the
    collected embedding matrix (population covariance, ddof=0)."""
    import numpy as np

    from batch_processing_new_spark.operators.clustering import (
        q160_embedding_covariance,
    )
    from batch_processing_new_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    x = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    ref = np.cov(x, rowvar=False, ddof=0)
    got = {
        (r.i, r.j): r.cov
        for r in q160_embedding_covariance(spark, SF_SMOKE).collect()
    }
    for i, j in [(0, 0), (0, 1), (5, 9), (31, 63), (63, 63)]:
        assert abs(got[(i, j)] - ref[i, j]) < 5e-6, (i, j)
