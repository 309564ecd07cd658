"""Distributed k-means: parity with the single-process numpy reference
implementation of the identical algorithm, plus assignment semantics."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.clustering import (
    init_centroids,
    kmeans_assign,
    kmeans_fit,
    kmeans_fit_reference,
)
from fetch_engines_ray.ops.similarity import _normalize


def _blob_table(seed=7, n_per=100, d=8, centers=3):
    rng = np.random.RandomState(seed)
    base = _normalize(rng.randn(centers, d))
    vecs, ids = [], []
    for c in range(centers):
        pts = base[c] + 0.05 * rng.randn(n_per, d)
        vecs.extend(pts.tolist())
        ids.extend(range(c * n_per, (c + 1) * n_per))
    return (
        pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array(vecs, type=pa.list_(pa.float64()))}),
        np.asarray(ids),
        np.asarray(vecs),
    )


@pytest.fixture(scope="module")
def blobs(ray_session):
    tbl, ids, mat = _blob_table()
    # several blocks so the distributed reduce actually crosses batches
    return ray.data.from_arrow(tbl).repartition(6), ids, mat


def test_kmeans_matches_numpy_reference(blobs):
    ds, ids, mat = blobs
    got = kmeans_fit(ds, n_clusters=3, n_iters=8, seed=13)
    want = kmeans_fit_reference(ids, mat, n_clusters=3, n_iters=8, seed=13)
    assert got.shape == want.shape == (3, 8)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # unit centroids (spherical k-means)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-12)


def test_kmeans_init_is_md5_rank_deterministic(blobs):
    ds, ids, mat = blobs
    a = init_centroids(ds, n_clusters=4, seed=13)
    b = init_centroids(ds.repartition(11), n_clusters=4, seed=13)
    np.testing.assert_array_equal(a, b)  # partitioning-invariant
    c = init_centroids(ds, n_clusters=4, seed=14)
    assert not np.array_equal(a, c)  # seed actually selects


def test_kmeans_assign_separates_blobs(blobs):
    ds, ids, mat = blobs
    cents = kmeans_fit(ds, n_clusters=3, n_iters=8, seed=13)
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert len(out) == len(ids)
    # every ground-truth blob lands in exactly one fitted cluster
    blob = out["vec_id"].to_numpy() // 100
    for b in range(3):
        assert out["cluster"][blob == b].nunique() == 1
    assert out["cluster"].nunique() == 3
    # tight blobs: similarity to own centroid is high, integer-scaled
    assert out["sim_x1m"].dtype == np.int64
    assert out["sim_x1m"].min() > 900_000


def test_kmeans_empty_cluster_keeps_previous_centroid(blobs):
    ds, ids, mat = blobs
    # an init centroid orthogonal to every (positive-quadrant-ish) blob
    # mean direction never wins argmax for tight blobs around 3 centers:
    # force it by handing 4 centroids where one is the negation of a blob
    ref = kmeans_fit_reference(ids, mat, n_clusters=3, n_iters=8, seed=13)
    lonely = -ref[0]
    init = np.vstack([ref, lonely])
    got = kmeans_fit(ds, n_clusters=4, n_iters=2, seed=13, init=init.copy())
    np.testing.assert_allclose(got[3], lonely, atol=1e-12)
