"""Distributed k-means over embedding columns (Lloyd's algorithm).

The semantic-clustering primitive behind SemDeDup-style curation
(Abbas et al. 2023) and IVF index building: cluster the corpus's
embedding column, then run per-cluster work (near-dup pruning, index
partitions, diversity sampling) inside bounded groups.

Scale shape, per iteration (one streaming pass over the corpus):

1. centroids (k x d floats, tiny) broadcast once via ``ray.put`` and
   read by every map task — never re-shipped per batch;
2. ``map_batches`` computes ONE partial row per (batch, cluster):
   member count + vector sum (a ``d``-float blob).  The wide exchange
   therefore moves ``n_blocks * k`` small rows, never the vectors;
3. ``groupby(cluster)`` sums the partials — k bounded groups;
4. the driver reduces k rows into the next centroid set (k x d floats).

Nothing corpus-sized ever lands on the driver; the embedding table
streams through each pass.  Iterations re-execute the input dataset's
lineage — pass a parquet/Lance-backed Dataset (reads are the cheap
part) or ``materialize()`` a small one before calling.

Determinism: seeded md5-rank init (the engine-wide convention, cf.
``ops/textstats.py`` train/val split), first-max argmax assignment,
fixed iteration count or early exit on centroid convergence — the
distributed fit equals a single-process numpy reference to float
tolerance (pinned by ``tests/test_clustering.py``).

Reference analog: none (the reference fetches one URL at a time);
this family belongs to the 100-TB curation surface the north rule
adds on top of reference parity.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .similarity import _normalize, _to_matrix


def _md5_rank(ids: np.ndarray, seed: int) -> np.ndarray:
    """Stable pseudo-random rank per id (hex md5 of ``seed:id``)."""
    return np.asarray(
        [hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids], dtype=object
    )


def init_centroids(
    ds: "ray.data.Dataset",
    n_clusters: int,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spread init: the k vectors with the smallest
    ``md5(seed:id)`` rank.  Per-batch local bottom-k, then a driver
    reduce over ``n_blocks * k`` candidates — no shuffle, no sort."""

    def local_bottom_k(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        ranks = _md5_rank(ids, seed)
        order = np.lexsort((ids, ranks))[:n_clusters]
        mat = _to_matrix(batch[vec_col])[order]
        return pa.table(
            {
                "rank": pa.array(ranks[order].tolist(), type=pa.string()),
                "vec": pa.array([v.tobytes() for v in mat], type=pa.binary()),
            }
        )

    cand = ds.map_batches(local_bottom_k, batch_format="pyarrow", batch_size=8192).take_all()
    cand.sort(key=lambda r: r["rank"])
    mat = np.asarray(
        [np.frombuffer(r["vec"], dtype=np.float64) for r in cand[:n_clusters]]
    )
    return _normalize(mat)


def kmeans_fit(
    ds: "ray.data.Dataset",
    n_clusters: int,
    n_iters: int = 8,
    tol: float = 1e-6,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Spherical k-means fit; returns the (k x d) unit centroid matrix.

    Cosine metric (vectors and centroids unit-normalized — embedding
    columns are similarity spaces); empty clusters keep their previous
    centroid.  Early exit when every centroid moves less than ``tol``.
    """
    centroids = init_centroids(ds, n_clusters, seed, id_col, vec_col) if init is None else init
    k, d = centroids.shape

    for _ in range(n_iters):
        ref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            mat = _normalize(_to_matrix(batch[vec_col]))
            assign = (mat @ cents.T).argmax(axis=1)
            rows = []
            for c in np.unique(assign):
                members = mat[assign == c]
                rows.append(
                    {
                        "cluster": int(c),
                        "n": int(len(members)),
                        "vec_sum": members.sum(axis=0).tobytes(),
                    }
                )
            return pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [("cluster", pa.int64()), ("n", pa.int64()), ("vec_sum", pa.binary())]
                ),
            )

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            vs = np.stack([np.frombuffer(b, dtype=np.float64) for b in group["vec_sum"]])
            return pd.DataFrame(
                {
                    "cluster": [int(group["cluster"].iloc[0])],
                    "n": [int(group["n"].sum())],
                    "vec_sum": [vs.sum(axis=0).tobytes()],
                }
            )

        reduced = (
            ds.map_batches(partials, batch_format="pyarrow", batch_size=8192)
            .groupby("cluster")
            .map_groups(combine, batch_format="pandas")
            .take_all()
        )

        new = centroids.copy()
        for r in reduced:
            if r["n"] > 0:
                v = np.frombuffer(r["vec_sum"], dtype=np.float64)
                norm = np.linalg.norm(v)
                if norm > 0:
                    new[r["cluster"]] = v / norm
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Streaming assignment: (id, cluster, sim_x1m) per vector, with
    the cosine similarity integer-scaled (x1e6, half-away rounding)
    so downstream comparisons are engine-stable."""
    ref = ray.put(np.ascontiguousarray(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        mat = _normalize(_to_matrix(batch[vec_col]))
        sims = mat @ cents.T
        best = sims.argmax(axis=1)
        best_sim = sims[np.arange(len(mat)), best]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(best, type=pa.int64()),
                # half-AWAY-from-zero, as documented (SQL round()
                # semantics): floor(x + 0.5) is half-UP, which disagrees
                # by 1 on negative-cosine .5 boundaries
                "sim_x1m": pa.array(
                    (
                        np.sign(best_sim)
                        * np.floor(np.abs(best_sim * 1_000_000) + 0.5)
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)


def kmeans_fit_reference(
    ids: np.ndarray,
    mat: np.ndarray,
    n_clusters: int,
    n_iters: int = 8,
    tol: float = 1e-6,
    seed: int = 13,
) -> np.ndarray:
    """Single-process numpy reference of the EXACT same algorithm (same
    init ranks, assignment, empty-cluster and convergence rules) — the
    parity oracle for the distributed fit."""
    ranks = _md5_rank(np.asarray(ids), seed)
    order = np.lexsort((np.asarray(ids), ranks))[:n_clusters]
    mat = _normalize(np.asarray(mat, dtype=np.float64))
    centroids = mat[order].copy()
    for _ in range(n_iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        new = centroids.copy()
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    new[c] = v / norm
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return centroids
