"""SemDeDup: semantic deduplication over an embedding column.

Public-knowledge basis: Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" (2023) — cluster
embeddings with k-means, find pairs above a cosine threshold WITHIN each
cluster, and keep one representative per duplicate group (the paper
keeps the member with the LOWEST cosine similarity to the cluster
centroid, i.e. the "hardest" example).  The reference engine has no
embedding surface; this family belongs to the training-data tier
(SURVEY.md §2.8).

Ray-Data shape (identical scale posture to
:func:`fetch_engines_ray.ops.similarity.embedding_near_dup_pairs`):

- centroids from a bounded sample, broadcast once (``ray.put``);
- one ``groupby(cluster).map_groups`` pass — no all-to-all beyond the
  single cluster shuffle; ``n_clusters`` ~ sqrt(N) keeps expected
  cluster population sqrt(N);
- inside a cluster the O(n^2) similarity step is bounded by
  ``max_group_size`` via recursive seeded projection splits
  (duplicate-group resolution is exact within a leaf; near-threshold
  pairs straddling a split can be missed with the same documented small
  probability as the top-level cluster bucketing);
- output is a streaming Dataset of every input id with a
  ``semdedup_keep`` flag — nothing corpus-sized lands on the driver.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from fetch_engines_ray.ops.similarity import (
    _bounded_cluster_pairs,
    _normalize,
    _to_matrix,
    build_centroids,
)

if TYPE_CHECKING:  # pragma: no cover
    import ray


def _resolve_components(
    ids: np.ndarray, cos_to_centroid: np.ndarray, pairs: pd.DataFrame
) -> np.ndarray:
    """Union-find over one cluster's duplicate pairs -> boolean keep
    mask.  Per component the kept member is the one with the lowest
    cosine to the centroid (SemDeDup's keep rule), ties by lowest id."""
    index = {int(i): k for k, i in enumerate(ids)}
    parent = list(range(len(ids)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(index[int(a)]), find(index[int(b)])
        if ra != rb:
            parent[rb] = ra
    keep = np.ones(len(ids), dtype=bool)
    best: dict[int, int] = {}
    for k in range(len(ids)):
        r = find(k)
        cur = best.get(r)
        if cur is None:
            best[r] = k
            continue
        # lowest cosine wins; ties resolved by lowest id
        if (cos_to_centroid[k], ids[k]) < (cos_to_centroid[cur], ids[cur]):
            keep[cur] = False
            best[r] = k
        else:
            keep[k] = False
    return keep


def semdedup(
    ds: "ray.data.Dataset",
    eps: float = 0.95,
    n_clusters: Optional[int] = None,
    max_group_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Flag semantic duplicates: returns a Dataset of
    ``(id_col, cluster:int32, cos_to_centroid:float64, semdedup_keep:bool)``
    covering every input row.  Filter ``semdedup_keep`` to prune.

    ``eps`` is the paper's cosine-similarity duplicate threshold."""
    import ray

    n_total = ds.count()
    if n_clusters is None:
        n_clusters = int(min(4096, max(16, round(n_total**0.5))))
    centroids = build_centroids(
        ds,
        n_clusters=n_clusters,
        sample_size=max(2048, 8 * n_clusters),
        vec_col=vec_col,
        n_total=n_total,
    )
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        mat = _normalize(_to_matrix(batch[vec_col]))
        sims = mat @ cents.T
        a = sims.argmax(axis=1)
        return pa.table(
            {
                "cluster": pa.array(a, type=pa.int32()),
                "cos_to_centroid": pa.array(sims[np.arange(len(a)), a], type=pa.float64()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    def dedup_cluster(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        cos = group["cos_to_centroid"].to_numpy()
        mat = _normalize(np.asarray(group[vec_col].tolist(), dtype=np.float64))
        pairs = pd.concat(
            _bounded_cluster_pairs(ids, mat, eps, max_group_size), ignore_index=True
        )
        keep = (
            _resolve_components(ids, cos, pairs)
            if len(pairs)
            else np.ones(len(ids), dtype=bool)
        )
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": group["cluster"].to_numpy(),
                "cos_to_centroid": cos,
                "semdedup_keep": keep,
            }
        )

    return assigned.groupby("cluster").map_groups(dedup_cluster, batch_format="pandas")


def semdedup_reference(
    ids: np.ndarray, mat: np.ndarray, eps: float = 0.95
) -> np.ndarray:
    """Single-process exact SemDeDup over ONE cluster (no bucketing, no
    split bounding) — the pytest parity pin for planted-duplicate sets
    small enough that bucketing never separates them."""
    m = _normalize(np.asarray(mat, dtype=np.float64))
    centroid = m.mean(axis=0)
    centroid /= np.linalg.norm(centroid) or 1.0
    cos = m @ centroid
    sims = m @ m.T
    ia, ib = np.nonzero(np.triu(sims >= eps, k=1))
    pairs = pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})
    return _resolve_components(ids, cos, pairs)
