"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one float64 matmul against it; per
batch we keep only the local top-k, so the driver-side reduce sees
``num_blocks × q × k`` candidate rows, never the full corpus.

Scale path: IVF — seeded mini-kmeans centroids (built from a sample),
cluster assignment as a batch stage, probe only the closest ``nprobe``
clusters.  Embedding-cosine near-duplicate detection reuses the same
batch kernel with a threshold instead of a k.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    arr = col.to_pylist()
    return np.asarray(arr, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _fetch_query_matrix(
    ds: "ray.data.Dataset", query_ids, id_col: str, vec_col: str
) -> tuple[list, np.ndarray]:
    """Pull the query rows (tiny) and return ``(sorted ids, normalized
    matrix)`` — ONE implementation shared by knn_bruteforce and ivf_knn
    so the membership/ordering semantics cannot drift.  Membership
    tests the RAW value: coercing with int() raised on string/null id
    columns that the row-level filter used to accept."""
    qset = set(query_ids)

    def _pick_queries(batch: pa.Table) -> pa.Table:
        mask = pa.array([v in qset for v in batch[id_col].to_pylist()])
        return batch.filter(mask)

    q_rows = ds.map_batches(
        _pick_queries, batch_format="pyarrow", batch_size=8192
    ).take_all()
    q_rows.sort(key=lambda r: r[id_col])
    qids = [r[id_col] for r in q_rows]
    qmat = _normalize(np.asarray([r[vec_col] for r in q_rows], dtype=np.float64))
    return qids, qmat


def knn_bruteforce(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query id.  Returns
    (query_id, neighbor_id, rank) with rank 1..k, ties broken by
    neighbor_id (deterministic; matches the SQL oracle's ORDER BY)."""
    qids, qmat = _fetch_query_matrix(ds, query_ids, id_col, vec_col)
    q_ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_l, qmat_l = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize(_to_matrix(batch[vec_col]))
        sims = qmat_l @ mat.T  # [q, n]
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids_l):
            row = sims[qi]
            mask = ids != qid
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            # deterministic k-th-boundary ties (duplicate vectors tie
            # exactly): (sim desc, id asc), matching the oracle ORDER BY
            order = np.lexsort((ids[cand_idx], -row[cand_idx]))
            top = cand_idx[order[: min(k, len(cand_idx))]]
            out_q.extend([qid] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    # global reduce: tiny (num_blocks × q × k rows)
    candidates.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], inplace=True
    )
    topk = candidates.groupby("query_id", sort=True).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------

def build_centroids(
    ds: "ray.data.Dataset",
    n_clusters: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 13,
    vec_col: str = "embedding",
    n_total: Optional[int] = None,
) -> np.ndarray:
    """Seeded mini-kmeans on a sample (driver-side; centroids are tiny).

    ``n_total``: pass the dataset's row count when the caller already
    computed it — on a non-parquet-backed lineage a second ``count()``
    re-executes the whole upstream chain just for sampling-fraction
    arithmetic."""
    frac = 1.0
    total = ds.count() if n_total is None else n_total
    if total > sample_size:
        frac = sample_size / total
    sample = ds.random_sample(frac, seed=seed).take_all() if frac < 1.0 else ds.take_all()
    mat = _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float64))
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(iters):
        sims = mat @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ivf_knn(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """Approximate top-k: only batch rows assigned to a query's nprobe
    closest clusters are scored.  Same output schema as knn_bruteforce."""
    if centroids is None:
        centroids = build_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    qids, qmat = _fetch_query_matrix(ds, query_ids, id_col, vec_col)
    q_clusters = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]  # [q, nprobe]
    probe_union = set(q_clusters.flatten().tolist())
    ref = ray.put((qids, qmat, q_clusters, centroids, sorted(probe_union)))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_l, qmat_l, q_clusters_l, cents, probe = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize(_to_matrix(batch[vec_col]))
        assign = (mat @ cents.T).argmax(axis=1)
        keep = np.isin(assign, probe)
        ids, mat, assign = ids[keep], mat[keep], assign[keep]
        out_q, out_n, out_s = [], [], []
        if len(ids):
            sims = qmat_l @ mat.T
            for qi, qid in enumerate(qids_l):
                allowed = np.isin(assign, q_clusters_l[qi]) & (ids != qid)
                cand = np.nonzero(allowed)[0]
                if len(cand) == 0:
                    continue
                take = min(k, len(cand))
                row = sims[qi]
                # deterministic k-th-boundary ties (sim desc, id asc) —
                # argpartition would keep whichever tied candidate lands
                # first in memory order (same fix as knn_bruteforce and
                # ann_index.search_ivf_index)
                order = np.lexsort((ids[cand], -row[cand]))
                top = cand[order[:take]]
                out_q.extend([qid] * len(top))
                out_n.extend(ids[top].tolist())
                out_s.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    if candidates.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "rank"])
    candidates.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], inplace=True
    )
    topk = candidates.groupby("query_id", sort=True).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def _bounded_cluster_pairs(
    ids: np.ndarray,
    mat: np.ndarray,
    threshold: float,
    max_group: int,
    depth: int = 0,
    stats: Optional[dict] = None,
) -> list[pd.DataFrame]:
    """All-pairs >= threshold within one cluster, with the matmul
    BOUNDED: groups larger than ``max_group`` are recursively median-
    split on a seeded random projection before the O(n^2) step, so one
    hot cluster can never blow up a task's memory or wall time.

    Identical vectors share a projection value and the split predicate
    (``p <= median``), so planted exact clones always stay together;
    near-identical vectors straddle a median with the same (documented)
    small probability as the top-level cluster bucketing.  When a group
    cannot be split (all projections equal — i.e. all duplicates of one
    vector), the all-pairs output itself is the required answer and runs
    regardless of size."""
    if len(ids) > max_group and depth < 48:
        rng = np.random.RandomState(7000 + depth)
        d = rng.randn(mat.shape[1])
        d /= np.linalg.norm(d) or 1.0
        p = mat @ d
        med = np.median(p)
        left = p <= med
        if left.any() and not left.all():
            out = _bounded_cluster_pairs(
                ids[left], mat[left], threshold, max_group, depth + 1, stats
            )
            out += _bounded_cluster_pairs(
                ids[~left], mat[~left], threshold, max_group, depth + 1, stats
            )
            return out
        # equal projections: retry with a fresh direction via depth bump
        return _bounded_cluster_pairs(ids, mat, threshold, max_group, depth + 7, stats)
    if stats is not None:
        stats["max_leaf"] = max(stats.get("max_leaf", 0), len(ids))
    sims = mat @ mat.T
    ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
    return [
        pd.DataFrame(
            {
                "doc_a": np.minimum(ids[ia], ids[ib]),
                "doc_b": np.maximum(ids[ia], ids[ib]),
                "cos_sim": sims[ia, ib],
            }
        )
    ]


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    n_clusters: Optional[int] = None,
    # 2048^2 float64 sims = 32 MB per leaf task — large fresh
    # allocations stall badly on this host during noise phases, and at
    # cluster scale a smaller leaf also bounds task memory tighter
    max_group_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs via cluster-bucketed
    all-pairs (only within a cluster — the LSH-style scale path).

    Scale shape: ``n_clusters`` defaults to ~sqrt(N) (floor 16) so the
    expected cluster population scales as sqrt(N) rather than N/16;
    inside each cluster the all-pairs matmul is bounded by
    ``max_group_size`` via recursive projection splits
    (:func:`_bounded_cluster_pairs`).  Returns a **Dataset** — the pair
    table streams to its consumer and never lands on the driver."""
    n_total = ds.count()
    if n_clusters is None:
        n_clusters = int(min(4096, max(16, round(n_total ** 0.5))))
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
        a = (mat @ cents.T).argmax(axis=1)
        return pa.table(
            {
                "cluster": pa.array(a, type=pa.int32()),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    def pairs_in_cluster(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        mat = _normalize(np.asarray(group[vec_col].tolist(), dtype=np.float64))
        parts = _bounded_cluster_pairs(ids, mat, threshold, max_group_size)
        out = pd.concat(parts, ignore_index=True)
        if out.empty:
            # typed empty frame keeps Ray Data schema unification stable
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype=ids.dtype),
                    "doc_b": pd.Series(dtype=ids.dtype),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        return out

    return assigned.groupby("cluster").map_groups(pairs_in_cluster, batch_format="pandas")
