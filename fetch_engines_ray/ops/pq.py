"""Product quantization (PQ) for compressed similarity search.

Public-knowledge basis: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — split each d-dim vector into
``m`` subvectors, vector-quantize every subspace with its own
``ksub``-centroid codebook, store each vector as ``m`` uint8 codes, and
search with asymmetric distance computation (ADC): per query build an
``m x ksub`` lookup table once, then score any database vector with
``m`` table lookups instead of a ``d``-dim dot product.

Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes;
its PQ code at m=8 is 8 bytes — a 32x shrink that turns an
object-store-resident ANN corpus into something that fits in worker
heaps.  Recall is bounded by quantization error; the brute-force path
(:func:`fetch_engines_ray.ops.similarity.knn_bruteforce`) stays the
exactness oracle and the pytest recall floor is asserted against it.

Ray-Data shape:

- codebooks train driver-side on a bounded seeded sample (the standard
  practice — FAISS trains PQ on a sample too); the codebook tensor is
  ``m * ksub * (d/m)`` floats (a few hundred KiB), broadcast via
  ``ray.put``;
- encoding is one ``map_batches`` pass producing an ``m``-byte binary
  code per row (Arrow ``binary``, the repo's established blob pattern —
  hash joins reject list columns);
- ADC search is one ``map_batches`` pass with per-block top-k partials
  before the final ``sort.limit`` — no shuffle of the code table.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from fetch_engines_ray.ops.similarity import _normalize, _to_matrix

if TYPE_CHECKING:  # pragma: no cover
    import ray


def _md5_order(n: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random ordering of range(n) (md5 of index)."""
    import hashlib

    keys = np.asarray(
        [int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:12], 16) for i in range(n)]
    )
    return np.argsort(keys, kind="stable")


def _lloyd_euclidean(
    mat: np.ndarray, k: int, n_iters: int = 20, seed: int = 13
) -> np.ndarray:
    """Deterministic Euclidean Lloyd's on a driver-side sample: init =
    first k rows in md5 order; empty clusters keep their centroid."""
    k = min(k, len(mat))
    cents = mat[_md5_order(len(mat), seed)[:k]].astype(np.float64).copy()
    for _ in range(n_iters):
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin drops ||x||^2
        d = -2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)
        assign = d.argmin(axis=1)
        moved = 0.0
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                nc = members.mean(axis=0)
                moved = max(moved, float(np.abs(nc - cents[c]).max()))
                cents[c] = nc
        if moved < 1e-9:
            break
    return cents


def sample_matrix(
    ds: "ray.data.Dataset", sample_size: int, seed: int, vec_col: str
) -> np.ndarray:
    """Seeded bounded sample -> L2-normalized float64 matrix — ONE
    implementation shared by pq_train and ann_index's residual branch
    (two hand-copies once risked drifting)."""
    total = ds.count()
    frac = min(1.0, sample_size / max(1, total))
    sample = ds.random_sample(frac, seed=seed).take_all() if frac < 1.0 else ds.take_all()
    if not sample:
        raise ValueError("cannot train PQ codebooks on an empty dataset")
    return _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float64))


def pq_train(
    ds: "ray.data.Dataset",
    m: int = 8,
    ksub: int = 256,
    sample_size: int = 16384,
    seed: int = 13,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace codebooks on a seeded sample.

    Returns ``codebooks`` of shape ``(m, ksub, d // m)`` (float64).
    Vectors are L2-normalized first so ADC inner products approximate
    cosine similarity (the family's metric)."""
    mat = sample_matrix(ds, sample_size, seed, vec_col)
    return pq_train_matrix(mat, m=m, ksub=ksub, seed=seed)


def pq_train_matrix(
    mat: np.ndarray, m: int = 8, ksub: int = 256, seed: int = 13
) -> np.ndarray:
    """Codebooks from an in-memory training matrix (rows are the
    vectors to quantize — raw normalized vectors, or coarse-centroid
    RESIDUALS for the IVFADC form in ``ops/ann_index``)."""
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ksub = min(ksub, len(mat))
    return np.stack(
        [
            _lloyd_euclidean(mat[:, j * dsub : (j + 1) * dsub], ksub, seed=seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Encode every vector to an m-byte PQ code (Arrow binary column).

    Requires ``ksub <= 256`` (uint8 codes)."""
    import ray

    m, ksub, dsub = codebooks.shape
    if ksub > 256:
        raise ValueError("ksub must be <= 256 for uint8 codes")
    cb_ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        mat = _normalize(_to_matrix(batch[vec_col]))
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d = -2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)
            codes[:, j] = d.argmin(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "pq_code": pa.array([c.tobytes() for c in codes], type=pa.binary()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


def pq_search(
    codes: "ray.data.Dataset",
    codebooks: np.ndarray,
    query_vecs: np.ndarray,
    query_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """ADC top-k search over the encoded corpus.

    ``query_vecs`` are the raw query vectors (normalized here); a query
    never matches its own id.  Per-block partial top-k keeps the wide
    step at ``n_blocks * n_queries * k`` rows.  Returns
    ``(query_id, neighbor_id, rank)`` like ``knn_bruteforce``."""
    import ray

    m, ksub, dsub = codebooks.shape
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    # per-query inner-product LUT: luts[qi, j, code]
    luts = np.stack(
        [
            np.stack([qv[j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)])
            for qv in q
        ]
    )
    lut_ref = ray.put(np.ascontiguousarray(luts))
    qids = np.asarray(list(query_ids), dtype=np.int64)
    qid_ref = ray.put(qids)

    def block_topk(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        qs = ray.get(qid_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        raw = b"".join(batch["pq_code"].to_pylist())
        c = np.frombuffer(raw, dtype=np.uint8).reshape(len(ids), m)
        out_q, out_n, out_s = [], [], []
        cols = np.arange(m)
        for qi in range(len(qs)):
            sims = lt[qi][cols, c].sum(axis=1)
            # MASK the self row out (not just -inf): with fewer than k
            # non-self rows the -inf row survived the cut and the query
            # matched its own id, violating the documented contract
            cand = np.nonzero(ids != qs[qi])[0]
            if len(cand) == 0:
                continue
            # deterministic k-th-boundary ties (sim desc, id asc) —
            # duplicate vectors share PQ codes and tie EXACTLY, and a
            # block-order argsort made the result partition-dependent
            order = np.lexsort((ids[cand], -sims[cand]))
            take = cand[order[: min(k, len(cand))]]
            out_q.append(np.full(len(take), qs[qi], dtype=np.int64))
            out_n.append(ids[take])
            out_s.append(sims[take])
        if not out_q:  # block held only the queries themselves
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    reduced = codes.map_batches(block_topk, batch_format="pyarrow", batch_size=65536)
    pdf = reduced.to_pandas()
    pdf.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True], inplace=True)
    topk = pdf.groupby("query_id", sort=True).head(k).copy()
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)


def pq_reconstruction_error(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the codebooks over the
    corpus (one streaming pass) — the PQ quality diagnostic."""
    import ray

    m, ksub, dsub = codebooks.shape
    cb_ref = ray.put(np.ascontiguousarray(codebooks))

    def err(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        mat = _normalize(_to_matrix(batch[vec_col]))
        total = np.zeros(len(mat))
        for j in range(m):
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (keeps the temp at
            # n x ksub instead of n x ksub x dsub)
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d = (sub**2).sum(axis=1, keepdims=True) - 2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)
            total += d.min(axis=1)
        return pa.table({"se": pa.array(total, type=pa.float64()), "n": pa.array(np.ones(len(mat), dtype=np.int64))})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(err, batch_format="pyarrow", batch_size=1024).aggregate(
        Sum("se", alias_name="se"), Sum("n", alias_name="n")
    )
    if agg["se"] is None:  # empty dataset: Sum of no rows is None
        raise ValueError("pq_reconstruction_error needs a non-empty dataset")
    return float(agg["se"]) / max(1, int(agg["n"]))
