"""Distributed PCA over an embedding column (method of moments).

The 100-TB-safe shape for PCA on tall-skinny data (n rows x d dims,
n >> d): ONE streaming pass accumulates per-block first and second
moments (``sum x`` and ``sum x xT`` — d and d*d floats per block), the
driver reduces those tiny partials, eigendecomposes the d x d
covariance (microseconds for embedding-sized d), and projection is a
single broadcast matmul per batch.  Nothing row-scaled ever reaches
the driver, and there is NO shuffle at all — moments ride the same
``map_batches`` stream as any other per-batch metric.

Used for: embedding compression before ANN / SemDeDup (project to the
top-k energy subspace), whitening, and drift-friendly 2-D corpus maps.
Published technique (Pearson 1901; the streaming moment form is the
textbook one); sign convention pinned like scikit-learn's
``svd_flip`` so components are deterministic across block orders.

Reference analog: none (the reference has no linear algebra) — this is
part of the training-data tier, same family as ops/similarity.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    total_variance: float  # trace of the covariance
    n_rows: int

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        return self.explained_variance / max(self.total_variance, 1e-300)


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    if len(batch) == 0:
        # d is unknowable from an empty block; callers skip 0-row output
        return np.zeros((0, 0), dtype=np.float64)
    col = batch[vec_col]
    if col.num_chunks == 1:
        arr = col.chunk(0)
    else:
        arr = col.combine_chunks()
    if hasattr(arr, "flatten"):  # list<float> / fixed_size_list
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        return flat.reshape(len(batch), -1)
    # Ray tensor extension array (ndarray cells via from_pandas)
    return np.asarray(arr.to_numpy(), dtype=np.float64).reshape(len(batch), -1)


def fit_pca(
    ds: "ray.data.Dataset",
    n_components: int = 8,
    vec_col: str = "embedding",
) -> PCAModel:
    """One streaming pass of (n, sum x, sum x xT) per block, then a
    driver-side d x d eigendecomposition.  Driver state is O(d^2),
    never O(n)."""

    _MOMENTS_SCHEMA = pa.schema(
        [
            ("n", pa.int64()),
            ("s1", pa.list_(pa.float64())),
            ("s2", pa.list_(pa.float64())),
        ]
    )

    def moments(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        if x.shape[0] == 0:  # empty partitions carry no d — emit nothing
            return _MOMENTS_SCHEMA.empty_table()
        return pa.table(
            {
                "n": pa.array([x.shape[0]], type=pa.int64()),
                "s1": pa.array([x.sum(axis=0)], type=pa.list_(pa.float64())),
                "s2": pa.array([(x.T @ x).ravel()], type=pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow", batch_size=4096).to_pandas()
    # a fully-empty dataset yields a COLUMN-LESS frame (the recurring
    # empty-partition hazard — see ops/profile.py), not an empty "n"
    n = int(parts["n"].sum()) if "n" in parts.columns else 0
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {n}")
    s1 = np.sum(np.stack(parts["s1"].to_numpy()), axis=0)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
    d = s1.shape[0]
    mean = s1 / n
    # unbiased covariance from raw moments: (S2 - n mu muT) / (n - 1)
    cov = (s2.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # kill accumulation asymmetry
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(n_components, d)]
    comps = evecs[:, order].T
    # svd_flip convention: largest-|coord| entry of each axis positive
    idx = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(len(idx)), idx])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=np.maximum(evals[order], 0.0),
        total_variance=float(np.trace(cov)),
        n_rows=n,
    )


def pca_project(
    ds: "ray.data.Dataset",
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    keep_input: bool = False,
    whiten: bool = False,
) -> "ray.data.Dataset":
    """Append the k-dim projection ``(x - mean) @ components.T`` —
    model is O(k*d), captured by value into the task closure (a few KB
    shipped once per task, same posture as the broadcast LUTs in
    ops/ann_index.py).  ``whiten=True`` additionally scales each
    component by ``1/sqrt(eigenvalue)`` so outputs have unit variance
    per axis (the usual pre-step before cosine/kmeans on anisotropic
    embeddings)."""
    mean = model.mean
    comps_t = model.components.T.astype(np.float64)
    if whiten:
        comps_t = comps_t / np.sqrt(np.maximum(model.explained_variance, 1e-12))

    def project(batch: pa.Table) -> pa.Table:
        k = comps_t.shape[1]
        if len(batch) == 0:
            out = batch if keep_input else batch.drop_columns([vec_col])
            empty = pa.ListArray.from_arrays(
                pa.array([0], type=pa.int32()), pa.array([], type=pa.float32())
            ).slice(0, 0)
            return out.append_column(out_col, empty)
        x = _batch_matrix(batch, vec_col)
        proj = (x - mean) @ comps_t
        values = pa.array(proj.astype(np.float32).ravel(), type=pa.float32())
        offsets = pa.array(np.arange(0, (len(batch) + 1) * k, k, dtype=np.int32))
        out = batch if keep_input else batch.drop_columns([vec_col])
        return out.append_column(out_col, pa.ListArray.from_arrays(offsets, values))

    return ds.map_batches(project, batch_format="pyarrow", batch_size=4096)
