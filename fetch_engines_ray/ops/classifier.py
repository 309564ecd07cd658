"""Learned quality classifier: distributed logistic regression.

The trainable counterpart to the heuristic Gopher filter
(``ops/textstats.gopher_quality_filter``): CCNet / GPT-3-style
curation trains a linear classifier to separate reference-quality
text from crawl text, then scores the whole corpus with it.  Both
halves are expressed Ray-Data-first:

* **fit** — full-batch gradient descent where each iteration is ONE
  streaming pass: weights broadcast via ``ray.put``, ``map_batches``
  emits a per-batch gradient partial as ``d+2`` plain float columns,
  and Ray's NATIVE ``Dataset.sum`` reduces them (distributed tree
  reduce — no driver-side partial list, no custom shuffle).  The
  driver only ever holds the ``d+1`` weight vector.
* **score** — a stateless vectorized ``map_batches`` pass adding
  ``quality_score`` (sigmoid) and an integer-scaled
  ``quality_score_x1m`` for engine-stable comparisons.

Determinism: fixed iteration count and zero-init weights make the fit
reproducible; float summation order varies with partitioning, so the
parity contract vs the single-process numpy reference is tolerance-
based (pinned by ``tests/test_classifier.py``).  Iterations re-execute
the input's lineage — hand this a column-pruned parquet read or a
small materialized feature table.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _design_matrix(batch: pa.Table, feature_cols: Sequence[str]) -> np.ndarray:
    cols = [
        batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in feature_cols
    ]
    x = np.column_stack(cols + [np.ones(batch.num_rows)])  # intercept last
    return x


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_fit(
    ds: "ray.data.Dataset",
    feature_cols: Sequence[str],
    label_col: str = "label",
    n_iters: int = 100,
    lr: float = 0.5,
    l2: float = 0.0,
    init: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fit weights (len(feature_cols) + 1, intercept last) by
    full-batch gradient descent; returns the weight vector."""
    d = len(feature_cols) + 1
    w = np.zeros(d) if init is None else np.asarray(init, dtype=np.float64).copy()
    grad_cols = [f"g{i}" for i in range(d)]

    for _ in range(n_iters):
        ref = ray.put(w)

        def partials(batch: pa.Table) -> pa.Table:
            wv = ray.get(ref)
            x = _design_matrix(batch, feature_cols)
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            g = x.T @ (_sigmoid(x @ wv) - y)
            cols = {c: pa.array([float(v)]) for c, v in zip(grad_cols, g)}
            cols["n"] = pa.array([float(len(y))])
            return pa.table(cols)

        agg = ds.map_batches(partials, batch_format="pyarrow", batch_size=8192).sum(
            grad_cols + ["n"]
        )
        if agg["sum(n)"] is None:  # empty training set: Sum of no rows
            raise ValueError("logreg_fit needs a non-empty labeled dataset")
        n = max(agg["sum(n)"], 1.0)
        grad = np.asarray([agg[f"sum({c})"] for c in grad_cols]) / n
        if l2 > 0.0:
            reg = l2 * w
            reg[-1] = 0.0  # never regularize the intercept
            grad = grad + reg
        w = w - lr * grad
    return w


def logreg_score(
    ds: "ray.data.Dataset",
    weights: np.ndarray,
    feature_cols: Sequence[str],
) -> "ray.data.Dataset":
    """Append ``quality_score`` (sigmoid) + ``quality_score_x1m``
    (x1e6, half-away rounding — the engine's integer-stable form)."""
    ref = ray.put(np.asarray(weights, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = ray.get(ref)
        p = _sigmoid(_design_matrix(batch, feature_cols) @ wv)
        batch = batch.append_column("quality_score", pa.array(p, type=pa.float64()))
        return batch.append_column(
            "quality_score_x1m",
            pa.array(np.floor(p * 1_000_000 + 0.5).astype(np.int64), type=pa.int64()),
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


def logreg_fit_reference(
    x: np.ndarray,
    y: np.ndarray,
    n_iters: int = 100,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Single-process numpy reference of the exact same algorithm —
    the parity oracle for the distributed fit."""
    x = np.column_stack([np.asarray(x, dtype=np.float64), np.ones(len(x))])
    y = np.asarray(y, dtype=np.float64)
    w = np.zeros(x.shape[1])
    for _ in range(n_iters):
        grad = x.T @ (_sigmoid(x @ w) - y) / len(y)
        if l2 > 0.0:
            reg = l2 * w
            reg[-1] = 0.0
            grad = grad + reg
        w = w - lr * grad
    return w
