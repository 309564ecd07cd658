"""Corpus drift detection between snapshots: PSI / KL over profiles.

Continuous ingestion needs a tripwire for distribution shift — a crawl
source changing its mix (language, length, quality) silently degrades
every model trained downstream.  The standard instrument (public
knowledge from credit-risk monitoring onward) is the Population
Stability Index over per-feature histograms:

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

with the usual reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25
action required.  KL(p||q) ships alongside for the asymmetric view.

Ray-Data shape: each snapshot reduces to a HISTOGRAM in one streaming
pass — numeric columns bucket against FIXED edges taken from the
reference snapshot's quantiles (both snapshots must share edges or the
comparison is meaningless), categorical columns count values with the
same pre-aggregated ``(value, n)`` rollup as ``word_counts``.  Only
bucket vectors (driver-sized) ever leave the workers; the comparison
itself is closed-form numpy.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

_EPS = 1e-6  # add-epsilon smoothing for empty buckets (standard PSI practice)


def numeric_edges(
    ds: "ray.data.Dataset", col: str, n_buckets: int = 10, bins: int = 4096
) -> np.ndarray:
    """Reference-snapshot bucket edges: approximate quantiles of ``col``
    from the mergeable fixed-width histogram sketch
    (:func:`fetch_engines_ray.ops.sketches.approx_quantiles`) — two
    streaming aggregate passes moving O(bins) bytes per block, NO sort
    and nothing row-scaled through the driver.  Per-edge error is
    bounded by one sketch-bucket width, (max-min)/bins, which is far
    inside what PSI bucketing can distinguish.  Returns ``n_buckets-1``
    interior edges."""
    from fetch_engines_ray.ops.sketches import approx_quantiles

    qs = [(i + 1) / n_buckets for i in range(n_buckets - 1)]
    picked = approx_quantiles(ds.select_columns([col]), col, qs, bins=bins)
    return np.asarray(picked, dtype=np.float64)


def numeric_histogram(
    ds: "ray.data.Dataset", col: str, edges: np.ndarray
) -> np.ndarray:
    """Bucket counts for ``col`` against FIXED edges: one map_batches
    pass of per-batch ``np.bincount`` partials + a tiny reduce."""
    from ray.data.aggregate import Sum

    e = np.asarray(edges, dtype=np.float64)
    k = len(e) + 1

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.searchsorted(e, v, side="right")
        c = np.bincount(b, minlength=k)
        return pa.table(
            {"bucket": pa.array(np.arange(k, dtype=np.int64)), "n": pa.array(c, type=pa.int64())}
        )

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = np.zeros(k, dtype=np.int64)
    # an empty / all-null snapshot yields a COLUMN-LESS frame — the
    # tripwire must report the (maximal) shift, not die on the exact
    # catastrophic input it exists to alert on
    if "bucket" in rolled.columns:
        out[rolled["bucket"].to_numpy()] = rolled["n"].to_numpy()
    return out


def categorical_histogram(
    ds: "ray.data.Dataset", col: str, categories: Optional[list] = None
) -> tuple[list, np.ndarray]:
    """(categories, counts) for a categorical column; pass the REFERENCE
    snapshot's categories when profiling the current one (unseen values
    collapse into a final OTHER bucket)."""
    from ray.data.aggregate import Count

    counts = (
        ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
    )
    if "n" not in counts.columns:  # empty snapshot: column-less frame
        counts = pd.DataFrame({col: pd.Series(dtype=object), "n": pd.Series(dtype="int64")})
    if categories is None:
        counts = counts.sort_values(col).reset_index(drop=True)
        return counts[col].tolist(), counts["n"].to_numpy().astype(np.int64)
    idx = {c: i for i, c in enumerate(categories)}
    out = np.zeros(len(categories) + 1, dtype=np.int64)  # +OTHER
    for v, n in zip(counts[col], counts["n"]):
        out[idx.get(v, len(categories))] += int(n)
    return list(categories) + ["__other__"], out


def psi(ref_counts: np.ndarray, cur_counts: np.ndarray) -> float:
    """Population Stability Index between two aligned histograms."""
    p = ref_counts.astype(np.float64) + _EPS
    q = cur_counts.astype(np.float64) + _EPS
    p /= p.sum()
    q /= q.sum()
    return float(((q - p) * np.log(q / p)).sum())


def kl_divergence(ref_counts: np.ndarray, cur_counts: np.ndarray) -> float:
    """KL(current || reference) over aligned histograms (smoothed)."""
    p = ref_counts.astype(np.float64) + _EPS
    q = cur_counts.astype(np.float64) + _EPS
    p /= p.sum()
    q /= q.sum()
    return float((q * np.log(q / p)).sum())


def drift_report(
    reference: "ray.data.Dataset",
    current: "ray.data.Dataset",
    numeric_cols: list[str] = (),
    categorical_cols: list[str] = (),
    n_buckets: int = 10,
    psi_warn: float = 0.1,
    psi_alert: float = 0.25,
) -> pd.DataFrame:
    """Per-column drift report ``(column, kind, psi, kl, status)`` with
    the standard PSI reading (ok / warn / alert).  Edges and categories
    are taken from the REFERENCE snapshot so both sides bucket
    identically."""
    rows = []
    for col in numeric_cols:
        edges = numeric_edges(reference, col, n_buckets)
        r = numeric_histogram(reference, col, edges)
        c = numeric_histogram(current, col, edges)
        s = psi(r, c)
        rows.append((col, "numeric", s, kl_divergence(r, c)))
    for col in categorical_cols:
        cats, r = categorical_histogram(reference, col)
        _, c = categorical_histogram(current, col, categories=cats)
        r = np.concatenate([r, [0]])  # align reference with the OTHER bucket
        s = psi(r, c)
        rows.append((col, "categorical", s, kl_divergence(r, c)))
    out = pd.DataFrame(rows, columns=["column", "kind", "psi", "kl"])
    out["status"] = np.where(
        out["psi"] >= psi_alert, "alert", np.where(out["psi"] >= psi_warn, "warn", "ok")
    )
    return out
