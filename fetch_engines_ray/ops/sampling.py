"""Deterministic weighted sampling without replacement.

Efraimidis & Spirakis (2006, "Weighted random sampling with a
reservoir"): each row draws a uniform ``u`` and gets the key
``ln(u)/w``; the ``k`` LARGEST keys form an exact weight-proportional
sample without replacement.  The uniform comes from a 64-bit hash of
``(seed, id)`` — no RNG state, so the draw is reproducible across runs,
partitionings and cluster sizes, and any subset of the corpus can be
re-scored independently (the resume property every other sampler in
this repo shares; cf. ``textstats.add_split_assignment``).

Scale shape: the key is vectorized per block, each block keeps its
local top-``k`` (the A-ES reservoir merge: global top-k == top-k of
per-block top-ks), the driver reduces ``k x n_blocks`` candidate rows,
and the final selection is one broadcast membership filter — no
shuffle, driver state O(k), never O(rows).
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _keys(ids, weights: np.ndarray, seed: int) -> np.ndarray:
    """A-ES keys ln(u)/w with u = hash64(seed, id) mapped into (0, 1);
    non-positive weights get -inf (never sampled)."""
    h = pd.util.hash_array(
        np.asarray([f"{seed}:{v}" for v in ids], dtype=object)
    ).astype(np.uint64)
    u = (h.astype(np.float64) + 1.0) / 18446744073709551617.0  # (0, 1]
    w = np.asarray(weights, dtype=np.float64)
    out = np.full(len(w), -np.inf)
    pos = w > 0
    out[pos] = np.log(u[pos]) / w[pos]
    return out


def weighted_sample(
    ds: "ray.data.Dataset",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Exactly ``min(k, n_positive_weight)`` rows drawn without
    replacement with probability proportional to ``weight_col``,
    deterministically for a given ``seed``."""
    import ray

    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        return ds.limit(0)

    def local_top(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keys = _keys(ids, batch[weight_col].to_numpy(zero_copy_only=False), seed)
        finite = np.isfinite(keys)
        idx = np.nonzero(finite)[0]
        if len(idx) > k:
            idx = idx[np.argpartition(keys[idx], -k)[-k:]]
        return pa.table(
            {
                "_id": pa.array([ids[i] for i in idx], type=batch[id_col].type),
                "_key": pa.array(keys[idx], type=pa.float64()),
            }
        )

    cand = ds.map_batches(
        local_top, batch_format="pyarrow", batch_size=65536
    ).to_pandas()  # bounded: <= k rows per block
    if cand.empty:
        return ds.limit(0)
    # ties broken by id for full determinism (hash ties are ~impossible
    # but the contract is bitwise reproducibility)
    cand = cand.sort_values(["_key", "_id"], ascending=[False, True]).head(k)
    kept = set(cand["_id"].tolist())
    kept_ref = ray.put(kept)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sel = ray.get(kept_ref)
        return batch.filter(pa.array([v in sel for v in ids]))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=65536)


def weighted_sample_per_group(
    ds: "ray.data.Dataset",
    k: int,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> "ray.data.Dataset":
    """Per-group A-ES sampling: ``min(k, n_positive_weight(g))`` rows
    from EVERY group ``g``, weight-proportional without replacement,
    deterministic for a given seed — the quality-weighted per-source
    subsample a mixture recipe needs (uniform per-source quotas are
    ``textstats.sample_mixture``; this is its weighted sibling).

    Same no-shuffle shape as :func:`weighted_sample`, with the driver
    candidate pull bounded by ``k x groups-per-block x blocks`` — sized
    for source/domain-cardinality groups (dozens to thousands), the
    same boundedness posture as ``sample_mixture``'s quota dict."""
    import ray

    if k < 0:
        raise ValueError("k must be >= 0")
    if k == 0:
        return ds.limit(0)

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        keys = _keys(
            batch[id_col].tolist(),
            batch[weight_col].to_numpy(),
            seed,
        )
        out = batch[[group_col, id_col]].copy()
        out["_key"] = keys
        out = out[np.isfinite(keys)]
        return (
            out.sort_values(["_key", id_col], ascending=[False, True])
            .groupby(group_col, sort=False)
            .head(k)
        )

    cand = ds.map_batches(
        local_top, batch_format="pandas", batch_size=65536
    ).to_pandas()
    if cand.empty:
        return ds.limit(0)
    kept_df = (
        cand.sort_values(["_key", id_col], ascending=[False, True])
        .groupby(group_col, sort=False)
        .head(k)
    )
    kept = set(kept_df[id_col].tolist())
    kept_ref = ray.put(kept)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sel = ray.get(kept_ref)
        return batch.filter(pa.array([v in sel for v in ids]))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=65536)
