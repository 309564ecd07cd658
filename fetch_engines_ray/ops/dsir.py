"""DSIR: Data Selection via Importance Resampling.

Public-knowledge basis: Xie et al., "Data Selection for Language Models
via Importance Resampling" (NeurIPS 2023) — represent documents as
bags of hashed n-grams (unigrams + bigrams hashed into B buckets), fit
bucket distributions over a small TARGET sample and over the RAW corpus,
weight every raw document by its log importance ratio
``sum_ngrams log(p_target[b] / p_raw[b])``, and select documents by
Gumbel top-k resampling.  The reference engine has no data-selection
surface; this family belongs to the training-data tier (SURVEY.md §2.8).

Ray-Data shape:

- the RAW bucket distribution is one distributed pass: per-batch
  ``np.bincount`` partials emitted as ``(bucket, n)`` rows (at most B
  rows per batch) -> tiny ``groupby(bucket).sum`` shuffle;
- the TARGET sample is small by construction (the paper uses a few
  thousand target documents) and is counted on the driver;
- the per-bucket log-ratio vector (B float64, ~64 KiB at the default
  B=8192) is broadcast once via ``ray.put``; weighting is a vectorized
  lookup + ``np.add.reduceat`` per batch — no shuffle;
- resampling keys documents by ``logw + Gumbel(hash64(doc_id, seed))``
  — deterministic, partitioning-invariant — with per-block top-n partials
  before the final ``sort.limit`` so only ``n_blocks * n`` rows reach
  the wide step.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

DEFAULT_BUCKETS = 8192  # power of two: bucket = hash & (B - 1)


def _doc_ngrams(text: Optional[str]) -> list[str]:
    toks = (text or "").lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_ids(ngrams: Sequence[str], n_buckets: int) -> np.ndarray:
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        # the & mask is only a modulus for powers of two — anything else
        # silently skews the mapping and leaves buckets permanently empty
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    if not ngrams:
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(np.asarray(ngrams, dtype=object))
    return (h & np.uint64(n_buckets - 1)).astype(np.int64)


def _batch_ngram_offsets(
    texts: Sequence[Optional[str]], n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a batch's hashed n-grams; return (bucket_ids, offsets)."""
    grams: list[str] = []
    offs = np.empty(len(texts) + 1, dtype=np.int64)
    offs[0] = 0
    for i, t in enumerate(texts):
        grams.extend(_doc_ngrams(t))
        offs[i + 1] = len(grams)
    return _bucket_ids(grams, n_buckets), offs


def target_bucket_counts(
    target_texts: Sequence[Optional[str]], n_buckets: int = DEFAULT_BUCKETS
) -> np.ndarray:
    """Driver-side bucket counts of the (small) target sample."""
    ids, _ = _batch_ngram_offsets(list(target_texts), n_buckets)
    return np.bincount(ids, minlength=n_buckets).astype(np.int64)


def raw_bucket_counts(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> np.ndarray:
    """Distributed bucket counts over the raw corpus: per-batch bincount
    partials -> one (bucket, n) groupby-sum of at most B rows/batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids, _ = _batch_ngram_offsets(batch[text_col].to_pylist(), n_buckets)
        c = np.bincount(ids, minlength=n_buckets)
        nz = np.nonzero(c)[0]
        return pa.table(
            {"bucket": pa.array(nz, type=pa.int64()), "n": pa.array(c[nz], type=pa.int64())}
        )

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = np.zeros(n_buckets, dtype=np.int64)
    if "bucket" in rolled.columns:  # empty corpus -> column-less frame
        out[rolled["bucket"].to_numpy()] = rolled["n"].to_numpy()
    return out


def log_importance_ratio(
    target_counts: np.ndarray, raw_counts: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Per-bucket ``log p_target - log p_raw`` with add-alpha smoothing."""
    b = len(target_counts)
    pt = (target_counts + alpha) / (target_counts.sum() + alpha * b)
    pr = (raw_counts + alpha) / (raw_counts.sum() + alpha * b)
    return np.log(pt) - np.log(pr)


def dsir_weights(
    ds: "ray.data.Dataset",
    log_ratio: np.ndarray,
    text_col: str = "text",
    n_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Add ``dsir_logw`` (float64): the document's total hashed-n-gram
    log importance weight.  The B-float ratio vector is broadcast once."""
    import ray

    b = n_buckets or len(log_ratio)
    ref = ray.put(np.ascontiguousarray(log_ratio, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        ids, offs = _batch_ngram_offsets(batch[text_col].to_pylist(), b)
        vals = lr[ids]
        sums = np.add.reduceat(
            np.concatenate([vals, [0.0]]), np.minimum(offs[:-1], len(vals))
        )
        sums[np.diff(offs) == 0] = 0.0
        return batch.append_column("dsir_logw", pa.array(sums, type=pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=2048)


def _gumbel_from_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id Gumbel(0,1) noise from hash64(seed, id): the
    top-k of ``logw + g`` is then a sample WITHOUT replacement from the
    softmax over logw (Gumbel top-k trick), reproducible across runs and
    partitionings.  ONE vectorized ``pd.util.hash_array`` call (the
    same u-from-id derivation as ``sampling._keys``) — the former
    per-row ``hashlib.md5`` loop was the only non-vectorized step in
    the DSIR path; the single-process reference shares this helper, so
    engine/reference parity is unaffected by the hash choice."""
    h = pd.util.hash_array(
        np.asarray([f"{seed}:{d}" for d in ids], dtype=object)
    ).astype(np.uint64)
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0  # (0, 1) open
    return -np.log(-np.log(u))


def dsir_resample(
    scored: "ray.data.Dataset",
    n: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Gumbel top-k selection of ``n`` documents by importance weight.

    Per-block partial top-n first, so the wide sort sees at most
    ``n_blocks * n`` rows; returns the selected ``(id_col, dsir_logw,
    dsir_key)`` frame sorted by key descending (driver-sized: n rows)."""

    def partial_topn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        logw = batch["dsir_logw"].to_numpy(zero_copy_only=False)
        key = logw + _gumbel_from_ids(ids, seed)
        take = np.argsort(-key)[:n]
        return pa.table(
            {
                id_col: pa.array(ids[take]),
                "dsir_logw": pa.array(logw[take], type=pa.float64()),
                "dsir_key": pa.array(key[take], type=pa.float64()),
            }
        )

    reduced = scored.map_batches(partial_topn, batch_format="pyarrow", batch_size=8192)
    out = (
        reduced.sort("dsir_key", descending=True)
        .limit(n)
        .to_pandas()
        .reset_index(drop=True)
    )
    return out


def dsir_reference(
    raw: Sequence[tuple[int, str]],
    target_texts: Sequence[str],
    n: int,
    seed: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.5,
) -> list[int]:
    """Single-process DSIR over (id, text) pairs — the pytest parity pin
    (same hashing, smoothing and Gumbel keys as the distributed path)."""
    tc = target_bucket_counts(target_texts, n_buckets)
    rc = np.zeros(n_buckets, dtype=np.int64)
    for _, t in raw:
        ids = _bucket_ids(_doc_ngrams(t), n_buckets)
        rc += np.bincount(ids, minlength=n_buckets)
    lr = log_importance_ratio(tc, rc, alpha)
    ids = np.asarray([d for d, _ in raw])
    logw = np.asarray(
        [lr[_bucket_ids(_doc_ngrams(t), n_buckets)].sum() for _, t in raw]
    )
    key = logw + _gumbel_from_ids(ids, seed)
    order = np.argsort(-key)[:n]
    return [int(i) for i in ids[order]]
