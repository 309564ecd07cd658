"""Benchmark decontamination: flag training documents that contain any
n-gram from an evaluation/benchmark set (the GPT-3-style "remove test
set from training data" step; 13-gram overlap is the published
convention).

Scale shape: the benchmark side is SMALL (eval sets are thousands of
documents) — its n-gram hash set is built driver-side, ``ray.put``
once, and read zero-copy from the object store by every map task; the
CORPUS side streams through one vectorized ``map_batches`` with no
shuffle at all.  Per-batch work is one ``pd.util.hash_array`` call over
every n-gram of the batch plus one ``np.isin`` against the sorted
benchmark array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _ngram_strings(text: str, n: int) -> list[str]:
    toks = (text or "").lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def benchmark_ngram_hashes(benchmark_texts: list[str], n: int = 13) -> np.ndarray:
    """Sorted uint64 hash array of every word n-gram in the benchmark
    set (driver-side; benchmark sets are small by construction)."""
    grams: set[str] = set()
    for t in benchmark_texts:
        grams.update(_ngram_strings(t, n))
    if not grams:
        return np.array([], dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(sorted(grams), dtype=object))
    return np.sort(h)


def flag_contaminated(
    ds: "ray.data.Dataset",
    benchmark_texts: list[str],
    n: int = 13,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Append ``n_contaminated_ngrams`` (int64) and ``contaminated``
    (bool) to every row: the count of the document's n-grams that occur
    in the benchmark set, and whether any did.  The benchmark hash set
    is broadcast once (``ray.put``); each task reads it zero-copy from
    the local object store — no shuffle, no per-batch reshipping.
    """
    bench_ref = ray.put(benchmark_ngram_hashes(benchmark_texts, n))

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # plasma-local, zero-copy after first task
        texts = batch[text_col].to_pylist()
        per_doc = [_ngram_strings(t, n) for t in texts]
        counts = np.zeros(len(texts), dtype=np.int64)
        flat = [g for grams in per_doc for g in grams]
        if flat and len(bench):
            hits = np.isin(
                pd.util.hash_array(np.asarray(flat, dtype=object)), bench
            )
            lens = np.fromiter((len(g) for g in per_doc), dtype=np.int64, count=len(per_doc))
            # per-doc hit counts via segment sums over the flat layout
            csum = np.concatenate([[0], np.cumsum(hits.astype(np.int64))])
            ends = np.cumsum(lens)
            counts = csum[ends] - csum[ends - lens]
        batch = batch.append_column(
            "n_contaminated_ngrams", pa.array(counts, type=pa.int64())
        )
        return batch.append_column(
            "contaminated", pa.array(counts > 0, type=pa.bool_())
        )

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=2048)
