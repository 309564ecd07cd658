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
    # NOTE: pandas object-string hashing truncates at NUL bytes; both
    # the benchmark side (here) and the corpus pass hash through the
    # SAME function, so the comparison stays symmetric — a NUL-bearing
    # gram can only create a FALSE POSITIVE (drops a clean doc), never
    # leak contamination.
    h = pd.util.hash_array(np.asarray(sorted(grams), dtype=object))
    return np.sort(h)


def benchmark_bloom(
    benchmark_texts: list[str], n: int = 13, fp_rate: float = 1e-4
) -> tuple[bytes, int, int]:
    """``(blob, m_bits, k)`` Bloom filter over the benchmark n-gram set
    (``ops.sketches`` bit layout).  The compact-broadcast alternative to
    :func:`benchmark_ngram_hashes` for LARGE reference sides
    (cross-corpus decontamination, billion-entry blocklists): ~2.4
    bytes/n-gram at fp 1e-4 vs 8 for the sorted hash array, and false
    positives only ever DROP a clean document — Bloom filters have no
    false negatives, so contamination never leaks through."""
    import math

    from .sketches import _bloom_set

    grams: set[str] = set()
    for t in benchmark_texts:
        grams.update(_ngram_strings(t, n))
    n_items = max(1, len(grams))
    m_bits = int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    m_bits = max(64, (m_bits + 63) // 64 * 64)
    k = max(1, round(m_bits / n_items * math.log(2)))
    bits = _bloom_set(np.asarray(sorted(grams), dtype=object), m_bits, k)
    return bits.tobytes(), m_bits, k


def flag_contaminated(
    ds: "ray.data.Dataset",
    benchmark_texts: list[str],
    n: int = 13,
    text_col: str = "text",
    probe: str = "isin",
    bloom_fp: float = 1e-4,
) -> "ray.data.Dataset":
    """Append ``n_contaminated_ngrams`` (int64) and ``contaminated``
    (bool) to every row: the count of the document's n-grams that occur
    in the benchmark set, and whether any did.  The benchmark index is
    broadcast once (``ray.put``); each task reads it zero-copy from
    the local object store — no shuffle, no per-batch reshipping.

    ``probe="isin"`` (default) uses the exact sorted-hash-array index;
    ``probe="bloom"`` swaps in the :func:`benchmark_bloom` filter —
    a ~3-7x smaller broadcast for large reference sides, with counts
    becoming an upper bound (rate ``bloom_fp``) in the conservative
    direction: extra drops, never leaked contamination.
    """
    if probe not in ("isin", "bloom"):
        raise ValueError("probe must be 'isin' or 'bloom'")
    if probe == "bloom":
        blob, m_bits, k = benchmark_bloom(benchmark_texts, n, bloom_fp)
        bench_ref = ray.put(blob)
    else:
        bench_ref = ray.put(benchmark_ngram_hashes(benchmark_texts, n))

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # plasma-local, zero-copy after first task
        texts = batch[text_col].to_pylist()
        per_doc = [_ngram_strings(t, n) for t in texts]
        counts = np.zeros(len(texts), dtype=np.int64)
        flat = [g for grams in per_doc for g in grams]
        if flat and len(bench):
            if probe == "bloom":
                from .sketches import bloom_contains as _bc

                hits = _bc(bench, np.asarray(flat, dtype=object), m_bits, k)
            else:
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


def _bench_band_tables(bench_sigs: np.ndarray, num_bands: int) -> list:
    """Per-band ``(sorted_keys, bench_row_permutation)`` lookup tables
    over the benchmark signature matrix (the broadcast probe index)."""
    from .dedup import _fold_band_keys

    if len(bench_sigs):
        bench_keys = _fold_band_keys(bench_sigs, num_bands)
    else:
        bench_keys = np.zeros((0, num_bands), dtype=np.int64)
    tables = []
    for b in range(num_bands):
        order = np.argsort(bench_keys[:, b], kind="stable")
        tables.append((bench_keys[order, b], order.astype(np.int64)))
    return tables


def _probe_best(
    sigs: np.ndarray, bench_sigs: np.ndarray, band_tables: list
) -> tuple[np.ndarray, np.ndarray]:
    """Pure probe kernel: for each doc signature, the best estimated
    Jaccard among benchmark rows sharing AT LEAST ONE band key, and the
    index of that best match (ties → lowest bench index; no collision →
    ``0.0`` / ``-1``).  Factored out of the map task so the exact
    candidate semantics are property-testable against a brute-force
    recompute without a Ray session."""
    from .dedup import _fold_band_keys

    n = len(sigs)
    num_bands = len(band_tables)
    best = np.zeros(n, dtype=np.float64)
    best_id = np.full(n, -1, dtype=np.int64)
    if not n or not len(bench_sigs):
        return best, best_id
    keys = _fold_band_keys(sigs, num_bands)
    cand_d: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []
    for b, (skeys, order) in enumerate(band_tables):
        lo = np.searchsorted(skeys, keys[:, b], side="left")
        hi = np.searchsorted(skeys, keys[:, b], side="right")
        width = hi - lo
        docs_hit = np.nonzero(width)[0]
        if not len(docs_hit):
            continue
        # expand duplicate-key runs: doc i matches bench rows
        # order[lo[i]:hi[i]]
        reps = width[docs_hit]
        flat_doc = np.repeat(docs_hit, reps)
        flat_pos = np.concatenate([np.arange(lo[i], hi[i]) for i in docs_hit])
        cand_d.append(flat_doc)
        cand_b.append(order[flat_pos])
    if cand_d:
        d = np.concatenate(cand_d)
        bidx = np.concatenate(cand_b)
        # dedupe (doc, bench) pairs colliding in several bands
        pair_key = d * np.int64(len(bench_sigs)) + bidx
        _, uniq = np.unique(pair_key, return_index=True)
        d, bidx = d[uniq], bidx[uniq]
        est = (sigs[d] == bench_sigs[bidx]).mean(axis=1)
        np.maximum.at(best, d, est)
        # argmax bench id per doc: keep the id of the pair that achieves
        # the per-doc max (ties → lowest bench id via stable ordering on
        # (doc, -est, bench))
        o = np.lexsort((bidx, -est, d))
        d_o = d[o]
        first = np.ones(len(d_o), dtype=bool)
        first[1:] = d_o[1:] != d_o[:-1]
        best_id[d_o[first]] = bidx[o][first]
    return best, best_id


def fuzzy_decontaminate(
    ds: "ray.data.Dataset",
    benchmark_texts: list[str],
    threshold: float = 0.8,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_size: int = 3,
    seed: int = 7,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Near-duplicate benchmark decontamination (the Llama-style fuzzy
    step next to the exact 13-gram rule): flag training documents whose
    MinHash-estimated Jaccard similarity to ANY benchmark document
    reaches ``threshold``, catching light paraphrases / whitespace
    edits that defeat exact n-gram matching.

    Appends three columns:

    - ``max_bench_jaccard`` (float64) — best estimated Jaccard against
      the benchmark set among LSH candidates (0.0 when no band
      collides),
    - ``matched_bench_id`` (int64) — index into ``benchmark_texts`` of
      that best match (−1 when no candidate),
    - ``fuzzy_contaminated`` (bool) — ``max_bench_jaccard >= threshold``.

    Scale shape: the benchmark side is SMALL, so its signature matrix
    and per-band sorted key tables are built driver-side and broadcast
    ONCE (``ray.put``, read zero-copy per task); the corpus streams
    through one ``map_batches`` with NO shuffle.  Per batch: one
    vectorized signature pass (the same ``MinHasher`` kernel the dedup
    family uses), a band fold identical to the pair-LSH
    (``dedup._fold_band_keys`` — both sides bucket identically), and a
    ``searchsorted`` probe per band; only colliding (doc, bench) pairs
    pay the full signature comparison.  With the defaults (16 bands of
    4 rows) a true 0.8-Jaccard pair is missed with probability
    ``(1 - 0.8^4)^16 ≈ 6e-5``."""
    from .dedup import MinHasher

    mh = MinHasher(num_perm=num_perm, shingle_size=shingle_size, seed=seed)
    bench_sigs = mh.signatures([t or "" for t in benchmark_texts]) if benchmark_texts else np.zeros((0, num_perm), dtype=np.int64)
    band_tables = _bench_band_tables(bench_sigs, num_bands)
    bench_ref = ray.put((bench_sigs, band_tables))

    def probe(batch: pa.Table) -> pa.Table:
        from .dedup import _MINHASHERS

        bench_sigs, band_tables = ray.get(bench_ref)  # plasma-local
        n = batch.num_rows
        if len(bench_sigs) and n:
            key = (num_perm, shingle_size, seed)
            h = _MINHASHERS.get(key)
            if h is None:
                h = _MINHASHERS[key] = MinHasher(num_perm, shingle_size, seed)
            sigs = h.signatures(batch[text_col].to_pylist())
            best, best_id = _probe_best(sigs, bench_sigs, band_tables)
        else:
            best = np.zeros(n, dtype=np.float64)
            best_id = np.full(n, -1, dtype=np.int64)
        batch = batch.append_column(
            "max_bench_jaccard", pa.array(best, type=pa.float64())
        )
        batch = batch.append_column(
            "matched_bench_id", pa.array(best_id, type=pa.int64())
        )
        return batch.append_column(
            "fuzzy_contaminated", pa.array(best >= threshold, type=pa.bool_())
        )

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=2048)
