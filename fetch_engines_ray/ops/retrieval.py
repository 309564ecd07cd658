"""Distributed BM25 keyword retrieval.

Public-knowledge basis: Robertson & Zaragoza, "The Probabilistic
Relevance Framework: BM25 and Beyond" (FnTIR 2009) — the standard
keyword-relevance score.  A training-data engine needs it for targeted
corpus slicing ("every document about X"), hard-negative mining next to
the vector-search family, and keyword/vector hybrid retrieval.

Ray-Data shape:

- corpus statistics are ONE pass: per-batch partial document-frequency
  rows (distinct terms per doc, pre-aggregated per batch before the
  shuffle, exactly like ``textstats.word_counts``) plus a tiny
  ``(n_docs, total_len)`` reduce for the average document length;
- only the QUERY terms' statistics are kept (a query touches a handful
  of terms), broadcast once via ``ray.put``;
- scoring is one stateless ``map_batches`` pass (vectorized term
  counting against the query vocabulary), with per-block top-k partials
  before the final ``sort.limit`` reduce.

Scores are computed in float64 from exact integer inputs with a fixed
per-term summation order (query-term order), so results are
deterministic and partitioning-invariant; ties break by doc id.
"""
from __future__ import annotations

import math
from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray


def _tokenize(text: Optional[str]) -> list[str]:
    return (text or "").lower().split()


def corpus_stats(
    ds: "ray.data.Dataset",
    query_terms: Sequence[str],
    text_col: str = "text",
) -> tuple[dict[str, int], int, float]:
    """One distributed pass: document frequencies for the QUERY terms
    only, corpus size, and average document length."""
    from ray.data.aggregate import Sum

    terms = sorted(set(t.lower() for t in query_terms))
    term_arr = np.asarray(terms, dtype=object)

    def partial(batch: pa.Table) -> pa.Table:
        df_counts = np.zeros(len(terms), dtype=np.int64)
        n_docs = 0
        total_len = 0
        for t in batch[text_col].to_pylist():
            toks = _tokenize(t)
            n_docs += 1
            total_len += len(toks)
            if toks:
                present = np.isin(term_arr, np.unique(np.asarray(toks, dtype=object)))
                df_counts += present
        rows = {
            "term": pa.array(terms + ["\x00n_docs", "\x00total_len"], type=pa.string()),
            "n": pa.array(
                np.concatenate([df_counts, [n_docs, total_len]]), type=pa.int64()
            ),
        }
        return pa.table(rows)

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    stats = dict(zip(rolled["term"], rolled["n"].astype(int)))
    n_docs = stats.pop("\x00n_docs", 0)
    total_len = stats.pop("\x00total_len", 0)
    avgdl = (total_len / n_docs) if n_docs else 0.0
    return stats, n_docs, avgdl


def _idf(df: int, n_docs: int) -> float:
    # BM25+-style floor at 0 via the standard Robertson idf with 0.5s
    return max(0.0, math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))


def bm25_topk(
    ds: "ray.data.Dataset",
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """BM25 top-k documents for one query string.

    Returns ``(doc_id, score_x1e6, rank)`` — the score rides as integer
    micro-units (round-half-away) so downstream hash comparisons are
    representation-stable."""
    terms = sorted(set(_tokenize(query)))
    if not terms:
        return pd.DataFrame(columns=[id_col, "score_x1e6", "rank"])
    import ray

    dfs, n_docs, avgdl = corpus_stats(ds, terms, text_col)
    idf = np.asarray([_idf(dfs.get(t, 0), n_docs) for t in terms])
    bc = ray.put((np.asarray(terms, dtype=object), idf, float(avgdl)))

    def block_topk(batch: pa.Table) -> pa.Table:
        terms_l, idf_l, avgdl_l = ray.get(bc)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tf = np.zeros((len(ids), len(terms_l)), dtype=np.float64)
        dl = np.zeros(len(ids), dtype=np.float64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = _tokenize(t)
            dl[i] = len(toks)
            if toks:
                u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
                pos = np.searchsorted(u, terms_l)
                pos = np.clip(pos, 0, len(u) - 1)
                hit = u[pos] == terms_l
                tf[i] = np.where(hit, c[pos], 0)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / (avgdl_l or 1.0))
        scores = ((tf * (k1 + 1.0)) / denom) @ idf_l
        # integer micro-units, half-away (matches the engine's money
        # convention); keep only scoring docs
        sx = np.floor(scores * 1_000_000 + 0.5).astype(np.int64)
        nz = sx > 0
        order = np.lexsort((ids[nz], -sx[nz]))[:k]
        keep = np.nonzero(nz)[0][order]
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "score_x1e6": pa.array(sx[keep], type=pa.int64()),
            }
        )

    reduced = ds.map_batches(block_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    if reduced.empty:  # no scoring doc anywhere (ray drops empty schema)
        return pd.DataFrame(columns=[id_col, "score_x1e6", "rank"])
    reduced.sort_values(
        ["score_x1e6", id_col], ascending=[False, True], inplace=True
    )
    top = reduced.head(k).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def bm25_reference(
    docs: Sequence[tuple[int, str]],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Single-process BM25 (pytest parity pin; identical arithmetic)."""
    terms = sorted(set(_tokenize(query)))
    toks = {d: _tokenize(t) for d, t in docs}
    n_docs = len(docs)
    avgdl = (sum(len(v) for v in toks.values()) / n_docs) if n_docs else 0.0
    dfs = {t: sum(1 for v in toks.values() if t in set(v)) for t in terms}
    idf = np.asarray([_idf(dfs[t], n_docs) for t in terms])
    rows = []
    for d, tk in toks.items():
        tf = np.asarray([float(tk.count(t)) for t in terms])
        denom = tf + k1 * (1.0 - b + b * len(tk) / (avgdl or 1.0))
        score = float(((tf * (k1 + 1.0)) / denom) @ idf)
        sx = int(math.floor(score * 1_000_000 + 0.5))
        if sx > 0:
            rows.append((d, sx))
    out = pd.DataFrame(rows, columns=["doc_id", "score_x1e6"]).sort_values(
        ["score_x1e6", "doc_id"], ascending=[False, True]
    )
    out = out.head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def rrf_fuse(
    ranked: Sequence[pd.DataFrame],
    id_cols: Optional[Sequence[str]] = None,
    k: int = 60,
    topk: Optional[int] = None,
) -> pd.DataFrame:
    """Reciprocal-rank fusion of ranked result lists (Cormack, Clarke &
    Buettcher, SIGIR 2009): ``score = sum_lists 1 / (k + rank)`` — the
    standard way to combine BM25 and vector-search results without score
    calibration.

    Each input frame needs an id column (default ``doc_id``,
    ``neighbor_id`` accepted for the kNN family's output) and a ``rank``
    column.  Driver-side by design: inputs are k-sized result lists.
    Scores ride as integer nano-units summed in list order —
    deterministic, ties break by id."""
    if id_cols is None:
        id_cols = [
            "doc_id" if "doc_id" in f.columns else "neighbor_id" for f in ranked
        ]
    acc: dict = {}
    for f, idc in zip(ranked, id_cols):
        for did, rank in zip(f[idc], f["rank"]):
            acc[did] = acc.get(did, 0) + round(1e9 / (k + int(rank)))
    out = pd.DataFrame(
        sorted(acc.items(), key=lambda kv: (-kv[1], kv[0])),
        columns=["doc_id", "rrf_score_x1e9"],
    )
    if topk is not None:
        out = out.head(topk)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out
