"""Long-document chunking: sliding token windows with overlap — the
standard pre-embedding stage of a retrieval pipeline (a 50k-token page
can't go through a fixed-context embedder; it becomes overlapping
windows keyed ``(doc_id, chunk_idx)`` that embed/index independently
and resolve back to the parent doc at serving time).

Scale shape: one ``map_batches`` pass.  Words explode once per batch
(the ``line_dedup`` object-array pattern), window index arrays build
with numpy repeat/cumsum arithmetic, and chunk texts reassemble with a
single pandas groupby-join — no Python loop over words, no shuffle,
embarrassingly parallel.  Output rows carry ``n_chunks`` so downstream
aggregation (e.g. max-score-per-doc) needs no second pass over the
corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def chunk_batch(
    batch: pa.Table,
    max_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Chunk one Arrow batch; returns ``(doc_id, chunk_idx, n_chunks,
    text, n_tokens)`` rows.  Tokens are whitespace runs; chunk ``i``
    covers tokens ``[i*stride, i*stride + max_tokens)`` with ``stride =
    max_tokens - overlap``, so consecutive chunks share exactly
    ``overlap`` tokens (fewer in the final short chunk).  Every doc
    yields at least one chunk — empty docs survive as one empty chunk,
    so chunking never silently drops corpus ids."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    s = batch[text_col].to_pandas().fillna("")
    s.index = pd.RangeIndex(len(s))
    words = s.str.findall(r"\S+")
    nw = words.str.len().to_numpy(np.int64)
    total = int(nw.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in words:
        flat[pos : pos + len(w)] = w
        pos += len(w)
    doc_off = np.concatenate([[0], np.cumsum(nw)])[:-1]

    # chunks per doc: 1 + ceil(max(nw - max_tokens, 0) / stride)
    extra = np.maximum(nw - max_tokens, 0)
    n_chunks = 1 + (extra + stride - 1) // stride

    # chunk-level arrays
    doc_idx = np.arange(len(s), dtype=np.int64).repeat(n_chunks)
    c_start = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - c_start.repeat(n_chunks)
    starts = chunk_idx * stride
    lens = np.minimum(max_tokens, nw[doc_idx] - starts)
    lens = np.maximum(lens, 0)  # empty doc -> one zero-length chunk

    # word-gather index: for chunk c, flat[doc_off + start : ... + len]
    total_out = int(lens.sum())
    base = (doc_off[doc_idx] + starts).repeat(lens)
    within_off = np.concatenate([[0], np.cumsum(lens)])[:-1]
    within = np.arange(total_out, dtype=np.int64) - within_off.repeat(lens)
    gathered = flat[base + within]
    owner = np.arange(len(lens), dtype=np.int64).repeat(lens)

    text = (
        pd.Series(gathered)
        .groupby(owner)
        .agg(" ".join)
        .reindex(pd.RangeIndex(len(lens)), fill_value="")
    )
    ids = batch[id_col].to_pandas().to_numpy()
    return pa.table(
        {
            id_col: pa.array(ids[doc_idx]),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            "n_chunks": pa.array(n_chunks[doc_idx], type=pa.int64()),
            text_col: pa.array(text, type=pa.string()),
            "n_tokens": pa.array(lens, type=pa.int64()),
        }
    )


# chunk_idx fits comfortably in 20 bits (1M chunks = 256M tokens/doc at
# the default window); doc_id keeps the high 43 bits.
_CHUNK_BITS = 20


def pack_chunk_id(doc_id, chunk_idx):
    """Pack ``(doc_id, chunk_idx)`` into one int64 — the vector key the
    ANN index family needs (they key on a single int64 id).  Vectorized
    over numpy arrays or scalars; inverse is :func:`unpack_chunk_id`.

    LOUD on overflow: ``|doc_id| >= 2^43`` (e.g. a full-range 64-bit
    hash id — remap to dense ids first) or ``chunk_idx >= 2^20`` would
    wrap silently, colliding chunk keys across documents and resolving
    search hits to the WRONG parent doc."""
    d = np.asarray(doc_id, dtype=np.int64)
    c = np.asarray(chunk_idx, dtype=np.int64)
    if np.any(np.abs(d) >= np.int64(1) << (63 - _CHUNK_BITS)):
        raise ValueError(
            f"doc_id out of packable range (|id| < 2^{63 - _CHUNK_BITS}); "
            "remap full-range hash ids to dense ids before chunk packing"
        )
    if np.any((c < 0) | (c >= np.int64(1) << _CHUNK_BITS)):
        raise ValueError(f"chunk_idx must be in [0, 2^{_CHUNK_BITS})")
    return d * np.int64(1 << _CHUNK_BITS) + c


def unpack_chunk_id(chunk_key):
    """Inverse of :func:`pack_chunk_id` → ``(doc_id, chunk_idx)``."""
    k = np.int64(chunk_key)
    return k >> np.int64(_CHUNK_BITS), k & np.int64((1 << _CHUNK_BITS) - 1)


def add_chunk_key(
    batch: pa.Table, id_col: str = "doc_id", out_col: str = "chunk_key"
) -> pa.Table:
    """Append the packed int64 ``chunk_key`` to a chunked batch (run
    after :func:`chunk_batch`) so chunk rows can flow through the
    int64-keyed embed/ANN/dedup chain unchanged."""
    keys = pack_chunk_id(
        batch[id_col].to_numpy(zero_copy_only=False),
        batch["chunk_idx"].to_numpy(zero_copy_only=False),
    )
    return batch.append_column(out_col, pa.array(keys, type=pa.int64()))


def resolve_chunk_hits(
    hits: "pd.DataFrame",
    key_col: str = "chunk_key",
    score_col: str | None = None,
    k: int | None = None,
) -> "pd.DataFrame":
    """Collapse chunk-level search hits to PARENT documents: per doc,
    keep the best chunk (max ``score_col``, or min rank when no score
    column), re-rank, optionally cut to top ``k``.  Hits frames are
    k-sized — this is driver-side by design.  Returns
    ``(doc_id, best_chunk_idx, <score_col|rank>, rank)``."""
    df = hits.copy()
    doc, idx = unpack_chunk_id(df[key_col].to_numpy())
    df["doc_id"] = doc
    df["best_chunk_idx"] = idx
    if score_col is not None:
        df.sort_values(
            [score_col, "doc_id", "best_chunk_idx"],
            ascending=[False, True, True],
            kind="stable",
            inplace=True,
        )
        keep_cols = ["doc_id", "best_chunk_idx", score_col]
    else:
        df.sort_values(
            ["rank", "doc_id", "best_chunk_idx"], kind="stable", inplace=True
        )
        keep_cols = ["doc_id", "best_chunk_idx"]
    best = df.drop_duplicates("doc_id", keep="first")[keep_cols].reset_index(drop=True)
    if k is not None:
        best = best.head(k)
    best["rank"] = np.arange(1, len(best) + 1)
    return best


def chunk_documents(
    ds: "ray.data.Dataset",
    max_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Streaming corpus chunker (see :func:`chunk_batch`).  The output
    feeds ``ops.embed.embed_texts`` / the ANN index builders directly;
    downstream dedup of near-identical chunks is exactly what the
    overlap creates, so index ``(doc_id, chunk_idx)`` — don't near-dedup
    chunk text."""
    return ds.map_batches(
        lambda b: chunk_batch(
            b,
            max_tokens=max_tokens,
            overlap=overlap,
            text_col=text_col,
            id_col=id_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
