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
