"""Sequence packing (concat-and-chunk): greedily pack documents into
training sequences of at most ``max_tokens`` tokens.

The pretraining-prep staple the reference never needed but a 100-TB
training-data pipeline does: documents become fixed-budget sequences so
the trainer sees dense batches.  Packing state is SHARD-LOCAL by
design — each input block packs independently inside ``map_batches``
(exactly how production pipelines pack per shard), so there is no
cross-partition sequential state, no driver loop, and results are
deterministic given the partitioning.  Sequences are identified by
their first document's id, which is unique corpus-wide regardless of
how blocks split.

A document longer than ``max_tokens`` on its own becomes a singleton
sequence flagged ``oversize`` — or, with ``chunk_oversize=True``, is
split into full-budget chunks + remainder (trainer semantics).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_OUT_SCHEMA = pa.schema(
    [
        ("seq_id", pa.int64()),          # first doc_id in the sequence
        ("doc_ids", pa.list_(pa.int64())),
        ("n_docs", pa.int64()),
        ("total_tokens", pa.int64()),
        ("oversize", pa.bool_()),
        ("chunk_idx", pa.int64()),       # 0 except for oversize chunks
    ]
)


def _pack_batch(
    batch: pa.Table,
    max_tokens: int,
    id_col: str,
    text_col: str,
    count_col=None,
    chunk_oversize: bool = False,
) -> pa.Table:
    """Greedy first-fit-in-order packing of one batch."""
    ids = batch[id_col].to_pylist()
    if count_col is not None:
        # precomputed token counts (e.g. learned-BPE piece counts from
        # ops.bpe.bpe_encode) — pack by the trainer's real token budget
        toks = batch[count_col].to_pylist()
    else:
        # whitespace token counts, vectorized (same token definition as
        # textstats.add_token_count)
        toks = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(batch[text_col]), r"\s+")
        ).to_pylist()
    seq_ids: list[int] = []
    doc_lists: list[list[int]] = []
    totals: list[int] = []
    oversize: list[bool] = []
    chunk_idx: list[int] = []
    cur: list[int] = []
    cur_tok = 0

    def emit_oversize(doc: int, n: int) -> None:
        if not chunk_oversize:
            seq_ids.append(doc)
            doc_lists.append([doc])
            totals.append(n)
            oversize.append(True)
            chunk_idx.append(0)
            return
        # trainer semantics: split an over-budget doc into full-budget
        # chunks + remainder; (seq_id, chunk_idx) identifies the piece
        full, rem = divmod(n, max_tokens)
        sizes = [max_tokens] * full + ([rem] if rem else [])
        for ci, sz in enumerate(sizes):
            seq_ids.append(doc)
            doc_lists.append([doc])
            totals.append(sz)
            oversize.append(False)
            chunk_idx.append(ci)

    for doc, n in zip(ids, toks):
        n = n or 0
        if n > max_tokens and not cur:
            emit_oversize(doc, n)
            continue
        if cur and cur_tok + n > max_tokens:
            seq_ids.append(cur[0])
            doc_lists.append(cur)
            totals.append(cur_tok)
            oversize.append(False)
            chunk_idx.append(0)
            cur, cur_tok = [], 0
        if n > max_tokens:  # oversize doc arriving with an open sequence
            emit_oversize(doc, n)
            continue
        cur.append(doc)
        cur_tok += n
    if cur:
        seq_ids.append(cur[0])
        doc_lists.append(cur)
        totals.append(cur_tok)
        oversize.append(False)
        chunk_idx.append(0)
    return pa.table(
        {
            "seq_id": pa.array(seq_ids, type=pa.int64()),
            "doc_ids": pa.array(doc_lists, type=pa.list_(pa.int64())),
            "n_docs": pa.array([len(d) for d in doc_lists], type=pa.int64()),
            "total_tokens": pa.array(totals, type=pa.int64()),
            "oversize": pa.array(oversize, type=pa.bool_()),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
        },
        schema=_OUT_SCHEMA,
    )


def _pack_batch_bfd(
    batch: pa.Table,
    max_tokens: int,
    id_col: str,
    text_col: str,
    count_col=None,
    chunk_oversize: bool = False,
) -> pa.Table:
    """Best-fit-decreasing packing of one batch: documents sorted by
    token count (desc, id asc) each go to the fullest open sequence
    they fit — classical BFD bin packing (≤ 11/9·OPT + fewer, denser
    sequences than order-preserving greedy at the cost of shuffling
    document order WITHIN the shard).  Oversize handling matches the
    greedy path."""
    import bisect

    ids = batch[id_col].to_pylist()
    if count_col is not None:
        toks = batch[count_col].to_pylist()
    else:
        toks = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(batch[text_col]), r"\s+")
        ).to_pylist()
    items = sorted(
        ((n or 0, doc) for doc, n in zip(ids, toks)), key=lambda t: (-t[0], t[1])
    )
    seq_ids: list[int] = []
    doc_lists: list[list[int]] = []
    totals: list[int] = []
    oversize: list[bool] = []
    chunk_idx: list[int] = []
    # open bins: remaining capacities kept sorted (bisect), parallel payloads
    rems: list[int] = []
    bins: list[tuple[int, list[int]]] = []  # (insertion tiebreak, docs) by rems order

    for n, doc in items:
        if n > max_tokens:
            if not chunk_oversize:
                seq_ids.append(doc)
                doc_lists.append([doc])
                totals.append(n)
                oversize.append(True)
                chunk_idx.append(0)
            else:
                full, rem = divmod(n, max_tokens)
                for ci, sz in enumerate([max_tokens] * full + ([rem] if rem else [])):
                    seq_ids.append(doc)
                    doc_lists.append([doc])
                    totals.append(sz)
                    oversize.append(False)
                    chunk_idx.append(ci)
            continue
        # best fit = smallest remaining capacity that still fits n
        i = bisect.bisect_left(rems, n)
        if i < len(rems):
            rem = rems.pop(i)
            _, docs = bins.pop(i)
        else:
            rem, docs = max_tokens, []
        docs.append(doc)
        new_rem = rem - n
        j = bisect.bisect_left(rems, new_rem)
        rems.insert(j, new_rem)
        bins.insert(j, (doc, docs))
    for rem, (_, docs) in zip(rems, bins):
        seq_ids.append(docs[0])
        doc_lists.append(docs)
        totals.append(max_tokens - rem)
        oversize.append(False)
        chunk_idx.append(0)
    return pa.table(
        {
            "seq_id": pa.array(seq_ids, type=pa.int64()),
            "doc_ids": pa.array(doc_lists, type=pa.list_(pa.int64())),
            "n_docs": pa.array([len(d) for d in doc_lists], type=pa.int64()),
            "total_tokens": pa.array(totals, type=pa.int64()),
            "oversize": pa.array(oversize, type=pa.bool_()),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
        },
        schema=_OUT_SCHEMA,
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    max_tokens: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
    count_col: str | None = None,
    chunk_oversize: bool = False,
    strategy: str = "greedy",
) -> "ray.data.Dataset":
    """Pack ``ds`` rows into sequences of ≤ ``max_tokens`` tokens.

    Token budget source: ``count_col`` when given (a precomputed
    per-document count column, e.g. learned-BPE piece counts), else
    whitespace token counts derived from ``text_col``.

    ``strategy="greedy"`` (default) packs first-fit IN ORDER —
    document order inside each sequence follows the shard;
    ``strategy="bfd"`` packs best-fit-decreasing, trading in-shard
    document order for fewer, denser sequences (less padding waste at
    the trainer).  Both are shard-local and deterministic.

    ``chunk_oversize=True`` splits an over-budget document into
    full-budget chunks plus a remainder (the trainer's concat-and-chunk
    semantics) instead of flagging it: every emitted sequence then fits
    the budget, and ``(seq_id, chunk_idx)`` identifies each piece.

    Returns a Dataset with schema ``(seq_id, doc_ids: list<int64>,
    n_docs, total_tokens, oversize, chunk_idx)``.  Every input document
    appears in exactly one output sequence (or one chunk run).
    """
    if strategy not in ("greedy", "bfd"):
        raise ValueError(f"unknown packing strategy: {strategy!r}")
    return ds.map_batches(
        _pack_batch if strategy == "greedy" else _pack_batch_bfd,
        fn_kwargs={
            "max_tokens": max_tokens,
            "id_col": id_col,
            "text_col": text_col,
            "count_col": count_col,
            "chunk_oversize": chunk_oversize,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
    )
