"""Binary token-shard delivery: the trainer-facing export format.

The reference ends at markdown (`MarkdownConverter.ts` — its output is
consumed by humans/LLM prompts); a 100-TB pretraining pipeline ends at
memory-mapped token streams (the Megatron-LM / GPT-2 `.bin` layout:
little-endian uint16/uint32 tokens, fixed-length sequences, one file
per shard).  This module is that last mile, composed from stages the
engine already has:

  bpe_encode(keep_pieces=True)           (ops/bpe.py)
    → build_piece_vocab                  one bounded distinct pass
    → tokens_from_pieces                 broadcast vocab, int32 ids
    → concat_and_chunk                   shard-local concat-and-chunk
    → write_token_shards                 seeded shuffle → .bin + .idx.json
                                          per shard, atomic + resumable
    → read_token_shards                  distributed mmap-style read-back

Scale posture:
- The vocab distinct pass is bounded BY CONSTRUCTION, not by corpus
  size: every piece ``encode_word`` can emit is either a single
  character of the training alphabet or the concatenation produced by
  one of the learned merges, so distinct pieces ≤ |alphabet| + |merges|
  (a few thousand) no matter how many documents stream through.
- Chunking is shard-local inside ``map_batches`` (same posture as
  ``ops/packing.py``): no cross-partition state, no driver loop.
- Shard files are written inside ``groupby(shard).map_groups`` tasks —
  bytes never transit the driver — with tmp+rename atomicity, so a
  killed export resumes by skipping shards whose ``.idx.json`` exists.
- One shard materializes in ONE write task (that is what makes the file
  atomic and the resume unit whole-file): size ``n_shards`` so a single
  shard's token matrix fits a worker heap — at uint16 and seq_len 512 a
  1-GiB shard is ~1M sequences, and a 100-TB corpus wants tens of
  thousands of shards, not 8.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

EOS_PIECE = "<eos>"
PAD_PIECE = "<pad>"
_SPECIALS = (PAD_PIECE, EOS_PIECE)  # pad=0, eos=1


def build_piece_vocab(encoded: "ray.data.Dataset", pieces_col: str = "pieces") -> list[str]:
    """Deterministic piece→id vocabulary from an encoded corpus.

    One distributed distinct pass (per-batch ``np.unique`` partials →
    one small groupby); the result is bounded by the BPE symbol set
    (alphabet + merges), never by corpus size.  Ids: specials first
    (pad=0, eos=1), then pieces in lexicographic order — reproducible
    across runs, partitionings and engines.
    """

    def local_unique(batch: pa.Table) -> pa.Table:
        flat = batch[pieces_col].combine_chunks().flatten()
        uniq = np.unique(np.asarray(flat.to_pylist(), dtype=object))
        return pa.table({"piece": pa.array(list(uniq), type=pa.string())})

    parts = encoded.map_batches(local_unique, batch_format="pyarrow", batch_size=4096)
    distinct = parts.groupby("piece").count().to_pandas()  # bounded: symbol set
    pieces = sorted(p for p in distinct["piece"].tolist() if p not in _SPECIALS)
    return list(_SPECIALS) + pieces


def tokens_from_pieces(
    encoded: "ray.data.Dataset",
    vocab: list[str],
    pieces_col: str = "pieces",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Map piece strings to int32 token ids (broadcast vocab, one
    ``np.unique`` + inverse gather per batch — each distinct piece is
    looked up once per batch, not once per occurrence)."""
    vocab_ref = ray.put({p: i for i, p in enumerate(vocab)})

    class Mapper:
        def __init__(self):
            self.lut = ray.get(vocab_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[pieces_col].combine_chunks()
            flat = np.asarray(col.flatten().to_pylist(), dtype=object)
            offsets = col.offsets.to_numpy(zero_copy_only=False)
            if len(flat):
                uniq, inv = np.unique(flat, return_inverse=True)
                lut = self.lut
                uids = np.asarray([lut[p] for p in uniq], dtype=np.int32)
                ids = uids[inv]
            else:
                ids = np.empty(0, dtype=np.int32)
            out = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(ids, type=pa.int32())
            )
            return pa.table({id_col: batch[id_col], "token_ids": out})

    return encoded.map_batches(
        Mapper, concurrency=(1, 8), batch_format="pyarrow", batch_size=1024
    )


def concat_and_chunk(
    tokens: "ray.data.Dataset",
    seq_len: int = 512,
    eos_id: int = 1,
    pad_id: int = 0,
    id_col: str = "doc_id",
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """GPT-style concat-and-chunk, shard-local: within each batch,
    document token streams are concatenated (one ``eos_id`` after each
    document) and emitted as exactly-``seq_len`` sequences; the batch's
    tail remainder becomes one pad-filled final sequence (``n_tokens``
    records the real length).  Identity: ``(seq_id, chunk_idx)`` where
    ``seq_id`` is the batch's first doc_id — unique corpus-wide however
    blocks split, same contract as ``ops/packing.py``.
    """

    def chunk(batch: pa.Table) -> pa.Table:
        col = batch["token_ids"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        n_docs = len(batch)
        if n_docs == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], type=pa.int64()),
                    "chunk_idx": pa.array([], type=pa.int64()),
                    "token_ids": pa.array([], type=pa.list_(pa.int32())),
                    "n_tokens": pa.array([], type=pa.int64()),
                }
            )
        # insert one eos after each document: build the concatenated
        # stream vectorized (lengths + scatter), no per-token loop
        doc_lens = np.diff(offsets)
        total = int(flat.size + n_docs)
        stream = np.empty(total, dtype=np.int64)
        ends = np.cumsum(doc_lens + 1)  # position AFTER each doc's eos
        stream[ends - 1] = eos_id
        mask = np.ones(total, dtype=bool)
        mask[ends - 1] = False
        stream[mask] = flat
        first_id = int(batch[id_col][0].as_py())
        n_full, rem = divmod(total, seq_len)
        seqs = [stream[i * seq_len : (i + 1) * seq_len] for i in range(n_full)]
        n_tok = [seq_len] * n_full
        if rem:
            tail = np.full(seq_len, pad_id, dtype=np.int64)
            tail[:rem] = stream[n_full * seq_len :]
            seqs.append(tail)
            n_tok.append(rem)
        k = len(seqs)
        return pa.table(
            {
                "seq_id": pa.array([first_id] * k, type=pa.int64()),
                "chunk_idx": pa.array(range(k), type=pa.int64()),
                "token_ids": pa.array(
                    [s.astype(np.int32) for s in seqs], type=pa.list_(pa.int32())
                ),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
            }
        )

    return tokens.map_batches(chunk, batch_format="pyarrow", batch_size=batch_size)


def _dtype_for(vocab_size: int) -> str:
    return "uint16" if vocab_size <= np.iinfo(np.uint16).max + 1 else "uint32"


def write_token_shards(
    seqs: "ray.data.Dataset",
    path: str,
    vocab: list[str],
    n_shards: int = 8,
    seed: int = 0,
    seq_len: int | None = None,
) -> dict:
    """Seeded-shuffle sharded binary export, atomic and resumable.

    Sequences get deterministic shard + shuffle order via
    ``partitioning.assign_shards`` keyed on ``seq_id#chunk_idx`` (the
    unique sequence identity — ``seq_id`` alone is shared by every
    chunk of one input batch, which would collapse the shuffle); same
    reproducible-global-shuffle contract as the parquet exporter.  Each
    shard's task writes ``shard_K.bin`` (raw little-endian tokens,
    uint16 when the vocab fits, else uint32) and ``shard_K.idx.json``
    (dtype, seq_len, n_seqs, per-sequence real lengths) via tmp+rename
    — a re-run SKIPS shards whose idx already exists, so a killed
    export never rewrites finished files.  ``vocab.json`` rides along:
    the delivery is meaningless to a trainer without it.

    Returns a manifest dict (per-shard seq/token counts, dtype, path).
    """
    from .partitioning import assign_shards

    os.makedirs(path, exist_ok=True)
    dtype = _dtype_for(len(vocab))
    vpath = os.path.join(path, "vocab.json")
    if not os.path.exists(vpath):
        tmp = vpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"format": "fer-token-shards", "version": 1, "vocab": vocab}, f)
        os.replace(tmp, vpath)

    def add_uid(batch: pa.Table) -> pa.Table:
        sid = batch["seq_id"].to_pylist()
        cid = batch["chunk_idx"].to_pylist()
        return batch.append_column(
            "seq_uid", pa.array([f"{s}#{c}" for s, c in zip(sid, cid)], type=pa.string())
        )

    with_uid = seqs.map_batches(add_uid, batch_format="pyarrow", batch_size=4096)
    sharded = assign_shards(with_uid, n_shards, seed=seed, id_col="seq_uid")

    def write_shard(group: "pa.Table | object") -> pa.Table:
        import pandas as pd

        if isinstance(group, pd.DataFrame):
            df = group.sort_values("shuffle_key")
        else:  # pragma: no cover - map_groups hands pandas by default
            df = group.to_pandas().sort_values("shuffle_key")
        shard = int(df["shard"].iloc[0])
        bin_path = os.path.join(path, f"shard_{shard:05d}.bin")
        idx_path = os.path.join(path, f"shard_{shard:05d}.idx.json")
        if os.path.exists(idx_path):  # resume: shard already delivered
            with open(idx_path) as f:
                meta = json.load(f)
            return pa.table(
                {
                    "shard": pa.array([shard], type=pa.int64()),
                    "n_seqs": pa.array([meta["n_seqs"]], type=pa.int64()),
                    "n_tokens": pa.array([meta["n_tokens"]], type=pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        mat = np.stack([np.asarray(t, dtype=np.int64) for t in df["token_ids"]])
        L = mat.shape[1]
        if seq_len is not None and L != seq_len:
            # the caller's declared seq_len is ENFORCED, not decorative —
            # a mismatch means the upstream chunker and this export were
            # composed with different lengths, and the trainer would
            # mmap the .bin with the wrong stride
            raise ValueError(
                f"shard {shard}: sequences are length {L}, caller declared "
                f"seq_len={seq_len}"
            )
        lens = df["n_tokens"].astype(int).tolist()
        tmp_bin = bin_path + ".tmp"
        mat.astype(np.dtype(dtype).newbyteorder("<")).tofile(tmp_bin)
        os.replace(tmp_bin, bin_path)
        meta = {
            "format": "fer-token-shards",
            "version": 1,
            "dtype": dtype,
            "seq_len": L,
            "n_seqs": int(mat.shape[0]),
            "n_tokens": int(sum(lens)),
            "lengths": lens,
        }
        tmp_idx = idx_path + ".tmp"
        with open(tmp_idx, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_idx, idx_path)
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int64()),
                "n_seqs": pa.array([meta["n_seqs"]], type=pa.int64()),
                "n_tokens": pa.array([meta["n_tokens"]], type=pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    manifest = (
        sharded.groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()  # bounded: one row per shard
        .sort_values("shard")
        .reset_index(drop=True)
    )
    return {
        "path": path,
        "dtype": dtype,
        "n_shards": int(len(manifest)),
        "n_seqs": int(manifest["n_seqs"].sum()),
        "n_tokens": int(manifest["n_tokens"].sum()),
        "skipped_shards": int(manifest["skipped"].sum()),
    }


def _mix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 — ONE shared implementation
    (ops/sketches._splitmix64_vec) so epoch ordering and bloom hashing
    can never drift apart; pure uint64 arithmetic, stable across runs,
    machines and library versions."""
    from .sketches import _splitmix64_vec

    return _splitmix64_vec(np.asarray(x, dtype=np.uint64))


def read_token_shards(path: str, epoch: int | None = None) -> "ray.data.Dataset":
    """Distributed read-back: one task per shard file parses its
    ``.bin`` against the sidecar idx (``np.frombuffer`` reshape — the
    same zero-copy access pattern a trainer's mmap loader uses) and
    yields ``(shard, seq_idx, token_ids, n_tokens)`` rows.  File bytes
    never transit the driver; only the file LIST does.

    ``epoch`` turns this into the multi-epoch trainer feed: shard ORDER
    and the row order WITHIN each shard both permute deterministically
    per epoch (splitmix64 of (epoch, shard[, row]) — no RNG state, so
    any worker reproduces any epoch), while the row multiset stays
    identical.  ``epoch=None`` keeps the written sequential order.
    The write-time seeded shuffle decorrelates neighbors once; epoch
    reshuffling here is the cheap per-pass reorder on top."""
    idx_files = sorted(
        f for f in os.listdir(path) if f.endswith(".idx.json") and f.startswith("shard_")
    )
    if epoch is not None:
        shard_nos = np.array(
            [int(f.split("_")[1].split(".")[0]) for f in idx_files], dtype=np.uint64
        )
        order = np.argsort(
            _mix64(shard_nos ^ (np.uint64(epoch) << np.uint64(32))), kind="stable"
        )
        idx_files = [idx_files[i] for i in order]
    files = ray.data.from_items(
        [{"idx": os.path.join(path, f)} for f in idx_files]
    )

    def load(batch: pa.Table) -> pa.Table:
        shards, seq_idx, toks, lens = [], [], [], []
        for ipath in batch["idx"].to_pylist():
            with open(ipath) as f:
                meta = json.load(f)
            shard = int(os.path.basename(ipath).split("_")[1].split(".")[0])
            raw = np.fromfile(
                ipath.replace(".idx.json", ".bin"),
                dtype=np.dtype(meta["dtype"]).newbyteorder("<"),
            ).reshape(meta["n_seqs"], meta["seq_len"])
            rows = np.arange(meta["n_seqs"], dtype=np.uint64)
            if epoch is not None and meta["n_seqs"]:
                key = rows ^ (np.uint64(shard) << np.uint64(20))
                key ^= np.uint64(epoch) << np.uint64(40)
                rows = rows[np.argsort(_mix64(key), kind="stable")]
            for i in rows.tolist():
                shards.append(shard)
                seq_idx.append(i)
                toks.append(raw[i].astype(np.int32))
                lens.append(meta["lengths"][i])
        return pa.table(
            {
                "shard": pa.array(shards, type=pa.int64()),
                "seq_idx": pa.array(seq_idx, type=pa.int64()),
                "token_ids": pa.array([t for t in toks], type=pa.list_(pa.int32())),
                "n_tokens": pa.array(lens, type=pa.int64()),
            }
        )

    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


def export_token_delivery(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    path: str,
    seq_len: int = 512,
    n_shards: int = 8,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """End-to-end delivery: encode with a learned BPE, build the vocab,
    id-map, concat-and-chunk, and write binary shards.  The composed
    form a user calls after ``curate_corpus``."""
    from .bpe import bpe_encode

    encoded = bpe_encode(ds, merges, text_col=text_col, id_col=id_col, keep_pieces=True)
    vocab = build_piece_vocab(encoded)
    toks = tokens_from_pieces(encoded, vocab, id_col=id_col)
    seqs = concat_and_chunk(toks, seq_len=seq_len, id_col=id_col)
    return write_token_shards(seqs, path, vocab, n_shards=n_shards, seed=seed, seq_len=seq_len)
