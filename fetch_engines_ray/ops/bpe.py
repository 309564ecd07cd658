"""BPE tokenizer training + encoding over the corpus.

Real byte-pair-encoding (Sennrich et al. 2016), composed the way
production tokenizer trainers actually scale (HF `tokenizers`, the
published GPT-2 trainer): the corpus-sized work is ONE distributed
word-count (``ops/textstats.word_counts`` — per-batch pre-aggregation
before the shuffle), and merge learning then runs on the driver over
the BOUNDED (word, count) table — pair statistics are maintained
incrementally per merge, never rescanned from the corpus.  Encoding
is a streaming ``map_batches`` pass with the learned merge ranks
broadcast once via ``ray.put`` and a per-task word→pieces cache
(natural language repeats words heavily, so each distinct word is
encoded once per task, not once per occurrence).

Greedy encode order matches the published BPE algorithm: repeatedly
apply the LOWEST-rank applicable merge.  Training ties break by
(count desc, pair lexicographic asc) so the learned tokenizer is
deterministic across runs and partitionings.

This is the learned-tokenizer upgrade over the regex pre-tokenizer
count in ``ops/textstats.add_bpe_token_count``; the reference has no
tokenizer (its unit is the document, ``src/MarkdownConverter.ts``),
but token accounting is a first-class need of the 100-TB curation
surface this engine targets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .textstats import word_counts

_EOW = "</w>"  # end-of-word sentinel (subword-nmt convention); appended
# as ONE symbol, so its length never affects the pair algebra


def learn_merges(vocab: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge learning over a bounded (word, count) table.

    Incremental pair-count maintenance: applying a merge only touches
    the words that contain the merged pair, and only their adjacent
    pairs change — the standard fastBPE/subword-nmt bookkeeping, O(
    affected words) per merge instead of O(vocab) rescans."""
    words = [tuple(w) + (_EOW,) for w, _ in vocab]
    counts = [int(n) for _, n in vocab]

    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> set of word indexes containing it
    for wi, sym in enumerate(words):
        c = counts[wi]
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            key = (-c, p)  # count desc, pair lex asc
            if best is None or key < best:
                best = key
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            sym = words[wi]
            c = counts[wi]
            # remove this word's old pair contributions
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= c
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = tuple(out)
            # add the new contributions
            for a, b in zip(words[wi], words[wi][1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def bpe_train(
    ds: "ray.data.Dataset",
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 30000,
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """Distributed word-count → bounded driver-side merge learning.

    ``max_words`` caps the (word, count) table the driver sees: the
    top-N by (count desc, word asc), fetched via a per-block top-N +
    tiny reduce, so the driver never holds the full open vocabulary.
    """
    vocab = bounded_word_table(ds, text_col=text_col, max_words=max_words, min_count=min_count)
    return learn_merges(vocab, n_merges)


def bounded_word_table(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    max_words: int = 30000,
    min_count: int = 1,
) -> list[tuple[str, int]]:
    """The bounded (word, count) table every driver-side tokenizer
    trainer learns over: distributed word-count shuffle, then per-block
    top-``max_words`` by (count desc, word asc) + a tiny driver reduce —
    the driver never holds the full open vocabulary.  Shared by
    ``bpe_train`` and ``unigram_tok.unigram_train``."""
    wc = word_counts(ds, text_col=text_col, min_count=min_count)

    def local_top(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        w = np.asarray(batch["word"].to_pylist(), dtype=object)
        order = np.lexsort((w, -n))[:max_words]
        return pa.table(
            {"word": pa.array(w[order].tolist(), type=pa.string()),
             "n": pa.array(n[order], type=pa.int64())}
        )

    cand = wc.map_batches(local_top, batch_format="pyarrow", batch_size=2 * max_words).take_all()
    cand.sort(key=lambda r: (-r["n"], r["word"]))
    return [(r["word"], r["n"]) for r in cand[:max_words]]


def encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (published
    algorithm; ``ranks`` maps (left, right) -> merge index)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(sym, sym[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_pieces: bool = False,
) -> "ray.data.Dataset":
    """Streaming encode: (doc_id, n_pieces[, pieces]) per document.

    Merge ranks are broadcast once (``ray.put``); each task keeps a
    word→pieces cache so every DISTINCT word in a batch is encoded
    once (one ``np.unique`` per batch, then an inverse gather)."""
    ranks_ref = ray.put({tuple(p): i for i, p in enumerate(merges)})

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(ranks_ref)
            self.cache: dict = {}

        def _pieces(self, w: str) -> list[str]:
            out = self.cache.get(w)
            if out is None:
                out = encode_word(w, self.ranks)
                self.cache[w] = out
            return out

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch[text_col].to_pylist()
            docs = [(t or "").lower().split() for t in texts]
            flat = np.asarray(
                [w for d in docs for w in d] or [""], dtype=object
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            enc = [self._pieces(w) for w in uniq]
            cols: dict = {id_col: batch[id_col]}
            n_out, pieces_out, pos = [], [], 0
            for d in docs:
                k = len(d)
                idxs = inv[pos : pos + k]
                pos += k
                doc_pieces = [p for i in idxs for p in enc[i]]
                n_out.append(len(doc_pieces))
                if keep_pieces:
                    pieces_out.append(doc_pieces)
            cols["n_pieces"] = pa.array(n_out, type=pa.int64())
            if keep_pieces:
                cols["pieces"] = pa.array(pieces_out, type=pa.list_(pa.string()))
            return pa.table(cols)

    return ds.map_batches(
        Encoder, concurrency=(1, 8), batch_format="pyarrow", batch_size=1024
    )


def decode_pieces(pieces: list[str]) -> str:
    """Inverse of encode: concatenation with the end-of-word sentinel
    restoring spaces — the lossless-roundtrip check."""
    return "".join(pieces).replace(_EOW, " ").strip()


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as the tokenizer ARTIFACT — the
    packed-sequence delivery is meaningless to a trainer without the
    tokenizer that produced its token counts.  JSON with a version/format
    header; merge order IS the rank order."""
    import json

    with open(path, "w") as f:
        json.dump(
            {"format": "fer-bpe-merges", "version": 1, "eow": _EOW,
             "merges": [list(p) for p in merges]},
            f,
        )


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a :func:`save_merges` artifact (validates the header)."""
    import json

    with open(path) as f:
        obj = json.load(f)
    if obj.get("format") != "fer-bpe-merges":
        raise ValueError(f"{path} is not a fer-bpe-merges artifact")
    if obj.get("eow") != _EOW:
        raise ValueError(f"{path} uses eow={obj.get('eow')!r}, engine uses {_EOW!r}")
    return [tuple(p) for p in obj["merges"]]
