"""Batched text-embedding inference stage.

The canonical "stateful model inference" pattern: the model loads ONCE
per actor in ``__init__`` and every ``__call__`` embeds a whole Arrow
batch vectorized.  In this sandbox the "model" is a deterministic
hashed bag-of-words + seeded random projection (public feature-hashing
technique) — real, useful embeddings for dedup/similarity pipelines,
with the exact actor-pool plumbing a transformer encoder would use
(swap ``_load_model``/``_encode`` for the real thing; batch size and
``concurrency`` stay the controls).

Reference analog: the LLM-provider slot of the structured engine
(/root/reference/src/StructuredContentEngine.ts:366-384) — expensive
client state held per worker, batched calls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


class TextEmbedder:
    """``map_batches`` callable CLASS for actor pools.

    ``__init__`` builds the "model" (a seeded projection matrix —
    deterministic, so embeddings are stable across runs/actors);
    ``__call__`` embeds one batch with two matrix ops: hashed
    bag-of-words featurization then projection, L2-normalized.
    """

    def __init__(
        self,
        dim: int = 64,
        vocab_buckets: int = 4096,
        seed: int = 17,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        self.dim = dim
        self.buckets = vocab_buckets
        self.text_col = text_col
        self.id_col = id_col
        self._proj = self._load_model(seed)

    def _load_model(self, seed: int) -> np.ndarray:
        """The expensive once-per-actor step (a real stage loads weights
        here)."""
        rng = np.random.RandomState(seed)
        return rng.randn(self.buckets, self.dim).astype(np.float64) / np.sqrt(self.dim)

    def _encode(self, texts: list) -> np.ndarray:
        """Hashed BoW + projection for a whole batch (no per-row model
        calls — the batched-inference contract)."""
        # one C-vectorized hash call over every token of the batch
        tok_lists = [(t or "").lower().split() for t in texts]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        flat = [tok for toks in tok_lists for tok in toks]
        feats = np.zeros((len(texts), self.buckets), dtype=np.float64)
        if flat:
            h = pd.util.hash_array(np.asarray(flat, dtype=object)) % self.buckets
            doc_idx = np.repeat(np.arange(len(texts)), counts)
            np.add.at(feats, (doc_idx, h.astype(np.int64)), 1.0)
        emb = feats @ self._proj
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return emb / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = self._encode(batch[self.text_col].to_pylist())
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.array(
                    [row for row in emb.astype(np.float32).tolist()],
                    type=pa.list_(pa.float32()),
                ),
            }
        )


def embed_texts(
    ds: "ray.data.Dataset",
    dim: int = 64,
    concurrency: int = 2,
    batch_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Embed a document table with an actor pool (model built once per
    actor); output schema ``(id, embedding: list<float32>)`` matches the
    similarity ops' input, so ``knn_bruteforce`` / ``ivf_knn`` /
    ``embedding_near_dup_pairs`` consume it directly."""
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"dim": dim, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
