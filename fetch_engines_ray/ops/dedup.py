"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every flavor is partial-first — per-batch signature
computation in ``map_batches`` (vectorized numpy), then ONE ``groupby``
on a bucket key whose fan-in is tiny (bucket members), never an
all-pairs shuffle.  Candidate verification happens inside the bucket
group (``map_groups``), so the only wide op moves (key, doc_id,
signature) triples, not documents.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _stable_hash32(s: str) -> int:
    return zlib.crc32(s.encode())


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup: md5(text) groups; keep min(doc_id).

    Returns (text_hash, keep_doc_id, n_dups) — SQL-oracle-equivalent to
    ``SELECT md5(text), min(doc_id), count(*) ... GROUP BY md5(text)``.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [_md5_hex(t or "") for t in batch[text_col].to_pylist()]
        return pa.table(
            {"text_hash": pa.array(hashes), id_col: batch[id_col]}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=4096)
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_doc_id"), Count(alias_name="n_dups")
    )


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"):
    """Keep one row per distinct text (the min-id winner's ids)."""
    return exact_dedup_groups(ds, text_col, id_col).select_columns(["keep_doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-batch MinHash signatures over word shingles.

    Stateful actor stage: the (a, b) permutation parameters are built
    once per actor in ``__init__`` (seeded → identical across actors).
    """

    def __init__(self, num_perm: int = 64, shingle_size: int = 3, seed: int = 7) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        # one DISTINCT odd multiplier per shingle position — cycling a
        # fixed 4-tuple made positions j and j+4 share a multiplier, so
        # the commutative XOR combine collided shingles differing only
        # by a token swap at distance 4 (shingle_size > 4 only)
        self.pos_mult = tuple(
            self._POS_MULT[j] if j < len(self._POS_MULT) else _splitmix64(0x9E3779B9 + j) | 1
            for j in range(shingle_size)
        )

    # distinct odd multipliers combining the k token hashes of a shingle
    # (first four kept verbatim so default-config signatures are stable)
    _POS_MULT = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5)

    def signature(self, text: str) -> np.ndarray:
        toks = text.lower().split()
        k = self.shingle_size
        if len(toks) < k:
            hv = np.array([_stable_hash32(" ".join(toks))], dtype=np.int64)
        else:
            # shingle hash = position-weighted combine of per-TOKEN crc32s,
            # fully vectorized — no per-shingle string join/encode/hash
            th = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
            n_sh = len(toks) - k + 1
            acc = np.zeros(n_sh, dtype=np.uint64)
            for j in range(k):
                acc ^= th[j : j + n_sh] * np.uint64(self.pos_mult[j])
            hv = np.unique(acc).astype(np.int64) & np.int64((1 << 62) - 1)
        # sig[j] = min over shingles of (a_j * h + b_j) mod p   (vectorized)
        vals = (np.outer(self.a, hv) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [self.signature(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "minhash_sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
            }
        )


_MINHASHERS: dict = {}


def minhash_batch(
    batch: pa.Table, num_perm: int = 64, shingle_size: int = 3, seed: int = 7
) -> pa.Table:
    """Task-pool form of MinHasher: per-worker cached permutation state.
    (An actor pool caps the fused upstream at pool size — see
    stages/extract.py for the same pattern.)

    Emits the signature as a fixed-width little-endian int64 blob —
    Arrow hash joins don't support list payload columns, and the blob
    is also ~half the wire size of a list<int64>."""
    key = (num_perm, shingle_size, seed)
    h = _MINHASHERS.get(key)
    if h is None:
        h = _MINHASHERS[key] = MinHasher(num_perm, shingle_size, seed)
    ids = batch["doc_id"].to_pylist()
    blobs = [
        h.signature(t or "").astype("<i8").tobytes() for t in batch["text"].to_pylist()
    ]
    return pa.table({"doc_id": pa.array(ids), "minhash_sig": pa.array(blobs, type=pa.binary())})


def _decode_sigs(col) -> np.ndarray:
    return np.stack([np.frombuffer(b, dtype="<i8") for b in col.to_pylist()])


def _band_rows(batch: pa.Table, num_bands: int) -> pa.Table:
    """Explode signatures into (band_bucket, doc_id) rows.

    Deliberately does NOT carry the signature through the LSH shuffle —
    that would duplicate ~0.5 KB/doc x num_bands across the all-to-all
    exchange.  Signatures are re-attached to the (tiny) candidate-pair
    set afterwards via hash join."""
    out_bucket: list[str] = []
    out_id: list = []
    ids = batch["doc_id"].to_pylist()
    sigs = _decode_sigs(batch["minhash_sig"])
    for doc_id, sig in zip(ids, sigs):
        sig = sig.tolist()
        rows_per_band = len(sig) // num_bands
        for b in range(num_bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            digest = hashlib.blake2b(
                (str(b) + ":" + ",".join(map(str, chunk))).encode(), digest_size=8
            ).hexdigest()
            out_bucket.append(digest)
            out_id.append(doc_id)
    return pa.table({"bucket": pa.array(out_bucket), "doc_id": pa.array(out_id)})


def _collision_buckets_only(banded: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop singleton LSH buckets before the per-bucket pair pass.

    A vectorized ``groupby(bucket).count`` finds the (rare) colliding
    buckets; their keys are broadcast (``ray.put``) and the band rows
    are filtered in ``map_batches``.  At corpus scale where the
    colliding-key set itself outgrows memory, this broadcast becomes a
    hash-partitioned semi-join — same plan shape, no API change.
    """
    counts = banded.groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    dup_keys = set(counts.loc[counts["n"] >= 2, "bucket"])
    if not dup_keys:
        return None  # type: ignore[return-value]
    keys_ref = ray.put(dup_keys)

    def keep_collisions(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pa.array([b in keys for b in batch["bucket"].to_pylist()])
        return batch.filter(mask)

    return banded.map_batches(keep_collisions, batch_format="pyarrow", batch_size=8192)


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
) -> pd.DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduplicated
    across buckets, est_jaccard = fraction of equal signature rows ≥
    ``threshold``.
    """
    sigs = ds.map_batches(
        minhash_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_size": shingle_size},
        batch_format="pyarrow",
        batch_size=1024,
    )
    # Signatures are consumed three times (banding + both join sides);
    # materialize once — they are ~0.5 KB/doc.  At 10^12-doc scale this
    # becomes a parquet checkpoint of the signature table instead.
    sigs = sigs.materialize()
    banded = sigs.map_batches(
        lambda b: _band_rows(b, num_bands), batch_format="pyarrow", batch_size=1024
    )
    empty = pd.DataFrame(columns=["doc_a", "doc_b", "est_jaccard"])
    colliding = _collision_buckets_only(banded)
    if colliding is None:
        return empty

    # Candidate ID pairs per colliding bucket (ids only — tiny rows).
    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        rows = [
            {"doc_a": ids[i], "doc_b": ids[j]}
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ]
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"])

    cand = colliding.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    # Re-attach signatures to candidates with two hash joins (the
    # at-scale shape: candidates are rare, signatures never fan out
    # through the LSH shuffle).  Partition count scales with the
    # signature table — each join partition is a shuffle-aggregator
    # actor with multi-second fixed cost.
    n_parts = max(2, min(16, sigs.count() // 200_000 + 1))
    left = cand.join(
        sigs, join_type="inner", num_partitions=n_parts, on=("doc_a",), right_on=("doc_id",)
    )
    both = left.join(
        sigs.map_batches(
            lambda b: b.rename_columns(["doc_id", "minhash_sig_b"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=n_parts,
        on=("doc_b",),
        right_on=("doc_id",),
    )

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], type=batch.column("doc_a").type),
                    "doc_b": pa.array([], type=batch.column("doc_b").type),
                    "est_jaccard": pa.array([], type=pa.float64()),
                }
            )
        a = _decode_sigs(batch.column("minhash_sig"))
        b = _decode_sigs(batch.column("minhash_sig_b"))
        est = (a == b).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": batch.column("doc_a").filter(pa.array(keep)),
                "doc_b": batch.column("doc_b").filter(pa.array(keep)),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
            }
        )

    pairs = both.map_batches(estimate, batch_format="pyarrow", batch_size=4096).to_pandas()
    if pairs.empty:
        return empty
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    toks = text.lower().split()
    if not toks:
        return 0
    for t in toks:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_signatures(ds: "ray.data.Dataset"):
    """(doc_id, simhash, chunk0..chunk3) — 16-bit chunks are the LSH
    bucket keys (two near-dup docs with hamming distance ≤ 3 share at
    least one chunk by pigeonhole)."""

    def add(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [_simhash64(t or "") for t in batch["text"].to_pylist()]
        cols = {
            "doc_id": pa.array(ids),
            "simhash": pa.array([f"{h:016x}" for h in hs]),
        }
        for c in range(4):
            cols[f"chunk{c}"] = pa.array([(h >> (16 * c)) & 0xFFFF for h in hs], type=pa.int32())
        return pa.table(cols)

    return ds.map_batches(add, batch_format="pyarrow", batch_size=2048)


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs: bucket by each 16-bit chunk, verify hamming ≤ k."""
    sigs = simhash_signatures(ds)

    def explode(batch: pa.Table) -> pa.Table:
        ids, sims, buckets = [], [], []
        for r in batch.to_pylist():
            for c in range(4):
                ids.append(r["doc_id"])
                sims.append(r["simhash"])
                buckets.append(f"{c}:{r[f'chunk{c}']}")
        return pa.table({"bucket": pa.array(buckets), "doc_id": pa.array(ids), "simhash": pa.array(sims)})

    banded = sigs.map_batches(explode, batch_format="pyarrow", batch_size=2048)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        ids = group["doc_id"].tolist()
        hs = [int(s, 16) for s in group["simhash"]]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    rows.append({"doc_a": a, "doc_b": b, "hamming": d})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    empty = pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    colliding = _collision_buckets_only(banded)
    if colliding is None:
        return empty
    pairs = colliding.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    if pairs.empty:
        return empty
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity of two texts."""

    def grams(t: str) -> set:
        toks = t.lower().split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    union = len(ga | gb)
    return len(ga & gb) / union if union else 0.0


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
) -> pd.DataFrame:
    """Near-dup pairs verified by EXACT word n-gram Jaccard.

    Same LSH candidate generation as :func:`minhash_lsh_pairs`, but the
    verification joins the candidate ids back to the raw TEXTS (hash
    join) and computes the true n-gram Jaccard — the estimator-free
    variant for when candidate volume is small enough to afford exact
    verification.  Returns (doc_a, doc_b, jaccard_x1000) with an
    integer-scaled score (hash-stable).
    """
    sigs = ds.map_batches(
        minhash_batch,
        fn_kwargs={"num_perm": num_perm, "shingle_size": shingle_size},
        batch_format="pyarrow",
        batch_size=1024,
    ).materialize()
    banded = sigs.map_batches(
        lambda b: _band_rows(b, num_bands), batch_format="pyarrow", batch_size=1024
    )
    empty = pd.DataFrame(columns=["doc_a", "doc_b", "jaccard_x1000"])
    colliding = _collision_buckets_only(banded)
    if colliding is None:
        return empty

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        return pd.DataFrame(
            [{"doc_a": ids[i], "doc_b": ids[j]} for i in range(len(ids)) for j in range(i + 1, len(ids))],
            columns=["doc_a", "doc_b"],
        )

    cand = colliding.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    texts = ds.map_batches(
        lambda b: b.select(["doc_id", "text"]), batch_format="pyarrow", batch_size=4096
    )
    n_parts = max(2, min(16, sigs.count() // 200_000 + 1))
    left = cand.join(texts, join_type="inner", num_partitions=n_parts, on=("doc_a",), right_on=("doc_id",))
    both = left.join(
        texts.map_batches(lambda b: b.rename_columns(["doc_id", "text_b"]), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("doc_b",),
        right_on=("doc_id",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.select(["doc_a", "doc_b", "text", "text_b"]).to_pylist():
            j = ngram_jaccard(r["text"] or "", r["text_b"] or "", n=shingle_size)
            if j >= threshold:
                rows.append({"doc_a": r["doc_a"], "doc_b": r["doc_b"], "jaccard_x1000": int(round(j * 1000))})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_a", batch.schema.field("doc_a").type), ("doc_b", batch.schema.field("doc_b").type), ("jaccard_x1000", pa.int64())]
            ),
        )

    pairs = both.map_batches(verify, batch_format="pyarrow", batch_size=2048).to_pandas()
    if pairs.empty:
        return empty
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def dedup_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Resolve near-dup PAIRS into clusters via union-find and pick the
    min doc_id as each cluster's representative.

    Pair lists are tiny relative to the corpus (only near-dups), so the
    union-find runs driver-side; at a scale where even the pair list is
    distributed, this becomes iterative label propagation over the same
    (doc_a, doc_b) edge dataset — same output contract.

    Returns (doc_id, cluster_rep, is_kept) for every doc appearing in a
    pair; docs not in any pair are implicitly kept.
    """
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as root → deterministic representative
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    rows = [
        {"doc_id": d, "cluster_rep": find(d), "is_kept": find(d) == d}
        for d in sorted(parent)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep", "is_kept"])


def minhash_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.7,
    **lsh_kwargs,
) -> pd.DataFrame:
    """End-to-end near-dedup: LSH pairs → clusters → per-doc keep/drop
    decision (docs in no cluster are kept)."""
    pairs = minhash_lsh_pairs(ds, threshold=threshold, **lsh_kwargs)
    return dedup_clusters(pairs)
