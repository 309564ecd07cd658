"""Corpus snapshot diff: which documents were ADDED, REMOVED or
CHANGED between two versions of a document table — the governance
primitive behind "what changed since the last crawl / curation run"
(pairs with ``ops/drift.py``, which answers the distributional form of
the same question).

Scale shape: each side collapses to ``(doc_id, content_hash)`` inside
one vectorized ``map_batches`` — document TEXT never crosses the
shuffle, only 16 bytes per row do.  The tagged union hash-partitions
by id into int64 parts (a key never straddles parts; same machinery as
``dedup._partitioned_attach``, which exists because Ray's hash join
dies on sparse-side empty partitions) and ONE vectorized pandas merge
per part emits the verdicts.  The output is CHANGE-sized, not
corpus-sized: unchanged rows drop unless asked for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _id_hash_side(
    ds: "ray.data.Dataset", id_col: str, text_col: str, role: int, n_parts: int
):
    from .dedup import _mix_mod

    def collapse(batch: pa.Table) -> pa.Table:
        id_arr = batch[id_col]
        # string ids route through a 64-bit hash for PARTITIONING only —
        # the key column keeps the original values, so verdicts carry
        # real ids and hash collisions merely co-locate two ids
        if pa.types.is_integer(id_arr.type):
            ids = id_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            part = _mix_mod(ids, n_parts)
            key = pa.array(ids, type=pa.int64())
        else:
            raw = np.asarray(id_arr.to_pylist(), dtype=object)
            part = pd.util.hash_array(
                np.asarray([x.encode() for x in raw], dtype=object)
            ).view(np.int64) % n_parts
            key = pa.array(raw, type=pa.string())
        # 64-bit content hash: a collision can only hide a CHANGED
        # verdict for one id, w.p. 2^-64 per changed doc.  Hash the
        # UTF-8 BYTES, not the str objects — pandas' object-string
        # hashing truncates at the first NUL (C-string semantics), so
        # str hashing would mask any change after an embedded \x00
        h = pd.util.hash_array(
            np.asarray(
                [(t or "").encode() for t in batch[text_col].to_pylist()],
                dtype=object,
            )
        ).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "key": key,
                "h": pa.array(h, type=pa.int64()),
                "role": pa.array(np.full(len(key), role, dtype=np.int8)),
            }
        )

    return ds.map_batches(collapse, batch_format="pyarrow", batch_size=8192)


def corpus_diff(
    ds_old: "ray.data.Dataset",
    ds_new: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
    include_unchanged: bool = False,
) -> "ray.data.Dataset":
    """Diff two corpus snapshots by id + content hash.

    Returns a Dataset of ``(doc_id, status)`` with status one of
    ``added`` (id only in ``ds_new``), ``removed`` (only in
    ``ds_old``), ``changed`` (both sides, different text hash) — plus
    ``unchanged`` rows when ``include_unchanged=True``.  Ids are
    assumed unique per side (the document-table contract); duplicate
    ids keep their first row."""
    unioned = _id_hash_side(ds_old, id_col, text_col, 0, n_parts).union(
        _id_hash_side(ds_new, id_col, text_col, 1, n_parts)
    )

    def diff_part(group: pd.DataFrame) -> pa.Table:
        old = group[group["role"] == 0].drop_duplicates("key")
        new = group[group["role"] == 1].drop_duplicates("key")
        # hashes ride as NULLABLE Int64 through the outer merge — the
        # default NaN-padding promotes int64 to float64, rounding
        # full-range hashes to 52-bit mantissas and silently weakening
        # the 2^-64 collision bound to ~2^-53 (the same int64→float64
        # trap dedup._partitioned_attach documents)
        m = old[["key", "h"]].astype({"h": "Int64"}).merge(
            new[["key", "h"]].astype({"h": "Int64"}),
            on="key",
            how="outer",
            suffixes=("_old", "_new"),
        )
        old_missing = m["h_old"].isna().to_numpy()
        new_missing = m["h_new"].isna().to_numpy()
        same = (m["h_old"] == m["h_new"]).fillna(False).to_numpy(dtype=bool)
        status = np.where(
            old_missing,
            "added",
            np.where(new_missing, "removed", np.where(same, "unchanged", "changed")),
        )
        keep = np.ones(len(m), dtype=bool) if include_unchanged else status != "unchanged"
        return pa.table(
            {
                id_col: pa.array(
                    m["key"].to_numpy()[keep].astype(np.int64)
                    if np.issubdtype(group["key"].dtype, np.integer)
                    else m["key"].to_numpy()[keep].astype(object),
                ),
                "status": pa.array(status[keep].tolist(), type=pa.string()),
            }
        )

    return unioned.groupby("part").map_groups(
        diff_part, batch_format="pandas"
    )
